package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class SsspSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dist(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Long] =
    Sssp.distances(edges.toDF("u", "v", "w"), sources.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // expensive direct edge 1→4 (w=10) vs cheap chain 1→2→3→4 (w=1+1+1):
  // hop-BFS would take the direct edge; weighted SSSP must not
  private val weighted = Seq(
    (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 10L), (4L, 5L, 2L))

  test("cheap multi-hop route beats expensive direct edge") {
    assert(dist(weighted, Seq(1L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 5L))
  }

  test("round bound = min over paths of ≤ k edges (direct edge wins early)") {
    // after 1 round only ≤1-edge paths exist: 4 is reached at cost 10
    assert(dist(weighted, Seq(1L), 1) ===
      Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
    // after 3 rounds the 3-edge chain has relaxed through: 4 costs 3
    assert(dist(weighted, Seq(1L), 3)(4L) === 3L)
  }

  test("a later cheaper route lowers an already-settled distance") {
    // 5 is first reached round 2 via the direct edge (10+2), then
    // improved round 4 via the chain (3+2) — the frontier re-expansion
    // that plain BFS never needs
    assert(dist(weighted, Seq(1L), 2)(5L) === 12L)
    assert(dist(weighted, Seq(1L), 4)(5L) === 5L)
  }

  test("multiple sources take the cheapest origin; cycles terminate") {
    val ring = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L))
    assert(dist(ring, Seq(1L, 3L), 6) ===
      Map(1L -> 0L, 3L -> 0L, 2L -> 5L))
  }

  test("generous round bound exits early on empty frontier") {
    // diameter 4; 100 rounds must still converge (and quickly)
    assert(dist(weighted, Seq(1L), 100)(5L) === 5L)
  }

  test("zero-weight edges are admitted, negative weights refused") {
    val zero = Seq((1L, 2L, 0L), (2L, 3L, 4L))
    assert(dist(zero, Seq(1L), 3) === Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
    val neg = Seq((1L, 2L, -1L))
    assertThrows[IllegalArgumentException] {
      Sssp.distances(neg.toDF("u", "v", "w"), Seq(1L).toDF("node"), 2)
    }
  }

  test("unit weights degenerate to Bfs hops (random graphs)") {
    // with w=1 min summed weight IS min hop count — the two operators
    // must agree exactly; seeds fixed so the graphs are reproducible
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val unit = edges.map { case (u, v) => (u, v, 1L) }
      val viaSssp = dist(unit, Seq(0L), 8)
      val viaBfs = Bfs.hops(edges.toDF("u", "v"), Seq(0L).toDF("node"), 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSssp === viaBfs, s"unit-weight SSSP diverged from BFS on $edges")
    }
  }

  test("maxRounds=0 returns the distinct source set at distance 0") {
    // the round-15 own-flag merge initializes sources with a null own
    // distance; a zero-round call must still return exactly the seeds
    // (IterProbe's rounds=0 arm and the setup-cost attribution rely on it)
    assert(dist(weighted, Seq(1L, 1L, 4L), 0) === Map(1L -> 0L, 4L -> 0L))
  }

  test("frontier excludes non-improved nodes (own-flag merge semantics)") {
    // diamond where 4 is settled at round 2 via both routes at equal
    // cost: the round-15 filter (d < od, od null for new) must treat an
    // EQUAL re-derivation as non-improved — with ≥ admitted to the
    // frontier, the 4→5 edge would re-relax every round and the
    // early-exit below would never fire inside the generous bound
    val diamond = Seq(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
    assert(dist(diamond, Seq(1L), 50) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("reliable checkpoint mode: identical distances, files on disk") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sssp-ckpt")
    val reliable = Sssp
      .distances(weighted.toDF("u", "v", "w"), Seq(1L).toDF("node"), 4,
        checkpointDir = Some(ckpt.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === dist(weighted, Seq(1L), 4),
      "reliable-checkpoint mode changed the answer")
    assert(java.nio.file.Files.list(ckpt).count() > 0,
      "checkpoint dir is empty — rounds did not go through the reliable path")
  }
}
