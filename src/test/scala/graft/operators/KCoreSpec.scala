package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Symmetrize an undirected edge list and run KCore. */
  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val e = edges.toDF("u", "v")
    val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
    KCore.core(sym, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pendant chain cascades away, clique core survives (k=2)") {
    // clique {1,2,3,4} with a pendant chain 4-5-6-7: peeling at k=2
    // must remove 7 (deg 1), then 6, then 5 — a 3-round cascade —
    // leaving exactly the clique, every member at degree 3.
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = core(clique ++ chain, 2)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("k above the degeneracy empties the graph") {
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L)) // triangle: 2-core max
    assert(core(clique, 3) === Map.empty)
  }

  test("k=1 keeps every non-isolated node with its full degree") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(core(edges, 1) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("two components peel independently") {
    // triangle {1,2,3} and a 4-cycle {10,11,12,13} with one chord
    // removed: at k=2 both survive whole; at k=3 only nothing survives
    // from the cycle and the triangle dies too (all deg 2).
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val cyc = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val got2 = core(tri ++ cyc, 2)
    assert(got2.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L, 13L))
    assert(core(tri ++ cyc, 3) === Map.empty)
  }

  test("shuffle semi-join fallback path is identical to broadcast peel") {
    // round 12: the peel is adaptive — broadcast anti-joins for small
    // per-round drop sets, keep-set semi-joins past broadcastDropMax.
    // Force the fallback (bound 0) on the cascade fixture and require
    // the same core; the default path is what every other case runs.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val e = edges.toDF("u", "v")
    val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
    val viaShuffle = KCore.core(sym, 2, broadcastDropMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaShuffle === core(edges, 2),
      "semi-join fallback diverged from the broadcast peel")
  }

  test("reliable checkpoint mode: identical core, files on disk") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val e = edges.toDF("u", "v")
    val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kcore-ckpt")
    val reliable = KCore.core(sym, 2, checkpointDir = Some(ckpt.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === core(edges, 2),
      "reliable-checkpoint mode changed the answer")
    assert(java.nio.file.Files.list(ckpt).count() > 0,
      "checkpoint dir is empty — rounds did not go through the reliable path")
  }
}
