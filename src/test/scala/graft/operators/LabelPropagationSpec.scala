package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges ++ edges.map { case (a, b) => (b, a) }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
      maxIterations: Int = 50,
      checkpointDir: Option[String] = None,
      minDelta: Long = 0L): Map[Long, Long] =
    LabelPropagation.propagate(sym(edges).toDF("u", "v"),
        seeds.toDF("node", "label"), maxIterations, checkpointDir, minDelta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("converges on a path graph: labels meet in the middle") {
    // 1-2-3-4-5-6, seeds 1→10 and 6→20: round 1 labels {2,5}, round 2
    // labels {3,4}, round 3 wins nothing → converged. maxIterations=50
    // must terminate at the fixpoint, not run 50 rounds of no-ops.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = run(edges, Seq((1L, 10L), (6L, 20L)))
    assert(got === Map(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L))
  }

  test("majority vote with smallest-label tie-break is deterministic") {
    // node 0 has three labeled neighbors: two vote 7, one votes 3 →
    // majority 7; node 100 has one neighbor each of 5 and 3 → tie,
    // smaller label 3 wins
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 100L), (5L, 100L))
    val got = run(edges,
      Seq((1L, 7L), (2L, 7L), (3L, 3L), (4L, 5L), (5L, 3L)),
      maxIterations = 1)
    assert(got(0L) === 7L)
    assert(got(100L) === 3L)
  }

  test("seeds and won labels are clamped — never overwritten") {
    // seed 1→10 sits in a sea of 20-labeled neighbors ({2,3,4} each see
    // one 10-vote and two 20-votes in round 1, so 20 wins the majority);
    // a clamping bug would flip node 1 on round 2
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 2L), (5L, 3L), (5L, 4L), (6L, 2L), (6L, 3L), (6L, 4L))
    val got = run(edges, Seq((1L, 10L), (5L, 20L), (6L, 20L)))
    assert(got(1L) === 10L)
    assert(Seq(2L, 3L, 4L).forall(got(_) === 20L))
  }

  test("unreachable nodes stay unlabeled") {
    val edges = Seq((1L, 2L), (8L, 9L)) // component {8,9} has no seed
    val got = run(edges, Seq((1L, 10L)))
    assert(got === Map(1L -> 10L, 2L -> 10L))
  }

  test("reliable checkpoint mode: identical labels, files on disk") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val seeds = Seq((1L, 10L), (6L, 20L))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lp-ckpt")
    val reliable = run(edges, seeds, checkpointDir = Some(ckpt.toString))
    assert(reliable === run(edges, seeds),
      "reliable-checkpoint mode changed the answer")
    assert(java.nio.file.Files.list(ckpt).count() > 0,
      "checkpoint dir is empty")
  }

  test("maxIterations bounds the rounds: 1 round reaches only the frontier") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = run(edges, Seq((1L, 10L)), maxIterations = 1)
    assert(got === Map(1L -> 10L, 2L -> 10L))
  }

  test("minDelta=0 IS the exact fixpoint (tol-mode contract, round 11)") {
    // the delta path must not change the default semantics: same graph,
    // same seeds, explicit minDelta=0 ≡ the fixpoint-mode answer
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val seeds = Seq((1L, 10L), (6L, 20L))
    assert(run(edges, seeds, minDelta = 0L) === run(edges, seeds))
  }

  test("minDelta stops the thin tail early; won labels are still exact") {
    // star(1..4 around hub 0) + a path tail 4-5-6-7-8, seed 1→10:
    // round 1 wins exactly {0}, so minDelta=1 converges immediately —
    // the star arms and the tail stay unlabeled — while the exact run
    // walks the whole graph. Every label the early run DID emit must
    // match the exact run (clamping makes wins final).
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    val seeds = Seq((1L, 10L))
    val exact = run(edges, seeds)
    val early = run(edges, seeds, minDelta = 1L)
    assert(exact.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(early.size < exact.size,
      s"minDelta=1 should stop before the full tail (got ${early.size})")
    // under-labeling only, never wrong labels
    assert(early.forall { case (n, l) => exact(n) == l })
    // and the seeds' neighborhood (the high-delta rounds) is covered
    assert(Set(0L, 1L).subsetOf(early.keySet))
  }
}
