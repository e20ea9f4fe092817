package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    val got = components(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)))
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("initialLabels resume: any mid-run state converges to the full " +
      "run's fixpoint") {
    // chain 1-2-3-4-5 (diameter 4). Hand-computed round-1 state of the
    // min-label loop: every node takes min(self, neighbors) —
    // 1→1, 2→1, 3→2, 4→3, 5→4. Resuming from it must reach the same
    // all-1 fixpoint as the cold run (monotone + idempotent), and
    // resuming from the FIXPOINT itself must be a no-op.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val full = components(chain)
    assert(full === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    val round1 = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L))
      .toDF("node", "label")
    val resumed = ConnectedComponents
      .minLabel(chain.toDF("a", "b"), initialLabels = Some(round1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === full, "resume from round-1 state diverged")
    val fixpoint = full.toSeq.map { case (n, c) => (n, c) }
      .toDF("node", "label")
    val noop = ConnectedComponents
      .minLabel(chain.toDF("a", "b"), initialLabels = Some(fixpoint))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noop === full, "resume from the fixpoint moved a label")
  }

  test("reliable checkpoint mode: identical components, files on disk") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    val reliable = ConnectedComponents
      .minLabel(edges.toDF("a", "b"), checkpointDir = Some(ckpt.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === components(edges),
      "reliable-checkpoint mode changed the answer")
    // the rounds really went through the reliable path: checkpoint data
    // exists under the directory
    val wrote = java.nio.file.Files.walk(ckpt).iterator()
    assert(wrote.asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .hasNext, "no checkpoint files written")
    assert(java.nio.file.Files.list(ckpt).count() > 0,
      "checkpoint dir is empty")
  }

  test("matches a reference union-find on random graphs") {
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(50)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      // min-label invariant: union-find roots ARE the min ids here
      // because unions always point the larger root at the smaller
      assert(components(edges) === expected, s"trial $trial")
    }
  }
}
