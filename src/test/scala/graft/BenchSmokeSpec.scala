package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** CI floor for the bench surface (round-4 advice): a plan regression
  * that makes a headline query THROW must fail `sbt test`, not hide
  * until the driver's sf0.1 bench run. Runs the fixed 14-query headline
  * set at sf0.001 through the same noop-sink forcing Bench uses —
  * timing is not asserted (the box is noisy; floors are tracked by the
  * driver), only that every plan still executes.
  */
class BenchSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("all headline bench queries execute at sf0.001") {
    val failures = SparkEntry.benchQueries.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("iterative bench group is the six loop-shaped engines") {
    // The group exists to floor the fixpoint operators' per-round
    // lineage-cut cost; membership is pinned so a refactor can't
    // silently drop one from the driver's BENCH_r{N} report.
    // Round 8 added g08/g10 (the round-7 iterative additions) so drift
    // on those surfaces is measured, not assumed.
    assert(SparkEntry.benchIterQueries.sorted ==
      Seq("d06_dup_clusters", "g01_pagerank", "g05_kcore", "g08_sssp",
        "g10_hits", "s09_int_kmeans"))
  }

  test("ladder.py SF10_SUBSET matches the Scala bench groups") {
    // tools/ladder.py hardcodes the sf10 rung membership as a Python
    // list; nothing else pins it to the Scala registry, so a future
    // bench=true query would silently drop out of the rung while the
    // rung metadata still claims 'bench+iter+heavy' (round-11 advice).
    // Parse the quoted names out of the SF10_SUBSET block and require
    // set equality with the flagged groups.
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("tools/ladder.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    val block = text.split("SF10_SUBSET")(1).split("\\]\\)")(0)
    val pinned = "\"([a-z0-9_]+)\"".r.findAllMatchIn(block)
      .map(_.group(1)).toSet
    val scala_ = (SparkEntry.benchQueries ++ SparkEntry.benchIterQueries ++
      SparkEntry.benchHeavyQueries).toSet
    assert(pinned == scala_,
      s"ladder.py SF10_SUBSET drifted from the Scala bench groups: " +
        s"ladder-only=${(pinned -- scala_).toSeq.sorted.mkString(",")} " +
        s"scala-only=${(scala_ -- pinned).toSeq.sorted.mkString(",")}")
  }

  test("heavy bench group is the round-7 multi-stage pipelines") {
    // Same pinning for the heavy non-loop group (round-8 addition):
    // the expensive dedup/ANN pipelines whose drift was previously
    // unmeasured between rounds.
    // Round 12 adds m08 (corpus-scale decode throughput) — the first
    // heavy row whose cost is per-row CPU, not join/shuffle work.
    assert(SparkEntry.benchHeavyQueries.sorted ==
      Seq("d18_tfidf_similarity", "d20_entity_blocks",
        "m08_decode_volume", "s20_ivf_adc_topk"))
  }
}
