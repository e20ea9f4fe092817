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

  test("heavy bench group is the round-7 multi-stage pipelines") {
    // Same pinning for the heavy non-loop group (round-8 addition):
    // the expensive dedup/ANN pipelines whose drift was previously
    // unmeasured between rounds.
    assert(SparkEntry.benchHeavyQueries.sorted ==
      Seq("d18_tfidf_similarity", "d20_entity_blocks", "s20_ivf_adc_topk"))
  }
}
