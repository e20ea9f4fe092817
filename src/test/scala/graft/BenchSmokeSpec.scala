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

  test("iterative bench group is the four loop-shaped engines") {
    // The group exists to floor the fixpoint operators' per-round
    // lineage-cut cost; membership is pinned so a refactor can't
    // silently drop one from the driver's BENCH_r{N} report.
    assert(SparkEntry.benchIterQueries.sorted ==
      Seq("d06_dup_clusters", "g01_pagerank", "g05_kcore", "s09_int_kmeans"))
  }
}
