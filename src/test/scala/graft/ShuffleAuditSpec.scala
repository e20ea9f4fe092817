package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Pins the shuffle-audit instrument's measurement path: the listener
  * must attribute a grouped aggregation's shuffle bytes to the query
  * that ran between reset() and snapshot(), through the listener-bus
  * drain barrier. Without the barrier this test is FLAKY by
  * construction (task-end events are async); deterministic green here
  * is the evidence the barrier works.
  */
class ShuffleAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("listener attributes shuffle bytes to the measured window") {
    val listener = new ShuffleAudit.MetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      listener.reset()
      // a groupBy on forced-random keys MUST shuffle (no partial-agg
      // collapse to zero groups) — deterministic seed, ~64k rows
      spark.range(0, 65536, 1, 8)
        .selectExpr("id % 977 AS k", "id AS v")
        .groupBy("k").sum("v")
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graftshim.ListenerShim
        .waitUntilEmpty(spark.sparkContext)
      val m = listener.snapshot()
      assert(m("n_tasks") > 0)
      assert(m("shuffle_write_bytes") > 0,
        "grouped agg produced no shuffle write — listener not wired")
      assert(m("shuffle_read_bytes") > 0)

      // reset + a shuffle-free scan: bytes must NOT leak across windows
      listener.reset()
      spark.range(0, 1000, 1, 2).selectExpr("id")
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graftshim.ListenerShim
        .waitUntilEmpty(spark.sparkContext)
      val m2 = listener.snapshot()
      assert(m2("shuffle_write_bytes") == 0,
        s"shuffle-free scan shows ${m2("shuffle_write_bytes")} shuffled " +
          "bytes — events leaked across the reset() window")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
