package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Pins the PLATFORM half of the skew story: q47 oracle-gates the
  * explicit salted join (SkewJoin) for the pathological shapes, and
  * this spec proves the default path — AQE's runtime skew splitting —
  * actually engages on a deliberately skewed sort-merge join, so a conf
  * regression (AQE or skewJoin disabled, thresholds broken) fails
  * `sbt test` instead of silently serializing one 100 TB hot partition
  * through a single reducer.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // force sort-merge (the skew optimization's target shape) and
      // scale the size thresholds down to fixture size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // one hot key carries ~99% of the big side; payload pads the rows
      // so the hot partition is far past the 64KB threshold
      val big = spark.range(0, 100000)
        .select(when(col("id") % 100 === 0, col("id") % 7)
          .otherwise(lit(0L)).as("k"),
          concat(lit("x" * 64), col("id")).as("payload"))
      val small = spark.range(0, 7).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = big.join(small, "k")

      // execute THIS QueryExecution (a .count() would build another) so
      // AQE finalizes its stages and the skew split shows in the plan
      val rows = joined.queryExecution.executedPlan.execute().count()
      assert(rows === 100000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
