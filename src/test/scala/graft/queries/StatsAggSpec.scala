package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.mr.SparkTestSession

/** q34 derives corr/covar/stddev from exact integer co-moments (the
  * only hash-stable cross-engine formulation — see the query's
  * scaladoc). This spec pins that derivation to Spark's NATIVE
  * statistical aggregates: on the same input the formula-based values
  * must agree with corr/covar_samp/stddev_samp to 1e-9, so the oracle
  * query really is testing the same statistic the built-ins compute.
  */
class StatsAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("Dataset.observe collects pipeline counters without a second pass") {
    // The run-time-counters idiom a 100 TB pipeline needs: row/volume
    // metrics ride along INSIDE the job (collected on the driver as
    // tasks report), instead of a second aggregate pass over the data.
    val obs = org.apache.spark.sql.Observation("pipe_stats")
    val li = Tables.lineitem(spark, sfDir)
      .observe(obs, count(lit(1)).as("rows"),
        sum(round(col("l_quantity"), 0).cast("long")).as("qty"))
      .filter(col("l_quantity") > 25)
    val kept = li.count()
    val expected = Tables.lineitem(spark, sfDir)
      .agg(count(lit(1)), sum(round(col("l_quantity"), 0).cast("long")))
      .collect().head
    // observe sees PRE-filter rows: it sits below the filter in the plan
    assert(obs.get("rows") === expected.getLong(0))
    assert(obs.get("qty") === expected.getLong(1))
    assert(kept < expected.getLong(0))
  }

  test("q34 integer-moment formulas match native corr/covar_samp/stddev_samp") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_quantity"), 0).cast("long").as("x"),
        round(col("l_discount") * 100, 0).cast("long").as("y"))
    val native = li.groupBy("l_returnflag")
      .agg(corr(col("x"), col("y")).as("corr"),
        covar_samp(col("x"), col("y")).as("covar"),
        stddev_samp(col("x")).as("sx"),
        stddev_samp(col("y")).as("sy"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val viaQuery = graft.SparkEntry.queries("q34_stats_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2) / 1e6, r.getLong(3) / 1e6, r.getLong(4) / 1e6,
          r.getLong(5) / 1e6)).toMap

    assert(native.keySet === viaQuery.keySet)
    for ((flag, (c, cv, sx, sy)) <- native) {
      val (qc, qcv, qsx, qsy) = viaQuery(flag)
      // q34 is rounded to 1e-6; native should land within that grid cell
      assert(math.abs(c - qc) < 1e-6 + 1e-9, s"corr $flag: $c vs $qc")
      assert(math.abs(cv - qcv) < 1e-6 + 1e-9, s"covar $flag: $cv vs $qcv")
      assert(math.abs(sx - qsx) < 1e-6 + 1e-9, s"stddev_x $flag: $sx vs $qsx")
      assert(math.abs(sy - qsy) < 1e-6 + 1e-9, s"stddev_y $flag: $sy vs $qsy")
    }
  }
}
