package graft.queries

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}
import graft.mr.SparkTestSession

/** Pins for the exact-DECIMAL family (q45/q50). The round-4 post-mortem
  * found the suite's one driver-red cell was a *representation* bug, not
  * a value bug: raw DECIMAL output columns hash-diverge at the driver
  * whenever a cell carries a trailing zero at its declared scale
  * (oracle path collapses DECIMAL→float64 '…899'; parquet path keeps
  * the Decimal '…8990'). The convention is therefore: do all arithmetic
  * in DecimalType, render the FINAL projection as strings. These specs
  * pin both halves — the internal decimal widths (Spark's precision
  * rules) and the scale-preserving string rendering — plus bit-exact
  * values against an independent BigDecimal recompute from integer
  * cents, so neither engine's double→decimal rounding participates.
  */
class DecimalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("q45: string projection, scale preserved, values == exact " +
    "BigDecimal recompute from integer cents") {
    val df = SparkEntry.queries("q45_decimal_exact")(spark, sfDir)
    assert(df.schema.fields.forall(_.dataType == StringType),
      "final projection must be all-string (driver decimal-hash rule)")
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4)))
    assert(got.nonEmpty)
    // full declared scale survives rendering — the exact failure mode
    // of round 4 was a dropped trailing zero
    got.foreach { case (_, sp, mn, mx, net) =>
      assert(sp.matches("""-?\d+\.\d{2}"""), s"sum_price scale: $sp")
      assert(mn.matches("""-?\d+\.\d{2}"""), s"min_price scale: $mn")
      assert(mx.matches("""-?\d+\.\d{2}"""), s"max_price scale: $mx")
      assert(net.matches("""-?\d+\.\d{4}"""), s"sum_net scale: $net")
    }

    // independent recompute: Long cents all the way, BigDecimal only at
    // the final rendering — no floating point after the initial
    // round(x*100), which is exactly integral for 2-decimal inputs
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_discount"))
      .collect()
      .map(r => (r.getString(0),
        math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2) * 100)))
    val exp = raw.groupBy(_._1).map { case (flag, rows) =>
      val pcs = rows.map(_._2)
      val sumP = pcs.sum
      val sumNet = rows.map { case (_, pc, dc) => pc * (100L - dc) }.sum
      (flag,
        JBigDecimal.valueOf(sumP, 2).toPlainString,
        JBigDecimal.valueOf(pcs.min, 2).toPlainString,
        JBigDecimal.valueOf(pcs.max, 2).toPlainString,
        JBigDecimal.valueOf(sumNet, 4).toPlainString)
    }.toArray.sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
  }

  test("q45: internal arithmetic is first-class DecimalType at Spark's " +
    "documented result widths") {
    // the query's pre-projection frame, rebuilt without the string cast
    val agg = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("bigint").as("pc"),
        round(col("l_discount") * 100).cast("bigint").as("dc"))
      .select(col("l_returnflag"),
        (col("pc").cast("decimal(14,0)")
          * lit("0.01").cast("decimal(3,2)"))
          .cast("decimal(12,2)").as("p"),
        (col("dc").cast("decimal(4,0)")
          * lit("0.01").cast("decimal(3,2)"))
          .cast("decimal(4,2)").as("disc"))
      .withColumn("net",
        col("p") * (lit("1.00").cast("decimal(3,2)") - col("disc")))
    // (12,2)×(5,2) → (18,4) per Spark's multiply rule (p1+p2+1, s1+s2)
    assert(agg.schema("net").dataType == DecimalType(18, 4))
    val out = agg.groupBy("l_returnflag")
      .agg(sum(col("p")).as("sum_price"), sum(col("net")).as("sum_net"))
    // sum widens precision by 10, keeps scale
    assert(out.schema("sum_price").dataType == DecimalType(22, 2))
    assert(out.schema("sum_net").dataType == DecimalType(28, 4))
  }

  test("q50: avg/divide result widths follow Spark's rules; try_ ops " +
    "yield NULL, never errors") {
    val li = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("bigint").as("pc"))
      .select((col("pc").cast("decimal(14,0)")
        * lit("0.01").cast("decimal(3,2)"))
        .cast("decimal(12,2)").as("p"))
    // avg(DECIMAL(p,s)) → DECIMAL(p+4, s+4)
    assert(li.agg(avg(col("p"))).schema.head.dataType == DecimalType(16, 6))
    // (12,2)/(3,2) → scale max(6, s1+p2+1)=6, precision p1-s1+s2+scale=18
    val div = li.select(
      (col("p") / lit("1.07").cast("decimal(3,2)")).as("vat"))
    assert(div.schema("vat").dataType == DecimalType(18, 6))

    val rows = SparkEntry.queries("q50_decimal_depth")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("ovf_null")),
        "narrowing try_cast must be NULL")
      assert(r.isNullAt(r.fieldIndex("div0_null")),
        "try_divide by zero must be NULL")
      assert(r.getString(r.fieldIndex("ok_cast")) != null,
        "fitting try_cast must keep the value")
      // division renders at full scale 6
      assert(r.getString(r.fieldIndex("vat_min"))
        .matches("""-?\d+\.\d{6}"""))
    }
  }
}
