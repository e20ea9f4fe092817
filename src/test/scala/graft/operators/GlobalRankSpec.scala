package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** The two-pass global rank must agree exactly with the single-partition
  * WindowExec formulation it replaces — and must actually run on more
  * than one partition (the whole point). */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 997 rows, shuffled insertion order, unique tie-break key
  private def df = spark.range(997)
    .select((col("id") * 7919 % 997).as("v"), col("id").as("k"))

  test("row numbers equal the single-partition window's") {
    val got = GlobalRank
      .withRowNumber(df, Seq(col("v"), col("k")), "rn", numPartitions = 7)
      .select("k", "rn")
    val want = df
      .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("k"))))
      .select("k", "rn")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ntile equals the single-partition window's, incl. uneven buckets") {
    // 997 % 10 = 7 → first 7 buckets get 100 rows, last 3 get 99
    val got = GlobalRank
      .withNtile(df, Seq(col("v"), col("k")), 10, "b", numPartitions = 5)
      .select("k", "b")
    val want = df
      .withColumn("b", ntile(10).over(Window.orderBy(col("v"), col("k"))))
      .select("k", "b")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ntile with n < k gives one row per leading bucket") {
    val tiny = spark.range(3).select(col("id").as("v"), col("id").as("k"))
    val got = GlobalRank
      .withNtile(tiny, Seq(col("v"), col("k")), 10, "b", numPartitions = 2)
      .select("k", "b").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(1, 2, 3))
  }

  test("percent_rank and cume_dist are bit-identical to WindowExec's") {
    val got = GlobalRank
      .withPercentiles(df, Seq(col("v"), col("k")),
        percentRankCol = Some("pr"), cumeDistCol = Some("cd"),
        numPartitions = 6)
      .select("k", "pr", "cd").as[(Long, Double, Double)].collect()
      .sortBy(_._1)
    val w = Window.orderBy(col("v"), col("k"))
    val want = df
      .select(col("k"), percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    got.zip(want).foreach { case ((k1, p1, c1), (k2, p2, c2)) =>
      assert(k1 === k2)
      assert(java.lang.Double.doubleToLongBits(p1) ===
        java.lang.Double.doubleToLongBits(p2))
      assert(java.lang.Double.doubleToLongBits(c1) ===
        java.lang.Double.doubleToLongBits(c2))
    }
  }

  test("empty input yields an empty ranked frame, not a crash") {
    val empty = spark.range(0).select(col("id").as("v"), col("id").as("k"))
    assert(GlobalRank.withRowNumber(empty, Seq(col("v")), "rn").count() === 0L)
    assert(GlobalRank.withNtile(empty, Seq(col("v")), 4, "b").count() === 0L)
  }

  test("single-row input: percent_rank 0.0, cume_dist 1.0") {
    val one = spark.range(1).select(col("id").as("v"), col("id").as("k"))
    val r = GlobalRank.withPercentiles(one, Seq(col("v"), col("k")),
      percentRankCol = Some("pr"), cumeDistCol = Some("cd"))
      .select("pr", "cd").as[(Double, Double)].collect().head
    assert(r === ((0.0, 1.0)))
  }

  test("work is spread across partitions — no single-partition stage") {
    val ranked = GlobalRank
      .withRowNumber(df, Seq(col("v"), col("k")), "rn", numPartitions = 7)
    // the ranked relation itself must have > 1 partition (a bare
    // Window.orderBy collapses everything to exactly 1)
    assert(ranked.rdd.getNumPartitions > 1)
    // and every partition holds a contiguous, correctly-offset rank range
    val perPart = ranked
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("rn").as("lo"), max("rn").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"),
        r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(perPart.map(_._3).sum === 997L)
    perPart.foreach { case (lo, hi, n) => assert(hi - lo + 1 === n) }
    assert(perPart.head._1 === 1L)
    assert(perPart.last._2 === 997L)
  }

  test("per-key row numbers equal Window.partitionBy(key)'s — with the " +
    "key's rows spread over many partitions") {
    // 4 keys × ~250 rows, shuffled values
    val kdf = spark.range(997)
      .select((col("id") % 4).cast("string").as("src"),
        (col("id") * 7919 % 997).as("v"), col("id").as("k"))
    val got = GlobalRank
      .withRowNumberPerKey(kdf, "src", Seq(col("v"), col("k")), "rn",
        numPartitions = 7)
    val want = kdf.withColumn("rn", row_number().over(
      Window.partitionBy("src").orderBy(col("v"), col("k"))))
    assert(got.select("src", "k", "rn")
      .except(want.select("src", "k", "rn")).isEmpty &&
      want.select("src", "k", "rn")
        .except(got.select("src", "k", "rn")).isEmpty)
    // the anti-hot-partition property: at least one key's rows live in
    // more than one partition (Window.partitionBy would force exactly 1)
    val spread = got.withColumn("pid", spark_partition_id())
      .groupBy("src").agg(countDistinct("pid").as("np"))
      .collect().map(_.getAs[Long]("np"))
    assert(spread.exists(_ > 1L),
      "every key collapsed to one partition — keyed rank lost its point")
  }

  test("keyed rank refuses data-sized keys (driver offset-map guard)") {
    // 997 distinct keys against a cap of 100: the (partition × key)
    // offset map is driver state, so a data-sized key column must fail
    // loudly instead of OOMing the driver at corpus scale
    val wide = spark.range(997).select(col("id").as("k"), col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      GlobalRank.withRowNumberPerKey(wide, "k", Seq(col("v")), "rn",
        numPartitions = 7, maxKeyPartitionEntries = 100)
    }
    assert(e.getMessage.contains("modest-cardinality"))
    // and the real default never bites the grouped-rank use cases
    assert(GlobalRank.withRowNumberPerKey(wide, "k", Seq(col("v")), "rn",
      numPartitions = 7).count() === 997L)
  }
}
