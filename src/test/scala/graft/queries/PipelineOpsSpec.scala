package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}
import graft.mr.SparkTestSession

/** Semantic invariants for the round-5 pipeline additions (their digits
  * are oracle-checked by the driver; these pin the PROPERTIES).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("e14: exactly one open interval per user; intervals chain " +
    "without gaps") {
    val iv = SparkEntry.queries("e14_scd2_dimension")(spark, sfDir)
    val byUser = iv.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"),
        count(lit(1)).as("n"))
    assert(byUser.filter(col("n_open") =!= 1).count() === 0,
      "every user must have exactly one current row")
    // each closed interval's valid_to equals the next interval's
    // valid_from (no gaps, no overlaps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us")
    val chained = iv
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us").isNotNull)
    assert(chained.filter(col("valid_to_us") =!= col("next_from"))
      .count() === 0, "intervals must chain end-to-start")
  }

  test("p14: a true permutation, reproducible, and seed-sensitive") {
    val perm = SparkEntry.queries("p14_seeded_shuffle")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables.documents(spark, sfDir).count()
    assert(perm.map(_._1).toSeq === (1L to n),
      "positions must be exactly 1..n")
    assert(perm.map(_._2).distinct.length === n.toInt,
      "every doc appears exactly once")
    // reproducible: second run bit-identical
    val again = SparkEntry.queries("p14_seeded_shuffle")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perm.toSeq === again.toSeq)
    // a different seed yields a different order (same membership)
    val other = graft.operators.GlobalRank.withRowNumber(
        Tables.documents(spark, sfDir).select(col("doc_id"),
          md5(concat(lit("8|"), col("doc_id").cast("string"))).as("h")),
        Seq(col("h"), col("doc_id")), "pos")
      .select(col("pos"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(other.sortBy(_._1).map(_._2).toSeq !==
      perm.sortBy(_._1).map(_._2).toSeq, "seed must change the order")
  }

  test("d11: spans are maximal, disjoint, ≥ one 8-gram, and internally " +
    "consistent") {
    val spans = SparkEntry.queries("d11_dup_spans")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(spans.nonEmpty, "fixture should contain duplicated substrings")
    spans.foreach { case (_, s, e, n) =>
      assert(e - s >= 7, s"span [$s,$e] shorter than one 8-gram")
      // n flagged starts within [s, e-7]: at least the endpoints' grams
      assert(n >= 1 && n <= e - 7 - s + 1, s"gram count $n out of range")
    }
    // disjoint AND maximal per doc: next span starts ≥ 2 tokens after
    // the previous would have merged (gap ≤ 8 between flagged starts)
    spans.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"spans [$e1] and [$s2] should have merged")
        case _ =>
      }
    }
  }

  test("e15: delta formulation equals the naive expansion on Spark too") {
    // the DuckDB oracle already cross-checks this; pin it engine-local
    // so a refactor of either side can't drift silently
    val fast = SparkEntry.queries("e15_rolling_wau")(spark, sfDir)
    val ud = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("d")).distinct()
    val days = ud.select(col("event_type"), col("d")).distinct()
      .withColumnRenamed("d", "day")
    val naive = days.join(ud,
        ud("event_type") === days("event_type") &&
          ud("d").between(date_sub(col("day"), 6), col("day")))
      .groupBy(days("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    assert(fast.join(naive, Seq("event_type", "day"))
      .filter(fast("wau") =!= naive("wau")).count() === 0)
    assert(fast.count() === naive.count())
  }

  test("p22: canaryScan refuses a corpus-proportional canary list") {
    import spark.implicits._
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    // one over the ceiling → loud failure, not a silent O(n·m) sweep
    val oversized = spark.range(PipelinePack.MaxCanaries + 1)
      .select(col("id").as("canary_doc"),
        concat(lit("canary-"), col("id")).as("canary"))
    val e = intercept[IllegalArgumentException] {
      PipelinePack.canaryScan(docs, oversized)
    }
    assert(e.getMessage.contains("canary list"))
    // at the ceiling it still runs (and finds the planted hit)
    val ok = spark.range(3)
      .select(col("id").as("canary_doc"),
        when(col("id") === 0, "hello").otherwise(concat(lit("x"), col("id")))
          .as("canary"))
    val hits = PipelinePack.canaryScan(docs, ok).collect()
    assert(hits.length === 1 && hits.head.getLong(0) === 0L)
  }
}
