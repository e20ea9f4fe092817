package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("picks the greatest right ts not exceeding each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("lk", "lts", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 20L, 102L),
      (3L, 1L, 900L)).toDF("rk", "rts", "payload")
    val out = AsOfJoinOps.asof(spark, left, right, "lk", "rk", "lts", "rts")
      .select($"tag", $"payload").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(
      "a" -> 101L,  // ts=10 matches right ts=10 exactly (<=)
      "b" -> 102L,  // ts=25 → latest right ts=20
      "c" -> -1L))  // key 2 has no right rows → null
  }

  test("matches the union+carry composition on fixture data") {
    val d = "/root/testdata/sf0.001"
    val native = graft.SparkEntry.queries("e06_asof_join_native")(spark, d)
      .collect().map(_.toSeq).toSeq
    val composed = graft.SparkEntry.queries("e05_asof_join")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("interval mode (maxLag) rejects matches older than the window") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 21L, "c"))
      .toDF("lk", "lts", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 20L, 102L)).toDF("rk", "rts", "payload")
    val out = AsOfJoinOps.asof(spark, left, right, "lk", "rk", "lts", "rts",
        maxLag = Some(3L))
      .select($"tag", $"payload").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(
      "a" -> -1L,   // latest ≤ 10 is ts=5, lag 5 > 3 → no match
      "b" -> -1L,   // latest ≤ 25 is ts=20, lag 5 > 3 → no match
      "c" -> 102L)) // latest ≤ 21 is ts=20, lag 1 ≤ 3 → match
  }

  test("empty right side leaves every left row unmatched") {
    val left = Seq((1L, 10L)).toDF("lk", "lts")
    val right = Seq.empty[(Long, Long, Long)].toDF("rk", "rts", "payload")
    val out = AsOfJoinOps.asof(spark, left, right, "lk", "rk", "lts", "rts")
      .collect()
    assert(out.length === 1 && out.head.isNullAt(2))
  }

  test("survives many keys across multiple shuffle partitions") {
    val left = (1 to 2000).map(i => (i.toLong % 37, i.toLong)).toDF("lk", "lts")
    val right = (1 to 500).map(i => (i.toLong % 37, i.toLong * 4, i.toLong))
      .toDF("rk", "rts", "payload")
    val native = AsOfJoinOps.asof(spark, left, right, "lk", "rk", "lts", "rts")
      .select($"lk", $"lts", $"payload").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // oracle: per-row max-ts lookup computed naively
    val rightRows = (1 to 500).map(i => (i.toLong % 37, i.toLong * 4, i.toLong))
    val expected = (1 to 2000).map { i =>
      val (lk, lts) = (i.toLong % 37, i.toLong)
      val m = rightRows.filter(r => r._1 == lk && r._2 <= lts)
      (lk, lts, if (m.isEmpty) -1L else m.maxBy(r => (r._2, r._3))._3)
    }.toSet
    assert(native === expected)
  }
}
