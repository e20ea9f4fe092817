package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class TopKLongsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("heap keeps the multiset top-k under any insertion order") {
    val rnd = new Random(7)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(6)
      val vals = Seq.fill(n)(rnd.nextInt(20).toLong)
      val h = new TopKHeap(k)
      rnd.shuffle(vals).foreach(h.insert)
      assert(h.sortedDesc.toSeq === vals.sorted.reverse.take(k),
        s"trial $trial n=$n k=$k")
    }
  }

  test("merge of split heaps equals one heap over the union") {
    val rnd = new Random(13)
    val vals = Seq.fill(200)(rnd.nextLong() % 1000)
    val (l, r) = vals.splitAt(77)
    val hl = new TopKHeap(5); l.foreach(hl.insert)
    val hr = new TopKHeap(5); r.foreach(hr.insert)
    hl.mergeFrom(hr)
    val whole = new TopKHeap(5); vals.foreach(whole.insert)
    assert(hl.sortedDesc.toSeq === whole.sortedDesc.toSeq)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = TopKLongs(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 4)
    val h = new TopKHeap(4)
    Seq(9L, 3L, 12L, 7L, 5L, 12L).foreach(h.insert)
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedDesc.toSeq === h.sortedDesc.toSeq)
  }

  test("aggregate matches the row_number window formulation on real data") {
    GraftFunctions.register(spark)
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey", round($"o_totalprice" * 100, 0).cast("long").as("pc"))
    val viaAgg = orders.groupBy($"o_custkey")
      .agg(GraftFunctions.topkLongs($"pc", 3).as("top"))
      .select($"o_custkey", explode($"top").as("pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val w = Window.partitionBy($"o_custkey").orderBy($"pc".desc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select($"o_custkey", $"pc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaAgg.nonEmpty && (viaAgg.toSeq === viaWindow.toSeq))
  }
}
