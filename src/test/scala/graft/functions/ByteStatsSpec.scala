package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class ByteStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference implementation on the driver, mirroring the kernel's
    * per-term e6-rounded contract. */
  def ref(bytes: Array[Byte]): (Long, Long, Long) = {
    val counts = new Array[Long](256)
    bytes.foreach(b => counts(b & 0xff) += 1)
    val n = bytes.length.toLong
    val nonzero = counts.filter(_ > 0)
    val terms = nonzero.map(c =>
      Math.round(1000000.0 * c * Math.log(n.toDouble / c.toDouble))).sum
    (n, nonzero.length.toLong, terms)
  }

  test("kernel matches the driver-side reference on mixed payloads") {
    GraftFunctions.register(spark)
    val payloads = Seq(
      "hello world, a perfectly ordinary string",
      "aaaaaaaaaaaaaaaaaaaaaa",           // single symbol → entropy 0
      "ab",                               // two symbols → ln 2
      new String((0 until 256).map(_.toChar).toArray)) // wide alphabet
    val rows = payloads.toDF("s")
      .select(GraftFunctions.byteStats(col("s").cast("binary")).as("st"))
      .collect()
    payloads.zip(rows).foreach { case (p, r) =>
      val got = r.getSeq[Long](0)
      val (n, d, t) = ref(p.getBytes("UTF-8"))
      assert(got === Seq(n, d, t), s"payload: $p")
    }
  }

  test("entropy endpoints: uniform alphabet hits ln(k), constant hits 0") {
    GraftFunctions.register(spark)
    val uniform = "abcd" * 64 // 4 symbols, equal counts → ln 4 ≈ 1.386294
    val rows = Seq(uniform, "zzzz").toDF("s")
      .select(GraftFunctions.byteStats(col("s").cast("binary")).as("st"))
      .select(expr("st[2] div st[0]").as("e6")).as[Long].collect()
    assert(rows(0) === 1386294L)
    assert(rows(1) === 0L)
  }

  test("null input yields null; empty payload yields [0,0,0]") {
    GraftFunctions.register(spark)
    val rows = Seq(Some(""), None).toDF("s")
      .select(GraftFunctions.byteStats(col("s").cast("binary")).as("st"))
      .collect()
    assert(rows(0).getSeq[Long](0) === Seq(0L, 0L, 0L))
    assert(rows(1).isNullAt(0))
  }

  test("kernel runs inside WholeStageCodegen (no eval fallback)") {
    GraftFunctions.register(spark)
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(GraftFunctions.byteStats(col("text").cast("binary")).as("st"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is WholeStageCodegenExec's simpleString marker —
    // the Project evaluating byte_stats must carry it (no eval fallback)
    assert(plan.linesIterator.exists(l =>
      l.contains("byte_stats") && l.trim.startsWith("*(")), plan.take(400))
    // and interpreted eval agrees with codegen on real data
    val a = df.collect().map(_.getSeq[Long](0))
    val b = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map(r => {
        val (n, d, t) = ref(r.getAs[String]("text").getBytes("UTF-8"))
        Seq(n, d, t)
      })
    assert(a.toSeq === b.toSeq)
  }
}
