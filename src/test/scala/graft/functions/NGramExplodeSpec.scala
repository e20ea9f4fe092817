package graft.functions

import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class NGramExplodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gen(text: String, n: Int): Seq[(Int, String)] = {
    GraftFunctions.register(spark)
    Seq(text).toDF("text")
      .select(expr(s"ngram_explode(split(text, ' '), $n)"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
  }

  test("emits L-n+1 windows with 0-based positions") {
    assert(gen("a b c d", 2) ===
      Seq((0, "a b"), (1, "b c"), (2, "c d")))
    assert(gen("a b c d", 3) === Seq((0, "a b c"), (1, "b c d")))
    assert(gen("a b c d", 4) === Seq((0, "a b c d")))
  }

  test("short and degenerate inputs yield no rows") {
    assert(gen("a b", 3) === Seq.empty)
    GraftFunctions.register(spark)
    val nullArr = Seq("x").toDF("text")
      .select(expr("ngram_explode(CAST(NULL AS ARRAY<STRING>), 2)"))
    assert(nullArr.count() === 0)
  }

  test("windows containing a null token are skipped") {
    GraftFunctions.register(spark)
    val out = Seq(1).toDF("i")
      .select(expr("ngram_explode(array('a', NULL, 'b', 'c'), 2)"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out === Seq((2, "b c")))
  }

  test("matches the composable zip_with bigram formulation on real docs") {
    GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaGen = docs
      .select(expr("ngram_explode(split(text, ' '), 2)"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val viaZip = docs
      .select(explode(zip_with(
        expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
        expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
        (x, y) => concat(x, lit(" "), y))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(viaGen.nonEmpty && viaGen.toSeq === viaZip.toSeq)
  }

  test("plans as a Generate node like built-in explode") {
    GraftFunctions.register(spark)
    val plan = Seq("a b c").toDF("text")
      .select(expr("ngram_explode(split(text, ' '), 2)"))
      .queryExecution.executedPlan
    assert(plan.collect { case g: GenerateExec => g }.nonEmpty,
      s"expected GenerateExec in:\n$plan")
  }
}
