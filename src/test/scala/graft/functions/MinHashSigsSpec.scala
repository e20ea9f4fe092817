package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class MinHashSigsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = 12

  /** The composable formulation the kernel replaces (and the shape of
    * the DuckDB oracle): per family i, min of md5("i|" + x). */
  private def foldSigs = array((0 until n).map { i =>
    array_min(transform(col("s"), x => md5(concat(lit(s"$i|"), x))))
  }: _*)

  test("bit-identical to the composable per-family formulation") {
    GraftFunctions.register(spark)
    val df = Seq(
      Seq("the quick fox", "lazy dog", "héllo wörld"),
      Seq("a"),
      Seq("词 语 词", "x y z", "", "tab\there")).toDF("s")
    val rows = df.select(
      GraftFunctions.minhashSigs(col("s"), n).as("native"),
      foldSigs.as("fold")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("empty set yields all-null signatures; null input yields null") {
    GraftFunctions.register(spark)
    val df = Seq(Some(Seq.empty[String]), None).toDF("s")
    val rows = df.select(GraftFunctions.minhashSigs(col("s"), n)).collect()
    assert(rows(0).getSeq[String](0) === Seq.fill(n)(null))
    assert(rows(1).isNullAt(0))
  }

  test("usable from SQL with a literal family count") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT minhash_sigs(array('a', 'b'), 2) AS sigs").collect().head
      .getSeq[String](0)
    // oracle values: min(md5('0|a'), md5('0|b')) and min(md5('1|a'), md5('1|b'))
    val exp0 = Seq("a", "b").map(x => md5Hex("0|" + x)).min
    val exp1 = Seq("a", "b").map(x => md5Hex("1|" + x)).min
    assert(r === Seq(exp0, exp1))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("property: matches a driver-side reference on random unicode sets") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(1234)
    val alphabet = "abc XYZ 词héü0\t9"
    def randomSet(): Seq[String] = Seq.fill(1 + rnd.nextInt(12)) {
      Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val sets = Seq.fill(60)(randomSet())
    val rows = sets.toDF("s")
      .select(GraftFunctions.minhashSigs(col("s"), n)).collect()
    sets.zip(rows).foreach { case (set, row) =>
      val want = (0 until n).map(i => set.map(x => md5Hex(s"$i|" + x)).min)
      assert(row.getSeq[String](0) === want)
    }
  }
}
