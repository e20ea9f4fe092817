package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def foldCosine = {
    val dot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(col("a"), x => x * x), lit(0.0), (p, x) => p + x)
    val nb = aggregate(transform(col("b"), x => x * x), lit(0.0), (p, x) => p + x)
    dot / sqrt(na) / sqrt(nb)
  }

  test("native expression is bit-identical to the fold formulation") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
      (Array(0.1, -0.2, 0.3), Array(0.4, 0.5, -0.6)),
      (Array(1e-8, 1e8, -1.0), Array(1e8, 1e-8, 1.0))).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.cosineSimilarity(col("a"), col("b")).as("native"),
      foldCosine.as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float arrays widen to double (fixture embeddings)") {
    GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(5)
      .select(col("embedding").as("a"))
    val pairs = e.crossJoin(e.select(col("a").as("b")))
    val dblFold = {
      val ad = transform(col("a"), x => x.cast("double"))
      val bd = transform(col("b"), x => x.cast("double"))
      val dot = aggregate(zip_with(ad, bd, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val na = aggregate(transform(ad, x => x * x), lit(0.0), (p, x) => p + x)
      val nb = aggregate(transform(bd, x => x * x), lit(0.0), (p, x) => p + x)
      dot / sqrt(na) / sqrt(nb)
    }
    val rows = pairs.select(
      GraftFunctions.cosineSimilarity(col("a"), col("b")).as("native"),
      dblFold.as("fold")).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null input and length mismatch yield null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0))),
      (None, Some(Array(1.0))),
      (Some(Array(1.0)), None)).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.cosineSimilarity(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("optimizer rule rewrites self-similarity to the unary kernel") {
    GraftFunctions.register(spark)
    // spark.range (not a LocalRelation) so ConvertToLocalRelation can't
    // eagerly evaluate the rewritten expression out of the plan
    val df = spark.range(3)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"))
    val selfSim = df.select(
      GraftFunctions.cosineSimilarity(col("a"), col("a")).as("c"))
    val optimized = selfSim.queryExecution.optimizedPlan.toString
    assert(optimized.contains("self_cosine"), optimized)
    assert(!optimized.contains("cosine_similarity"), optimized)
  }

  test("self-similarity rewrite is bit-identical to the binary form") {
    GraftFunctions.register(spark)
    // block the rule on one side by aliasing through a trivial transform,
    // so we compare rewritten vs un-rewritten evaluations of the same data
    val df = Seq(
      Array(1.0, 2.0, 3.0),
      Array(0.3, -0.7, 1e-8),
      Array(1e154, 1e154),          // na overflows to Inf → Inf/Inf = NaN
      Array(0.0, 0.0, 0.0),         // zero norm → 0/0 = NaN
      Array.empty[Double],          // empty → 0/0 = NaN
      Array(Double.NaN, 1.0)).toDF("a")
    val rewritten = df.select(
      GraftFunctions.cosineSimilarity(col("a"), col("a")).as("c")).collect()
    val unrewritten = df
      .select(col("a"), transform(col("a"), x => x).as("b"))
      .select(GraftFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect()
    rewritten.zip(unrewritten).foreach { case (r, u) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(u.getDouble(0)))
    }
    // zero-norm, empty, and NaN-element vectors must all be NaN, not 1.0
    assert(rewritten.drop(2).forall(r => r.getDouble(0).isNaN))
  }

  test("self-similarity of a null vector stays null after the rewrite") {
    GraftFunctions.register(spark)
    val df = Seq(Some(Array(1.0, 2.0)), None).toDF("a")
    val rows = df.select(
      GraftFunctions.cosineSimilarity(col("a"), col("a")).as("c")).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }

  test("usable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect().head.getDouble(0)
    assert(r === 1.0)
  }
}

class JaccardE4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def foldJaccard = {
    val inter = size(array_intersect(array_distinct(col("a")), array_distinct(col("b"))))
    round(inter * lit(10000.0)
      / (size(array_distinct(col("a"))) + size(array_distinct(col("b"))) - inter), 0)
      .cast("long")
  }

  test("matches the array_intersect formulation, including duplicates") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),   // duplicates collapse
      (Seq("x"), Seq("y")),
      (Seq("q", "r"), Seq("q", "r"))).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.jaccardE4(col("a"), col("b")).as("native"),
      foldJaccard.as("fold")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null inputs and empty-empty yield null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq("a")), None),
      (None, Some(Seq("a"))),
      (Some(Seq.empty[String]), Some(Seq.empty[String]))).toDF("a", "b")
    val rows = df.select(GraftFunctions.jaccardE4(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("usable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaccard_e4(array('a','b'), array('b','c')) AS j")
      .collect().head.getLong(0)
    assert(r === 3333L) // 1/3 → round(3333.33...)
  }
}
