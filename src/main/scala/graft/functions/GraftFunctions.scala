package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration points for graft's native Catalyst expressions.
  *
  * Two paths (both standard Spark):
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (cluster-wide injection at session build);
  *   - [[GraftFunctions.register]] for programmatic registration on an
  *     existing session (what the query packs use).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "jaccard_e4" -> (es => JaccardE4(es(0), es(1))),
    // second argument must be a foldable int literal (hash-family count)
    "minhash_sigs" -> (es =>
      MinHashSigs(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    // second argument must be a foldable int literal (k)
    "topk_longs" -> (es => new TopKLongs(es(0), es(1))
      .toAggregateExpression()),
    // second argument must be a foldable int literal (n)
    "ngram_explode" -> (es =>
      NGramExplode(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    "byte_stats" -> (es => ByteStats(es(0))))

  /** Idempotently register graft functions + optimizer rules on `spark`.
    * Quiet on re-entry: query packs call this per invocation, and
    * re-replacing an already-present function spams a
    * `SimpleFunctionRegistry ... replaced` warning per call. */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      val registry = spark.sessionState.functionRegistry
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(FoldSelfCosine))
      spark.experimental.extraOptimizations = cur :+ FoldSelfCosine
  }

  /** Column-API sugar (requires [[register]] on the session first). */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Column-API sugar (requires [[register]] on the session first). */
  def jaccardE4(a: Column, b: Column): Column =
    call_function("jaccard_e4", a, b)

  /** Column-API sugar (requires [[register]] on the session first). */
  def minhashSigs(s: Column, numHashes: Int): Column =
    call_function("minhash_sigs", s,
      org.apache.spark.sql.functions.lit(numHashes))

  /** Column-API sugar (requires [[register]] on the session first). */
  def topkLongs(c: Column, k: Int): Column =
    call_function("topk_longs", c, org.apache.spark.sql.functions.lit(k))

  /** Column-API sugar (requires [[register]] on the session first). */
  def byteStats(c: Column): Column = call_function("byte_stats", c)
}

/** `spark.sql.extensions` entry point injecting graft's functions,
  * optimizer rules, and planner strategies. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    val exprClass = Map(
      "cosine_similarity" -> classOf[CosineSimilarity].getName,
      "jaccard_e4" -> classOf[JaccardE4].getName,
      "minhash_sigs" -> classOf[MinHashSigs].getName,
      "topk_longs" -> classOf[TopKLongs].getName,
      "ngram_explode" -> classOf[NGramExplode].getName,
      "byte_stats" -> classOf[ByteStats].getName)
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(exprClass(name), name),
        builder))
    }
    e.injectOptimizerRule(_ => FoldSelfCosine)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
