package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in [[graft.queries.QueryPack]] instances; this object
  * flattens the registered packs into the driver's `queries`/`oracleSql`
  * maps (run → queries, oracle → oracleSql).
  */
object SparkEntry {

  /** Registered packs. Order only affects listing, names must be unique. */
  val packs: Seq[QueryPack] = Seq(
    RelationalPack, ExtrasPack, WindowPack, EventsPack, TextPack, DedupPack,
    SimilarityPack, MrPack, MultimodalPack, TypedPack, PipelinePack, GraphPack)

  lazy val all: Seq[(String, Q)] = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_._1).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.run }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap

  /** Headline queries timed by [[Bench]]. */
  def benchQueries: Seq[String] = all.collect { case (n, q) if q.bench => n }

  /** Iterative-operator group timed by [[Bench]], reported separately. */
  def benchIterQueries: Seq[String] =
    all.collect { case (n, q) if q.benchIter => n }

  /** Heavy non-loop group timed by [[Bench]], reported separately. */
  def benchHeavyQueries: Seq[String] =
    all.collect { case (n, q) if q.benchHeavy => n }
}
