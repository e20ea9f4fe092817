package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries
  * (`Q.bench = true`) on SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced with a `noop` sink write — `count()` would let
  * Catalyst prune projections and skip computing most of the plan.
  * The session is warmed with one untimed run of the first query so JVM /
  * codegen startup cost isn't attributed to it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Two groups: the FIXED headline set (14 queries, `value` = its total,
    // kept stable for round-over-round comparability) and the ITERATIVE
    // group (loop-shaped engines — CC, PageRank, k-means, k-core — whose
    // per-round lineage-cut cost is otherwise unmeasured), reported under
    // "iter_queries"/"iter_total" so neither total pollutes the other.
    val names = SparkEntry.benchQueries
    val iterNames = SparkEntry.benchIterQueries
    val allNames = names ++ iterNames
    // Warm-up: JVM JIT / codegen / parquet-footer startup, untimed —
    // each query shape pays 1-3s of Janino+JIT on first execution.
    // Failures are tolerated here; the measured loop reports them.
    allNames.foreach(n => try force(n) catch { case _: Throwable => () })

    // min of three measured runs, ROUND-ROBIN over the whole set: the box
    // hosting local[32] sees multi-second external load spikes; running a
    // query's three repetitions back-to-back lets one spike poison all of
    // them, while interleaving puts each query's repetitions minutes apart
    // so the per-query min survives any single spike. A query that throws
    // is reported as -1, excluded from the total, and named in "failed" —
    // never silently timed as a fast "success".
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 3).foreach { _ =>
      allNames.foreach { name =>
        val t0 = System.nanoTime()
        try {
          force(name)
          samples(name) ::= (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
      }
    }
    def summarize(ns: Seq[String]): (Seq[(String, Double)], String, Double) = {
      val results = ns.map(n => n -> samples(n).minOption.getOrElse(-1.0))
      val json = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      (results, json, results.map(_._2).filter(_ >= 0).sum)
    }
    val (res, qs, total) = summarize(names)
    val (iterRes, iterQs, iterTotal) = summarize(iterNames)
    val failed = (res ++ iterRes).collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"iter_queries":$iterQs,"iter_total":$iterTotal,"failed":$failed,"sf":"$sfDir"}""")
    if ((res ++ iterRes).exists(_._2 < 0)) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
