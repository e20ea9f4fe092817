package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only iterative-engine cost breakdown (NOT part of the driver
  * contract — [[Scratch]]'s sibling): separates a graph query's wall
  * into (a) EDGE DERIVATION (the relational lineitem⋈orders+distinct
  * that manufactures the graph), (b) ENGINE SETUP (pins, degree table,
  * loud guards — rounds=0), and (c) PER-ROUND marginal cost, by running
  * the same engine at increasing round counts inside one warm JVM and
  * differencing adjacent walls. The scale ladder (LADDER_r{N}) and the
  * layout arms (GROWTH_r{N}) measure whole queries one JVM at a time;
  * this probe answers the follow-up those artifacts raise — WHICH stage
  * of an iterative query owns its growth (g10's sf10 reading is the
  * motivating case: HITS grows ~12x min-of-3-matched for 10x data where
  * PageRank grows ~4x, and the difference must be setup, round cost, or
  * round count to be actionable).
  *
  * Usage: runMain graft.IterProbe <sfDir> <pagerank|hits> [maxRounds]
  * Env: SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS (Verify's
  * knobs, same defaults) so probe readings are comparable to the
  * ladder's.
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val which = args(1)
    val maxRounds = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[iterprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    // the g01/g05/g08/g10 edge derivation (GraphPack's shared shape)
    def baseEdges(): DataFrame =
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("u"),
          (col("o_custkey") + lit(1000000L)).as("v"))
        .distinct()

    timed("edge derivation (distinct count)")(baseEdges().count())

    which match {
      case "pagerank" =>
        val e0 = baseEdges()
        val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        for (r <- 0 to maxRounds)
          timed(s"pagerank rounds=$r") {
            operators.PageRank.ranks(edges, r)
              .queryExecution.toRdd.count()
          }
      case "hits" =>
        // g10's orientation: customers point at suppliers
        val edges = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") + lit(1000000L)).as("u"),
            col("l_suppkey").as("v"))
          .distinct()
        for (r <- 0 to maxRounds)
          timed(s"hits rounds=$r") {
            operators.Hits.scores(edges, r)
              .queryExecution.toRdd.count()
          }
      case other =>
        sys.error(s"unknown engine '$other' (pagerank|hits)")
    }
    spark.stop()
  }
}
