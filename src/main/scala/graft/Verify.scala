package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Also writes
  * timings.json (name → wall seconds for the result write) so
  * tools/ladder.py can record per-rung wall times in LADDER_r{N}.json
  * without a second run. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names (dev iteration aid),
    // or "@bench" = headline ∪ iterative ∪ heavy bench groups (the
    // scale-ladder subset for rungs where the full suite's quadratic
    // ORACLES would dominate, not the Spark side).
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(if (args(2) == "@bench")
          (SparkEntry.benchQueries ++ SparkEntry.benchIterQueries ++
            SparkEntry.benchHeavyQueries).toSet
        else args(2).split(",").toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions default to the thread count (the ladder's
    // comparable-layout rule) but can be raised independently: at the
    // sf10 rung cpus=8 packs ~7.5M shuffle rows per partition per
    // iterative round, and "partitions follow data volume, not cores"
    // is exactly the production guidance the ladder exists to test.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val timings = scala.collection.mutable.Map.empty[String, Double]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/timings.json"),
      timings.toSeq.sortBy(_._1)
        .map { case (k, v) => f"${q(k)}: $v%.3f" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
