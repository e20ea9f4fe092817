package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout helpers — the two write-side techniques that decide read
  * cost at 100 TB (SCALE.md): hive-style partition pruning and bucketed
  * co-located joins. The reference's only layout is "files in a dir"
  * (reference manager/__main__.py:371-374); these are its scale-aware
  * replacements.
  */
object Layout {

  /** Write `df` hive-partitioned by `partitionCols`; readers filtering
    * on those columns scan only matching directories (PartitionFilters
    * in the plan — see SourcesSpec). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Save `df` as a bucketed+sorted table: joins/aggregations on
    * `bucketCol` between tables bucketed the same way need no shuffle
    * and no sort (asserted in SourcesSpec). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket column — shuffle-free
    * by construction. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))

  /** Compact a directory of (many small) parquet files into
    * ceil(totalBytes / targetBytes) outputs — the routine maintenance
    * op every long-lived 100 TB table needs: streaming/incremental
    * writers fragment a table into files far below the scan-efficient
    * size, and every downstream scan then pays per-file open/footer
    * cost and tiny-split scheduling overhead. Sizing from the ACTUAL
    * on-disk byte total (not row counts) keeps output files near the
    * target regardless of schema width or compression ratio.
    * Round-robin repartition spreads rows evenly; writes go to a new
    * directory (swap-in is the caller's atomic rename).
    *
    * @return the number of output files chosen */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(path).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
