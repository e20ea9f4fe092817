package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 32-bit Z-order (Morton) key: interleave the low 16 bits of two
    * columns — bit b of `x` lands at 2b, bit b of `y` at 2b+1. Pure
    * integer arithmetic (shift/mod/scale), so external engines compute
    * the identical key. */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      (shiftright(x, b) % 2).cast("long") * lit(1L << (2 * b)) +
        (shiftright(y, b) % 2).cast("long") * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** The SQL twin of [[zValue]] for an external oracle. */
  def zValueSql(x: String, y: String): String =
    (0 until 16).map { b =>
      s"((($x) // ${1L << b}) % 2) * ${1L << (2 * b)}" +
        s" + ((($y) // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")

  /** Write `df` range-partitioned and sorted by the Z-order key of
    * (xCol, yCol): rows close in BOTH dimensions land in the same few
    * files, so per-file min/max statistics prune 2-D box predicates —
    * the data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) that a
    * plain sort on either single column cannot give. Verified in
    * SourcesSpec: a small 2-D box query touches a fraction of the
    * z-ordered files but nearly all randomly-laid-out ones. */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
