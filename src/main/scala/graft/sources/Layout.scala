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
}
