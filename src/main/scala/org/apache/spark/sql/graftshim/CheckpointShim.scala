package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-access shim for reliable-checkpoint recovery.
  *
  * Reading an RDD back from reliable checkpoint FILES in a FRESH
  * SparkContext is exactly what `SparkContext.checkpointFile` exists
  * for — Spark's own `ReliableCheckpointRDD` round-trip — but the
  * method is `protected[spark]` and rebuilding a DataFrame from
  * deserialized `InternalRow`s needs the `private[sql]`
  * `internalCreateDataFrame`. This object lives in an
  * `org.apache.spark.sql` subpackage purely to reach those two
  * published-but-package-scoped entry points; all policy (what to
  * read, which schema, when) stays in [[graft.operators
  * .CheckpointRecovery]]. No Spark internals are reimplemented here.
  */
object CheckpointShim {

  /** Deserialize the checkpointed `InternalRow`s under `path`
    * (an `rdd-<id>` reliable-checkpoint directory) and rebuild a
    * DataFrame with `schema` — which must be the schema the frame was
    * checkpointed with: the rows are stored as UnsafeRow images, so a
    * mismatched field list would misread the layout. */
  def readCheckpoint(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd: RDD[InternalRow] =
      classic.sparkContext.checkpointFile[InternalRow](path)
    classic.internalCreateDataFrame(rdd, schema)
  }
}
