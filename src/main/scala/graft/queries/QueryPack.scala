package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: a Spark implementation plus (optionally) the
  * equivalent SQL the driver runs in DuckDB as a correctness oracle.
  *
  * Oracle-safety rules used throughout the packs (so that a value-hash
  * compare between Spark-parquet and DuckDB passes bit-for-bit):
  *   - Monetary doubles are converted to integer cents PER ROW
  *     (`round(x*100) :: bigint`) before aggregation — integer sums are
  *     order-independent and exact in both engines, unlike double sums.
  *   - Counts are bigint in both engines.
  *   - Single double ops on exact inputs (one division, one subtraction)
  *     are IEEE-deterministic and safe to emit raw.
  *   - Every query ends in a total ORDER BY over a unique key set.
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Queries included in the Bench headline set. */
    bench: Boolean = false)

trait QueryPack {
  def queries: Seq[(String, Q)]
}

object Cents {
  /** Exact integer cents of a 2-decimal monetary double column. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  /** SQL twin of [[cents]] for the DuckDB oracle. */
  def sqlCents(e: String): String = s"CAST(round(($e)*100) AS BIGINT)"
}
