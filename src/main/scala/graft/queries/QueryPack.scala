package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: a Spark implementation plus (optionally) the
  * equivalent SQL the driver runs in DuckDB as a correctness oracle.
  *
  * Oracle-safety rules used throughout the packs (so that a value-hash
  * compare between Spark-parquet and DuckDB passes bit-for-bit):
  *   - Monetary doubles are converted to scaled integers PER ROW
  *     (`round(x*10^k) :: bigint`) before aggregation — integer sums are
  *     order-independent and exact in both engines, unlike double sums.
  *     `l_quantity` is integer-valued, so its double sum is also exact.
  *   - Counts are bigint in both engines.
  *   - A fixed, identical sequence of IEEE double ops on exact inputs
  *     (e.g. one division after an exact integer sum) is deterministic
  *     and safe to emit raw; reassociated double sums are NOT.
  *   - Every multi-row query ends in a total ORDER BY over a unique key
  *     set (ties broken by a unique column).
  *   - Timestamps are never emitted raw: `events.ts` is NANOS in parquet
  *     (DuckDB keeps ns, Spark only has µs — see [[graft.Tables.events]]),
  *     so outputs go through `unix_micros`/`epoch_us` or
  *     second-truncated `date_format`/`strftime` strings on both sides.
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Queries included in the Bench headline set. */
    bench: Boolean = false,
    /** Queries in Bench's ITERATIVE group (loop-shaped engines: CC,
      * PageRank, k-means, k-core). Timed and reported separately so the
      * fixed 14-query headline total stays comparable across rounds
      * while the per-round lineage-cut cost — the least-measured scale
      * risk of the fixpoint operators — gets its own floor. */
    benchIter: Boolean = false,
    /** Queries in Bench's HEAVY group: the non-loop-shaped expensive
      * additions (multi-stage dedup/ANN pipelines) whose drift would
      * otherwise go unmeasured round to round. Reported separately,
      * like the iterative group, so the fixed headline total stays
      * comparable across rounds. */
    benchHeavy: Boolean = false)

trait QueryPack {
  def queries: Seq[(String, Q)]
}

/** Exact scaled-integer helpers, with SQL twins for the DuckDB oracle. */
object Cents {
  /** Exact integer cents of a 2-decimal monetary double column. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  /** Exact integer 1e-4 units of a ≤4-decimal product (e.g. price*(1-disc)). */
  def e4(c: Column): Column = round(c * 10000, 0).cast("long")
  /** Exact integer 1e-6 units of a ≤6-decimal product. */
  def e6(c: Column): Column = round(c * 1000000, 0).cast("long")
  def sqlCents(e: String): String = s"CAST(round(($e)*100) AS BIGINT)"
  def sqlE4(e: String): String = s"CAST(round(($e)*10000) AS BIGINT)"
  def sqlE6(e: String): String = s"CAST(round(($e)*1000000) AS BIGINT)"
}
