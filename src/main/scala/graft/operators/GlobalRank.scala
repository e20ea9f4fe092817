package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe global ranking: the range-partitioned two-pass rank.
  *
  * `Window.orderBy(...)` with no partition spec plans a SINGLE-partition
  * WindowExec — one task sorts and ranks the entire input, the classic
  * 100 TB scale-killer (fine at test SF, fatal at cluster scale). The
  * two-pass formulation keeps every stage parallel:
  *
  *   1. `repartitionByRange` on the sort key (RangePartitioner: sampled
  *      boundaries, contiguous sorted ranges across partitions) + local
  *      sort within each partition;
  *   2. count rows per partition (cheap second read of the already-
  *      written shuffle files), prefix-sum the P counts on the driver
  *      (P longs — partition metadata, not data);
  *   3. global rank = partition offset + local position.
  *
  * Requires a TOTAL (duplicate-free) ordering — callers tie-break with a
  * unique key column, same as the oracle-parity rule every query pack
  * follows. With unique keys, row_number == rank == dense_rank, and
  * ntile / percent_rank / cume_dist are pure arithmetic on (rank, n):
  * exactly the formulas Spark's and DuckDB's window operators use, so
  * results are bit-identical to the single-partition plan.
  *
  * In the reference paradigm a global rank needs R=1 (one reducer sees
  * everything — SURVEY.md §2.2 "Sort (global)"); this is the distributed
  * refinement of that same sort-merge idea.
  */
object GlobalRank {

  /** `df` + a 1-based global row number column, assigned in `sortCols`
    * order without any single-partition stage. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame =
    withRank(df, sortCols, numPartitions) { (rn, _) => Seq(out -> rn) }

  /** `df` + an ntile-over-total-order bucket column (1..k). */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int, out: String,
      numPartitions: Int = 0): DataFrame =
    withRank(df, sortCols, numPartitions) { (rn, n) =>
      // standard ntile allocation (Spark NTile / DuckDB ntile): the first
      // n%k buckets get n/k+1 rows, the rest n/k
      val q = n / k
      val rem = n % k
      val cut = rem * (q + 1)
      val bucket =
        if (q == 0) rn // n < k: one row per bucket
        else when(rn <= cut, (rn - 1) / (q + 1) + 1)
          .otherwise(lit(rem) + (rn - cut - 1) / q + 1)
      Seq(out -> bucket.cast("int"))
    }

  /** `df` + percent_rank and/or cume_dist columns over the total order.
    * With a duplicate-free ordering: percent_rank = (rank-1)/(n-1),
    * cume_dist = rank/n — the same double divisions WindowExec performs. */
  def withPercentiles(df: DataFrame, sortCols: Seq[Column],
      percentRankCol: Option[String] = None,
      cumeDistCol: Option[String] = None,
      numPartitions: Int = 0): DataFrame =
    withRank(df, sortCols, numPartitions) { (rn, n) =>
      percentRankCol.map { c =>
        c -> (if (n <= 1) lit(0.0)
              else (rn - 1).cast("double") / lit((n - 1).toDouble))
      }.toSeq ++
        cumeDistCol.map { c =>
          c -> rn.cast("double") / lit(n.toDouble)
        }
    }

  /** Core two-pass machinery: rank the rows, then append the columns
    * `derive(rankCol, totalRows)` produces. */
  private def withRank(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int)(
      derive: (Column, Long) => Seq[(String, Column)]): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd
    // pass 1: per-partition counts → driver-side prefix sum (P longs).
    // The shuffle write is reused; only the read re-runs.
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    // pass 2: global rank = partition offset + local position
    val rankField = "__graft_rank"
    val rankedRdd = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    val withRankDf = spark.createDataFrame(rankedRdd,
      ranged.schema.add(rankField, LongType, nullable = false))
    val derived = derive(col(rankField), total)
    derived.foldLeft(withRankDf) { case (acc, (name, c)) =>
      acc.withColumn(name, c)
    }.drop(rankField)
  }
}
