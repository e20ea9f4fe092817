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

  /** Driver-metadata budget for [[withRowNumberPerKey]]'s offset map:
    * (partition × key) count entries collected to the driver. */
  val MaxKeyPartitionEntries: Int = 1000000

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

  /** `df` + a 1-based PER-KEY row number column, assigned in `sortCols`
    * order within each `keyName` group — without the hot-partition trap
    * of `Window.partitionBy(key)` when the key is low-cardinality
    * (source, language, shard): there one task owns each key's entire
    * data. Here rows of one key span MANY range partitions (the range
    * key is (key, sortCols…)), and per-key offsets come from a
    * (partition × key) count map — driver metadata as long as key
    * cardinality stays modest (the grouped-rank use cases), broadcast
    * back for pass 2. Same two-pass shuffle-reuse as [[withRowNumber]];
    * requires a per-key duplicate-free ordering. */
  def withRowNumberPerKey(df: DataFrame, keyName: String,
      sortCols: Seq[Column], out: String,
      numPartitions: Int = 0,
      maxKeyPartitionEntries: Int = MaxKeyPartitionEntries): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val rangeCols = col(keyName) +: sortCols
    val ranged = df
      .repartitionByRange(parts, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    val rdd = ranged.rdd
    val keyIdx = ranged.schema.fieldIndex(keyName)
    // pass 1: per-(partition, key) counts — P × |keys| longs
    val countsRdd = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap[Any, Long]()
      it.foreach { r =>
        val k = r.get(keyIdx); m.update(k, m.getOrElse(k, 0L) + 1)
      }
      m.iterator.map { case (k, n) => (i, k, n) }
    }
    // loud guard for the scaladoc's "modest key cardinality" contract
    // (the d05-cap convention): the offset map is DRIVER state and is
    // broadcast back whole, so a data-sized key column (doc_id, user
    // id) must refuse here instead of OOMing the driver at scale. The
    // grouped-rank use cases (source, language, shard) are thousands
    // of keys; 1e6 × P entries is already ~100 MB of driver metadata.
    // The cardinality is counted DISTRIBUTIVELY (a count() job over the
    // same shuffle output — executors return one long each) BEFORE any
    // collect(), so a truly data-sized key refuses here instead of
    // OOMing the driver inside the collect the guard exists to prevent;
    // the extra pass is a shuffle-file re-read, the withRank pattern.
    val nEntries = countsRdd.count()
    require(nEntries <= maxKeyPartitionEntries,
      s"GlobalRank.withRowNumberPerKey would collect $nEntries " +
        s"(partition × key) count entries (cap $maxKeyPartitionEntries): " +
        s"'$keyName' is not a modest-cardinality grouping key. For " +
        "data-sized keys use Window.partitionBy (each key's run fits " +
        "one task) or withRowNumber over (key, sortCols) ranges.")
    val counts = countsRdd.collect()
    val offsets: Map[Any, Map[Int, Long]] =
      counts.groupBy(_._2).map { case (k, arr) =>
        val sorted = arr.sortBy(_._1)
        val offs = sorted.map(_._3).scanLeft(0L)(_ + _)
        k -> sorted.map(_._1).zip(offs).toMap
      }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: per-key rank = this key's offset before partition i +
    // local position within the partition's (sorted) key run
    val rankedRdd = rdd.mapPartitionsWithIndex { (i, it) =>
      val local = scala.collection.mutable.HashMap[Any, Long]()
      it.map { row =>
        val k = row.get(keyIdx)
        val r = local.getOrElse(k, bc.value(k)(i)) + 1
        local.update(k, r)
        Row.fromSeq(row.toSeq :+ r)
      }
    }
    spark.createDataFrame(rankedRdd,
      ranged.schema.add(out, LongType, nullable = false))
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
