package graft

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Session-cache registry (round 10): the one place that knows every
  * pack-level memo so a long-lived session can be swept BETWEEN query
  * groups instead of accumulating all of them unbounded.
  *
  * Why this exists: three packs memoize a materialized relation per
  * (session, dir) — DedupPack's shingle tables, SimilarityPack's PQ
  * pipeline, GraphPack's edge relation. Each memo is correct and
  * individually bounded, but Verify's full-suite mode runs 220 queries
  * through ONE session, so by the tail of a run every memo is resident
  * at once. At the sf10 rung that compounding is exactly what collapsed
  * the shared-session ladder (heap ceiling → GC starved the heartbeat
  * → context killed mid-suite, round-9 finding); at the sf1 full-suite
  * rung it silently inflates later groups' walls. The registry makes
  * the pressure a MANAGED surface: Verify sweeps when the suite crosses
  * a pack boundary, and the per-group peak is recorded.
  *
  * Sweep semantics are each pack's own `clear` contract. NOTE the
  * asymmetry (GraphPack.clear scaladoc): Dedup/Similarity relations are
  * persist-backed and transparently recompute after a sweep, but the
  * graph edge memo is a localCheckpoint — a sweep INVALIDATES any
  * still-held DataFrame derived from it. Verify requests each query's
  * DataFrame fresh after every sweep, so the contract holds there;
  * other long-lived callers must do the same.
  *
  * Round 12 adds the TRANSIENT registry — ownership-aware per-QUERY
  * reclamation, the granularity SHARED_r11 proved pack-boundary sweeps
  * cannot reach. An iterative engine call leaves behind its final
  * `keep` [[graft.operators.LineageCut]] generations plus every
  * [[graft.operators.LineageCut.pin]]ned setup relation (edge-SIZED
  * localCheckpoints); within one pack, eleven graph queries each leak
  * one such set, and the r11 shared-session sf10 sweep arm OOM'd
  * in-pack — the boundary sweep never got a chance to run. Every cut
  * is now registered here at creation and deregistered when the
  * rotation itself releases it, so [[strayUnpersist]] can drop exactly
  * the cuts no rotation will ever release — after the query's result
  * is written — without touching the pack memos (which are owned by
  * their packs, not enrolled here).
  */
object Caches {

  /** Unpin every pack-level memo held for `session`. Safe to call at
    * any query-group boundary; the next consumer re-derives. */
  def sweep(session: SparkSession): Unit = {
    queries.DedupPack.clear(session)
    queries.SimilarityPack.clear(session)
    queries.GraphPack.clear(session)
  }

  // ---- transient-cut ownership (round 12) --------------------------
  // Keyed by SparkContext (persistence is context-level). RDD does not
  // override equals, so the mutable.Set compares by reference — a
  // re-created RDD can never alias an old entry. All access to a set
  // goes through its own monitor.
  private val transients = scala.collection.concurrent.TrieMap
    .empty[SparkContext, scala.collection.mutable.Set[RDD[_]]]

  /** Enroll a cut's backing RDD as TRANSIENT: dead the moment the
    * query that created it finishes (nothing outside the query can
    * hold it — packs own their memos separately and never enroll
    * them). Called by [[graft.operators.LineageCut]] for every
    * rotation cut and pin, and by [[trackCut]] for direct
    * localCheckpoint scaffolding. */
  def track(rdd: RDD[_]): Unit = {
    // evict dead-context entries opportunistically: a long-lived JVM
    // that cycles sessions (the sbt test suite) would otherwise
    // accumulate one handle set per stopped context forever —
    // strayUnpersist on a LIVE session never reaches them (round-13
    // advice). Nothing to release: a stopped context's blocks are gone
    // with it.
    transients.keys.filter(_.isStopped).foreach(transients.remove)
    val s = transients.getOrElseUpdate(rdd.sparkContext,
      scala.collection.mutable.Set.empty[RDD[_]])
    s.synchronized(s += rdd)
  }

  /** Remove `rdd` from the transient set WITHOUT releasing it — for
    * [[graft.operators.LineageCut]]'s own rotation, which releases
    * superseded generations itself. */
  def untrack(rdd: RDD[_]): Unit =
    transients.get(rdd.sparkContext)
      .foreach(s => s.synchronized(s -= rdd))

  /** Register an already-localCheckpoint'ed DataFrame's backing RDD as
    * transient and return the DataFrame — the one-line wrapper for
    * in-query scaffolding cuts (`Caches.trackCut(df.localCheckpoint(
    * true))`). No-op if the plan is not a checkpoint LogicalRDD. */
  def trackCut(df: DataFrame): DataFrame = {
    df.queryExecution.analyzed
      .collectFirst { case l: LogicalRDD => l.rdd }.foreach(track)
    df
  }

  /** Unpersist `rdd`'s blocks and — for RELIABLE checkpoints — delete
    * its `rdd-<id>` directory (best-effort: a failed delete costs
    * disk, never correctness). The shared release primitive for
    * LineageCut's rotation (non-blocking — mid-loop latency matters)
    * and [[strayUnpersist]] (BLOCKING — it runs between queries, and
    * an async removal of a finished engine's multi-GB block set
    * otherwise races whatever is measured next: the round-12 g05 A/B
    * caught the END calibration probe reading 7.2× par-over-scalar
    * purely from our own deferred cleanup). */
  def releaseRdd(rdd: RDD[_], blocking: Boolean = false): Unit = {
    rdd.unpersist(blocking)
    rdd.getCheckpointFile.foreach { dir =>
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(rdd.sparkContext.hadoopConfiguration)
          .delete(p, true)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Release every still-enrolled transient cut for `session`'s
    * context: the per-QUERY reclamation Verify runs after each result
    * is written. Returns the number of cuts released.
    *
    * CONTRACT: any DataFrame returned by an earlier engine call is
    * INVALID after this (its final cut's blocks are gone and a
    * localCheckpoint cannot recompute); callers must have fully
    * consumed results first. Pack memos are untouched — they are not
    * enrolled here — so within-group reuse (ten graph queries sharing
    * one edge relation) survives. */
  def strayUnpersist(session: SparkSession): Int =
    transients.get(session.sparkContext).map { s =>
      val drained = s.synchronized {
        val d = s.toVector; s.clear(); d
      }
      drained.foreach(releaseRdd(_, blocking = true))
      // drop the entry while it is (still) empty — track re-creates on
      // demand, and keeping it would leak one map entry per context a
      // long-lived JVM ever creates. A concurrent track racing this
      // remove at worst leaves its cut to driver GC (the pre-round-12
      // behavior), never double-releases.
      if (s.synchronized(s.isEmpty)) transients.remove(session.sparkContext)
      drained.size
    }.getOrElse(0)

  /** Storage-memory footprint of everything currently persisted in the
    * session's block manager (memos, LineageCut pins that have not yet
    * rotated out, stray caches): (n RDDs, Σ bytes in memory, Σ bytes on
    * disk). Feeds Verify's peak-storage record — the number SCALE.md
    * cites for the full-suite cache-pressure claim. */
  def storageBytes(session: SparkSession): (Int, Long, Long) = {
    val infos = session.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }
}
