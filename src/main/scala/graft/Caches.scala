package graft

import org.apache.spark.sql.SparkSession

/** Session-cache registry (round 10): the one place that knows every
  * pack-level memo so a long-lived session can be swept BETWEEN query
  * groups instead of accumulating all of them unbounded.
  *
  * Why this exists: three packs memoize a materialized relation per
  * (session, dir) — DedupPack's shingle tables, SimilarityPack's PQ
  * pipeline, GraphPack's edge relation. Each memo is correct and
  * individually bounded, but Verify's full-suite mode runs 219 queries
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
  */
object Caches {

  /** Unpin every pack-level memo held for `session`. Safe to call at
    * any query-group boundary; the next consumer re-derives. */
  def sweep(session: SparkSession): Unit = {
    queries.DedupPack.clear(session)
    queries.SimilarityPack.clear(session)
    queries.GraphPack.clear(session)
  }

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
