package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded single-source(-set) shortest paths over a WEIGHTED directed
  * edge list: frontier-restricted Bellman–Ford relaxation. Completes
  * the iterative family — [[Bfs]] minimizes HOPS (every edge costs 1);
  * this minimizes summed edge WEIGHT, so a cheap multi-hop route beats
  * an expensive direct edge, which is exactly the case hop-BFS gets
  * wrong on weighted graphs.
  *
  * Exact by construction (integer weights, min-merge is
  * order-insensitive), so an external oracle can replay round k as k
  * unrolled full relaxations: after round k, `d(node)` is the minimum
  * weight over all paths of ≤ k edges from any source. The frontier
  * restriction (only nodes whose distance IMPROVED last round join the
  * edge list) is a pure optimization — a non-improved node re-relaxing
  * can only re-derive candidates it already produced — so per-round
  * work is frontier × out-degree, not nodes × edges, and the loop
  * stops early once a round improves nothing (negative weights are
  * rejected; with them the fixpoint argument fails).
  *
  * Lineage cuts follow the [[ConnectedComponents]] contract:
  * `checkpointDir = None` → `localCheckpoint` (local[n] / restartable
  * batch); `Some(dir)` → reliable `checkpoint` into that directory,
  * the production default at 100 TB where a deep relaxation outlives
  * preempted executors.
  */
object Sssp {

  /** @param edges   long columns `u` (src), `v` (dst), `w` (weight ≥ 0)
    * @param sources long column `node` — distance-0 seed set
    * @param maxRounds relaxation rounds; result is exact over paths of
    *                  ≤ maxRounds edges (set ≥ graph diameter for the
    *                  true fixpoint — the empty-frontier early exit
    *                  makes a generous bound cost nothing extra)
    * @param checkpointDir when set, per-round lineage cuts go through
    *                      reliable `checkpoint` into this directory
    *                      (survives executor loss) instead of
    *                      `localCheckpoint`
    * @return columns `node`, `d` (min summed weight from any source
    *         over ≤ maxRounds edges; unreached nodes absent) */
  def distances(edges: DataFrame, sources: DataFrame, maxRounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    // core-tied round layout (see [[RoundLayout]]): node-sized
    // per-round state must not inherit a corpus-derived session
    // partition count -- measured at sf10 in GROWTH_r10
    RoundLayout.coreTied(edges.sparkSession) {
      // rotated per-round cuts with keep=3 (see [[LineageCut]]): the
      // frontier cut reads `dist` from TWO cut generations back
      // (dist(n-1) joins against merged(n) AFTER merged(n)'s cut), so
      // three generations stay live — still bounded by construction
      val lc = new LineageCut(checkpointDir, keep = 3)
      // pre-partitioned on the per-round join key (the g01 hoist): each
      // round's frontier⋈e join reshuffles only the frontier
      val e = lc.pin(edges.select(col("u"), col("v"), col("w"))
        .repartition(col("u")))
      require(e.filter(col("w") < 0).limit(1).count() == 0L,
        "Sssp requires non-negative edge weights: with negative weights " +
          "the empty-frontier stop is not a fixpoint proof")
      var dist = lc(sources.select(col("node"), lit(0L).as("d")).distinct())
      var frontier = dist
      var r = 1
      var exhausted = false
      while (r <= maxRounds && !exhausted) {
        // an empty frontier means the last round improved nothing —
        // every ≤-maxRounds-edge path minimum is already in `dist`
        if (frontier.limit(1).count() == 0L) exhausted = true
        else {
          val cand = frontier.join(e, frontier("node") === e("u"))
            .select(e("v").as("node"), (frontier("d") + e("w")).as("d"))
          val merged = lc(dist.union(cand)
            .groupBy("node").agg(min("d").as("d")))
          // next frontier = strictly improved rows (new node, or a
          // cheaper route found) — the only rows whose relaxation can
          // still produce new candidates
          frontier = lc(merged
            .join(dist.withColumnRenamed("d", "od"), Seq("node"), "left")
            .filter(col("od").isNull || col("d") < col("od"))
            .select(col("node"), col("d")))
          dist = merged
        }
        r += 1
      }
      dist
    }
  }
}
