package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) over a DIRECTED edge list, in exact
  * integer arithmetic. The complement to [[PageRank]]'s single score:
  * on an asymmetric graph (buyers→sellers, citers→cited, linkers→
  * linked) HITS separates the two roles — a(v) rewards being pointed
  * AT by good hubs, h(u) rewards pointing at good authorities — which
  * one symmetric-random-walk score conflates.
  *
  * Update per iteration (standard order: authorities from current
  * hubs, then hubs from the NEW authorities), with the usual L2
  * normalization replaced by exact integer max-normalization so an
  * external oracle replays it bit-for-bit:
  *   a'(v) = Σ_{(u,v)∈E} h(u);   a(v) = (1e6 · a'(v)) div max_w a'(w)
  *   h'(u) = Σ_{(u,v)∈E} a(v);   h(u) = (1e6 · h'(u)) div max_w h'(w)
  * Max-normalization keeps every score in [0, 1e6] at any iteration
  * count and preserves the RANKING, which is what HITS is for; the
  * per-round max is a one-row in-plan aggregate broadcast via cross
  * join — never a driver collect (g07's dangling-sum pattern). Exact-
  * arithmetic headroom: the unnormalized sums are ≤ 1e6·deg and the
  * renormalization multiplies by 1e6 before dividing, so int64 is safe
  * up to max in/out-degree ≈ 9.2e6 — ENFORCED by a one-time setup
  * `require` (the loud-guard convention of Sssp's negative-weight and
  * PageRank's symmetry checks); beyond that (web-scale hub pages) drop
  * the scale to 1e3 or renormalize in two steps.
  *
  * Scale posture: each round is two edge⋈score equi-joins with
  * map-side partial sums (messages shuffle grouped, scores are one row
  * per node) plus two one-row maxes. HITS alternates join keys (h
  * joins on `u`, a joins on `v`), so in the default dual-pin layout
  * the edge list is checkpointed TWICE — once pre-partitioned per key
  * (the g01 hoist, doubled) — and each round reshuffles only the
  * node-sized score tables; `dualEdgePin = false` trades the second
  * pin for one edge shuffle per round, which wins below ≈4-5 rounds
  * (the GROWTH_r10 sf10 measurement, param scaladoc below). Score
  * state is checkpointed per round (constant-size plans). Lineage
  * cuts follow the [[ConnectedComponents]] contract via
  * `checkpointDir`.
  */
object Hits {

  /** @param edges directed long columns `u` (src) and `v` (dst)
    * @param tol   0 (default) = exactly `iterations` rounds, the
    *              oracle-replayable surface. tol > 0 = stop at the
    *              first round where BOTH max|Δa| ≤ tol AND
    *              max|Δh| ≤ tol (e6 score units), `iterations` as the
    *              cap — [[PageRank]]'s tolerance contract (two one-row
    *              deltas per round; 16 bytes of driver metadata).
    *              Spec-pinned: tol=0 ≡ fixed rounds, tol runs return
    *              their stopping round's fixed-round state exactly.
    * @param dualEdgePin true (default) = checkpoint TWO pre-partitioned
    *              edge copies, one per alternating join key, so no
    *              round ever reshuffles the edge list. false = pin only
    *              the u-keyed copy and let each h-round's join reshuffle
    *              it on `v` — halves setup materialization at the price
    *              of one edge-sized shuffle per round. GROWTH_r10
    *              measured both arms at sf10 (58.7M edges, 2 rounds,
    *              min-of-3): single 211.1 s vs dual 255.1 s — one pin
    *              ≈ 44 s while one per-round edge shuffle ≈ 10-20 s,
    *              so the break-even is ≈ 4-5 rounds. Callers with few
    *              fixed rounds (g10: 2) pass false; tol-mode long runs
    *              keep the default true. Results are IDENTICAL either
    *              way (same joins, same arithmetic) — purely a
    *              physical-layout choice, spec-pinned bit-identical in
    *              HitsSpec.
    * @return columns `node`, `hub_e6`, `auth_e6` for every node
    *         appearing in the edge list (either side) */
  def scores(edges: DataFrame, iterations: Int,
      checkpointDir: Option[String] = None,
      tol: Long = 0L,
      dualEdgePin: Boolean = true): DataFrame = {
    // core-tied round layout (see [[RoundLayout]]): node-sized
    // per-round state must not inherit a corpus-derived session
    // partition count -- measured at sf10 in GROWTH_r10
    RoundLayout.coreTied(edges.sparkSession) {
      require(tol >= 0L, s"tol must be ≥ 0 (got $tol)")
      // rotated per-round cuts: h/a interleave through one keep=2 FIFO —
      // a(n-1) is released when a(n) cuts, by which point h(n-1..n) were
      // already materialized from it (see [[LineageCut]]). Tolerance mode
      // keeps THREE generations: the Δa delta reads a(n-1) AFTER a(n)
      // cuts (queue [a(n-1), h(n-1), a(n)]), which keep=2 would have
      // just released.
      val lc = new LineageCut(checkpointDir, keep = if (tol > 0L) 3 else 2)
      val e = edges.select(col("u"), col("v"))
      // two pre-partitioned edge copies, one per alternating join key —
      // each round's edge⋈score join then reshuffles only the node-sized
      // score table, never the edge list. The CALLER'S edge plan is
      // evaluated exactly once (into eByU's cut); eByV and the degree
      // aggregate derive from the checkpoint, never from the caller's
      // plan. Before this, all three setup relations independently
      // re-ran the caller's edge DERIVATION — for g10 a fact⋈fact join
      // + distinct that costs more than every HITS round combined at the
      // sf10 rung (IterProbe: setup ≈ the whole 2-round wall, per-round
      // marginal ≈ noise), which is what made HITS the scale ladder's
      // lone >8x-growth outlier while PageRank (which pins first) grew 4x.
      val eByU = lc.pin(e.repartition(col("u")))
      // single-pin mode reads the u-keyed checkpoint for BOTH joins —
      // the h-round's join then reshuffles edges on `v` per round
      // instead of paying a second up-front pin (scaladoc trade-off)
      val eByV = if (dualEdgePin) lc.pin(eByU.repartition(col("v"))) else eByU
      // node set and total degree (in+out, bag union) come from ONE
      // grouped aggregate over the checkpointed copies — the count rides
      // the same shuffle the distinct node set needs anyway, so the
      // overflow guard below costs one node-sized agg over checkpointed
      // edges instead of a third evaluation of the caller's plan
      val grouped = lc.pin(eByU.select(col("u").as("node"))
        .union(eByV.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d")))
      val nodes = grouped.select(col("node"))
      // loud int64-headroom guard (scaladoc above): scores are ≤ 1e6 after
      // max-normalization, so an unnormalized sum is ≤ 1e6·degree and the
      // renormalization multiplies by 1e6 again — silent wraparound above
      // in/out-degree ~9.2e6. Total degree bounds both roles; degrees are
      // round-invariant so this never re-runs inside the loop.
      val maxDeg = grouped
        .agg(coalesce(max("d"), lit(0L)).as("m")).head.getLong(0)
      require(maxDeg <= 9200000L,
        s"Hits exact int64 arithmetic overflows above in/out-degree ~9.2e6 " +
          s"(found a node with total degree $maxDeg); drop the score scale " +
          "to 1e3 or renormalize in two steps — see scaladoc")
      var h = nodes.withColumn("h", lit(1000000L))
      var a = nodes.withColumn("a", lit(1000000L))
      // one-row max|Δ| between two adjacent score states (tol mode only)
      def delta(cur: DataFrame, prev: DataFrame, c: String): Long =
        cur.select(col("node"), col(c))
          .join(prev.select(col("node"), col(c).as("p")), "node")
          .agg(coalesce(max(abs(col(c) - col("p"))), lit(0L)).as("d"))
          .head.getLong(0)
      var i = 0
      var converged = false
      while (i < iterations && !converged) {
        val (hPrev, aPrev) = (h, a)
        // both a and h are cut per round: skipping a's cut was measured
        // SLOWER (sf0.1, warm min 5.9 s vs 3.8 s) because the amax
        // broadcast subquery and the a-join then each re-evaluate the
        // edge-sized asum aggregate — the checkpoint is what makes the
        // one-row max a free read
        val asum = eByU.join(h, col("node") === col("u"))
          .groupBy(col("v")).agg(sum("h").as("s"))
          .select(col("v").as("node"), col("s"))
        val amax = asum.agg(max("s").as("m"))
        a = lc(nodes.join(asum, Seq("node"), "left")
          .crossJoin(broadcast(amax))
          .select(col("node"),
            expr("CAST((1000000 * coalesce(s, 0L)) div m AS BIGINT)").as("a")))
        // Δa must read a(n-1) HERE, before h(n)'s cut rotates it out of
        // the keep=3 window (see the LineageCut comment above)
        val dA = if (tol > 0L) delta(a, aPrev, "a") else Long.MaxValue
        val hsum = eByV.join(a, col("node") === col("v"))
          .groupBy(col("u")).agg(sum("a").as("s"))
          .select(col("u").as("node"), col("s"))
        val hmax = hsum.agg(max("s").as("m"))
        h = lc(nodes.join(hsum, Seq("node"), "left")
          .crossJoin(broadcast(hmax))
          .select(col("node"),
            expr("CAST((1000000 * coalesce(s, 0L)) div m AS BIGINT)").as("h")))
        if (tol > 0L)
          converged = dA <= tol && delta(h, hPrev, "h") <= tol
        i += 1
      }
      h.join(a, "node")
        .select(col("node"), col("h").as("hub_e6"), col("a").as("auth_e6"))
    }
  }
}
