package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over a directed edge list, in EXACT integer
  * arithmetic so results are partitioning-independent and replayable
  * bit-for-bit by an external oracle: ranks are scaled 1e6, every
  * divide is integer division, and each iteration is
  *   r'(v) = 150000 + (85 * Σ_{(u,v)∈E} (r(u) div deg(u))) div 100
  * (damping 0.85 with the 1-d teleport folded in at the same scale).
  *
  * Nodes are whatever appears as an edge SOURCE (callers wanting no
  * dangling mass pass a symmetrized edge list — see g01). The edge
  * list is checkpointed once; each iteration is one shuffle keyed by
  * destination with map-side partial sums, and each round's rank
  * state (one row per node) is eagerly checkpointed so the plan stays
  * constant-size across iterations.
  */
object PageRank {

  /** @param edges DataFrame with long columns `u` (src) and `v` (dst). */
  def ranks(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(true)
    val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
    // contribution edges (u, v, d) built ONCE and pre-partitioned on the
    // join key: the loop used to redo e⋈deg every round, shuffling the
    // full edge list per iteration; now each round reshuffles only the
    // rank table (one row per node) plus the destination-keyed sum
    val ed = e.join(deg, "u")
      .repartition(col("u"))
      .localCheckpoint(true)
    var r = deg.select(col("u").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iterations) {
      r = ed
        .join(r, col("node") === col("u"))
        .groupBy(col("v"))
        .agg(expr("CAST(150000 + (85 * sum(r div d)) div 100 AS BIGINT)")
          .as("r2"))
        .select(col("v").as("node"), col("r2").as("r"))
        .localCheckpoint(true)
    }
    r
  }
}
