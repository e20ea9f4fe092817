package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core decomposition by iterative peeling — the graph
  * analogue of "drop the thin tail": repeatedly remove every node with
  * degree < k (and its edges) until no such node remains; the surviving
  * subgraph is the k-core. The standard density/robustness primitive
  * for community mining, spam-graph trimming, and picking well-connected
  * seed sets before expensive per-node analytics.
  *
  * Each peel round is one degree aggregation plus two semi-joins — all
  * keyed shuffles on node id, no collect, no all-pairs stage — and the
  * round count is the length of the longest removal CASCADE (a pendant
  * chain of length L needs L rounds), typically a small constant for
  * real graphs. Rounds are eagerly `localCheckpoint`ed like
  * [[ConnectedComponents]]: without the lineage cut, each round's plan
  * embeds the previous round's three times (one per join/agg reuse) and
  * analysis cost compounds exponentially. Lineage cuts follow the
  * [[ConnectedComponents]] contract: `checkpointDir = None` →
  * `localCheckpoint`; `Some(dir)` → reliable `checkpoint` for
  * preemption-prone clusters — same trade documented on the CC operator.
  */
object KCore {

  /** The k-core of the undirected graph given by the SYMMETRIC edge
    * list `edges` (numeric columns u, v; both directions present, as
    * produced by the g01/g05 trade-graph builders). Returns
    * (node, core_deg): the surviving nodes with their degree counted
    * inside the core subgraph. Fixpoint is reached when an entire peel
    * round removes nothing; `maxRounds` only bounds pathological
    * chains.
    *
    * @param checkpointDir when set, per-round lineage cuts go through
    *                      reliable `checkpoint` into this directory
    *                      (survives executor loss) instead of
    *                      `localCheckpoint` */
  def core(edges: DataFrame, k: Int, maxRounds: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    // core-tied round layout (see [[RoundLayout]]): node-sized
    // per-round state must not inherit a corpus-derived session
    // partition count -- measured at sf10 in GROWTH_r10
    RoundLayout.coreTied(edges.sparkSession) {
      // rotated per-round cuts: a peeled-away edge generation's blocks
      // are unpersisted once 2 newer cuts exist (see [[LineageCut]])
      val lc = new LineageCut(checkpointDir)
      var cur = lc(edges.select(col("u"), col("v")).repartition(col("u")))
      var nEdges = cur.count()
      var stable = nEdges == 0L
      var round = 0
      while (!stable && round < maxRounds) {
        val keep = cur.groupBy("u").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select("u")
        val next = lc(cur
          .join(keep, Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
          .select(col("u"), col("v")).repartition(col("u")))
        val n2 = next.count()
        stable = n2 == nEdges
        cur = next
        nEdges = n2
        round += 1
      }
      cur.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_deg"))
    }
  }
}
