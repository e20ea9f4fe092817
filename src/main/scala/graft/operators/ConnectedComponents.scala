package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the clustering step a near-dup pipeline needs between "similar pairs"
  * and "which docs to keep": pair lists over-drop or under-drop unless
  * transitive groups are resolved (a~b, b~c ⇒ {a,b,c} is ONE cluster;
  * keep exactly one representative per cluster).
  *
  * Algorithm: every node starts labeled with itself; each round, every
  * node takes the min label among itself and its neighbors; fixpoint =
  * components labeled by their minimum node id. Each round is one
  * shuffle (join + min-aggregate), and the round count is the graph
  * DIAMETER — for near-dup graphs (tiny, dense clusters; diameter
  * rarely > 3) this beats the O(log n)-round large-star/small-star
  * algorithms that pay bigger constants per round. For general graphs
  * with long chains, swap in star-contraction; the API contract
  * (edges → (node, component=min id)) stays the same.
  *
  * Each iteration's labels are eagerly `localCheckpoint`ed: without the
  * lineage cut, every round's logical plan embeds the previous round's
  * twice (join + union), so analysis/optimization cost grows
  * exponentially with round count even when the data itself is cached.
  * Local (executor-stored) checkpoints suffice for this operator's
  * restartable batch use; swap in reliable `checkpoint` when running
  * inside a job that must survive executor loss mid-iteration.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges` (two numeric
    * columns: src, dst). Returns (node, component) for every node that
    * appears in at least one edge; `component` is the minimum node id
    * reachable from `node`. */
  def minLabel(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val e = edges.toDF("a", "b")
    val sym = e
      .union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // eager localCheckpoint: materializes AND truncates lineage to a
    // LogicalRDD — constant-size plans per round (see scaladoc)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val msgs = sym
        .join(labels, sym("a") === labels("node"))
        .select(sym("b").as("node"), labels("label"))
        .union(labels)
      val next = msgs.groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "node")
        .filter(col("n.label") =!= col("o.label"))
        .limit(1).count()
      labels = next
      converged = changed == 0L
      i += 1
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }
}
