package graft

import org.apache.spark.sql.SparkSession

/** The plan-smell audit, shared by the dev CLI sweep
  * (`SCRATCH_EXPLAIN=1 runMain graft.Scratch <sf> all 1`) and the
  * regression gate (`graft.plans.PlanSmellGateSpec`): executes a
  * registered query and reports which of the three shapes that do not
  * survive scale-up appear in its EXECUTED plan (post-AQE).
  *
  * The three smells:
  *   - BroadcastNestedLoopJoin — a non-equi join evaluated row × row
  *     against a broadcast side; fine only when one side is
  *     metadata-sized (1-row scalar aggregates, bounded literals).
  *   - CartesianProduct — the non-broadcast all-pairs join; never
  *     acceptable in this repo's query code (round-7 inventory: zero).
  *   - SinglePartition — an exchange collapsing to one partition;
  *     fine only for metadata-sized relations (global audit cards,
  *     decile/time spines), fatal on data-sized ones.
  *
  * Every ACCEPTED instance is adjudicated per query in the committed
  * allowlist (PlanSmellGateSpec.allowed) with a one-line reason; the
  * gate FAILS on any flag not in the list, so a new query (or a plan
  * regression in an old one) cannot introduce an unadjudicated
  * cartesian silently — SCALE.md's inventory turned from a manual
  * re-run into a failing spec.
  */
object PlanSmells {
  val Smells: Seq[String] =
    Seq("BroadcastNestedLoopJoin", "CartesianProduct", "SinglePartition")

  /** Runs `name` against `dir` and returns the smells present in its
    * executed plan. Execution is required: AQE only finalizes join
    * strategies and partition coalescing at runtime, so an unexecuted
    * plan string would under- or over-report. */
  def audit(spark: SparkSession, dir: String, name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
    Smells.filter(p.contains)
  }
}
