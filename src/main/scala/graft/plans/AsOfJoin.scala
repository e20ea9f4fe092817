package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.LongType

/** Native as-of join: for each left row, the single right row with the
  * same key and the greatest `ts` not exceeding the left row's `ts`
  * (left-outer semantics: unmatched left rows keep null right columns).
  *
  * This is the SURVEY.md §2.2 "as-of" row implemented at preference
  * tier (c) — a whole operator as LogicalPlan + Strategy + SparkPlan —
  * complementing the tier-(a) composition in EventsPack e05 (union +
  * running last). The physical plan is the textbook distributed as-of:
  * both sides hash-clustered on the key and sorted by (key, ts) within
  * partitions (Catalyst inserts the exchanges/sorts from the declared
  * requirements), then a single linear merge per partition — no
  * per-left-row backward scan, no buffering beyond one candidate row.
  *
  * Scale: one shuffle per side keyed on the join key, merge is O(|L|+|R|)
  * per partition with O(1) state — the same cost envelope as a
  * sort-merge join.
  *
  * Keys and timestamps are required to be LongType (e.g. ids +
  * `unix_micros`) — the caller casts; this keeps the hot merge loop
  * allocation-free primitive comparisons.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    maxLag: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean =
    childrenResolved &&
      Seq(leftKey, rightKey, leftTs, rightTs).forall(_.resolved) &&
      Seq(leftKey, rightKey, leftTs, rightTs).forall(_.dataType == LongType)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, lag) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, lag) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    maxLag: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      val rb = rIt.buffered

      var cand: InternalRow = null
      var candKey = 0L
      var candTs = 0L
      // interval mode: a candidate older than maxLag below the left ts
      // does not match (the latest right row ≤ ts is the ONLY possible
      // in-window match, so one lag check decides)
      val lag = maxLag.getOrElse(Long.MaxValue)

      lIt.map { l =>
        val k = lk.eval(l).asInstanceOf[Long]
        val ts = lt.eval(l).asInstanceOf[Long]
        if (cand != null && candKey != k) cand = null
        var advancing = true
        while (advancing && rb.hasNext) {
          val head = rb.head
          val hk = rk.eval(head).asInstanceOf[Long]
          if (hk < k || (hk == k && rt.eval(head).asInstanceOf[Long] <= ts)) {
            val r = rb.next()
            if (hk == k) {
              cand = r.copy(); candKey = hk
              candTs = rt.eval(cand).asInstanceOf[Long]
            }
          } else advancing = false
        }
        val matched = cand != null && ts - candTs <= lag
        project(joined(l, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOfJoinOps.asof(left, right, ...)`. Registers the
  * planner strategy on the session (idempotent). */
object AsOfJoinOps {
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** As-of join `left` with `right`: equal `key`, greatest right `ts`
    * ≤ left `ts`. Columns are named (resolved against each side's
    * analyzed output) and must be long-typed.
    *
    * `maxLag` (same unit as the ts columns) switches to the INTERVAL
    * as-of: a right row only matches within `[ts - maxLag, ts]` — the
    * tolerance form of pandas `merge_asof` / DuckDB's windowed as-of. */
  def asof(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      maxLag: Option[Long] = None): DataFrame = {
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    GraftSqlBridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs), maxLag))
  }
}
