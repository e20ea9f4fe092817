package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-≤-k min-heap over the largest values
  * seen. Insert is O(log k) and the state never exceeds k longs — the
  * property that makes [[TopKLongs]] partial-aggregatable: each map
  * task ships at most k values per group, not its whole run. */
final class TopKHeap(val k: Int) {
  val heap = new Array[Long](math.max(k, 1))
  var size = 0

  def insert(v: Long): Unit =
    if (size < k) {
      heap(size) = v; size += 1
      var i = size - 1 // sift up
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (k > 0 && v > heap(0)) {
      heap(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && heap(l) < heap(m)) m = l
        if (r < size && heap(r) < heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
    }

  def mergeFrom(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.size) { insert(o.heap(i)); i += 1 }
  }

  /** The kept values, largest first — the deterministic multiset top-k
    * regardless of insertion or merge order. */
  def sortedDesc: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, size)
    java.util.Arrays.sort(out)
    var i = 0; var j = out.length - 1
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    out
  }
}

/** `topk_longs(col, k)`: exact largest-k values per group as a
  * descending `ARRAY<BIGINT>` — a native `TypedImperativeAggregate`
  * (the UDAF extension tier below `Aggregator`, above nothing).
  *
  * Why it exists: the standard per-group top-n (`row_number() OVER
  * (PARTITION BY g ORDER BY v DESC) <= n`, w01) must SHUFFLE EVERY ROW
  * of the fact table to sort each group. This aggregate's state is a
  * bounded k-element min-heap, so it partial-aggregates: each map task
  * emits ≤ k longs per group before the exchange — at 100 TB the
  * shuffle carries k·groups·tasks values instead of the table. Heap
  * insertion and merge are order-insensitive, so results are
  * deterministic under any partitioning (the multiset top-k, emitted
  * sorted).
  *
  * Runs through `ObjectHashAggregateExec` (partial + final), the
  * engine path Spark reserves for typed-buffer aggregates
  * (PlanSpec-pinned).
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, "topk_longs requires k > 0")

  def this(child: Expression, kExpr: Expression) =
    this(child, kExpr.eval().asInstanceOf[Number].intValue())

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT column, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_longs"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc)

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKLongs =
    copy(child = newChild)
}
