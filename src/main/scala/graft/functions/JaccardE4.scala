package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `jaccard_e4(a, b)`: Jaccard similarity of two arrays' DISTINCT
  * element sets, scaled to integer 1e-4 units:
  * `round(|a ∩ b| * 10000.0 / |a ∪ b|)` — the verification kernel of
  * the dedup surface (DedupPack d02/d03).
  *
  * Replaces `size(array_intersect(a,b))` + two `size()`s (which builds
  * an intermediate intersection array and walks both inputs three
  * times) with one hash-set pass. Eval-based (CodegenFallback) by
  * choice: the workload is hash-set membership over string arrays and
  * the surrounding pair-join dominates; codegen would only inline the
  * loop shell around the same set operations.
  *
  * Arithmetic is the exact IEEE sequence of the SQL twin
  * `CAST(round(shared * 10000.0 / (la + lb - shared)) AS BIGINT)`, so
  * results stay oracle-hash-identical. Null inputs → null; two empty
  * arrays → null (0/0).
  */
case class JaccardE4(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_e4"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if lt == rt =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same element type, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val elemType = left.dataType.asInstanceOf[ArrayType].elementType
    val la = a.asInstanceOf[ArrayData].toObjectArray(elemType)
    val rb = b.asInstanceOf[ArrayData].toObjectArray(elemType)
    val sa = new java.util.HashSet[Any](la.length * 2)
    la.foreach(sa.add)
    val sb = new java.util.HashSet[Any](rb.length * 2)
    rb.foreach(sb.add)
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) null
    else java.lang.Long.valueOf(math.round(inter * 10000.0 / union))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardE4 =
    copy(left = newLeft, right = newRight)
}
