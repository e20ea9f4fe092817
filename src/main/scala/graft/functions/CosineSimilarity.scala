package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric arrays — the hot
  * kernel of the similarity/dedup surface (SimilarityPack, DedupPack
  * d05).
  *
  * Motivation (SURVEY.md §7.2 revisited): the composable formulation
  * `aggregate(zip_with(a, b, *), 0d, +) / sqrt(...) / sqrt(...)` builds
  * three intermediate arrays and three higher-order-function eval loops
  * per pair; this expression is one fused loop inside whole-stage
  * codegen with zero allocations.
  *
  * Numeric contract: elements are widened to double and accumulated in
  * ascending index order — the exact IEEE sequence of the left-fold
  * formulation, so results are bit-identical to it (and to the DuckDB
  * `list_reduce` oracle). Returns null for null inputs or mismatched
  * lengths.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = lt match {
        case FloatType => x.getFloat(i).toDouble
        case _         => x.getDouble(i)
      }
      val yi = rt match {
        case FloatType => y.getFloat(i).toDouble
        case _         => y.getDouble(i)
      }
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double x = ${getter(elemType(left), a, i)};
            final double y = ${getter(elemType(right), b, i)};
            $dot += x * y; $na += x * x; $nb += y * y;
          }
          ${ev.value} = $dot / Math.sqrt($na) / Math.sqrt($nb);
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `cosine_similarity(x, x)` collapsed to one array read and one
  * accumulator — the target of [[FoldSelfCosine]].
  *
  * Bit-exactness: in `CosineSimilarity(x, x)` all three accumulators
  * (dot, ‖a‖², ‖b‖²) run the identical IEEE sequence `s += xi*xi` in
  * index order, so dot == na == nb == s exactly and the result is
  * `s/√s/√s` — which is what this computes. That preserves every edge
  * case of the binary form: zero vector or empty array → 0/0 = NaN,
  * NaN/∞ elements propagate, null input → null. (A fold to literal 1.0
  * would be wrong in all those cases — and even for ordinary vectors,
  * `s/√s/√s` is 1-ulp below 1.0 about half the time.)
  */
case class SelfCosine(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "self_cosine"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val t = elemType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = t match {
        case FloatType => x.getFloat(i).toDouble
        case _         => x.getDouble(i)
      }
      s += xi * xi
      i += 1
    }
    s / math.sqrt(s) / math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        final int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double x = ${get(a, i)};
          $s += x * x;
        }
        ${ev.value} = $s / Math.sqrt($s) / Math.sqrt($s);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)
}
