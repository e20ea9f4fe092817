package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF-class): explodes a token array
  * into its word n-grams, emitting one `(pos, ngram)` row per window.
  *
  * This completes graft's Catalyst extension trio — scalar
  * ([[CosineSimilarity]], codegen'd `Expression`), aggregate
  * ([[TopKLongs]], `TypedImperativeAggregate`), and now table-valued
  * (`Generator`). In the reference the *entire* user surface is
  * UDTF-shaped — a mapper executable may emit 0..n output lines per
  * input line (reference worker/__main__.py:128-144); this is that
  * contract as a first-class Catalyst citizen: the analyzer's
  * ExtractGenerator rule lifts it out of a `Project` into a `Generate`
  * node, so it composes with filters/aggregates like built-in `explode`.
  *
  * Semantics (shared with the composable `zip_with`+`slice` form used by
  * t05 and the DuckDB `range`+`string_split` oracle):
  *   - a token array of length L yields max(L-n+1, 0) rows;
  *   - `pos` is the 0-based offset of the window;
  *   - `ngram` is the n tokens joined by a single space;
  *   - windows containing a null token are skipped (a null corrupts the
  *     join; `split()` output never contains nulls so this is defensive);
  *   - a null input array yields no rows (like `explode(null)`).
  *
  * Why native rather than `explode(transform(sequence(...)))`: the
  * composable form materializes an index array plus one sliced sub-array
  * and one concat per window before exploding; this emits rows straight
  * off one pass over the backing array with a single reused
  * StringBuilder. Generators run interpreted inside `GenerateExec`
  * (only built-in explode-family generators participate in codegen), so
  * the win is allocation shape, not codegen — and the surrounding
  * filter/agg stages still fuse into whole-stage codegen around the
  * Generate boundary.
  */
case class NGramExplode(child: Expression, n: Int)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and n > 0, got ${t.simpleString} / $n")
  }

  override def prettyName: String = "ngram_explode"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Nil
    else new Iterator[InternalRow] {
      private val len = arr.numElements()
      private val last = len - n // last valid 0-based start offset
      private var pos = 0
      private var nextRow: InternalRow = advance()

      private def advance(): InternalRow = {
        while (pos <= last) {
          val p = pos
          pos += 1
          val sb = new java.lang.StringBuilder
          var i = 0
          var ok = true
          while (ok && i < n) {
            if (arr.isNullAt(p + i)) ok = false
            else {
              if (i > 0) sb.append(' ')
              sb.append(arr.getUTF8String(p + i).toString)
              i += 1
            }
          }
          if (ok) return new GenericInternalRow(
            Array[Any](p, UTF8String.fromString(sb.toString)))
        }
        null
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow
        nextRow = advance()
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramExplode =
    copy(child = newChildren.head)
}
