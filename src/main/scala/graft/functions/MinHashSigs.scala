package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signatures over a string set: for each of
  * `numHashes` seeded hash families, the minimum of `md5("<i>|" + x)`
  * over the elements, as lowercase hex — bit-identical to the
  * composable formulation
  * `array_min(transform(s, x -> md5(concat('<i>|', x))))` and to the
  * DuckDB oracle `list_aggregate(list_transform(s, x -> md5('i|'||x)),
  * 'min')`, because hex encoding preserves the unsigned byte order md5
  * digests are compared in.
  *
  * Why native: the composable version walks the set once PER SIGNATURE
  * (12 interpreted higher-order traversals), allocating a prefix
  * concat, a digest, and a hex string per (element × signature), then
  * keeps the min by string compare. This kernel walks the set once,
  * reuses one MessageDigest and one byte buffer across all (element ×
  * signature) digests, compares raw 16-byte digests, and hex-encodes
  * only the `numHashes` winners at the end. The md5 work is identical;
  * everything around it collapses.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and numHashes > 0, got " +
        s"${t.simpleString} / $numHashes")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  private val HEX = "0123456789abcdef".toCharArray

  /** Shared kernel for interpreted eval and codegen: one traversal of
    * the set, raw-digest min per hash family, hex only at the end.
    * Null elements are skipped (md5(null) is null and array_min ignores
    * nulls); an empty/all-null set yields all-null signatures, matching
    * the composable form. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(numHashes)(i =>
      (i.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](numHashes)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val bytes = arr.getUTF8String(e).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(prefixes(i))
          md.update(bytes)
          val d = md.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      e += 1
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = if (mins(i) == null) null else UTF8String.fromString(hex(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = HEX((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }
}
