package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native one-pass byte-histogram statistics over a `binary` payload:
  * `byte_stats(b)` → `array<bigint> [n_bytes, n_distinct_bytes,
  * entropy_terms_e6]`, where `entropy_terms_e6 = Σ_v round(1e6 · c_v ·
  * ln(n / c_v))` over the 256 byte values — so Shannon entropy in
  * e6-scaled nats/byte is `entropy_terms_e6 div n_bytes`, computed by
  * the caller in exact integer arithmetic.
  *
  * This is the corruption / already-compressed / encrypted-blob detector
  * for a multimodal ingest pipeline (MultimodalPack m05): text sits
  * around 2–3 nats, compressed or encrypted media saturates near
  * ln(256) ≈ 5.545, and a truncated/zero-filled payload collapses
  * toward 0 — one narrow per-row map, no shuffle, applied before any
  * expensive decode is attempted.
  *
  * Cross-engine exactness contract: each term is an IEEE double product
  * on exact integers (`1e6·c` ≤ ~5e9 is exactly representable; `n/c`
  * divides two exact integers) rounded to an integer ONCE — after that,
  * everything is order-independent BIGINT math, so a DuckDB oracle
  * replaying the same per-term expression hashes identically. The fused
  * histogram+fold loop is the whole point of the native kernel: the
  * composable alternative explodes one row per byte (corpus bytes × 1
  * row) through a shuffle, this touches each byte once in codegen with
  * a 256-slot stack array and zero allocations.
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "byte_stats"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val n = bytes.length.toLong
    var distinct = 0L
    var terms = 0L
    var v = 0
    while (v < 256) {
      val c = counts(v)
      if (c > 0) {
        distinct += 1
        terms += Math.round(1000000.0 * c * Math.log(n.toDouble / c.toDouble))
      }
      v += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(n, distinct, terms))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val dist = ctx.freshName("dist")
      val terms = ctx.freshName("terms")
      s"""
        final long[] $counts = new long[256];
        for (int $i = 0; $i < $b.length; $i++) { $counts[$b[$i] & 0xff]++; }
        final long $n = (long) $b.length;
        long $dist = 0L; long $terms = 0L;
        for (int $v = 0; $v < 256; $v++) {
          final long $c = $counts[$v];
          if ($c > 0L) {
            $dist++;
            $terms += Math.round(
              1000000.0 * $c * Math.log((double) $n / (double) $c));
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(new long[]{$n, $dist, $terms});
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}
