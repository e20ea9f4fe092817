package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed `Dataset[T]` surface (SURVEY.md §1.4 "Dataset where type
  * safety helps"): case-class rows, `groupByKey`/`mapGroups`, and a
  * custom `Aggregator[IN, BUF, OUT]` — the typed twins of the reducer
  * contract (a reducer executable is exactly an arbitrary fold over a
  * key group, reference worker/__main__.py:174-181).
  *
  * Determinism: all per-group folds here are commutative integer
  * arithmetic (cent-rounding per row, then Long adds), so any merge
  * order the shuffle produces yields identical results — same rule the
  * untyped packs follow.
  */
object TypedPack extends QueryPack {

  final case class Li(l_orderkey: Long, l_quantity: Double,
      l_returnflag: String, l_extendedprice: Double)

  final case class Ord(o_orderkey: Long, o_custkey: Long, o_orderstatus: String)
  final case class Li2(l_orderkey: Long, l_quantity: Double,
      l_returnflag: String, l_extendedprice: Double)

  /** Custom typed aggregator: exact cents sum of extended price. */
  object CentsSum extends Aggregator[Li, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Li): Long =
      b + math.round(a.l_extendedprice * 100)
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def queries: Seq[(String, Q)] = Seq(

    // ── groupByKey + mapGroups (typed reducer) ─────────────────────────
    "ty01_typed_mapgroups" -> Q(
      run = (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_returnflag"), col("l_extendedprice"))
          .as[Li]
          .filter((x: Li) => x.l_quantity > 10)
          .groupByKey((x: Li) => x.l_returnflag)
          .mapGroups { (k: String, it: Iterator[Li]) =>
            var n = 0L; var cents = 0L
            it.foreach { x =>
              n += 1; cents += math.round(x.l_extendedprice * 100)
            }
            (k, n, cents)
          }
          .toDF("l_returnflag", "n", "price_cents")
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem WHERE l_quantity > 10
        GROUP BY 1 ORDER BY l_returnflag""")),

    // ── custom Aggregator[IN, BUF, OUT] ────────────────────────────────
    "ty02_typed_aggregator" -> Q(
      run = (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_returnflag"), col("l_extendedprice"))
          .as[Li]
          .groupByKey((x: Li) => x.l_returnflag)
          .agg(CentsSum.toColumn.name("price_cents"))
          .toDF("l_returnflag", "price_cents")
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // ── typed joinWith: Dataset[(L, R)] tuple join ─────────────────────
    // the typed twin of the relational equi-join: both sides stay
    // case-class typed through the join, the projection happens on the
    // tuple fields
    "ty03_typed_joinwith" -> Q(
      run = (s, d) => {
        import s.implicits._
        val ords = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .as[Ord]
        val lis = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_returnflag"), col("l_extendedprice"))
          .withColumnRenamed("l_orderkey", "l_orderkey")
          .as[Li2]
        ords.joinWith(lis, ords("o_orderkey") === lis("l_orderkey"))
          .filter((t: (Ord, Li2)) => t._2.l_quantity >= 45)
          .map { case (o, l) =>
            (o.o_orderstatus, l.l_returnflag,
              math.round(l.l_extendedprice * 100)) }
          .toDF("status", "flag", "cents")
          .groupBy(col("status"), col("flag"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
          .orderBy("status", "flag")
      },
      oracle = Some("""
        SELECT o_orderstatus AS status, l_returnflag AS flag,
               count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_quantity >= 45
        GROUP BY 1, 2 ORDER BY status, flag""")),

    // ── groupByKey + reduceGroups (typed argmax fold) ──────────────────
    // The fourth typed primitive: a binary associative reduce instead
    // of a full group iterator — Spark runs it as a PARTIAL typed
    // aggregate (objectHashAgg partial+final), so unlike ty01's
    // mapGroups (which must see whole groups post-shuffle) each map
    // task pre-folds its slice. The fold is "longest doc, ties to the
    // smaller doc_id" — associative, commutative, deterministic: the
    // typed twin of an argmax the untyped packs write as a
    // row_number window.
    "ty04_typed_reducegroups" -> Q(
      run = (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .as[(Long, String, Long)]
          .groupByKey(_._2)
          .reduceGroups { (a: (Long, String, Long), b: (Long, String, Long)) =>
            if (a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)) a else b
          }
          .map { case (lang, (docId, _, nChars)) => (lang, docId, nChars) }
          .toDF("lang", "doc_id", "n_chars")
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents)
        WHERE rk = 1 ORDER BY lang"""))
  )
}
