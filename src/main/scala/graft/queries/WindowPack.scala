package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function surface (SURVEY.md §2.2 "Window functions").
  *
  * In the reference, per-key ordered runs are only visible inside a
  * reducer executable after the sort-merge shuffle (reference
  * worker/__main__.py:164-181) — rank/lag/cumsum must be hand-coded
  * there. Here each is a Catalyst `WindowExec` over an explicit
  * partition/order spec.
  *
  * Scale posture: every per-key window below is partitioned by a
  * high-cardinality key (custkey/suppkey/partkey), so the shuffle
  * distributes evenly and no executor materializes more than one key
  * group's frame; the two global-order queries (ntile/percent_rank) go
  * through [[graft.operators.GlobalRank]] — the range-partitioned
  * two-pass rank — so no stage anywhere in this pack is single-partition.
  *
  * Oracle parity: deterministic total orderings everywhere (ties broken
  * by unique keys); money as scaled ints; window frames written
  * identically on both sides.
  */
object WindowPack extends QueryPack {
  import Cents._

  def queries: Seq[(String, Q)] = Seq(

    // ── row_number top-N per group ─────────────────────────────────────
    "w01_rank_topn" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
            cents(col("c_acctbal")).as("acctbal_cents"))
          .orderBy("c_mktsegment", "rn")
      },
      oracle = Some("""
        SELECT c_mktsegment, rn, c_custkey, acctbal_cents FROM (
          SELECT c_mktsegment, c_custkey,
                 CAST(round((c_acctbal)*100) AS BIGINT) AS acctbal_cents,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
        WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // ── Running (cumulative) sum per group ─────────────────────────────
    "w02_running_sum" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .filter(col("l_suppkey") <= 3)
          .withColumn("running_qty", sum(col("l_quantity")).over(w))
          .select(col("l_suppkey"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
            col("l_orderkey"), col("l_linenumber"), col("running_qty"))
          .orderBy("l_suppkey", "ship_day", "l_orderkey", "l_linenumber")
      },
      oracle = Some("""
        SELECT l_suppkey, strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
               l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        FROM lineitem WHERE l_suppkey <= 3
        ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber""")),

    // ── lag: per-customer order-to-order price delta ───────────────────
    "w03_lag_delta" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .filter(col("o_custkey") < 100)
          .withColumn("price_cents", cents(col("o_totalprice")))
          .withColumn("delta_cents",
            col("price_cents") - lag(col("price_cents"), 1).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("delta_cents"))
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               price_cents - lag(price_cents, 1) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS delta_cents
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(round((o_totalprice)*100) AS BIGINT) AS price_cents
              FROM orders WHERE o_custkey < 100)
        ORDER BY o_custkey, o_orderkey""")),

    // ── ntile deciles over a global order ──────────────────────────────
    // via the range-partitioned two-pass rank (graft.operators.GlobalRank)
    // — a bare Window.orderBy here would plan a single-partition
    // WindowExec, the one stage that cannot scale past one executor
    "w04_ntile_deciles" -> Q(
      run = (s, d) =>
        graft.operators.GlobalRank.withNtile(Tables.orders(s, d),
            Seq(col("o_totalprice"), col("o_orderkey")), 10, "decile")
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("total_cents"))
          .orderBy("decile"),
      oracle = Some("""
        SELECT decile, count(*) AS n,
               CAST(sum(CAST(round((o_totalprice)*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM (SELECT o_totalprice,
                     ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
              FROM orders)
        GROUP BY decile ORDER BY decile""")),

    // ── first_value / last_value over an explicit full frame ───────────
    "w05_first_last" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.lineitem(s, d)
          .filter(col("l_partkey") < 100)
          .select(col("l_partkey"),
            date_format(first(col("l_shipdate")).over(w), "yyyy-MM-dd").as("first_ship"),
            date_format(last(col("l_shipdate")).over(w), "yyyy-MM-dd").as("last_ship"))
          .distinct()
          .orderBy("l_partkey")
      },
      oracle = Some("""
        SELECT DISTINCT l_partkey,
               strftime(first_value(l_shipdate) OVER w, '%Y-%m-%d') AS first_ship,
               strftime(last_value(l_shipdate) OVER w, '%Y-%m-%d') AS last_ship
        FROM lineitem WHERE l_partkey < 100
        WINDOW w AS (PARTITION BY l_partkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_partkey""")),

    // ── percent_rank / cume_dist ───────────────────────────────────────
    // two-pass global rank again: pr/cd are arithmetic on (rank, n) under
    // a duplicate-free ordering, identical to WindowExec's own formulas
    "w06_percentiles" -> Q(
      run = (s, d) =>
        graft.operators.GlobalRank.withPercentiles(
            Tables.customer(s, d).filter(col("c_custkey") < 300),
            Seq(col("c_acctbal"), col("c_custkey")),
            percentRankCol = Some("pr"), cumeDistCol = Some("cd"))
          .select(col("c_custkey"), col("pr"), col("cd"))
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey,
               percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pr,
               cume_dist()    OVER (ORDER BY c_acctbal, c_custkey) AS cd
        FROM customer WHERE c_custkey < 300
        ORDER BY c_custkey""")),

    // ── RANGE frame: rolling 7-day spend per customer ──────────────────
    // A true VALUE-range frame (RANGE BETWEEN 6 PRECEDING AND CURRENT
    // ROW over a day number), not a row count: all orders within the
    // trailing week enter the frame, ties on the same day are peers and
    // see the same aggregate in both engines. Partitioned by customer —
    // one even shuffle, frames bounded per key.
    "w07_range_rolling" -> Q(
      run = (s, d) => {
        val base = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).as("day"),
            cents(col("o_totalprice")).as("price_cents"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-6, 0)
        base
          .select(col("o_custkey"), col("o_orderkey"), col("day"),
            sum(col("price_cents")).over(w).as("spend_7d_cents"),
            count(lit(1)).over(w).as("n_orders_7d"))
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, day,
               CAST(sum(price_cents) OVER w AS BIGINT) AS spend_7d_cents,
               count(*) OVER w AS n_orders_7d
        FROM (SELECT o_custkey, o_orderkey,
                     date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
                     CAST(round((o_totalprice)*100) AS BIGINT) AS price_cents
              FROM orders)
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey""")),

    // ── Per-group top-k via the native partial-aggregating UDAF ────────
    // w01's row_number() formulation must shuffle EVERY fact row to
    // sort each group; graft.functions.TopKLongs keeps a bounded
    // k-element min-heap per group, so each map task ships ≤ k values
    // per group into the exchange (ObjectHashAggregate partial+final —
    // PlanSpec-pinned). Same answer as the window: the multiset top-k,
    // emitted sorted descending (heap insert/merge are order-
    // insensitive, so this is partitioning-independent). Ranks over
    // tied values emit the same value either way, so the oracle's
    // row_number() tie order cannot diverge.
    "w08_topk_agg_native" -> Q(
      run = (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.orders(s, d)
          .select(col("o_custkey"), cents(col("o_totalprice")).as("pc"))
          .groupBy(col("o_custkey"))
          .agg(graft.functions.GraftFunctions.topkLongs(col("pc"), 3).as("top"))
          .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "price_cents")))
          .select(col("o_custkey"), (col("pos") + 1).as("rn"), col("price_cents"))
          .orderBy("o_custkey", "rn")
      },
      oracle = Some("""
        SELECT o_custkey, rn, price_cents FROM (
          SELECT o_custkey,
                 CAST(round((o_totalprice)*100) AS BIGINT) AS price_cents,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY CAST(round((o_totalprice)*100) AS BIGINT) DESC) AS rn
          FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ── Cumulative DISTINCT count over a window (rewrite) ──────────────
    // Spark does not allow DISTINCT inside window aggregates; the exact
    // standard rewrite is dense_rank(): under ORDER BY x with the
    // default RANGE frame, count(DISTINCT x) up to the current row's
    // peer group IS the dense rank of x. DuckDB supports the DISTINCT
    // window natively, so the oracle states the original intent and the
    // rewrite is verified against it — expressing a missing engine
    // feature through an equivalent plan instead of giving up on it.
    "w09_window_distinct_rewrite" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"))
        Tables.orders(s, d)
          .filter(col("o_custkey") < 300)
          .select(col("o_custkey"), col("o_orderkey"),
            dense_rank().over(w).as("n_distinct_days_so_far"))
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               count(DISTINCT o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate) AS n_distinct_days_so_far
        FROM orders WHERE o_custkey < 300
        ORDER BY o_custkey, o_orderkey"""))
  )
}
