package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator surface (SURVEY.md §2.2): scan/filter/project
  * with pushdown, the join family, hash aggregation, distinct,
  * rollup/cube/grouping-sets, set ops, global top-k, scalar functions.
  *
  * In the reference every one of these must be hand-compiled by the user
  * onto map→shuffle→reduce (reference worker/__main__.py:113-185); here
  * each is a declarative Catalyst plan so pushdown/pruning/join-strategy
  * selection are automatic.
  *
  * Scale posture (100 TB): fact-table scans carry their filters into the
  * parquet reader (PushedFilters); dimension joins are explicitly
  * broadcast; the remaining fact-fact joins shuffle on their equi-keys
  * where AQE picks shuffled-hash vs sort-merge and handles skew; all
  * aggregates are partial (map-side) + final two-phase hash aggregates.
  */
object RelationalPack extends QueryPack {
  import Cents._

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  def queries: Seq[(String, Q)] = Seq(

    // ── Aggregation over a filtered scan (TPC-H Q1 shape) ──────────────
    "q01_pricing_summary" -> Q(
      run = (s, d) =>
        li(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
            sum(e4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("sum_disc_price_e4"),
            sum(e6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax")))).as("sum_charge_e6"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (sum(cents(col("l_extendedprice"))).cast("double") / lit(100.0)
              / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round((l_extendedprice*(1.0-l_discount))*10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
               CAST(sum(CAST(round((l_extendedprice*(1.0-l_discount)*(1.0+l_tax))*1000000) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
               sum(l_quantity)/count(*) AS avg_qty,
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) AS DOUBLE)/100.0/count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ── Filter + projection pushed into the parquet scan (Q6 shape) ────
    "q02_filter_pushdown" -> Q(
      run = (s, d) =>
        li(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 24)
          .agg(
            sum(e4(col("l_extendedprice") * col("l_discount"))).as("revenue_e4"),
            count(lit(1)).as("n_rows")),
      oracle = Some("""
        SELECT CAST(sum(CAST(round((l_extendedprice*l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24"""),
      bench = true),

    // ── 3-way join + agg + top-k (Q3 shape) ────────────────────────────
    // Scale: customer(filtered) is the small side of customer⋈orders —
    // still sharded, so it shuffles on the key; orders⋈lineitem is the
    // big fact-fact join, shuffled on orderkey; AQE handles skew. Top-k
    // is TakeOrderedAndProject (no global sort materialization).
    "q03_join_topk" -> Q(
      run = (s, d) => {
        val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = ord(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = li(s, d)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(e4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue_e4"))
          .select(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_orderpriority"), col("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
          .limit(10)
      },
      oracle = Some("""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               CAST(sum(CAST(round((l_extendedprice*(1.0-l_discount))*10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e4 DESC, l_orderkey
        LIMIT 10"""),
      bench = true),

    // ── Broadcast (map-side) dimension join ────────────────────────────
    // The reference cannot express this at all (no distributed cache —
    // SURVEY §2.2); on Spark the tiny dims ship to every executor and the
    // fact side never shuffles.
    "q04_broadcast_join" -> Q(
      run = (s, d) => {
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        cust(s, d)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_cust"),
            sum(cents(col("c_acctbal"))).as("acctbal_cents"))
          .orderBy("r_name")
      },
      oracle = Some("""
        SELECT r_name, count(*) AS n_cust,
               CAST(sum(CAST(round((c_acctbal)*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // ── Left-semi join (EXISTS) ────────────────────────────────────────
    "q05_semi_join" -> Q(
      run = (s, d) =>
        ord(s, d)
          .join(li(s, d).filter(col("l_quantity") >= 48),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── Left-anti join (NOT EXISTS) ────────────────────────────────────
    // customers without any pending ('P') order — every customer has
    // SOME order in the fixtures, so the unfiltered variant would be a
    // degenerate empty result
    "q06_anti_join" -> Q(
      run = (s, d) =>
        cust(s, d)
          .join(ord(s, d).filter(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("c_mktsegment"),
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_cust
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ── Left-outer join, null-aware count, second aggregation ──────────
    "q07_outer_join_histogram" -> Q(
      run = (s, d) =>
        cust(s, d)
          .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .groupBy(col("n_orders"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("n_orders"),
      oracle = Some("""
        SELECT n_orders, count(*) AS n_customers
        FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY n_orders ORDER BY n_orders""")),

    // ── Exact distinct aggregation ─────────────────────────────────────
    "q08_count_distinct" -> Q(
      run = (s, d) =>
        li(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            countDistinct(concat(col("l_partkey").cast("string"), lit("|"),
              col("l_suppkey").cast("string"))).as("n_part_supp"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR)) AS n_part_supp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── ROLLUP ─────────────────────────────────────────────────────────
    "q09_rollup" -> Q(
      run = (s, d) => {
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        cust(s, d)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            sum(cents(col("c_acctbal"))).as("acctbal_cents"))
          .select(coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("n_cust"), col("acctbal_cents"))
          .orderBy("region", "nation")
      },
      oracle = Some("""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               count(*) AS n_cust,
               CAST(sum(CAST(round((c_acctbal)*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation""")),

    // ── CUBE ───────────────────────────────────────────────────────────
    "q10_cube" -> Q(
      run = (s, d) =>
        ord(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("total_cents"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total_cents"))
          .orderBy("status", "priority"),
      oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(round((o_totalprice)*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ── GROUPING SETS (SQL surface) ────────────────────────────────────
    "q11_grouping_sets" -> Q(
      run = (s, d) => {
        ord(s, d).createOrReplaceTempView("q11_orders")
        s.sql("""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS priority,
                 count(*) AS n
          FROM q11_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY status, priority""")
      },
      oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")),

    // ── Set operations: EXCEPT / INTERSECT / UNION (all distinct) ──────
    "q12_setops" -> Q(
      run = (s, d) => {
        val a = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k"))
        val b = ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k"))
        a.except(b).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
          .unionByName(a.intersect(b).agg(count(lit(1)).as("n"))
            .withColumn("op", lit("intersect")))
          .unionByName(a.union(b).distinct().agg(count(lit(1)).as("n"))
            .withColumn("op", lit("union")))
          .select("op", "n").orderBy("op")
      },
      oracle = Some("""
        SELECT 'except' AS op, count(*) AS n FROM (
          SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          EXCEPT
          SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT 'intersect' AS op, count(*) AS n FROM (
          SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          INTERSECT
          SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT 'union' AS op, count(*) AS n FROM (
          SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION
          SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY op""")),

    // ── Global top-k (TakeOrderedAndProject, no full sort) ─────────────
    "q13_global_topk" -> Q(
      run = (s, d) =>
        ord(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("totalprice_cents")),
      oracle = Some("""
        SELECT o_orderkey, CAST(round((o_totalprice)*100) AS BIGINT) AS totalprice_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ── Scalar string/regex/math function coverage ─────────────────────
    "q14_scalar_fns" -> Q(
      run = (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("un"),
            length(col("p_name")).as("ln"),
            substring(col("p_name"), 1, 5).as("pre"),
            regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
            concat_ws("-", col("p_type"), col("p_brand")).as("tb"),
            (col("p_size") % 7).as("szmod"),
            greatest(col("p_size"), lit(25)).as("gsz"),
            e4(col("p_retailprice") * lit(1.1)).as("markup_e4"),
            replace(col("p_type"), lit("E"), lit("X")).as("rep"))
          .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey,
               upper(p_name) AS un,
               length(p_name) AS ln,
               substring(p_name, 1, 5) AS pre,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
               concat_ws('-', p_type, p_brand) AS tb,
               p_size % 7 AS szmod,
               greatest(p_size, 25) AS gsz,
               CAST(round((p_retailprice*1.1)*10000) AS BIGINT) AS markup_e4,
               replace(p_type, 'E', 'X') AS rep
        FROM part ORDER BY p_partkey""")),

    // ── Date/time functions + aggregation ──────────────────────────────
    "q15_date_agg" -> Q(
      run = (s, d) =>
        ord(s, d)
          .groupBy(year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("total_cents"))
          .orderBy("y", "q"),
      oracle = Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
               count(*) AS n,
               CAST(sum(CAST(round((o_totalprice)*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders GROUP BY 1, 2 ORDER BY y, q""")),

    // ── Conditional aggregation (CASE WHEN inside agg) ─────────────────
    "q16_case_agg" -> Q(
      run = (s, d) =>
        li(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_discount") > 0.05,
              e4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .otherwise(lit(0L))).as("hi_disc_rev_e4"),
            count(when(col("l_quantity") >= 30, lit(1))).as("n_bulk"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_discount > 0.05
                        THEN CAST(round((l_extendedprice*(1.0-l_discount))*10000) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS hi_disc_rev_e4,
               count(CASE WHEN l_quantity >= 30 THEN 1 END) AS n_bulk,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── Non-equi (range-bucket) join ───────────────────────────────────
    // Scale: the bucket table is a handful of rows → broadcast nested
    // loop is the correct plan even at 100 TB (fact side never moves).
    "q17_range_join" -> Q(
      run = (s, d) => {
        import s.implicits._
        val buckets = Seq(
          ("b0_lt10k", 0.0, 10000.0), ("b1_10k_50k", 10000.0, 50000.0),
          ("b2_50k_100k", 50000.0, 100000.0), ("b3_100k_200k", 100000.0, 200000.0),
          ("b4_ge200k", 200000.0, 1e12)).toDF("bucket", "lo", "hi")
        ord(s, d)
          .join(broadcast(buckets),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("total_cents"))
          .orderBy("bucket")
      },
      oracle = Some("""
        SELECT bucket, count(*) AS n,
               CAST(sum(CAST(round((o_totalprice)*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        JOIN (VALUES ('b0_lt10k', 0.0, 10000.0), ('b1_10k_50k', 10000.0, 50000.0),
                     ('b2_50k_100k', 50000.0, 100000.0), ('b3_100k_200k', 100000.0, 200000.0),
                     ('b4_ge200k', 200000.0, 1e12)) AS b(bucket, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY bucket ORDER BY bucket"""))
  )
}
