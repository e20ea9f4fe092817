package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Remaining relational/dataflow rows of the SURVEY.md §2.2 capability
  * matrix: approximate distinct (HLL++), exact median, pivot,
  * SQL-surface subqueries, bag (ALL) set ops, full-outer join, cross
  * join, collect/string aggregation, date arithmetic.
  *
  * Oracle notes: the HLL estimate itself is engine-specific, so q18
  * emits a BOOLEAN "within 5% of exact" (deterministic for fixed data —
  * Spark's HLL++ is seedless) and the oracle asserts literal TRUE.
  * Collected arrays are sorted before joining to a string — collect
  * order is nondeterministic in both engines, sorted content is not.
  */
object ExtrasPack extends QueryPack {
  import Cents._

  def queries: Seq[(String, Q)] = Seq(

    // ── Approximate count-distinct (HLL++) sanity-banded vs exact ──────
    "q18_approx_distinct" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            approx_count_distinct(col("l_partkey")).as("approx"))
          .select(col("l_returnflag"), col("n_parts"),
            (abs(col("approx") - col("n_parts"))
              <= col("n_parts") * 0.05).as("approx_ok"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
               TRUE AS approx_ok
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // ── Exact interpolated median ──────────────────────────────────────
    "q19_median" -> Q(
      run = (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          // exact interpolated median over integer cents: the midpoint of
          // two int64s is exact in IEEE doubles under either engine's
          // interpolation formula, so cont-quantiles are hash-safe here
          .agg(expr("percentile(CAST(round(o_totalprice*100) AS BIGINT), 0.5)")
            .as("median_cents"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority,
               quantile_cont(CAST(round((o_totalprice)*100) AS BIGINT), 0.5) AS median_cents,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY o_orderpriority""")),

    // ── Pivot (wide conditional aggregation) ───────────────────────────
    "q20_pivot" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(cents(col("l_extendedprice"))))
          .orderBy("l_linestatus"),
      oracle = Some("""
        SELECT l_linestatus,
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) FILTER (l_returnflag = 'A') AS BIGINT) AS "A",
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) FILTER (l_returnflag = 'N') AS BIGINT) AS "N",
               CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) FILTER (l_returnflag = 'R') AS BIGINT) AS "R"
        FROM lineitem GROUP BY 1 ORDER BY l_linestatus""")),

    // ── SQL surface: scalar + IN subqueries ────────────────────────────
    "q21_sql_subquery" -> Q(
      run = (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q21_orders")
        Tables.customer(s, d).createOrReplaceTempView("q21_customer")
        s.sql("""
          SELECT o_orderpriority, count(*) AS n
          FROM q21_orders
          WHERE o_totalprice > (SELECT max(o_totalprice) FROM q21_orders) * 0.5
            AND o_custkey IN (SELECT c_custkey FROM q21_customer
                              WHERE c_mktsegment = 'BUILDING')
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
          AND o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── Bag semantics: UNION ALL / EXCEPT ALL / INTERSECT ALL ──────────
    "q22_bag_setops" -> Q(
      run = (s, d) => {
        val a = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k"))
        val b = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey").as("k"))
        a.unionAll(b).agg(count(lit(1)).as("n")).withColumn("op", lit("union_all"))
          .unionByName(a.exceptAll(b).agg(count(lit(1)).as("n"))
            .withColumn("op", lit("except_all")))
          .unionByName(a.intersectAll(b).agg(count(lit(1)).as("n"))
            .withColumn("op", lit("intersect_all")))
          .select("op", "n").orderBy("op")
      },
      oracle = Some("""
        SELECT 'except_all' AS op, count(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        UNION ALL
        SELECT 'intersect_all' AS op, count(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        UNION ALL
        SELECT 'union_all' AS op, count(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        ORDER BY op""")),

    // ── Full-outer join with match categorization ──────────────────────
    "q23_full_outer" -> Q(
      run = (s, d) => {
        val a = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey").as("ka")).agg(count(lit(1)).as("na"))
        val b = Tables.orders(s, d).filter(col("o_orderpriority") === "5-LOW")
          .groupBy(col("o_custkey").as("kb")).agg(count(lit(1)).as("nb"))
        a.join(b, col("ka") === col("kb"), "full_outer")
          .select(when(col("ka").isNotNull && col("kb").isNotNull, "both")
            .when(col("ka").isNotNull, "left_only")
            .otherwise("right_only").as("category"),
            coalesce(col("na"), lit(0L)).as("na"),
            coalesce(col("nb"), lit(0L)).as("nb"))
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n_cust"), sum(col("na")).as("urgent_orders"),
            sum(col("nb")).as("low_orders"))
          .orderBy("category")
      },
      oracle = Some("""
        WITH a AS (SELECT o_custkey AS ka, count(*) AS na FROM orders
                   WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        b AS (SELECT o_custkey AS kb, count(*) AS nb FROM orders
              WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        SELECT CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN 'both'
                    WHEN ka IS NOT NULL THEN 'left_only'
                    ELSE 'right_only' END AS category,
               count(*) AS n_cust,
               CAST(sum(coalesce(na, 0)) AS BIGINT) AS urgent_orders,
               CAST(sum(coalesce(nb, 0)) AS BIGINT) AS low_orders
        FROM a FULL JOIN b ON ka = kb
        GROUP BY 1 ORDER BY category""")),

    // ── Cross join ─────────────────────────────────────────────────────
    "q24_cross_join" -> Q(
      run = (s, d) =>
        Tables.region(s, d).select(col("r_name"))
          .crossJoin(Tables.orders(s, d).select(col("o_orderstatus")).distinct())
          .orderBy("r_name", "o_orderstatus"),
      oracle = Some("""
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        ORDER BY r_name, o_orderstatus""")),

    // ── Collect + string aggregation (sorted for determinism) ──────────
    "q25_collect_agg" -> Q(
      run = (s, d) =>
        broadcast(Tables.nation(s, d))
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(sort_array(collect_set(col("n_name"))), ",")
            .as("nations"),
            count(lit(1)).as("n"))
          .orderBy("r_name"),
      oracle = Some("""
        SELECT r_name,
               array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations,
               count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1 ORDER BY r_name""")),

    // ── Null-handling functions over outer-join nulls ──────────────────
    "q27_null_fns" -> Q(
      run = (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d)
            .filter(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("o_orderkey"), lit(-1L)).as("ok_or_default"),
            col("o_orderkey").isNull.as("no_pending"),
            nullif(col("o_orderstatus"), lit("P")).as("status_nulled"),
            nvl2(col("o_orderkey"), lit("has"), lit("none")).as("tag"))
          .groupBy(col("no_pending"), col("status_nulled"), col("tag"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("ok_or_default") === -1L, 1L).otherwise(0L)).as("n_defaulted"))
          .orderBy("no_pending", "tag"),
      oracle = Some("""
        SELECT o_orderkey IS NULL AS no_pending,
               nullif(o_orderstatus, 'P') AS status_nulled,
               CASE WHEN o_orderkey IS NOT NULL THEN 'has' ELSE 'none' END AS tag,
               count(*) AS n,
               CAST(sum(CASE WHEN coalesce(o_orderkey, -1) = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
        FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
          ON c_custkey = o_custkey
        GROUP BY 1, 2, 3 ORDER BY no_pending, tag""")),

    // ── String function breadth (pad/translate/repeat/reverse/left) ────
    "q28_string_fns2" -> Q(
      run = (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("lp"),
            rpad(col("p_brand"), 12, "-").as("rp"),
            translate(col("p_type"), "AEO", "aeo").as("tr"),
            repeat(substring(col("p_name"), 1, 2), 3).as("rep"),
            reverse(col("p_name")).as("rev"),
            expr("left(p_name, 3)").as("l3"),
            expr("right(p_name, 2)").as("r2"))
          .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS lp,
               rpad(p_brand, 12, '-') AS rp,
               translate(p_type, 'AEO', 'aeo') AS tr,
               repeat(substring(p_name, 1, 2), 3) AS rep,
               reverse(p_name) AS rev,
               left(p_name, 3) AS l3,
               right(p_name, 2) AS r2
        FROM part ORDER BY p_partkey""")),

    // ── Array function breadth ─────────────────────────────────────────
    // set-ish ops normalized with a sort since union/distinct ordering
    // is engine-specific; array_position and list_position agree on
    // 1-based indexing with 0 for absent. Array results are emitted as
    // joined strings so the cross-engine value compare never depends on
    // how each side's client represents list cells.
    "q29_array_fns" -> Q(
      run = (s, d) => {
        val toks = split(col("p_name"), " ")
        Tables.part(s, d)
          .select(col("p_partkey"),
            array_join(array_sort(toks), ",").as("sorted"),
            array_join(array_sort(array_union(toks, array(lit("widget")))), ",").as("uni"),
            array_position(toks, "ring").as("pos"),
            array_join(reverse(toks), ",").as("rev"),
            array_join(slice(toks, 1, 1), ",").as("first1"),
            array_contains(toks, "bolt").as("has_bolt"),
            array_join(flatten(array(toks, array(lit("x")))), ",").as("flat"))
          .orderBy("p_partkey")
      },
      oracle = Some("""
        SELECT p_partkey,
               array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted,
               array_to_string(list_sort(list_distinct(list_concat(string_split(p_name, ' '), ['widget']))), ',') AS uni,
               list_position(string_split(p_name, ' '), 'ring') AS pos,
               array_to_string(list_reverse(string_split(p_name, ' ')), ',') AS rev,
               array_to_string(string_split(p_name, ' ')[1:1], ',') AS first1,
               list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt,
               array_to_string(flatten([string_split(p_name, ' '), ['x']]), ',') AS flat
        FROM part ORDER BY p_partkey""")),

    // ── Correlated scalar subquery ─────────────────────────────────────
    // each customer's most expensive order(s): the correlated max is
    // decorrelated by Catalyst into an aggregate + join
    "q30_correlated_subquery" -> Q(
      run = (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q30_orders")
        s.sql("""
          SELECT o_custkey, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM q30_orders o
          WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                                FROM q30_orders o2
                                WHERE o2.o_custkey = o.o_custkey)
            AND o_custkey < 300
          ORDER BY o_custkey, o_orderkey""")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
          AND o_custkey < 300
        ORDER BY o_custkey, o_orderkey""")),

    // ── Approximate quantile, sanity-banded vs exact (q18 pattern) ─────
    // approx_percentile's sketch is engine-specific, so the oracle
    // asserts the deterministic "within 2% of the exact median" flag
    // rather than the estimate itself.
    "q33_approx_quantile" -> Q(
      run = (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("percentile(CAST(round(o_totalprice*100) AS BIGINT), 0.5)")
              .as("exact_med"),
            expr("approx_percentile(CAST(round(o_totalprice*100) AS BIGINT), 0.5, 1000)")
              .as("approx_med"))
          .select(col("o_orderpriority"),
            (abs(col("approx_med") - col("exact_med"))
              <= col("exact_med") * 0.02).as("approx_ok"))
          .orderBy("o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority, TRUE AS approx_ok
        FROM orders GROUP BY 1 ORDER BY o_orderpriority""")),

    // ── from_json + map functions ──────────────────────────────────────
    // the schema-full twin of e04's get_json_object path: parse props
    // into MapType, then map_keys/element_at — SURVEY §2.2's "map/json"
    // scalar row. Keys emitted as a sorted joined string so map ordering
    // can't leak into the compare.
    "q31_json_map" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .withColumn("m", from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
          .select(element_at(col("m"), "k").as("kval"),
            array_join(array_sort(map_keys(col("m"))), ",").as("keys"))
          .groupBy((col("kval") % 10).as("kmod"), col("keys"))
          .agg(count(lit(1)).as("n"))
          .orderBy("kmod"),
      oracle = Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS kmod,
               array_to_string(list_sort(json_keys(props)), ',') AS keys,
               count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY kmod""")),

    // ── Unpivot (stack): wide → long, the inverse of q20 ───────────────
    "q32_unpivot" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(cents(col("l_extendedprice"))))
          .select(col("l_linestatus"),
            expr("stack(3, 'A', `A`, 'N', `N`, 'R', `R`) AS (flag, cents)"))
          .orderBy("l_linestatus", "flag"),
      oracle = Some("""
        WITH w AS (
          SELECT l_linestatus,
                 CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) FILTER (l_returnflag = 'A') AS BIGINT) AS a,
                 CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) FILTER (l_returnflag = 'N') AS BIGINT) AS n_,
                 CAST(sum(CAST(round((l_extendedprice)*100) AS BIGINT)) FILTER (l_returnflag = 'R') AS BIGINT) AS r
          FROM lineitem GROUP BY 1)
        SELECT l_linestatus, 'A' AS flag, a AS cents FROM w
        UNION ALL SELECT l_linestatus, 'N', n_ FROM w
        UNION ALL SELECT l_linestatus, 'R', r FROM w
        ORDER BY l_linestatus, flag""")),

    // ── Date arithmetic ────────────────────────────────────────────────
    "q26_date_fns" -> Q(
      run = (s, d) =>
        Tables.orders(s, d)
          .filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"),
            date_format(date_add(col("o_orderdate").cast("date"), 30),
              "yyyy-MM-dd").as("plus30"),
            date_format(last_day(col("o_orderdate").cast("date")),
              "yyyy-MM-dd").as("month_end"),
            datediff(lit("2002-01-01").cast("date"),
              col("o_orderdate").cast("date")).as("days_to_2002"),
            date_format(date_trunc("month", col("o_orderdate")),
              "yyyy-MM-dd").as("month_start"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // ── Statistical aggregates (corr / covar / stddev) ─────────────────
    // Raw corr()/stddev() emit reassociated double sums — order-
    // dependent, so never hash-stable across engines (QueryPack rules).
    // Instead the co-moments are accumulated as EXACT integer sums
    // (quantity and discount-% are integer-valued; every sum and product
    // here stays ≤ 2^53, so even after the implicit double promotion the
    // values are exact) and the statistics are derived by an identical
    // fixed sequence of IEEE ops in both engines. A spec separately pins
    // Spark's native corr/covar_samp/stddev_samp to these formulas
    // within 1e-9 (StatsAggSpec).
    "q34_stats_agg" -> Q(
      run = (s, d) => {
        val m = Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            round(col("l_quantity"), 0).cast("long").as("x"),
            round(col("l_discount") * 100, 0).cast("long").as("y"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
        val dxx = col("n") * col("sxx") - col("sx") * col("sx")
        val dyy = col("n") * col("syy") - col("sy") * col("sy")
        val dxy = col("n") * col("sxy") - col("sx") * col("sy")
        val nn1 = col("n") * (col("n") - 1)
        m.select(col("l_returnflag"), col("n"),
          round(dxy / sqrt(dxx) / sqrt(dyy) * 1000000, 0).cast("long").as("corr_e6"),
          round(dxy / nn1 * 1000000, 0).cast("long").as("covar_e6"),
          round(sqrt(dxx / nn1) * 1000000, 0).cast("long").as("stddev_x_e6"),
          round(sqrt(dyy / nn1) * 1000000, 0).cast("long").as("stddev_y_e6"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        WITH b AS (SELECT l_returnflag,
                          CAST(round(l_quantity) AS BIGINT) AS x,
                          CAST(round(l_discount*100) AS BIGINT) AS y
                   FROM lineitem),
        m AS (SELECT l_returnflag, count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x*x) AS BIGINT) AS sxx,
                     CAST(sum(y*y) AS BIGINT) AS syy,
                     CAST(sum(x*y) AS BIGINT) AS sxy
              FROM b GROUP BY 1)
        SELECT l_returnflag, n,
               CAST(round((n*sxy - sx*sy) / sqrt(n*sxx - sx*sx) / sqrt(n*syy - sy*sy) * 1000000) AS BIGINT) AS corr_e6,
               CAST(round((n*sxy - sx*sy) / (n*(n-1)) * 1000000) AS BIGINT) AS covar_e6,
               CAST(round(sqrt((n*sxx - sx*sx) / (n*(n-1))) * 1000000) AS BIGINT) AS stddev_x_e6,
               CAST(round(sqrt((n*syy - sy*sy) / (n*(n-1))) * 1000000) AS BIGINT) AS stddev_y_e6
        FROM m ORDER BY l_returnflag""")),

    // ── Higher-order array functions (exists/forall/filter/fold/zip) ───
    // Lambdas over a collected-per-group array — the codegen-friendly
    // alternative to a UDF for per-group sequence logic. collect_list
    // order is nondeterministic under parallel merge, so the array is
    // sort_array'd first (same rule as q25); the fold is over exact
    // longs. DuckDB expresses exists/forall through list_filter
    // emptiness — semantically identical.
    "q35_higher_order" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d).filter(col("l_orderkey") < 200)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(round(col("l_quantity"), 0)
            .cast("long"))).as("qs"))
          .select(col("l_orderkey"),
            size(col("qs")).as("n_lines"),
            exists(col("qs"), x => x > 40).as("any_gt_40"),
            forall(col("qs"), x => x <= 45).as("all_le_45"),
            size(filter(col("qs"), x => x < 10)).as("n_small"),
            aggregate(col("qs"), lit(0L), (acc, x) => acc + x).as("total_qty"),
            element_at(zip_with(col("qs"), reverse(col("qs")),
              (a, b) => a + b), 1).as("first_plus_last"))
          .orderBy("l_orderkey"),
      oracle = Some("""
        WITH a AS (SELECT l_orderkey,
                          list_sort(list(CAST(round(l_quantity) AS BIGINT))) AS qs
                   FROM lineitem WHERE l_orderkey < 200 GROUP BY 1)
        SELECT l_orderkey,
               len(qs) AS n_lines,
               len(list_filter(qs, x -> x > 40)) > 0 AS any_gt_40,
               len(list_filter(qs, x -> NOT (x <= 45))) = 0 AS all_le_45,
               len(list_filter(qs, x -> x < 10)) AS n_small,
               CAST(list_reduce(qs, (a, b) -> a + b) AS BIGINT) AS total_qty,
               CAST(qs[1] + list_reverse(qs)[1] AS BIGINT) AS first_plus_last
        FROM a ORDER BY l_orderkey""")),

    // ── LATERAL correlated subquery (top-1-per-row apply) ──────────────
    // The SQL-surface twin of a per-key argmax: for each order, the
    // heaviest line via a correlated LATERAL derived table with its own
    // ORDER BY/LIMIT. Catalyst decorrelates this into a ranked join —
    // no per-row re-execution survives in the physical plan.
    "q36_lateral_topline" -> Q(
      run = (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q36_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("q36_lineitem")
        s.sql("""
          SELECT o.o_orderkey, l.l_linenumber, l.qty
          FROM q36_orders o,
               LATERAL (SELECT l_linenumber,
                               CAST(round(l_quantity) AS BIGINT) AS qty
                        FROM q36_lineitem
                        WHERE l_orderkey = o.o_orderkey
                        ORDER BY l_quantity DESC, l_linenumber
                        LIMIT 1) l
          WHERE o.o_orderkey < 300
          ORDER BY o.o_orderkey""")
      },
      oracle = Some("""
        SELECT o.o_orderkey, l.l_linenumber, l.qty
        FROM orders o,
             LATERAL (SELECT l_linenumber,
                             CAST(round(l_quantity) AS BIGINT) AS qty
                      FROM lineitem
                      WHERE l_orderkey = o.o_orderkey
                      ORDER BY l_quantity DESC, l_linenumber
                      LIMIT 1) l
        WHERE o.o_orderkey < 300
        ORDER BY o.o_orderkey""")),

    // ── try_* null-safe scalar functions ───────────────────────────────
    // Fallible arithmetic/parsing that yields NULL instead of failing
    // the job — at 100 TB one malformed row must not kill a stage.
    // DuckDB twins: TRY_CAST is 1:1; try_divide is CASE-emulated (its
    // division on exact ints is the same deterministic IEEE op).
    "q37_try_fns" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("try_divide(CAST(round(l_extendedprice*100) AS BIGINT), " +
              "CAST(round(l_quantity) AS BIGINT) - 25)").as("div_maybe"),
            expr("try_cast(CASE WHEN l_linenumber % 2 = 0 THEN '123' " +
              "ELSE l_returnflag END AS INT)").as("parsed_maybe"))
          .orderBy("l_orderkey", "l_linenumber"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN CAST(round(l_quantity) AS BIGINT) - 25 = 0 THEN NULL
                    ELSE CAST(round(l_extendedprice*100) AS BIGINT)
                         / (CAST(round(l_quantity) AS BIGINT) - 25) END AS div_maybe,
               TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN '123'
                             ELSE l_returnflag END AS INT) AS parsed_maybe
        FROM lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber""")),

    // ── NULLS FIRST / NULLS LAST ordering semantics ────────────────────
    // The engines DISAGREE by default (Spark sorts nulls first
    // ascending, DuckDB last), so portable SQL must say which it wants —
    // and because the driver's compare sorts rows before hashing, plain
    // ORDER BY output can't test placement. The placement is therefore
    // ENCODED INTO VALUES: per-order ranks under v ASC NULLS FIRST and
    // under v DESC NULLS LAST — wrong placement shifts every rank.
    "q38_null_ordering" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = nullif(round(col("l_quantity"), 0).cast("long"), lit(25L))
        val base = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"), v.as("v"))
        val wf = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("v").asc_nulls_first, col("l_linenumber"))
        val wl = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("v").desc_nulls_last, col("l_linenumber"))
        base
          .select(col("l_orderkey"), col("l_linenumber"), col("v"),
            row_number().over(wf).as("rn_nulls_first"),
            row_number().over(wl).as("rn_nulls_last"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, v,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY v ASC NULLS FIRST, l_linenumber) AS rn_nulls_first,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY v DESC NULLS LAST, l_linenumber) AS rn_nulls_last
        FROM (SELECT l_orderkey, l_linenumber,
                     nullif(CAST(round(l_quantity) AS BIGINT), 25) AS v
              FROM lineitem WHERE l_orderkey < 100)
        ORDER BY l_orderkey, l_linenumber""")),

    // ── Recursive CTE (Spark 4.1 WITH RECURSIVE) ───────────────────────
    // A month spine generated by recursion — the standard way to report
    // over a gapless calendar when the fact table may skip periods.
    // Spark 4.1 recursion only admits UNION ALL, so the recursion must
    // be acyclic: the anchor row carries the END bound as a column
    // (avoiding a subquery in the recursive term, which neither engine
    // allows) and each step adds one month until it reaches it. Depth =
    // #months (~80 here), well under Spark's recursion-level limit of
    // 100; the spine is a handful of rows, so the recursive part is
    // driver-trivial and the real work stays in the one hash aggregate
    // over orders that the spine LEFT JOINs (broadcast — the spine side
    // is tiny) — the shape survives any corpus scale.
    "q39_recursive_cte" -> Q(
      run = (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q39_orders")
        s.sql("""
          WITH RECURSIVE spine(m, mx) AS (
            SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE),
                   CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE)
            FROM q39_orders
            UNION ALL
            SELECT add_months(m, 1), mx FROM spine WHERE m < mx),
          agg AS (
            SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
                   count(*) AS n,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM q39_orders GROUP BY 1)
          SELECT date_format(spine.m, 'yyyy-MM') AS ym,
                 coalesce(agg.n, CAST(0 AS BIGINT)) AS n,
                 coalesce(agg.cents, CAST(0 AS BIGINT)) AS total_cents
          FROM spine LEFT JOIN agg ON spine.m = agg.m
          ORDER BY ym""")
      },
      oracle = Some("""
        WITH RECURSIVE spine(m, mx) AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
                 CAST(date_trunc('month', max(o_orderdate)) AS DATE)
          FROM orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, mx FROM spine WHERE m < mx),
        agg AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 count(*) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1)
        SELECT strftime(spine.m, '%Y-%m') AS ym,
               coalesce(agg.n, CAST(0 AS BIGINT)) AS n,
               coalesce(agg.cents, CAST(0 AS BIGINT)) AS total_cents
        FROM spine LEFT JOIN agg ON spine.m = agg.m
        ORDER BY ym""")),

    // ── CDC upsert / MERGE-INTO semantics as composition ───────────────
    // The warehouse maintenance op parquet alone can't do natively:
    // merge a change stream into a keyed snapshot, classifying each
    // output key as insert (new key), update (existing key touched by
    // the delta) or carry (untouched). The split point is the midpoint
    // of the event-time range, computed PLAN-SIDE (1-row aggregate,
    // broadcast cross join — no driver action) with integer division
    // so both engines pick the identical cutoff. Latest-per-key =
    // row_number over (us DESC, event_id DESC) — the unique tiebreak
    // makes the merge deterministic under any partitioning. Scale
    // shape: one keyed window per side + two left joins, all shuffled
    // on user_id; nothing global.
    "q40_cdc_upsert" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            Cents.cents(col("value")).as("value_cents"))
        val bounds = ev.agg(expr("(min(us) + max(us)) div 2").as("cutoff"))
        val evc = ev.crossJoin(broadcast(bounds))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us").desc, col("event_id").desc)
        def latest(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        val base = latest(evc.filter(col("us") < col("cutoff")))
          .select(col("user_id"), col("us").as("base_us"))
        val fin = latest(evc)
          .select(col("user_id"), col("us"), col("value_cents"))
        val delta = evc.filter(col("us") >= col("cutoff"))
          .select("user_id").distinct().withColumn("has_delta", lit(1))
        fin.join(base, Seq("user_id"), "left")
          .join(delta, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("base_us").isNull, "insert")
              .when(col("has_delta").isNull, "carry")
              .otherwise("update").as("action"),
            col("us").as("last_us"), col("value_cents"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           CAST(round((value)*100) AS BIGINT) AS value_cents
                    FROM events),
        c AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM ev),
        base AS (SELECT user_id, us FROM (
                   SELECT user_id, us, row_number() OVER (PARTITION BY user_id
                     ORDER BY us DESC, event_id DESC) AS rn
                   FROM ev, c WHERE us < cutoff) WHERE rn = 1),
        fin AS (SELECT user_id, us, value_cents FROM (
                  SELECT user_id, us, value_cents,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY us DESC, event_id DESC) AS rn
                  FROM ev) WHERE rn = 1),
        del AS (SELECT DISTINCT user_id FROM ev, c WHERE us >= cutoff)
        SELECT f.user_id,
               CASE WHEN b.user_id IS NULL THEN 'insert'
                    WHEN d.user_id IS NULL THEN 'carry'
                    ELSE 'update' END AS action,
               f.us AS last_us, f.value_cents
        FROM fin f
        LEFT JOIN base b ON f.user_id = b.user_id
        LEFT JOIN del d ON f.user_id = d.user_id
        ORDER BY f.user_id""")),

    // ── SCD Type-2 history from a change stream ────────────────────────
    // The other half of warehouse temporality next to q40's snapshot
    // merge: every change becomes a VERSION with a half-open validity
    // interval [valid_from, valid_to); the latest version per key stays
    // open (NULL valid_to, is_current=1). One keyed window (lead +
    // row_number on the unique (us, event_id) order) — shuffled on
    // user_id only, no global ops, versions stream out per key.
    "q41_scd2_history" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            Cents.cents(col("value")).as("value_cents"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .select(col("user_id"), col("version"),
            col("us").as("valid_from_us"), col("valid_to_us"),
            when(col("valid_to_us").isNull, 1L).otherwise(0L)
              .as("is_current"),
            col("value_cents"))
          .filter(col("user_id") < 30)
          .orderBy("user_id", "version")
      },
      oracle = Some("""
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               us AS valid_from_us,
               lead(us, 1) OVER w AS valid_to_us,
               CASE WHEN lead(us, 1) OVER w IS NULL
                    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_current,
               value_cents
        FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
                     CAST(round((value)*100) AS BIGINT) AS value_cents
              FROM events)
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ORDER BY user_id, version""")),

    // ── Z-order (Morton) clustering key ────────────────────────────────
    // The data-skipping layout key (Delta/Iceberg OPTIMIZE ZORDER):
    // interleave the bits of two dimensions so rows close in BOTH land
    // close in the sort order; written range-partitioned on this key,
    // per-file min/max stats prune 2-D box predicates (locality is
    // asserted in SourcesSpec). Pure integer bit arithmetic — the
    // oracle computes the identical key. The key itself is a narrow
    // map; the write path (`Layout.zOrderWrite`) adds one range
    // repartition, the same cost class as any global sort-by-key.
    "q42_zorder_key" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 200)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_partkey") % 4096).as("x"),
            (col("l_suppkey") % 4096).as("y"))
          .withColumn("z",
            graft.sources.Layout.zValue(col("x"), col("y")))
          .orderBy("l_orderkey", "l_linenumber"),
      oracle = Some(s"""
        SELECT l_orderkey, l_linenumber,
               l_partkey % 4096 AS x, l_suppkey % 4096 AS y,
               ${graft.sources.Layout.zValueSql("l_partkey % 4096",
                 "l_suppkey % 4096")} AS z
        FROM lineitem WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber""")),

    // ── Equi-width histogram ───────────────────────────────────────────
    // Fixed-bucket value histogram (the profiling / ANALYZE shape). The
    // bucket edges derive from the data's max — ONE tiny agg broadcast
    // back into a narrow map (no width_bucket: its double-division
    // rounding is engine-specific; `(c*B) div hi` on non-negative
    // integer cents is floor in both engines, see Cents). Two shuffles
    // total (global max + 10-row groupBy) regardless of input size.
    "q43_histogram" -> Q(
      run = (s, d) => {
        val c = Tables.orders(s, d)
          .select(cents(col("o_totalprice")).as("c"))
        val hi = c.agg(max(col("c")).as("hi"))
        c.crossJoin(broadcast(hi))
          .select(least(expr("(c * 10) div (hi + 1)"), lit(9L)).as("bucket"),
            col("c"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("c")).as("sum_cents"),
            min(col("c")).as("min_cents"),
            max(col("c")).as("max_cents"))
          .orderBy("bucket")
      },
      oracle = Some(s"""
        WITH c AS (SELECT ${Cents.sqlCents("o_totalprice")} AS c FROM orders),
        hi AS (SELECT max(c) AS hi FROM c)
        SELECT least((c.c * 10) // (hi.hi + 1), 9) AS bucket,
               count(*) AS n_orders,
               CAST(sum(c.c) AS BIGINT) AS sum_cents,
               min(c.c) AS min_cents, max(c.c) AS max_cents
        FROM c, hi
        GROUP BY 1 ORDER BY bucket""")),

    // ── Mergeable HLL sketches (partial-aggregate re-aggregation) ──────
    // The 100 TB distinct-count pattern q18 can't express: q18's
    // approx_count_distinct is one-shot, but real pipelines SKETCH ONCE
    // at fine grain and RE-AGGREGATE the sketches at coarser grains
    // without touching raw data again. Here: one Datasketches HLL
    // sketch per day (hll_sketch_agg — partial-aggregating, so each
    // map task sketches locally and only ~KB sketches shuffle), then
    // weekly rollups via hll_union_agg over the 7 daily sketches —
    // the raw events are read exactly once however many grains are
    // layered on top. Correctness is banded like q18: the estimate
    // must land within 5% of exact (both computed in Spark; the
    // oracle recomputes exact and expects the flag true — validated
    // green at sf0.001/0.01/0.1).
    "q44_hll_union" -> Q(
      run = (s, d) => {
        val daily = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .groupBy("day")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val weekly = daily
          .groupBy(date_format(date_trunc("week", col("day")), "yyyy-MM-dd")
            .as("week"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = Tables.events(s, d)
          .select(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
            .as("week"), col("user_id"))
          .groupBy("week")
          .agg(countDistinct(col("user_id")).as("exact_users"))
        weekly.join(exact, "week")
          .select(col("week"), col("exact_users"),
            (abs(col("est") - col("exact_users"))
              <= col("exact_users") * 0.05).as("within_5pct"))
          .orderBy("week")
      },
      oracle = Some("""
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS within_5pct
        FROM events GROUP BY 1 ORDER BY week""")),

    // ── Mergeable histogram quantiles (the percentile twin of q44) ─────
    // q19/q55's exact percentiles re-sort raw data at every grain; the
    // 100 TB pattern is SKETCH ONCE at fine grain, MERGE at coarse
    // grain: a fixed 1000-bin histogram of order value per DAY (each
    // day's sketch ≤ 1000 rows regardless of volume), then monthly
    // quantiles from the SUMMED histograms — raw orders are read once,
    // every coarser grain is metadata-sized arithmetic, and two
    // sketches merge by plain addition (the property t-digest/KLL787
    // approximate and an equi-width histogram has exactly). Unlike
    // q44's banded HLL check, every step here is integer-exact (bin =
    // c·1000 div (max+1), median position = (n+1) div 2, answer = bin
    // LOWER BOUND in cents), so DuckDB replays the whole pipeline
    // bit-for-bit — the approximation error vs q19's exact median is
    // bounded by one bin width by construction, not asserted.
    // Scale posture: one scan bins raw rows (the max is a broadcast
    // scalar like q43's), the day×bucket relation is calendar-sized,
    // and everything after is windows over ≤1000 rows per month.
    "q59_histogram_quantile_merge" -> Q(
      run = (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderdate").as("day"),
            Cents.cents(col("o_totalprice")).as("c"))
        val hi = o.agg(max(col("c")).as("hi"))
        val daily = o.crossJoin(broadcast(hi))
          .select(col("day"),
            least(expr("(c * 1000) div (hi + 1)"), lit(999L)).as("bucket"))
          .groupBy("day", "bucket").agg(count(lit(1)).as("cnt"))
        val monthly = daily
          .select(date_format(col("day"), "yyyy-MM").as("month"),
            col("bucket"), col("cnt"))
          .groupBy("month", "bucket").agg(sum("cnt").as("cnt"))
        val tot = monthly.groupBy("month").agg(sum("cnt").as("n"))
        val w = Window.partitionBy("month").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val med = monthly.withColumn("cum", sum("cnt").over(w))
          .join(tot, "month")
          .filter(col("cum") >= expr("(n + 1) div 2"))
          .groupBy(col("month"), col("n"))
          .agg(min(col("bucket")).as("mbucket"))
        med.crossJoin(broadcast(hi))
          .select(col("month"), col("n").as("n_orders"),
            expr("(mbucket * (hi + 1)) div 1000").as("approx_med_lb_cents"))
          .orderBy("month")
      },
      oracle = Some(s"""
        WITH c AS (SELECT o_orderdate AS day,
                          ${Cents.sqlCents("o_totalprice")} AS c FROM orders),
        hi AS (SELECT max(c) AS hi FROM c),
        daily AS (SELECT day, least((c.c * 1000) // (hi.hi + 1), 999) AS bucket,
                         count(*) AS cnt
                  FROM c, hi GROUP BY 1, 2),
        monthly AS (SELECT strftime(day, '%Y-%m') AS month, bucket,
                           sum(cnt) AS cnt
                    FROM daily GROUP BY 1, 2),
        tot AS (SELECT month, sum(cnt) AS n FROM monthly GROUP BY 1),
        cum AS (SELECT m.month, m.bucket,
                       sum(m.cnt) OVER (PARTITION BY m.month
                         ORDER BY m.bucket ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum, t.n
                FROM monthly m JOIN tot t ON m.month = t.month),
        med AS (SELECT month, n, min(bucket) AS mbucket
                FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1, 2)
        SELECT month, CAST(n AS BIGINT) AS n_orders,
               CAST((mbucket * (hi.hi + 1)) // 1000 AS BIGINT)
                 AS approx_med_lb_cents
        FROM med, hi ORDER BY month""")),

    // ── Exact DECIMAL arithmetic ───────────────────────────────────────
    // The packs' scaled-int convention (QueryPack scaladoc) sidesteps
    // float nondeterminism; this query covers the OTHER exact path —
    // first-class DecimalType. Two hard-won determinism rules (round-4
    // post-mortem — the suite's only driver-red cell):
    //   1. Decimals are BUILT FROM EXACT INTEGER CENTS, never by a
    //      per-row double→decimal cast: round(x*100) is exactly
    //      integral in both engines (the doubles are 2-decimal values,
    //      so x*100 is within 1e-6 of an integer, never at a .5 tie),
    //      and cents × DECIMAL('0.01') is exact decimal multiplication.
    //      Every cell is bit-determined regardless of either engine's
    //      double→decimal rounding mode.
    //   2. The FINAL projection renders decimals AS STRINGS. Raw
    //      DECIMAL output columns hash-diverge at the driver whenever a
    //      cell has a trailing zero at its declared scale (its oracle
    //      path collapses DECIMAL→float64, repr '…899'; the Spark
    //      parquet path keeps the Decimal, str '…8990' — observed on
    //      sum_net row N at sf0.01). decimal→string is plain,
    //      scale-preserving, and identical in both engines, so the
    //      representation is reader-path-independent. ExtrasSpec pins
    //      that the PRE-projection types are the true decimal widths —
    //      sum(12,2)→(22,2); (1.00-(4,2))=(5,2), ×(12,2)→(18,4),
    //      sum→(28,4) — so DecimalType arithmetic stays first-class.
    // Decimal aggregation is partial+final two-phase like any long sum.
    "q45_decimal_exact" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("bigint").as("pc"),
            round(col("l_discount") * 100).cast("bigint").as("dc"))
          .select(col("l_returnflag"),
            (col("pc").cast("decimal(14,0)")
              * lit("0.01").cast("decimal(3,2)"))
              .cast("decimal(12,2)").as("p"),
            (col("dc").cast("decimal(4,0)")
              * lit("0.01").cast("decimal(3,2)"))
              .cast("decimal(4,2)").as("disc"))
          .withColumn("net",
            col("p") * (lit("1.00").cast("decimal(3,2)") - col("disc")))
          .groupBy("l_returnflag")
          .agg(sum(col("p")).cast("decimal(22,2)").as("sum_price"),
            min(col("p")).as("min_price"),
            max(col("p")).as("max_price"),
            sum(col("net")).cast("decimal(28,4)").as("sum_net"))
          .select(col("l_returnflag"),
            col("sum_price").cast("string").as("sum_price"),
            col("min_price").cast("string").as("min_price"),
            col("max_price").cast("string").as("max_price"),
            col("sum_net").cast("string").as("sum_net"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        WITH c AS (
          SELECT l_returnflag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                 CAST(round(l_discount * 100) AS BIGINT) AS dc
          FROM lineitem),
        d AS (
          SELECT l_returnflag,
                 CAST(CAST(pc AS DECIMAL(14,0))
                   * CAST('0.01' AS DECIMAL(3,2)) AS DECIMAL(12,2)) AS p,
                 CAST(CAST(dc AS DECIMAL(4,0))
                   * CAST('0.01' AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS disc
          FROM c)
        SELECT l_returnflag,
               CAST(CAST(sum(p) AS DECIMAL(22,2)) AS VARCHAR) AS sum_price,
               CAST(min(p) AS VARCHAR) AS min_price,
               CAST(max(p) AS VARCHAR) AS max_price,
               CAST(CAST(sum(p * (CAST('1.00' AS DECIMAL(3,2)) - disc))
                 AS DECIMAL(28,4)) AS VARCHAR) AS sum_net
        FROM d GROUP BY 1 ORDER BY l_returnflag""")),

    // ── Null-aware anti join (NOT IN) ──────────────────────────────────
    // NOT IN is NOT an anti-join when the subquery can yield NULL: one
    // NULL in the set makes every non-member comparison UNKNOWN, so the
    // whole result is empty — the classic three-valued-logic trap, and
    // a distinct PHYSICAL operator in Spark (single-column NOT IN plans
    // as BroadcastHashJoin(..., NullAwareAntiJoin), which must
    // broadcast the set to check the null case; NOT EXISTS/left_anti
    // skips that machinery). Both flavors in one row: a null-free set
    // (plain anti-join count) and the same set ∪ {NULL} (count 0 by
    // SQL semantics, not by accident). At 100 TB the set side must
    // stay broadcastable — if it doesn't fit, rewrite to NOT EXISTS,
    // which is what the n_not_exists column pins the equivalence for.
    "q46_null_aware_anti" -> Q(
      run = (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q46_orders")
        Tables.customer(s, d).createOrReplaceTempView("q46_customer")
        s.sql("""
          SELECT
            (SELECT count(*) FROM q46_customer
             WHERE c_custkey NOT IN
               (SELECT o_custkey FROM q46_orders
                WHERE o_totalprice > 400000)) AS n_not_in,
            (SELECT count(*) FROM q46_customer
             WHERE c_custkey NOT IN
               (SELECT o_custkey FROM q46_orders
                WHERE o_totalprice > 400000
                UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_with_null,
            (SELECT count(*) FROM q46_customer c
             WHERE NOT EXISTS
               (SELECT 1 FROM q46_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 400000)) AS n_not_exists""")
      },
      oracle = Some("""
        SELECT
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders
              WHERE o_totalprice > 400000)) AS n_not_in,
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders
              WHERE o_totalprice > 400000
              UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_with_null,
          (SELECT count(*) FROM customer c
           WHERE NOT EXISTS
             (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)) AS n_not_exists""")),

    // ── Salted skew join, oracle-pinned row-identical to the plain join
    // graft.operators.SkewJoin spreads one pathologically hot key over
    // saltFactor reducers: the big side salts on a row hash, the small
    // side explodes saltFactor×, the join keys on (key, salt). AQE's
    // skew splitting covers most skew; this is the explicit fallback
    // for single-key skew it can't split. The contract that matters is
    // ROW-IDENTITY with the unsalted join — so the oracle here IS the
    // plain join+aggregate, making the driver's hash compare the proof
    // (the spec checks a hand-built skewed frame; this checks fixture
    // data end-to-end through the gate).
    "q47_salted_join" -> Q(
      run = (s, d) => {
        val big = Tables.events(s, d)
          .select(col("user_id").as("k"), col("event_type"),
            Cents.cents(col("value")).as("v"))
        val small = Tables.customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment"))
        graft.operators.SkewJoin.saltedJoin(big, small, "k", 8)
          .groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("cents"))
          .orderBy("c_mktsegment", "event_type")
      },
      oracle = Some("""
        SELECT c_mktsegment, event_type, count(*) AS n,
               CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""")),

    // ── Schema evolution: union of old- and new-schema batches ─────────
    // The long-lived-table reality: yesterday's files lack a column
    // today's have. unionByName(allowMissingColumns = true) aligns by
    // NAME and nulls the missing column — positional union would
    // silently misalign or fail. Modeled by splitting events on
    // event_id parity: the "old" half drops `value`, the union
    // re-aggregates with nulls counting as absent. One narrow map per
    // branch + one two-phase aggregate; nothing about the union
    // shuffles.
    "q48_schema_evolution" -> Q(
      run = (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            Cents.cents(col("value")).as("value_cents"))
        val oldBatch = e.filter(col("event_id") % 2 === 0)
          .drop("value_cents")                      // old schema: no value
        val newBatch = e.filter(col("event_id") % 2 === 1)
        oldBatch.unionByName(newBatch, allowMissingColumns = true)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            count(col("value_cents")).as("n_with_value"),
            sum(col("value_cents")).as("cents"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH u AS (
          SELECT event_type, CAST(NULL AS BIGINT) AS value_cents
          FROM events WHERE event_id % 2 = 0
          UNION ALL
          SELECT event_type, CAST(round((value)*100) AS BIGINT)
          FROM events WHERE event_id % 2 = 1)
        SELECT event_type, count(*) AS n_rows,
               count(value_cents) AS n_with_value,
               CAST(sum(value_cents) AS BIGINT) AS cents
        FROM u GROUP BY 1 ORDER BY event_type""")),

    // ── VARIANT type (Spark 4 semi-structured fast path) ───────────────
    // e04/q31 parse JSON per access with string functions; VARIANT
    // parses ONCE into a binary-encoded tree (parse_json) that
    // variant_get then navigates with typed extraction — the
    // store-semi-structured-columns-efficiently answer for a 100 TB
    // event table where every query touches a different key. Same
    // answers as the string path, so the oracle is DuckDB's
    // json_extract with an explicit cast.
    "q49_variant" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            count(when(col("k") >= 90, lit(1))).as("n_high"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_k,
               count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                 >= 90 THEN 1 END) AS n_high
        FROM events GROUP BY 1 ORDER BY event_type""")),

    // ── DECIMAL depth: avg (scale+4), division widths, try_/overflow ──
    // q45's twin covers the decimal OPERATIONS engines genuinely
    // disagree on. Same determinism rules (integer-cents build, string
    // final projection — see q45):
    //   avg(DECIMAL(12,2)) → DECIMAL(16,6) (Spark's +4 precision/scale
    //     rule), rounded HALF_UP at scale 6; the oracle emulates with
    //     exact HUGEINT math: floor((2·sum·10⁴ + n)/(2n)) is half-up
    //     for positive operands.
    //   (12,2)/(3,2) → DECIMAL(18,6) (scale max(6, s1+p2+1), precision
    //     p1-s1+s2+scale), per-row; ties at scale 6 are impossible
    //     (2·pc·10⁶ is even, 107·odd is odd), so one floor-division
    //     emulates it exactly.
    //   try_cast to a too-narrow DECIMAL(5,2) → NULL (not an error —
    //     pinned under both ANSI modes), try_divide by zero → NULL,
    //     and a fitting try_cast stays value-preserving.
    // DecimalSpec pins the (16,6)/(18,6) result widths; here the
    // oracle pins the digits.
    "q50_decimal_depth" -> Q(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("bigint").as("pc"))
          .select(col("l_returnflag"),
            (col("pc").cast("decimal(14,0)")
              * lit("0.01").cast("decimal(3,2)"))
              .cast("decimal(12,2)").as("p"))
          .withColumn("vat", col("p") / lit("1.07").cast("decimal(3,2)"))
          .groupBy("l_returnflag")
          .agg(avg(col("p")).as("avg_p"),
            min(col("vat")).as("vat_min"),
            max(col("vat")).as("vat_max"),
            sum(col("p")).cast("decimal(22,2)").as("sum_p"),
            min(col("p")).as("min_p"))
          .select(col("l_returnflag"),
            col("avg_p").cast("string").as("avg_price"),
            col("vat_min").cast("string").as("vat_min"),
            col("vat_max").cast("string").as("vat_max"),
            expr("try_cast(sum_p AS DECIMAL(5,2))")
              .cast("string").as("ovf_null"),
            expr("try_divide(min_p, 0)").cast("string").as("div0_null"),
            expr("try_cast(min_p AS DECIMAL(10,2))")
              .cast("string").as("ok_cast"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        WITH c AS (
          SELECT l_returnflag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
          FROM lineitem),
        v AS (
          SELECT l_returnflag, pc,
                 (2 * CAST(pc AS HUGEINT) * 1000000 + 107) // (2 * 107)
                   AS vat6
          FROM c),
        a AS (
          SELECT l_returnflag,
                 sum(CAST(pc AS HUGEINT)) AS sc, count(*) AS n,
                 min(pc) AS mnc, min(vat6) AS vmn, max(vat6) AS vmx
          FROM v GROUP BY 1)
        SELECT l_returnflag,
               CAST(CAST(CAST((2 * sc * 10000 + n) // (2 * n)
                   AS DECIMAL(22,0))
                 * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(16,6))
                 AS VARCHAR) AS avg_price,
               CAST(CAST(CAST(vmn AS DECIMAL(24,0))
                 * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(18,6))
                 AS VARCHAR) AS vat_min,
               CAST(CAST(CAST(vmx AS DECIMAL(24,0))
                 * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(18,6))
                 AS VARCHAR) AS vat_max,
               CAST(NULL AS VARCHAR) AS ovf_null,
               CAST(NULL AS VARCHAR) AS div0_null,
               CAST(CAST(CAST(CAST(mnc AS DECIMAL(14,0))
                 * CAST('0.01' AS DECIMAL(3,2)) AS DECIMAL(12,2))
                 AS DECIMAL(10,2)) AS VARCHAR) AS ok_cast
        FROM a ORDER BY l_returnflag""")),

    // ── Bucketed co-located join: the zero-shuffle fact⋈fact story ────
    // At 100 TB the dominant cost of a fact-fact join is shuffling both
    // sides on the key. Bucketed STORAGE amortizes that shuffle into the
    // write: both tables are written `bucketBy(B, key).sortBy(key)`, so
    // every later join/agg on the key reads co-located buckets and the
    // SortMergeJoin needs NO Exchange on either side (PlanSpec pins
    // this). The `repartition(B, key)` before each write uses the same
    // murmur3-pmod placement as the bucket spec, so each task owns
    // exactly one bucket → one file per bucket (the layout that also
    // permits sorted-scan reuse where enabled). Per-bucket sorts at read
    // are bucket-local — B-way parallel, no data motion. The oracle is
    // the plain join/agg: bucketing is a physical property; results
    // must be identical to the unbucketed plan.
    "q52_bucketed_join" -> Q(
      run = (s, d) => {
        val wh = "/tmp/graft_bucketed_" +
          Integer.toHexString(d.hashCode & 0x7fffffff)
        s.sql("DROP TABLE IF EXISTS graft_li_bkt")
        s.sql("DROP TABLE IF EXISTS graft_ord_bkt")
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), cents(col("l_extendedprice")).as("pc"),
            col("l_quantity").cast("long").as("qty"))
          .repartition(8, col("l_orderkey"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$wh/li").saveAsTable("graft_li_bkt")
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .repartition(8, col("o_orderkey"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$wh/ord").saveAsTable("graft_ord_bkt")
        s.table("graft_ord_bkt").hint("merge")
          .join(s.table("graft_li_bkt"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("pc")).as("sum_price_cents"),
            sum(col("qty")).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                 AS BIGINT) AS sum_price_cents,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1 ORDER BY o_orderpriority""")),

    // ── Hive-partitioned layout + partition pruning ────────────────────
    // The third leg of the storage-layout triad (q42 Z-order intra-file
    // skipping, q52 bucketing for shuffle-free joins): a hive-style
    // `partitionBy(lang)` directory layout, re-read with a partition
    // predicate. The filter is satisfied by DIRECTORY LISTING alone —
    // the scan's PartitionFilters prune non-matching lang=… dirs before
    // a single parquet footer is opened (PlanSpec pins PartitionCount:
    // 2 of 5). At 100 TB this is the difference between reading 2/5 of
    // the corpus and reading all of it; the oracle reads the
    // unpartitioned table with the same predicate, proving the layout
    // round-trip loses nothing (row-count, langs, chars all agree).
    "q53_partition_pruning" -> Q(
      run = (s, d) => {
        val out = "/tmp/graft_partitioned_" +
          Integer.toHexString(d.hashCode & 0x7fffffff)
        Tables.documents(s, d)
          .write.mode("overwrite").partitionBy("lang").parquet(out)
        s.read.parquet(out)
          .filter(col("lang").isin("en", "fr"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy("source")
      },
      oracle = Some("""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               count(DISTINCT lang) AS n_langs
        FROM documents WHERE lang IN ('en', 'fr')
        GROUP BY 1 ORDER BY source""")),

    // ── Ordered string aggregation (LISTAGG WITHIN GROUP) ──────────────
    // The reporting primitive SQL standardized in 2023 and Spark added
    // in 4.0: collapse a group to one delimiter-joined string in a
    // DEFINED order. Determinism is the whole operator: an unordered
    // listagg is partitioning-dependent garbage under a hash-agg, so
    // the WITHIN GROUP clause (Spark: `listagg(...) within group
    // (order by ...)`, DuckDB: `string_agg(... ORDER BY ...)`) is what
    // makes the result hash-stable here and reproducible at any
    // parallelism. Scale: one two-phase agg; per-group payload is the
    // concatenated string, so groups are dimension-sized by contract
    // (nations per region) — corpus-sized listagg is a design error,
    // not an engine feature.
    "q54_listagg" -> Q(
      run = (s, d) =>
        Tables.nation(s, d)
          .join(Tables.region(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            expr("listagg(n_name, ',') within group (order by n_name)")
              .as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy("r_name"),
      oracle = Some("""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1 ORDER BY r_name""")),

    // ── Robust dispersion: exact per-group median + MAD ────────────────
    // q34's moment statistics are outlier-dominated at corpus scale;
    // median absolute deviation is the robust pair every data-quality
    // monitor wants. Two passes by necessity (MAD is a nested median):
    // each is one two-phase `percentile` aggregate over integer cents,
    // with the 5-row median table broadcast back between them — the
    // corpus shuffles twice on the same low-cardinality key and nothing
    // else moves. Exactness: q19's argument, one step further —
    // midpoints of int64 cents are exact dyadic doubles, so deviations
    // |cents − median| and THEIR interpolated median are bit-equal
    // across engines.
    "q55_median_mad" -> Q(
      run = (s, d) => {
        val b = Tables.orders(s, d)
          .select(col("o_orderpriority"), cents(col("o_totalprice")).as("cents"))
        val m = b.groupBy("o_orderpriority")
          .agg(expr("percentile(cents, 0.5)").as("median_cents"))
        b.join(broadcast(m), "o_orderpriority")
          .select(col("o_orderpriority"), col("median_cents"),
            abs(col("cents") - col("median_cents")).as("dev"))
          .groupBy("o_orderpriority", "median_cents")
          .agg(expr("percentile(dev, 0.5)").as("mad_cents"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        WITH b AS (SELECT o_orderpriority,
                          CAST(round(o_totalprice*100) AS BIGINT) AS cents
                   FROM orders),
        m AS (SELECT o_orderpriority, quantile_cont(cents, 0.5) AS median_cents
              FROM b GROUP BY 1),
        dv AS (SELECT b.o_orderpriority, m.median_cents,
                      abs(b.cents - m.median_cents) AS dev
               FROM b JOIN m USING (o_orderpriority))
        SELECT o_orderpriority, median_cents,
               quantile_cont(dev, 0.5) AS mad_cents, count(*) AS n
        FROM dv GROUP BY 1, 2 ORDER BY 1""")),

    // ── Data-quality profile (Deequ-style audit card) ──────────────────
    // The constraint-validation readout every ingestion step runs before
    // data is allowed downstream: per-column completeness (null counts),
    // domain cardinality, exact min/max range, value-range violations,
    // composite-key uniqueness, and referential integrity vs the parent
    // table — one (metric, value) row each. Shape: ONE aggregation pass
    // over lineitem computes every per-row metric (the count-distinct
    // adds Spark's expand, still a single scan); uniqueness is one
    // (orderkey, linenumber) hash agg; the FK audit is one left-anti
    // join — the only stages that touch data, everything emitted is
    // metadata-sized. At 100 TB this is exactly the profile pass a
    // warehouse runs per partition-drop: no collect, no per-metric
    // rescans. The synthetic fixture makes uniqueness genuinely dirty
    // (duplicate (l_orderkey, l_linenumber) pairs exist), so the audit
    // is a real signal, not an all-zeros card.
    "q56_dq_profile" -> Q(
      run = (s, d) => {
        val li = Tables.lineitem(s, d)
        val one = count(lit(1))
        val wide = li.agg(
          one.as("n_rows"),
          (one - count(col("l_orderkey"))).as("nulls_orderkey"),
          (one - count(col("l_extendedprice"))).as("nulls_extprice"),
          (one - count(col("l_returnflag"))).as("nulls_returnflag"),
          countDistinct(col("l_returnflag")).as("distinct_returnflag"),
          round(min(col("l_extendedprice")) * 100, 0).cast("long")
            .as("min_extprice_cents"),
          round(max(col("l_extendedprice")) * 100, 0).cast("long")
            .as("max_extprice_cents"),
          count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
            .as("viol_discount_range"),
          count(when(col("l_quantity") <= 0, 1)).as("viol_quantity_pos"))
        val scanMetrics = wide.selectExpr(
          """stack(9,
               'completeness_l_extendedprice_nulls', nulls_extprice,
               'completeness_l_orderkey_nulls', nulls_orderkey,
               'completeness_l_returnflag_nulls', nulls_returnflag,
               'distinct_l_returnflag', distinct_returnflag,
               'max_l_extendedprice_cents', max_extprice_cents,
               'min_l_extendedprice_cents', min_extprice_cents,
               'n_rows', n_rows,
               'violations_l_discount_range', viol_discount_range,
               'violations_l_quantity_nonpos', viol_quantity_pos)
             AS (metric, value)""")
        val orphans = li
          .join(Tables.orders(s, d).select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit("fk_orphan_l_orderkey").as("metric"), col("value"))
        val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
          .agg(count(lit(1)).as("value"))
          .select(lit("uniqueness_dup_line_keys").as("metric"), col("value"))
        scanMetrics.unionByName(orphans).unionByName(dupKeys)
          .select(col("metric"), col("value").cast("long"))
          .orderBy("metric")
      },
      oracle = Some("""
        WITH scan AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(*) - count(l_orderkey) AS BIGINT) AS nulls_orderkey,
                 CAST(count(*) - count(l_extendedprice) AS BIGINT) AS nulls_extprice,
                 CAST(count(*) - count(l_returnflag) AS BIGINT) AS nulls_returnflag,
                 CAST(count(DISTINCT l_returnflag) AS BIGINT) AS distinct_returnflag,
                 CAST(round(min(l_extendedprice)*100) AS BIGINT) AS min_extprice_cents,
                 CAST(round(max(l_extendedprice)*100) AS BIGINT) AS max_extprice_cents,
                 CAST(count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS BIGINT) AS viol_discount_range,
                 CAST(count(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT) AS viol_quantity_pos
          FROM lineitem),
        orphans AS (
          SELECT CAST(count(*) AS BIGINT) AS v FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
        dupkeys AS (
          SELECT CAST(count(*) AS BIGINT) AS v FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY 1, 2 HAVING count(*) > 1))
        SELECT 'completeness_l_extendedprice_nulls' AS metric, nulls_extprice AS value FROM scan
        UNION ALL SELECT 'completeness_l_orderkey_nulls', nulls_orderkey FROM scan
        UNION ALL SELECT 'completeness_l_returnflag_nulls', nulls_returnflag FROM scan
        UNION ALL SELECT 'distinct_l_returnflag', distinct_returnflag FROM scan
        UNION ALL SELECT 'fk_orphan_l_orderkey', v FROM orphans
        UNION ALL SELECT 'max_l_extendedprice_cents', max_extprice_cents FROM scan
        UNION ALL SELECT 'min_l_extendedprice_cents', min_extprice_cents FROM scan
        UNION ALL SELECT 'n_rows', n_rows FROM scan
        UNION ALL SELECT 'uniqueness_dup_line_keys', v FROM dupkeys
        UNION ALL SELECT 'violations_l_discount_range', viol_discount_range FROM scan
        UNION ALL SELECT 'violations_l_quantity_nonpos', viol_quantity_pos FROM scan
        ORDER BY metric""")),

    // ── Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) ─────────────
    // The join-semantics corner q05–q07/q46 leave open: under plain `=`
    // a NULL key matches nothing (the null-aware anti-join of q46 is
    // one consequence); under `<=>` NULL matches NULL. Exercised by
    // NULLing out one nation on both sides: the null group pairs up
    // cross-wise, every other group behaves as a plain equi-join.
    // Catalyst plans `<=>` as a HASH join key (EqualNullSafe is
    // sargable — nulls hash to one partition), NOT a BNLJ residual —
    // that, plus one two-phase count agg, is the whole plan; the
    // null-key hot partition is the documented skew caveat (a real
    // corpus null-safe join salts the null key like q47).
    "q57_nullsafe_join" -> Q(
      run = (s, d) => {
        val cust = Tables.customer(s, d)
          .select(nullif(col("c_nationkey"), lit(3)).as("ck"))
        val supp = Tables.supplier(s, d)
          .select(nullif(col("s_nationkey"), lit(3)).as("sk"))
        cust.join(supp, col("ck") <=> col("sk"))
          .groupBy(coalesce(col("ck"), lit(-1L)).as("nation_key"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("nation_key")
      },
      oracle = Some("""
        WITH c AS (SELECT nullif(c_nationkey, 3) AS ck FROM customer),
             s AS (SELECT nullif(s_nationkey, 3) AS sk FROM supplier)
        SELECT CAST(coalesce(ck, -1) AS BIGINT) AS nation_key,
               count(*) AS n_pairs
        FROM c JOIN s ON c.ck IS NOT DISTINCT FROM s.sk
        GROUP BY 1 ORDER BY nation_key""")),

    // ── GROUPING() disambiguation of rollup NULLs ──────────────────────
    // The correctness corner q09–q11 leave open: a NULL in a rollup
    // output is ambiguous — "subtotal row" or "NULL data value"? The
    // SQL answer is the GROUPING() indicator (1 = column rolled up,
    // 0 = real value — including a real NULL). Exercised by injecting
    // genuine NULLs (nullif on one status) into a CUBE: coalesce-based
    // labeling would merge the NULL-data rows into the subtotal rows
    // and double-count; the grouping flags keep them apart, pinned by
    // the oracle's identical flag columns. Plan shape is q10's: one
    // Expand (×4 grouping sets) + one two-phase hash agg.
    "q58_grouping_id" -> Q(
      run = (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q58_orders")
        s.sql("""
          SELECT coalesce(nullif(o_orderstatus, 'P'), '?') AS status,
                 coalesce(o_orderpriority, '?') AS priority,
                 CAST(grouping(nullif(o_orderstatus, 'P')) AS BIGINT)
                   AS g_status,
                 CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
                 count(*) AS n
          FROM q58_orders
          GROUP BY CUBE (nullif(o_orderstatus, 'P'), o_orderpriority)
          ORDER BY g_status, g_priority, status, priority""")
      },
      oracle = Some("""
        SELECT coalesce(nullif(o_orderstatus, 'P'), '?') AS status,
               coalesce(o_orderpriority, '?') AS priority,
               CAST(GROUPING(nullif(o_orderstatus, 'P')) AS BIGINT)
                 AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (nullif(o_orderstatus, 'P'), o_orderpriority)
        ORDER BY g_status, g_priority, status, priority""")),

    // ── Join-key skew census: the measured "should I salt?" number ─────
    // q47 IS the salted join; this is the instrument that decides when
    // to deploy it (the relational twin of d16's hot-shingle census and
    // g12's degree audit): per-key counts on the probe-side join column,
    // then the top-5 hottest keys with their share of all rows and
    // their ratio to the MEAN key (cnt·n_keys/n_rows, ppm). A ratio
    // near 1e6 says uniform (hash partitioning holds at any scale); a
    // hot key at 50-100x mean says that reducer is the job's critical
    // path — salt it (q47), or let AQE skew-split it. Shapes: one
    // keyed count agg, a 1-row totals card broadcast in-plan (p01
    // pattern, plan-smell-adjudicated), TakeOrdered top-5 — no
    // all-pairs, no data-sized single partition.
    "q60_join_skew_audit" -> Q(
      run = (s, d) => {
        val counts = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("key"))
          .agg(count(lit(1)).as("cnt"))
        val totals = counts.agg(sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"))
        // vs_mean divides by the mean count rather than computing
        // cnt·n_keys·1e6 — the triple product overflows int64 exactly
        // on the corpora this instrument exists for (cnt ~1e9 keys
        // ~1e6 already exceeds 9.2e18); cnt·1e6 alone is safe to
        // ~9e12 rows per key
        counts.crossJoin(broadcast(totals))
          .select(col("key"), col("cnt"),
            expr("cnt * 1000000L div n_rows").as("share_e6"),
            expr("cnt * 1000000L div (n_rows div n_keys)").as("vs_mean_ppm"))
          .orderBy(col("cnt").desc, col("key"))
          .limit(5)
      },
      oracle = Some("""
        WITH counts AS (SELECT l_partkey AS key, count(*) AS cnt
                        FROM lineitem GROUP BY 1),
        totals AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                          CAST(count(*) AS BIGINT) AS n_keys
                   FROM counts)
        SELECT key, cnt,
               CAST(cnt * 1000000 // n_rows AS BIGINT) AS share_e6,
               CAST(cnt * 1000000 // (n_rows // n_keys) AS BIGINT)
                 AS vs_mean_ppm
        FROM counts, totals
        ORDER BY cnt DESC, key LIMIT 5"""))
  )
}
