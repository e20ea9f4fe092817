package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` fixture, expressed as batch
  * plans whose streaming twins live in `graft.streaming` (SURVEY.md §2.2
  * "Streaming": the reference has no data-plane streaming at all — only
  * control-plane heartbeats, reference worker/__main__.py:103-111).
  *
  * `events.ts` is nanosecond-precision parquet; all time arithmetic and
  * ordering here goes through microseconds (`unix_micros` / `epoch_us`)
  * so Spark (µs) and the DuckDB oracle (ns) observe identical values —
  * see [[graft.Tables.events]].
  *
  * Scale posture: tumbling/sliding windows are plain hash aggregates on
  * (bucket, type) — fully parallel, map-side partials; sessionization is
  * one shuffle on user_id + a per-user sort (high-cardinality key, no
  * global sort); the as-of join avoids a per-event backward scan by the
  * union + last(ignoreNulls) running-carry trick — one shuffle on the
  * user key, linear in events+orders, the classic distributed as-of
  * formulation.
  */
object EventsPack extends QueryPack {
  import Cents._

  def queries: Seq[(String, Q)] = Seq(

    // ── Tumbling window (1 h) ──────────────────────────────────────────
    "e01_tumbling_hourly" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"), col("value_cents"))
          .orderBy("hour", "event_type"),
      oracle = Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type, count(*) AS n,
               CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
      bench = true),

    // ── Sliding window (1 h window, 30 min slide → 2 windows/event) ────
    "e02_sliding_windows" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
            col("event_type"), col("n"))
          .orderBy("wstart", "event_type"),
      oracle = Some("""
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
               count(*) AS n
        FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                             time_bucket(INTERVAL '30 minutes', ts)]) AS wstart,
                     event_type
              FROM events)
        GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    // ── Sessionization (30 min inactivity gap) ─────────────────────────
    "e03_sessionize" -> Q(
      run = (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull
              || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("us")).as("start_us"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
          .orderBy("user_id", "sess_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        flagged AS (
          SELECT user_id, event_id, us,
                 CASE WHEN lag(us, 1) OVER w IS NULL
                        OR us - lag(us, 1) OVER w > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        sessions AS (
          SELECT user_id, us,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
          FROM flagged)
        SELECT user_id, sess_id, count(*) AS n_events,
               min(us) AS start_us, max(us) - min(us) AS dur_us
        FROM sessions GROUP BY user_id, sess_id
        ORDER BY user_id, sess_id"""),
      bench = true),

    // ── JSON extraction ────────────────────────────────────────────────
    "e04_json_extract" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy((col("k") % 10).as("kmod"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
          .orderBy("kmod"),
      oracle = Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS kmod,
               count(*) AS n,
               CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events GROUP BY 1 ORDER BY kmod""")),

    // ── As-of join: latest order at-or-before each event ───────────────
    // Distributed formulation: dedupe the right side to one row per
    // (user, time), union both sides into one keyed stream, carry the
    // last non-null order key forward with a running window, keep event
    // rows. One shuffle, no per-event rescans (vs the naive
    // join+row_number which is quadratic per user).
    "e05_asof_join" -> Q(
      run = (s, d) => {
        val o2 = Tables.orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("ok"))
          .select(col("o_custkey").as("uid"),
            // o_orderdate loads as TIMESTAMP_NTZ; session TZ is UTC so the
            // cast to TIMESTAMP is wall-clock lossless.
            unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
            lit(0).as("kind"), lit(null).cast("long").as("event_id"),
            col("ok"))
        val ev = Tables.events(s, d)
          .select(col("user_id").as("uid"), unix_micros(col("ts")).as("t"),
            lit(1).as("kind"), col("event_id"),
            lit(null).cast("long").as("ok"))
        val w = Window.partitionBy(col("uid"))
          .orderBy(col("t"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o2.unionByName(ev)
          .withColumn("matched_orderkey",
            last(col("ok"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("matched_orderkey"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH o2 AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
                    FROM orders GROUP BY 1, 2)
        SELECT e.event_id, o2.ok AS matched_orderkey
        FROM events e
        ASOF LEFT JOIN o2
          ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
        ORDER BY e.event_id"""),
      bench = true),

    // ── As-of join via the native whole-operator (graft.plans) ─────────
    // Same semantics and oracle as e05, but through the custom
    // LogicalPlan + Strategy + sort-merge SparkPlan instead of the
    // union+carry composition.
    "e06_asof_join_native" -> Q(
      run = (s, d) => {
        val o2 = Tables.orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("ok"))
          .select(col("o_custkey").as("rk"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("rts"),
            col("ok"))
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id").as("lk"),
            unix_micros(col("ts")).as("lts"))
        graft.plans.AsOfJoinOps.asof(s, ev, o2, "lk", "rk", "lts", "rts")
          .select(col("event_id"), col("ok").as("matched_orderkey"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH o2 AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
                    FROM orders GROUP BY 1, 2)
        SELECT e.event_id, o2.ok AS matched_orderkey
        FROM events e
        ASOF LEFT JOIN o2
          ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
        ORDER BY e.event_id"""),
      bench = true),

    // ── Interval as-of: match only within a 90-day lookback ────────────
    // The native operator's maxLag mode (SURVEY §2.2 "as-of / interval"):
    // the latest order ≤ the event time counts only if it is at most 90
    // days old. Oracle: plain ASOF join + lag post-filter — equivalent,
    // since the latest row ≤ ts is the only possible in-window match.
    "e07_asof_interval" -> Q(
      run = (s, d) => {
        val lagUs = 90L * 86400L * 1000000L
        val o2 = Tables.orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("ok"))
          .select(col("o_custkey").as("rk"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("rts"),
            col("ok"))
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id").as("lk"),
            unix_micros(col("ts")).as("lts"))
        graft.plans.AsOfJoinOps.asof(s, ev, o2, "lk", "rk", "lts", "rts",
            maxLag = Some(lagUs))
          .select(col("event_id"), col("ok").as("matched_orderkey"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH o2 AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
                    FROM orders GROUP BY 1, 2)
        SELECT e.event_id,
               CASE WHEN epoch_us(e.ts) - epoch_us(CAST(o2.o_orderdate AS TIMESTAMP))
                         <= 7776000000000 THEN o2.ok END AS matched_orderkey
        FROM events e
        ASOF LEFT JOIN o2
          ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
        ORDER BY e.event_id""")),

    // ── Skew-safe exact count-distinct (two-level aggregation) ─────────
    // event_type has a handful of HOT groups over millions of users —
    // the textbook distinct-skew case. The two-level formulation first
    // shuffles on the full (event_type, user_id) pair — high
    // cardinality, spreads every hot group across the cluster — then
    // counts the tiny per-type result; no single reducer ever owns a
    // whole hot group's distinct set. Identical answer to
    // COUNT(DISTINCT ...), which is the oracle.
    "e08_skewsafe_distinct" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"), col("user_id")).distinct()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY event_type""")),

    // ── Native session_window (batch) ──────────────────────────────────
    // e03 builds sessions by hand (lag + running flag-sum); this is the
    // same 30-minute-gap semantics through Spark's built-in
    // `session_window`, which plans as a single SessionWindowing +
    // aggregate — one shuffle on user_id, windows merged per key with
    // NO global sort and no window function. A new session starts when
    // the gap is ≥ the timeout (a session's end is last_event + gap,
    // exclusive), so the oracle flags `diff >= gap` — note e03's
    // hand-rolled variant uses `>`, the two differ only for a gap of
    // exactly 1800.000000 s. window.end = max(ts) + gap by definition;
    // both ends are emitted as epoch micros (ts is ns in parquet, µs
    // in Spark — see Tables.events).
    "e09_session_window_fn" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("w.start")).as("start_us"),
            unix_micros(col("w.end")).as("end_us"),
            col("n_events"))
          .orderBy("user_id", "start_us"),
      oracle = Some("""
        WITH t AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        flagged AS (
          SELECT user_id, us,
                 CASE WHEN lag(us, 1) OVER w IS NULL
                        OR us - lag(us, 1) OVER w >= 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        sessions AS (
          SELECT user_id, us,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM flagged)
        SELECT user_id, min(us) AS start_us,
               max(us) + 1800 * 1000000 AS end_us,
               count(*) AS n_events
        FROM sessions GROUP BY user_id, sess_id
        ORDER BY user_id, start_us""")),

    // ── Funnel analysis (ordered multi-stage conversion) ───────────────
    // The product-analytics staple: of all users, how many ever viewed,
    // then clicked AFTER their first view, then purchased AFTER that
    // first qualifying click — order matters, so this is NOT three
    // independent filters. Implementation: three chained conditional
    // mins over the SAME `partitionBy(user_id)` window — each stage's
    // threshold is the previous stage's min, a per-user constant, so
    // Catalyst plans ONE exchange on user_id and runs all three Window
    // operators over the same sorted partition stream; no self-joins.
    // All comparisons happen on integer epoch-µs (ts is ns in parquet,
    // µs in Spark — see Tables.events; the oracle truncates to µs
    // first so both engines compare identical values). Scale posture:
    // single shuffle keyed by user — the highest-cardinality column —
    // then a tiny all-partial global aggregate.
    "e10_funnel" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
        val staged = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("us"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("us") > col("t1"),
              col("us"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("us") > col("t2"),
              col("us"))).over(w))
        staged.groupBy("user_id")
          .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
          .agg(count(lit(1)).as("n_users"),
            count(col("t1")).as("n_view"),
            count(col("t2")).as("n_view_click"),
            count(col("t3")).as("n_funnel"),
            sum(col("t3") - col("t1")).as("sum_funnel_us"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, min(us) FILTER (WHERE event_type = 'view') AS t1
               FROM e GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.us) AS t2
               FROM e JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.us) AS t3
               FROM e JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY 1)
        SELECT count(*) AS n_users,
               count(t1) AS n_view,
               count(t2) AS n_view_click,
               count(t3) AS n_funnel,
               CAST(sum(t3 - t1) AS BIGINT) AS sum_funnel_us
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // ── Time-series gap fill / resample with forward fill ──────────────
    // The missing-data operator every metrics pipeline needs: resample
    // each user's activity onto a dense daily spine (min..max active
    // day), then forward-fill gap days with the last observed daily
    // total. Spine generation is `sequence(d0, d1)` + explode — rows
    // are manufactured ON THE EXECUTORS from each user's 2-row bounds,
    // never collected; the fill is `last(_, ignoreNulls)` over a
    // running row frame. Daily totals are exact integer cents so the
    // carried sums hash-match. Scale posture: one shuffle to daily
    // grain, one broadcastable bounds table, spine join + fill share
    // the user_id partitioning; output stays at per-user grain.
    "e11_gapfill" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            cents(col("value")).as("v"))
          .groupBy("user_id", "day").agg(sum(col("v")).as("day_cents"))
        val spine = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val fillW = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "day"), "left")
          .withColumn("filled_cents",
            last(col("day_cents"), ignoreNulls = true).over(fillW))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_days"),
            count(col("day_cents")).as("n_observed"),
            sum(col("filled_cents")).as("sum_filled_cents"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                 CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT)
                   AS day_cents
          FROM events GROUP BY 1, 2),
        spine AS (
          SELECT user_id,
                 CAST(unnest(generate_series(min(day), max(day),
                   INTERVAL 1 DAY)) AS DATE) AS day
          FROM daily GROUP BY user_id),
        filled AS (
          SELECT s.user_id, s.day, d.day_cents,
                 last_value(d.day_cents IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_cents
          FROM spine s LEFT JOIN daily d
            ON s.user_id = d.user_id AND s.day = d.day)
        SELECT user_id, count(*) AS n_days,
               count(day_cents) AS n_observed,
               CAST(sum(filled_cents) AS BIGINT) AS sum_filled_cents
        FROM filled GROUP BY user_id ORDER BY user_id""")),

    // ── Forward as-of join (earliest match at-or-after) ────────────────
    // e05/e06 match the latest order AT-OR-BEFORE each event (pandas
    // merge_asof direction='backward'); this is direction='forward':
    // the EARLIEST order at-or-after. Same union+carry composition as
    // e05 with the window order REVERSED — carrying last(ignoreNulls)
    // down a descending timeline is exactly "next value at-or-after";
    // at equal timestamps the (t desc, kind) order processes the order
    // row first, preserving >= semantics. Still one shuffle keyed by
    // user. The oracle replays it through DuckDB's (backward-only)
    // ASOF JOIN on NEGATED µs — the standard direction-flip identity.
    "e12_asof_forward" -> Q(
      run = (s, d) => {
        val o2 = Tables.orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("ok"))
          .select(col("o_custkey").as("uid"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
            lit(0).as("kind"), lit(null).cast("long").as("event_id"),
            col("ok"))
        val ev = Tables.events(s, d)
          .select(col("user_id").as("uid"), unix_micros(col("ts")).as("t"),
            lit(1).as("kind"), col("event_id"),
            lit(null).cast("long").as("ok"))
        val w = Window.partitionBy(col("uid"))
          .orderBy(col("t").desc, col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o2.unionByName(ev)
          .withColumn("next_orderkey",
            last(col("ok"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("next_orderkey"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH o2 AS (
          SELECT o_custkey,
                 -epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS nt,
                 max(o_orderkey) AS ok
          FROM orders GROUP BY 1, 2),
        e AS (SELECT event_id, user_id, -epoch_us(ts) AS nt FROM events)
        SELECT e.event_id, o2.ok AS next_orderkey
        FROM e
        ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.nt >= o2.nt
        ORDER BY e.event_id""")),

    // ── Cumulative unique users (hourly growth curve) ──────────────────
    // The growth metric a naive plan gets catastrophically wrong:
    // "distinct users to date" per hour is NOT re-aggregable hour-by-hour
    // (COUNT(DISTINCT) over an expanding window rescans history every
    // hour). The exact scale formulation: a user contributes to the
    // curve only in their FIRST hour, so one groupBy(user) min(hour) —
    // a single shuffle keyed on the highest-cardinality column, partial
    // min map-side — reduces the corpus to one row per user, a tiny
    // per-day count follows, and the running sum is a window over the
    // ~|days| aggregate rows (like p08's ppm window: unpartitioned but
    // over metadata-sized input, never the data). The sketch variant of
    // the same question (when approximate is fine) is q44's mergeable
    // HLL union over daily sketches.
    "e13_cumulative_users" -> Q(
      run = (s, d) => {
        val firstHour = Tables.events(s, d)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
          .groupBy("user_id").agg(min(col("hr")).as("first_hr"))
        val w = Window.orderBy("first_hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        firstHour.groupBy("first_hr")
          .agg(count(lit(1)).as("new_users"))
          .withColumn("cum_users", sum(col("new_users")).over(w))
          .select(
            date_format(col("first_hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("new_users"), col("cum_users"))
          .orderBy("hour")
      },
      oracle = Some("""
        WITH f AS (
          SELECT user_id, min(date_trunc('hour', ts)) AS first_hr
          FROM events GROUP BY 1),
        n AS (SELECT first_hr, count(*) AS new_users FROM f GROUP BY 1)
        SELECT strftime(first_hr, '%Y-%m-%d %H:%M:%S') AS hour, new_users,
               CAST(sum(new_users) OVER (ORDER BY first_hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM n ORDER BY hour""")),

    // ── SCD2 dimension build (validity intervals from a change log) ────
    // The warehouse twin of q40's CDC upsert: turn an event stream into
    // a slowly-changing-dimension table — one row per (user, attribute
    // run) with [valid_from, valid_to) and an is_current flag, the
    // shape every point-in-time join consumes. Two windows, both
    // partitioned by user_id (high cardinality — parallel at any
    // scale): lag() finds run starts (value != previous), lead() over
    // the runs closes each interval at the next run's start. Total
    // order inside a user is (ts_us, event_id) — the pack's unique-key
    // tie-break rule, so run segmentation is engine-independent even
    // with equal timestamps. first_event_id is carried for provenance
    // AND as the output's total-order tiebreak.
    "e14_scd2_dimension" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
        val o = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
        o.filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
          .select(col("user_id"), col("event_id").as("first_event_id"),
            col("event_type").as("attr"),
            col("ts_us").as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.as("is_current"))
          .orderBy("user_id", "valid_from_us", "first_event_id")
      },
      oracle = Some("""
        WITH o AS (SELECT user_id, event_id, event_type,
                          epoch_us(ts) AS ts_us,
                          lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev
                   FROM events),
        starts AS (SELECT user_id, event_id, event_type, ts_us
                   FROM o WHERE prev IS NULL OR prev <> event_type),
        iv AS (SELECT user_id, event_id AS first_event_id,
                      event_type AS attr, ts_us AS valid_from_us,
                      lead(ts_us) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) AS valid_to_us
               FROM starts)
        SELECT user_id, first_event_id, attr, valid_from_us,
               valid_to_us, (valid_to_us IS NULL) AS is_current
        FROM iv ORDER BY user_id, valid_from_us, first_event_id""")),

    // ── Exact rolling 7-day active users (WAU curve per event type) ────
    // The rolling-distinct metric a naive plan computes by exploding
    // every (user, day) into 7 (user, day+i) rows — a 7× shuffle that
    // becomes 30× for MAU. The scale formulation used here never
    // expands rows: per (type, user), merge active days into intervals
    // wherever the gap is ≤ window (one keyed window + tiny agg), emit
    // +1/-1 boundary deltas, and take a running sum over the
    // (type, day) delta spine — metadata-sized, like e13's day curve.
    // Window length changes cost NOTHING (the ≤6 constant); the oracle
    // is the independent naive formulation (range join + distinct
    // count), so the two plans agreeing is a real cross-check.
    "e15_rolling_wau" -> Q(
      run = (s, d) => {
        // Round 15 (guide §2.4): ud feeds the run-detection window AND
        // the day spine (which is itself consumed twice — the gap
        // anti-join and the final inner join). Uncut, the events scan +
        // distinct ran per consumer; one cut computes it once.
        val ud = Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            to_date(date_trunc("day", col("ts"))).as("d"))
          .distinct()
          .localCheckpoint(true)
        graft.Caches.trackCut(ud)
        val w = Window.partitionBy("event_type", "user_id").orderBy("d")
        val runs = ud
          .withColumn("brk",
            when(datediff(col("d"), lag(col("d"), 1).over(w)) <= 6, lit(0))
              .otherwise(lit(1)))
          .withColumn("run", sum(col("brk")).over(w))
        val iv = runs.groupBy(col("event_type"), col("user_id"), col("run"))
          .agg(min(col("d")).as("st"), date_add(max(col("d")), 6).as("en"))
        val deltas = iv
          .select(col("event_type"), col("st").as("d"), lit(1L).as("dv"))
          .unionByName(iv.select(col("event_type"),
            date_add(col("en"), 1).as("d"), lit(-1L).as("dv")))
        val curve = deltas.groupBy(col("event_type"), col("d"))
          .agg(sum(col("dv")).as("dv"))
        val days = ud.select(col("event_type"), col("d")).distinct()
        val pts = curve.unionByName(
          days.join(curve, Seq("event_type", "d"), "left_anti")
            .select(col("event_type"), col("d"), lit(0L).as("dv")))
        val cw = Window.partitionBy("event_type").orderBy("d")
        pts.withColumn("wau", sum(col("dv")).over(cw))
          .join(days, Seq("event_type", "d"))
          .select(col("event_type"), col("d").as("day"), col("wau"))
          .orderBy("event_type", "day")
      },
      oracle = Some("""
        WITH ud AS (SELECT DISTINCT event_type, user_id,
                           CAST(date_trunc('day', ts) AS DATE) AS d
                    FROM events),
        days AS (SELECT DISTINCT event_type, d FROM ud)
        SELECT days.event_type, days.d AS day,
               count(DISTINCT ud.user_id) AS wau
        FROM days JOIN ud ON ud.event_type = days.event_type
                         AND ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── Cohort retention matrix ────────────────────────────────────────
    // The classic product-analytics triangle: users are cohorted by the
    // day of their FIRST qualifying event (here: 'purchase'), and each
    // cell counts how many of a cohort's users were active again
    // `day_offset` days later. Scale shape: the (user, day) activity
    // relation is distinct-reduced FIRST (the only corpus-sized
    // shuffle, keyed by user_id); the first-touch cohort is a groupBy
    // over that same user_id key — AQE/Exchange reuse keeps it one
    // physical shuffle — and the cohort join is user-keyed, never
    // row-expanding. The final matrix is |cohorts|×|offsets| ≈
    // metadata-sized at any corpus size (30 days → ≤465 cells).
    "e16_retention_cohorts" -> Q(
      run = (s, d) => {
        val act = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            to_date(date_trunc("day", col("ts"))).as("d"))
          .distinct()
        val first = act.groupBy("user_id").agg(min(col("d")).as("cohort"))
        act.join(first, "user_id")
          .groupBy(col("cohort"),
            datediff(col("d"), col("cohort")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort", "day_offset")
      },
      oracle = Some("""
        WITH act AS (SELECT DISTINCT user_id,
                            CAST(date_trunc('day', ts) AS DATE) AS d
                     FROM events WHERE event_type = 'purchase'),
        f AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY 1)
        SELECT cohort, CAST(d - cohort AS INT) AS day_offset,
               count(DISTINCT act.user_id) AS n_users
        FROM act JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── Daily-volume anomaly detection (z-score outlier days) ──────────
    // The ops-analytics alarm: per event type, flag days whose event
    // count sits ≥ 2σ from that type's daily mean. Moments are exact
    // integers (q34's trick: count/sum/sum-of-squares per type — a
    // metadata-sized two-phase agg), and the z-score is a FIXED
    // sequence of double ops on those exact ints, identical on both
    // engines, e6-rounded. Scale shape: one corpus-sized (type, day)
    // count agg, then everything downstream is |types|×|days| rows;
    // the per-type moment join broadcasts. Sample stddev (n-1).
    "e17_daily_anomaly" -> Q(
      run = (s, d) => {
        val dc = Tables.events(s, d)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        val st = dc.groupBy("event_type")
          .agg(count(lit(1)).as("nd"), sum(col("n")).as("sn"),
            sum(col("n") * col("n")).as("sn2"))
        val z = round(
          (col("n").cast("double") - col("sn").cast("double") / col("nd"))
            / sqrt((col("sn2").cast("double") * col("nd")
                - col("sn").cast("double") * col("sn"))
              / col("nd") / (col("nd") - lit(1)))
            * 1000000, 0).cast("long")
        dc.join(broadcast(st), "event_type")
          .select(col("event_type"), col("day"), col("n"),
            z.as("z_e6"))
          .withColumn("is_anomaly", abs(col("z_e6")) >= 2000000L)
          .orderBy("event_type", "day")
      },
      oracle = Some("""
        WITH dc AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                           count(*) AS n FROM events GROUP BY 1, 2),
        st AS (SELECT event_type, count(*) AS nd, CAST(sum(n) AS BIGINT) AS sn,
                      CAST(sum(n*n) AS BIGINT) AS sn2
               FROM dc GROUP BY 1)
        SELECT dc.event_type, dc.day, dc.n,
               CAST(round((CAST(dc.n AS DOUBLE) - CAST(sn AS DOUBLE) / nd)
                 / sqrt((CAST(sn2 AS DOUBLE) * nd - CAST(sn AS DOUBLE) * sn)
                        / nd / (nd - 1)) * 1000000) AS BIGINT) AS z_e6,
               abs(CAST(round((CAST(dc.n AS DOUBLE) - CAST(sn AS DOUBLE) / nd)
                 / sqrt((CAST(sn2 AS DOUBLE) * nd - CAST(sn AS DOUBLE) * sn)
                        / nd / (nd - 1)) * 1000000) AS BIGINT)) >= 2000000
                 AS is_anomaly
        FROM dc JOIN st USING (event_type)
        ORDER BY event_type, day""")),

    // ── Event-sequence transition matrix (first-order Markov model) ────
    // Per-user next-event transitions: what follows what, and with what
    // probability — the session-modeling / recommender-prior primitive.
    // One lead() window keyed by user_id (high cardinality, bounded
    // frames), one hash agg down to the |types|² transition matrix,
    // then a broadcast join against the |types|-row marginals. The
    // probability is integer ppm (n·1e6 div total) — cross-engine
    // exact. Ordering parity: (µs, event_id) like every events window.
    "e18_markov_transitions" -> Q(
      run = (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        val tr = ev
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val tots = tr.groupBy("event_type").agg(sum(col("n")).as("tot"))
        tr.join(broadcast(tots), "event_type")
          .select(col("event_type"), col("next_type"), col("n"),
            expr("n * 1000000L div tot").as("ppm"))
          .orderBy("event_type", "next_type")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
        tr0 AS (SELECT event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY us, event_id) AS next_type
                FROM ev),
        tr AS (SELECT event_type, next_type, count(*) AS n FROM tr0
               WHERE next_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
                FROM tr GROUP BY 1)
        SELECT tr.event_type, next_type, n, n * 1000000 // tot AS ppm
        FROM tr JOIN tot USING (event_type)
        ORDER BY event_type, next_type""")),

    // ── Inter-event latency percentiles (p50/p90/p99 gap per type) ─────
    // The arrival-process readout behind session-gap tuning (e03's 30 min
    // threshold), anomaly baselines (e17) and capacity models: per-type
    // distribution of the gap between a user's consecutive events. One
    // (user, type)-keyed lag window (high-cardinality partitioning,
    // bounded frames), then a per-type two-phase percentile aggregate —
    // gaps are exact integer µs, and the interpolated quantiles are
    // rounded to integer µs so the emitted cells are hash-stable even
    // if the engines' interpolation differs in the last ulp (at 1e11 µs
    // an ulp is ~1.5e-5 — far inside the round). At 100 TB the window
    // shuffle carries the events once; the percentile state is per-type.
    "e19_interevent_gaps" -> Q(
      run = (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("us"), col("event_id"))
        ev.withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            expr("CAST(round(percentile(gap, 0.5)) AS BIGINT)").as("p50_us"),
            expr("CAST(round(percentile(gap, 0.9)) AS BIGINT)").as("p90_us"),
            expr("CAST(round(percentile(gap, 0.99)) AS BIGINT)").as("p99_us"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us FROM events),
        g AS (SELECT event_type,
                     us - lag(us) OVER (PARTITION BY user_id, event_type
                                        ORDER BY us, event_id) AS gap
              FROM ev)
        SELECT event_type, count(*) AS n_gaps,
               CAST(round(quantile_cont(gap, 0.5)) AS BIGINT) AS p50_us,
               CAST(round(quantile_cont(gap, 0.9)) AS BIGINT) AS p90_us,
               CAST(round(quantile_cont(gap, 0.99)) AS BIGINT) AS p99_us
        FROM g WHERE gap IS NOT NULL
        GROUP BY 1 ORDER BY event_type""")),

    // ── Activity histogram (power-law / engagement-depth readout) ──────
    // How concentrated is activity? Per event type, bucket users by
    // their event count into power-of-two classes (1, 2-3, 4-7, …, 32+)
    // and report users and events per class — the engagement curve that
    // distinguishes a bot-heavy corpus (mass in the top bucket) from a
    // drive-by one (mass at 1). Shape: one (type, user) hash agg over
    // the corpus, then a class agg over the per-user table — the first
    // shuffle carries the data once, everything after is user-table
    // sized and partial-aggregated. Class edges are exact integer
    // comparisons; counts are BIGINT — nothing engine-sensitive.
    "e20_activity_histogram" -> Q(
      run = (s, d) => {
        val perUser = Tables.events(s, d)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val lo = when(col("n") === 1, 1L).when(col("n") <= 3, 2L)
          .when(col("n") <= 7, 4L).when(col("n") <= 15, 8L)
          .when(col("n") <= 31, 16L).otherwise(32L)
        val label = when(col("n") === 1, "1").when(col("n") <= 3, "2-3")
          .when(col("n") <= 7, "4-7").when(col("n") <= 15, "8-15")
          .when(col("n") <= 31, "16-31").otherwise("32+")
        perUser
          .select(col("event_type"), lo.as("bucket_lo"), label.as("bucket"),
            col("n"))
          .groupBy("event_type", "bucket_lo", "bucket")
          .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
          .orderBy("event_type", "bucket_lo")
      },
      oracle = Some("""
        WITH per_user AS (
          SELECT event_type, user_id, count(*) AS n
          FROM events GROUP BY 1, 2),
        b AS (
          SELECT event_type,
                 CASE WHEN n = 1 THEN 1 WHEN n <= 3 THEN 2
                      WHEN n <= 7 THEN 4 WHEN n <= 15 THEN 8
                      WHEN n <= 31 THEN 16 ELSE 32 END AS bucket_lo,
                 CASE WHEN n = 1 THEN '1' WHEN n <= 3 THEN '2-3'
                      WHEN n <= 7 THEN '4-7' WHEN n <= 15 THEN '8-15'
                      WHEN n <= 31 THEN '16-31' ELSE '32+' END AS bucket,
                 n
          FROM per_user)
        SELECT event_type, CAST(bucket_lo AS BIGINT) AS bucket_lo, bucket,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM b GROUP BY 1, 2, 3 ORDER BY event_type, bucket_lo""")),

    // ── Time-bounded funnel (conversion windows between stages) ────────
    // e10 with the constraint real funnel products enforce: each stage
    // must follow the previous within 24 h, or the journey doesn't
    // count (a purchase a month after the click is not attributable).
    // Same single-exchange shape as e10 — three chained conditional
    // mins over ONE user_id window partitioning, the gap bound is just
    // an extra predicate inside each min — so the bounded variant costs
    // exactly what the unbounded one does at any scale. The 24 h bound
    // genuinely bites on the fixture (150 view → 60 click → 25
    // purchase at sf0.01 vs e10's near-total conversion), so the
    // hash compare proves the window arithmetic, not just the chain.
    "e21_bounded_funnel" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val gapUs = 24L * 3600L * 1000000L
        val w = Window.partitionBy("user_id")
        val staged = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("us"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("us") > col("t1")
              && col("us") <= col("t1") + gapUs, col("us"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("us") > col("t2")
              && col("us") <= col("t2") + gapUs, col("us"))).over(w))
        staged.groupBy("user_id")
          .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
          .agg(count(lit(1)).as("n_users"),
            count(col("t1")).as("n_view"),
            count(col("t2")).as("n_view_click"),
            count(col("t3")).as("n_funnel"),
            sum(col("t3") - col("t1")).as("sum_funnel_us"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, min(us) FILTER (WHERE event_type = 'view') AS t1
               FROM e GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.us) AS t2
               FROM e JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.us > s1.t1
                 AND e.us <= s1.t1 + 86400000000 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.us) AS t3
               FROM e JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.us > s2.t2
                 AND e.us <= s2.t2 + 86400000000 GROUP BY 1)
        SELECT count(*) AS n_users,
               count(t1) AS n_view,
               count(t2) AS n_view_click,
               count(t3) AS n_funnel,
               CAST(sum(t3 - t1) AS BIGINT) AS sum_funnel_us
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // ── Watermark lateness accounting (batch twin of streaming
    //    late-data metrics) ──────────────────────────────────────────────
    // The question every watermark setting answers: "at delay D, how
    // much data would I have dropped?" The fixture's event_ids are
    // strictly time-ordered, so raw replay has zero lateness; arrival
    // disorder is simulated with a CONTENT-STABLE md5 jitter (≤ 1 h,
    // the p03 technique — deterministic across engines, unlike RNG).
    // Arrival batches are 30-min buckets of arrival time; the watermark
    // of batch b is the max EVENT time seen in earlier batches minus
    // D = 10 min; an event is late iff its event time < its batch's
    // watermark. Scale shape: one corpus shuffle on abatch for the
    // per-batch max/count (partial agg map-side), a metadata-sized
    // running max over the ~batch-count rows (unpartitioned window is
    // fine: rows = corpus / 30 min, not corpus), and the watermark
    // BROADCAST back onto the corpus for the late test — the corpus
    // never sorts globally and never moves twice on the same key.
    "e22_late_events" -> Q(
      run = (s, d) => {
        val jitterUs = 3600000000L   // ≤ 1 h simulated network disorder
        val batchUs  = 1800000000L   // 30-min arrival buckets
        val delayUs  = 600000000L    // withWatermark("10 minutes")
        val e = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("us"),
            (unix_micros(col("ts")) +
              conv(substring(md5(col("event_id").cast("string")), 1, 8),
                16, 10).cast("long") % jitterUs).as("arr"))
          .select(col("us"), expr(s"arr div ${batchUs}L").as("abatch"))
        val perBatch = e.groupBy("abatch")
          .agg(max("us").as("mx"), count(lit(1)).as("n_events"))
        // ~1437 rows at sf0.01: metadata, not data — the one place an
        // unpartitioned window is the right plan (SCALE.md e22)
        val wmW = Window.orderBy("abatch")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wm = perBatch.select(col("abatch"), col("n_events"),
          (max("mx").over(wmW) - delayUs).as("wm"))
        e.join(broadcast(wm), "abatch")
          .groupBy(col("abatch"), col("n_events"))
          .agg(sum(when(col("us") < col("wm"), 1L).otherwise(0L))
            .as("n_late"))
          .orderBy("abatch")
      },
      oracle = Some("""
        WITH e AS (
          SELECT epoch_us(ts) AS us,
                 (epoch_us(ts) + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                    % 3600000000) // 1800000000 AS abatch
          FROM events),
        pb AS (SELECT abatch, max(us) AS mx, count(*) AS n_events
               FROM e GROUP BY 1),
        wm AS (SELECT abatch, n_events,
                      max(mx) OVER (ORDER BY abatch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        - 600000000 AS wm
               FROM pb)
        SELECT w.abatch, CAST(w.n_events AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN e.us < w.wm THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late
        FROM e JOIN wm w USING (abatch)
        GROUP BY w.abatch, w.n_events ORDER BY w.abatch"""))
    ,

    // ── Watermark delay sweep (the curve that PICKS the delay) ─────────
    // e22 accounts lateness at one delay; this sweeps D ∈ {1 min,
    // 10 min, 1 h} in a single pass and emits the drop-rate curve —
    // the number a team actually stares at when trading staleness for
    // completeness. Because the delays are constants, the sweep costs
    // NOTHING extra at scale: the per-event watermark base joins back
    // once (broadcast, e22's shape) and the three delay thresholds are
    // three conditional sums inside ONE scalar aggregate — no
    // per-delay rescan, no cross join of the corpus; the 3-row curve
    // is unpivoted from the one-row aggregate with stack().
    "e23_delay_sweep" -> Q(
      run = (s, d) => {
        val jitterUs = 3600000000L
        val batchUs  = 1800000000L
        val e = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("us"),
            (unix_micros(col("ts")) +
              conv(substring(md5(col("event_id").cast("string")), 1, 8),
                16, 10).cast("long") % jitterUs).as("arr"))
          .select(col("us"), expr(s"arr div ${batchUs}L").as("abatch"))
        val perBatch = e.groupBy("abatch").agg(max("us").as("mx"))
        val wmW = Window.orderBy("abatch")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wm = perBatch.select(col("abatch"),
          max("mx").over(wmW).as("hi"))
        def late(delayUs: Long) =
          sum(when(col("us") < col("hi") - delayUs, 1L).otherwise(0L))
        e.join(broadcast(wm), "abatch")
          .agg(count(lit(1)).as("n_events"),
            late(60000000L).as("l1"),
            late(600000000L).as("l2"),
            late(3600000000L).as("l3"))
          .selectExpr("n_events",
            "stack(3, 60L, l1, 600L, l2, 3600L, l3) AS (delay_s, n_late)")
          .select(col("delay_s"), col("n_events"), col("n_late"),
            expr("n_late * 1000000L div n_events").as("late_ppm"))
          .orderBy("delay_s")
      },
      oracle = Some("""
        WITH e AS (
          SELECT epoch_us(ts) AS us,
                 (epoch_us(ts) + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                    % 3600000000) // 1800000000 AS abatch
          FROM events),
        pb AS (SELECT abatch, max(us) AS mx FROM e GROUP BY 1),
        wm AS (SELECT abatch,
                      max(mx) OVER (ORDER BY abatch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS hi
               FROM pb),
        j AS (SELECT e.us, w.hi FROM e JOIN wm w USING (abatch)),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CASE WHEN us < hi - 60000000
                                   THEN 1 ELSE 0 END) AS BIGINT) AS l1,
                     CAST(sum(CASE WHEN us < hi - 600000000
                                   THEN 1 ELSE 0 END) AS BIGINT) AS l2,
                     CAST(sum(CASE WHEN us < hi - 3600000000
                                   THEN 1 ELSE 0 END) AS BIGINT) AS l3
              FROM j)
        SELECT delay_s, n_events, n_late,
               n_late * 1000000 // n_events AS late_ppm
        FROM (SELECT CAST(60 AS BIGINT) AS delay_s, n_events, l1 AS n_late FROM a
              UNION ALL
              SELECT 600, n_events, l2 FROM a
              UNION ALL
              SELECT 3600, n_events, l3 FROM a)
        ORDER BY delay_s""")),

    // ── Peak concurrent sessions (sweep-line over session intervals) ───
    // Capacity planning from e03's sessions: how many sessions were
    // simultaneously active at the worst minute? The sweep-line
    // formulation keeps it scale-shaped where the naive minute×session
    // expansion would multiply the corpus by session length: each
    // session contributes exactly TWO delta rows (+1 at its start
    // minute, −1 one past its end minute), deltas hash-aggregate per
    // minute (one shuffle of 2 rows/session), and the running sum runs
    // over the DISTINCT-MINUTE relation — metadata bounded by the time
    // span (~526k rows/year at any corpus width), the e22 window
    // argument again. Peaks can only occur at delta minutes, so the
    // top-5 via TakeOrdered over that relation is exact.
    "e24_peak_concurrency" -> Q(
      run = (s, d) => {
        val sess = graft.SparkEntry.queries("e03_sessionize")(s, d)
          .select(expr("start_us div 60000000L").as("m0"),
            expr("(start_us + dur_us) div 60000000L + 1L").as("m1"))
        val deltas = sess.select(col("m0").as("minute"), lit(1L).as("d"))
          .union(sess.select(col("m1").as("minute"), lit(-1L).as("d")))
          .groupBy("minute").agg(sum("d").as("delta"))
        val w = Window.orderBy("minute")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas
          .withColumn("n_active", sum(col("delta")).over(w))
          .select(col("minute"), col("n_active"))
          .orderBy(col("n_active").desc, col("minute"))
          .limit(5)
      },
      oracle = Some("""
        WITH t AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        flagged AS (
          SELECT user_id, event_id, us,
                 CASE WHEN lag(us, 1) OVER w IS NULL
                        OR us - lag(us, 1) OVER w > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        sessions AS (
          SELECT user_id, us,
                 sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess_id
          FROM flagged),
        iv AS (SELECT min(us) // 60000000 AS m0,
                      max(us) // 60000000 + 1 AS m1
               FROM sessions GROUP BY user_id, sess_id),
        deltas AS (
          SELECT minute, CAST(sum(d) AS BIGINT) AS delta FROM (
            SELECT m0 AS minute, 1 AS d FROM iv
            UNION ALL SELECT m1, -1 FROM iv)
          GROUP BY 1),
        run AS (SELECT CAST(minute AS BIGINT) AS minute,
                       CAST(sum(delta) OVER (ORDER BY minute
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS n_active
                FROM deltas)
        SELECT minute, n_active FROM run
        ORDER BY n_active DESC, minute LIMIT 5""")),

    // ── Negative-condition sequence pattern (MATCH_RECOGNIZE class) ────
    // "view followed by purchase within 24 h with NO error in between" —
    // the pattern e10/e21's chained conditional mins CANNOT express,
    // because they only constrain what must happen, not what must NOT
    // happen in the gap. Formulation: two forward-looking windows per
    // view row (next purchase µs, next error µs — min over a
    // [1 FOLLOWING, UNBOUNDED] frame gated by type) on ONE user_id
    // partitioning; the classification is then row-local arithmetic:
    //   no_purchase_24h | converted_clean | converted_with_error.
    // Strictly-after is by (ts, event_id) row order, so ties are
    // deterministic in both engines. Scale posture: e10's cost envelope
    // exactly — one user-keyed exchange carries the corpus, both
    // windows and the classifier ride it, and the rollup is 3 rows.
    "e25_sequence_pattern" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dayUs = 86400000000L
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(1, Window.unboundedFollowing)
        val classed = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("next_purchase",
            min(when(col("event_type") === "purchase", col("us"))).over(w))
          .withColumn("next_error",
            min(when(col("event_type") === "error", col("us"))).over(w))
          .filter(col("event_type") === "view")
          .withColumn("outcome",
            when(col("next_purchase").isNull
              || col("next_purchase") - col("us") > dayUs,
              lit("no_purchase_24h"))
              .when(col("next_error").isNotNull
                && col("next_error") < col("next_purchase"),
                lit("converted_with_error"))
              .otherwise(lit("converted_clean")))
        classed.groupBy("outcome")
          .agg(count(lit(1)).as("n_views"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("outcome")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
                   FROM events),
        nx AS (SELECT user_id, event_id, event_type, us,
                      min(CASE WHEN event_type = 'purchase' THEN us END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN 1 FOLLOWING
                              AND UNBOUNDED FOLLOWING) AS next_purchase,
                      min(CASE WHEN event_type = 'error' THEN us END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN 1 FOLLOWING
                              AND UNBOUNDED FOLLOWING) AS next_error
               FROM e),
        cl AS (SELECT CASE
                 WHEN next_purchase IS NULL
                   OR next_purchase - us > 86400000000 THEN 'no_purchase_24h'
                 WHEN next_error IS NOT NULL
                   AND next_error < next_purchase THEN 'converted_with_error'
                 ELSE 'converted_clean' END AS outcome, user_id
               FROM nx WHERE event_type = 'view')
        SELECT outcome, count(*) AS n_views,
               count(DISTINCT user_id) AS n_users
        FROM cl GROUP BY 1 ORDER BY outcome""")),

    // ── Point-in-time feature join (training-serving skew killer) ──────
    // The feature-store primitive: enrich each PURCHASE with the
    // dimension version valid AT THAT MOMENT (e14's SCD2 intervals —
    // here "the user's current activity state"), never the current one
    // — joining training rows to today's features leaks the future.
    // Because SCD2 versions tile each user's timeline, "the version
    // whose interval contains ts" IS "the latest valid_from ≤ ts", so
    // the native AsOfJoin operator (e06) answers it with one
    // sort-merge pass — no interval blow-up. Same-timestamp version
    // ties are collapsed first (max first_event_id wins — the empty
    // [t,t) interval the loser leaves behind matches nothing anyway),
    // making the as-of target unique per (user, valid_from) and the
    // result engine-deterministic. The oracle is the INDEPENDENT
    // formulation — an explicit validity-interval join — so the two
    // agreeing cross-checks the as-of reduction itself.
    "e26_pit_feature_join" -> Q(
      run = (s, d) => {
        val w2 = Window.partitionBy("user_id", "valid_from_us")
          .orderBy(col("first_event_id").desc)
        val dim = graft.SparkEntry.queries("e14_scd2_dimension")(s, d)
          .withColumn("rn", row_number().over(w2))
          .filter(col("rn") === 1)
          .select(col("user_id").as("rk"),
            col("valid_from_us").as("rts"), col("attr"))
        val purchases = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("lk"),
            unix_micros(col("ts")).as("lts"))
        graft.plans.AsOfJoinOps.asof(s, purchases, dim, "lk", "rk",
            "lts", "rts")
          .select(col("event_id"), col("attr").as("state_at_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH o AS (SELECT user_id, event_id, event_type,
                          epoch_us(ts) AS ts_us,
                          lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev
                   FROM events),
        starts AS (SELECT user_id, event_id, event_type, ts_us
                   FROM o WHERE prev IS NULL OR prev <> event_type),
        iv AS (SELECT user_id, event_id AS first_event_id,
                      event_type AS attr, ts_us AS valid_from_us,
                      lead(ts_us) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) AS valid_to_us
               FROM starts),
        dim AS (SELECT user_id, attr, valid_from_us, valid_to_us FROM
                  (SELECT *, row_number() OVER (
                     PARTITION BY user_id, valid_from_us
                     ORDER BY first_event_id DESC) AS rn FROM iv)
                WHERE rn = 1)
        SELECT e.event_id, d.attr AS state_at_purchase
        FROM events e LEFT JOIN dim d
          ON e.user_id = d.user_id
         AND epoch_us(e.ts) >= d.valid_from_us
         AND (d.valid_to_us IS NULL OR epoch_us(e.ts) < d.valid_to_us)
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id""")),

    // ── Dynamic-gap sessionization (per-event inactivity window) ───────
    // e09's native session_window with the gap as an EXPRESSION: a
    // purchase closes its session after 5 minutes (checkout ends the
    // visit), anything else keeps the usual 30-minute window — the
    // per-event-type timeout real session models use. Semantically each
    // event spans [ts, ts+gap(event)) and overlapping spans merge
    // (interval union), which the DuckDB twin replays directly: a new
    // session starts exactly when an event's ts clears the running max
    // of all previous spans' ends (one ordered window per user), and a
    // session's end is the max member end — e03's flag-sum trick with a
    // running-max break condition instead of a fixed lag gap.
    // Scale posture: ONE SessionWindowing aggregate on Spark (same
    // plan class as e09, no window function at all); the oracle side's
    // two windows ride one user partitioning.
    "e27_dynamic_session_gap" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"),
            session_window(col("ts"),
              when(col("event_type") === "purchase", lit("5 minutes"))
                .otherwise(lit("30 minutes"))).as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("w.start")).as("start_us"),
            unix_micros(col("w.end")).as("end_us"),
            col("n_events"))
          .orderBy("user_id", "start_us"),
      oracle = Some("""
        WITH t AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CASE WHEN event_type = 'purchase'
                      THEN 300 * 1000000 ELSE 1800 * 1000000 END AS gap_us
          FROM events),
        flagged AS (
          SELECT user_id, event_id, us, gap_us,
                 CASE WHEN max(us + gap_us) OVER (PARTITION BY user_id
                        ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR us >= max(us + gap_us) OVER (PARTITION BY user_id
                        ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 1 ELSE 0 END AS new_sess
          FROM t),
        sessions AS (
          -- (us, event_id) tie-break carried through (e03's discipline):
          -- ordering the running sum by us alone lets DuckDB place a
          -- tied new_sess=0 row before the flagged row and split
          -- same-timestamp events across sessions
          SELECT user_id, us, gap_us,
                 sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM flagged)
        SELECT user_id, min(us) AS start_us,
               max(us + gap_us) AS end_us,
               count(*) AS n_events
        FROM sessions GROUP BY user_id, sess_id
        ORDER BY user_id, start_us""")),

    // ── EWMA smoothing of the daily series (dyadic-exact) ──────────────
    // e17 flags anomalies against a trailing MEAN; operations teams
    // smooth with an EWMA (recent days weigh more). The recursion
    // EWMA_t = α·x_t + (1−α)·EWMA_{t−1} unrolls to Σ α(1−α)^j·x_{t−j},
    // which a ROWS window can't weight per-offset — so: 8 explicit
    // lag() terms on ONE (type)-keyed day-ordered window. α = 1/2 on
    // purpose: every coefficient 1e8/2^(j+1) is an EXACT integer (10^8
    // carries 2^8), so the smoothed value is pure int64 multiply-add —
    // no float power chain for engines to disagree on. Truncation at 8
    // terms drops 2^-8 ≈ 0.4% of the mass (documented, not
    // renormalized); missing leading lags coalesce to 0, so early days
    // are biased low in BOTH engines identically — the
    // observation-indexed (not calendar-decay) EWMA, same convention
    // as pandas ewm(adjust=False) over the observed series. Scale:
    // the day-grain series is metadata-sized after one corpus
    // aggregate; the window is per-type over ~|days| rows.
    "e28_ewma_smoothing" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        val daily = Tables.events(s, d)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val sm = (0 until 8).map { j =>
          coalesce(lag(col("n"), j).over(w), lit(0L)) *
            lit(100000000L / (1L << (j + 1)))
        }.reduce(_ + _)
        daily.withColumn("ewma_e8", sm.cast("long"))
          .select(col("day"), col("event_type"), col("n"), col("ewma_e8"))
          .orderBy("day", "event_type")
      },
      oracle = Some {
        val terms = (0 until 8).map { j =>
          s"coalesce(lag(n, $j) OVER (PARTITION BY event_type ORDER BY day), 0)" +
            s" * ${100000000L / (1L << (j + 1))}"
        }.mkString(" + ")
        s"""
        WITH daily AS (
          SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                 event_type, count(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT day, event_type, n,
               CAST($terms AS BIGINT) AS ewma_e8
        FROM daily ORDER BY day, event_type"""
      }),

    // ── Last-touch attribution (purchase → preceding click channel) ────
    // The marketing twin of e25's negative pattern: each purchase is
    // credited to the channel of the user's most recent PRECEDING click
    // (none → 'direct'), then revenue rolls up per channel. "Most
    // recent preceding" is last(ignoreNulls) over a [unbounded, 1
    // PRECEDING] frame ordered by (us, event_id) — the e05 running-
    // carry trick reused as attribution, one user-keyed exchange, no
    // self-join, no per-purchase backward scan. Channel is a
    // deterministic bucket of the click's props.k (the fixture's only
    // dimension); revenue in exact cents. Scale: the window rides the
    // same user_id partitioning as every session/funnel query, and the
    // rollup is 5 rows.
    "e29_attribution" -> Q(
      run = (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("value"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
        e.withColumn("last_click_k",
            last(when(col("event_type") === "click", col("k")), true).over(w))
          .filter(col("event_type") === "purchase")
          .withColumn("channel",
            when(col("last_click_k").isNull, lit("direct"))
              .otherwise(concat(lit("ch"), col("last_click_k") % 4)))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"),
            sum(cents(col("value"))).as("revenue_cents"))
          .orderBy("channel")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                          value,
                          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                   FROM events),
        lc AS (SELECT *,
                      last_value(CASE WHEN event_type = 'click' THEN k END
                        IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS last_click_k
               FROM e)
        SELECT CASE WHEN last_click_k IS NULL THEN 'direct'
                    ELSE 'ch' || CAST(last_click_k % 4 AS VARCHAR) END
                 AS channel,
               count(*) AS n_purchases,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lc WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY channel"""))
  )
}
