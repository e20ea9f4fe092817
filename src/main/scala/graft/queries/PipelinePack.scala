package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-data pipeline composition — the reason the
  * individual operators exist: quality-filter the corpus, drop
  * near-duplicates (MinHash+LSH pairs, keep the lower doc_id of each
  * pair), and report what survives. One query, one oracle, exercising
  * the t02 scoring and d03 dedup pipelines as stages of a single plan.
  *
  * Scale posture: quality scoring is a narrow map; the dedup-pair
  * relation is the (materialized) d03 output, orders of magnitude
  * smaller than the corpus; the drop is a broadcast-able anti-join on
  * doc_id. This is the shape of a real corpus-preparation job at
  * 100 TB: score → pair → anti-join → write.
  */
object PipelinePack extends QueryPack {

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private def sqlStop = stop.map(s => s"'$s'").mkString(", ")
  private val qualityThreshold = 3000L

  /** Hard ceiling on a canary list. The p22 broadcast contains-scan is
    * adjudicated as a tiny-broadcast BNLJ *because* benchmark canary
    * sets are dozens of strings by construction; a corpus-proportional
    * list would silently turn it into an O(n·m) substring sweep. */
  val MaxCanaries = 1000L

  /** The p22 scan shape, guarded: canaries (canary_doc, canary) must be
    * a bounded list — the guard counts at most MaxCanaries+1 rows (one
    * `limit` scan, never a full count of an oversized relation) and
    * refuses to broadcast anything bigger. */
  def canaryScan(docs: DataFrame, canaries: DataFrame): DataFrame = {
    val n = canaries.limit((MaxCanaries + 1).toInt).count()
    require(n <= MaxCanaries,
      s"canary list has >$MaxCanaries entries ($n+): the broadcast " +
        "contains-scan is only valid for a fixed benchmark canary set, " +
        "not a corpus-derived list — route a large list through the " +
        "n-gram decontamination join (p06/p17) instead")
    docs.join(broadcast(canaries), expr("contains(text, canary)"))
      .groupBy("canary_doc")
      .agg(count(lit(1)).as("n_hits"),
        min(col("doc_id")).as("first_hit_doc"))
      .orderBy("canary_doc")
  }

  def queries: Seq[(String, Q)] = Seq(
    "p01_corpus_pipeline" -> Q(
      run = (s, d) => {
        val toks = split(col("text"), " ")
        val nStop = size(filter(toks, t => t.isin(stop: _*)))
        val quality = round(nStop * lit(5000.0) / size(toks)
          + least(col("n_chars"), lit(500)) * lit(5000.0) / lit(500.0), 0)
          .cast("long")
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), size(toks).as("n_tokens"),
            quality.as("quality_e4"))
        // near-dup pairs from the d03 pipeline; drop the higher id
        val dupDrop = graft.SparkEntry.queries("d03_minhash_lsh")(s, d)
          .select(col("db").as("drop_id")).distinct()
        // one pass: flag each doc, aggregate every pipeline counter in a
        // single job (vs. four separate aggregation jobs)
        val keep = col("quality_e4") >= qualityThreshold && col("drop_id").isNull
        scored
          .join(broadcast(dupDrop), col("doc_id") === col("drop_id"), "left")
          .agg(count(lit(1)).as("n_docs"),
            count(when(keep, lit(1))).as("n_kept"),
            count(when(col("quality_e4") < qualityThreshold, lit(1)))
              .as("n_low_quality"),
            count(col("drop_id")).as("n_dup_docs"),
            sum(when(keep, col("n_tokens"))).as("kept_tokens"))
      },
      oracle = Some {
        // reuse the d03 oracle verbatim as the pair CTE
        val d03Sql = DedupPack.queries
          .collectFirst { case ("d03_minhash_lsh", q) => q.oracle.get }.get
        s"""
        WITH scored AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                 CAST(round(len(list_filter(string_split(text, ' '),
                        t -> t IN ($sqlStop))) * 5000.0
                        / len(string_split(text, ' '))
                      + least(n_chars, 500) * 5000.0 / 500.0) AS BIGINT) AS quality_e4
          FROM documents),
        pairs AS ($d03Sql),
        dup_drop AS (SELECT DISTINCT db AS drop_id FROM pairs)
        SELECT count(*) AS n_docs,
               count(CASE WHEN quality_e4 >= $qualityThreshold AND drop_id IS NULL THEN 1 END) AS n_kept,
               count(CASE WHEN quality_e4 < $qualityThreshold THEN 1 END) AS n_low_quality,
               count(drop_id) AS n_dup_docs,
               CAST(sum(CASE WHEN quality_e4 >= $qualityThreshold AND drop_id IS NULL THEN n_tokens END) AS BIGINT) AS kept_tokens
        FROM scored LEFT JOIN dup_drop ON doc_id = drop_id"""
      },
      bench = true),

    // ── Materialized deduped corpus: the surviving doc ids ─────────────
    // the write-side twin of p01's counters — what a corpus-prep job
    // actually emits (here the id list; at scale, the filtered rows to
    // a partitioned sink via graft.sources.Layout)
    "p02_kept_ids" -> Q(
      run = (s, d) => {
        val toks = split(col("text"), " ")
        val nStop = size(filter(toks, t => t.isin(stop: _*)))
        val quality = round(nStop * lit(5000.0) / size(toks)
          + least(col("n_chars"), lit(500)) * lit(5000.0) / lit(500.0), 0)
          .cast("long")
        val dupDrop = graft.SparkEntry.queries("d03_minhash_lsh")(s, d)
          .select(col("db").as("drop_id")).distinct()
        Tables.documents(s, d)
          .select(col("doc_id"), quality.as("quality_e4"))
          .filter(col("quality_e4") >= qualityThreshold)
          .join(broadcast(dupDrop), col("doc_id") === col("drop_id"), "left_anti")
          .select(col("doc_id"), col("quality_e4"))
          .orderBy("doc_id")
      },
      oracle = Some {
        val d03Sql = DedupPack.queries
          .collectFirst { case ("d03_minhash_lsh", q) => q.oracle.get }.get
        s"""
        WITH scored AS (
          SELECT doc_id,
                 CAST(round(len(list_filter(string_split(text, ' '),
                        t -> t IN ($sqlStop))) * 5000.0
                        / len(string_split(text, ' '))
                      + least(n_chars, 500) * 5000.0 / 500.0) AS BIGINT) AS quality_e4
          FROM documents),
        pairs AS ($d03Sql)
        SELECT doc_id, quality_e4 FROM scored
        WHERE quality_e4 >= $qualityThreshold
          AND doc_id NOT IN (SELECT DISTINCT db FROM pairs)
        ORDER BY doc_id"""
      }),

    // ── Bloom-pruned anti-join (drop list too large to broadcast) ──────
    // p02 broadcasts its drop list — right whenever the list fits in
    // executor memory. At 100 TB a dedup pass can drop billions of ids,
    // and the classic fix is a Bloom filter built FROM the drop side:
    // a Bloom filter has no false negatives, so every row it rejects is
    // provably not in the drop list and is kept outright, never touching
    // a join; only the "maybe" sliver (true drops + fpp · rest) goes
    // through the exact anti-join to resolve false positives. The
    // output is therefore EXACTLY the anti-join's — same oracle shape
    // as p02 — while the join input shrinks from the corpus to the
    // sliver. The filter is built with Spark's distributed BloomFilter
    // aggregate (partial filters OR-merged at the driver, then
    // broadcast); the per-row probe is one UDF'd hash — the one place a
    // UDF carries its weight, since the broadcast filter object has no
    // Column-function equivalent.
    "p04_bloom_prune" -> Q(
      run = (s, d) => {
        val toks = split(col("text"), " ")
        val nStop = size(filter(toks, t => t.isin(stop: _*)))
        val quality = round(nStop * lit(5000.0) / size(toks)
          + least(col("n_chars"), lit(500)) * lit(5000.0) / lit(500.0), 0)
          .cast("long")
        val dupDrop = graft.SparkEntry.queries("d03_minhash_lsh")(s, d)
          .select(col("db").as("drop_id")).distinct()
        val bloom = dupDrop.stat.bloomFilter("drop_id",
          expectedNumItems = 100000, fpp = 0.01)
        val bloomB = s.sparkContext.broadcast(bloom)
        val mightContain = udf((id: Long) => bloomB.value.mightContain(id))
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), quality.as("quality_e4"))
          .filter(col("quality_e4") >= qualityThreshold)
        val definitelyKept = scored.filter(!mightContain(col("doc_id")))
        val resolved = scored.filter(mightContain(col("doc_id")))
          .join(dupDrop, col("doc_id") === col("drop_id"), "left_anti")
        definitelyKept.union(resolved)
          .select(col("doc_id"), col("quality_e4"))
          .orderBy("doc_id")
      },
      oracle = Some {
        val d03Sql = DedupPack.queries
          .collectFirst { case ("d03_minhash_lsh", q) => q.oracle.get }.get
        s"""
        WITH scored AS (
          SELECT doc_id,
                 CAST(round(len(list_filter(string_split(text, ' '),
                        t -> t IN ($sqlStop))) * 5000.0
                        / len(string_split(text, ' '))
                      + least(n_chars, 500) * 5000.0 / 500.0) AS BIGINT) AS quality_e4
          FROM documents),
        pairs AS ($d03Sql)
        SELECT doc_id, quality_e4 FROM scored
        WHERE quality_e4 >= $qualityThreshold
          AND doc_id NOT IN (SELECT DISTINCT db FROM pairs)
        ORDER BY doc_id"""
      }),

    // ── Deterministic train/val/test split by content-stable hash ──────
    // The standard reproducible-split technique: bucket = md5(doc_id)
    // mod 100 → 80/10/10. Hash-based (not RNG-based) so the assignment
    // is stable across engines, runs, partitionings, and re-shards —
    // exactly why real pipelines split this way (the technique s06
    // adopted in round 8, making the whole registry oracle-checkable).
    "p03_hash_split" -> Q(
      run = (s, d) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long") % 100
        val split = when(bucket < 80, "train")
          .when(bucket < 90, "val").otherwise("test")
        Tables.documents(s, d)
          .select(split.as("split"), col("n_chars"),
            size(org.apache.spark.sql.functions.split(col("text"), " "))
              .as("n_tokens"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            sum(col("n_chars").cast("long")).as("total_chars"))
          .orderBy("split")
      },
      oracle = Some("""
        SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b,
                     len(string_split(text, ' ')) AS n_tokens, n_chars
              FROM documents)
        GROUP BY 1 ORDER BY split""")),

    // ── Stratified deterministic sampling (per-language rates) ─────────
    // Corpus rebalancing: keep English-heavy strata at a low rate and
    // upweight rare languages — per-stratum Bernoulli by CONTENT-STABLE
    // hash, not RNG (same technique as p03, same reason it is
    // reproducible across engines, runs, and re-shards; Spark's own
    // sampleBy is RNG-seeded and NOT cross-engine checkable, which is
    // exactly why pipelines prefer hash gates). One narrow map + one
    // aggregate; no shuffle before the final tiny agg.
    "p05_stratified_sample" -> Q(
      run = (s, d) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long") % 100
        val rate = when(col("lang") === "en", 25)
          .when(col("lang") === "zh", 80)
          .otherwise(60)
        Tables.documents(s, d)
          .filter(bucket < rate)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_chars").cast("long")).as("sampled_chars"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, count(*) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        FROM (SELECT lang, n_chars,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b,
                     CASE WHEN lang = 'en' THEN 25
                          WHEN lang = 'zh' THEN 80 ELSE 60 END AS rate
              FROM documents)
        WHERE b < rate
        GROUP BY 1 ORDER BY lang""")),

    // ── Benchmark decontamination (n-gram overlap) ─────────────────────
    // The eval-set hygiene pass every training pipeline runs before a
    // model sees the corpus: flag any training doc sharing ≥1 distinct
    // 8-gram with a held-out benchmark set (GPT-3/PaLM-style n-gram
    // decontamination; 8 fits the fixture's 10–100-token docs). The
    // "benchmark" here is the deterministic doc_id % 50 == 0 slice so
    // the oracle can recompute it. Scale posture: real benchmark suites
    // are tiny and FIXED-size while the corpus grows — so the benchmark
    // n-gram dictionary is distinct-ed and BROADCAST, the corpus makes
    // one narrow map-side pass against it, and the only shuffle is the
    // per-doc overlap count on the (rare) hits. No corpus-sized join
    // state anywhere.
    "p06_decontaminate" -> Q(
      run = (s, d) => {
        val grams = expr(
          """transform(sequence(1, size(split(text, ' ')) - 7),
            |  i -> array_join(slice(split(text, ' '), i, 8), ' '))""".stripMargin)
        def flat = Tables.documents(s, d)
          .filter(size(split(col("text"), " ")) >= 8)
          .select(col("doc_id"), explode(grams).as("g"))
        val bench = flat.filter(col("doc_id") % 50 === 0)
          .select("g").distinct()
        flat.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(bench), "g")
          .groupBy("doc_id")
          .agg(countDistinct(col("g")).as("n_overlap"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        flat AS (SELECT doc_id,
                        unnest(list_transform(range(1, len(w) - 6),
                          i -> array_to_string(w[i:i+7], ' '))) AS g
                 FROM w),
        bench AS (SELECT DISTINCT g FROM flat WHERE doc_id % 50 = 0)
        SELECT f.doc_id, count(DISTINCT f.g) AS n_overlap
        FROM flat f JOIN bench b ON f.g = b.g
        WHERE f.doc_id % 50 <> 0
        GROUP BY f.doc_id ORDER BY f.doc_id""")),

    // ── Data-quality constraint gate (Deequ-style checks) ──────────────
    // The validation stage a pipeline runs before promoting a batch:
    // each check is one declarative aggregate (uniqueness, referential
    // integrity, null fraction, range) emitting (rows checked,
    // violations) — the job fails downstream iff any violations > 0.
    // Every check is its own scan+aggregate unioned into one result;
    // at 100 TB each is embarrassingly parallel (two-phase aggs, one
    // anti-join for the FK check) and the union is 5 one-row branches.
    "p07_quality_checks" -> Q(
      run = (s, d) => {
        val orders = Tables.orders(s, d)
        val lineitem = Tables.lineitem(s, d)
        val events = Tables.events(s, d)
        def shape(name: String, df: org.apache.spark.sql.DataFrame) =
          df.select(lit(name).as("check"),
            col("n_checked").cast("long"), col("violations").cast("long"))
        val pk = shape("orders_pk_unique",
          orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
            .agg(sum(col("c")).as("n_checked"),
              sum(when(col("c") > 1, col("c")).otherwise(0L)).as("violations")))
        // n_checked = -1: "not a row-fraction check" sentinel (the FK
        // check counts orphans, the denominator lives in other checks)
        val fk = shape("lineitem_fk_orders",
          lineitem.join(orders,
            col("l_orderkey") === col("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("violations"))
            .withColumn("n_checked", lit(-1L)))
        val nn = shape("orders_custkey_nonnull",
          orders.agg(count(lit(1)).as("n_checked"),
            sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
              .as("violations")))
        val rng = shape("lineitem_qty_range",
          lineitem.agg(count(lit(1)).as("n_checked"),
            sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
              .otherwise(0L)).as("violations")))
        val ev = shape("events_value_nonneg",
          events.agg(count(lit(1)).as("n_checked"),
            sum(when(col("value") < 0, 1L).otherwise(0L)).as("violations")))
        pk.union(fk).union(nn).union(rng).union(ev).orderBy("check")
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT 'orders_pk_unique' AS check,
                 CAST(sum(c) AS BIGINT) AS n_checked,
                 CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS violations
          FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
          UNION ALL
          SELECT 'lineitem_fk_orders', -1,
                 CAST(count(*) AS BIGINT)
          FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'orders_custkey_nonnull', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'lineitem_qty_range', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                          THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'events_value_nonneg', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM events)
        ORDER BY "check"""")),

    // ── Source-mix report (data mixing / dataset card) ─────────────────
    // Per (source, lang): document and token volume plus each cell's
    // integer-exact ppm share of all tokens — the mixing table every
    // corpus release publishes and every sampling-weights decision
    // reads. One partial-aggregated groupBy; the ppm division runs
    // over the ~|sources|×|langs| aggregate, so the unpartitioned
    // window is over a handful of rows, never the data.
    "p08_source_mix" -> Q(
      run = (s, d) => {
        val toks = size(split(col("text"), " "))
        Tables.documents(s, d)
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(toks.cast("long")).as("n_tokens"))
          .withColumn("share_ppm",
            expr("(n_tokens * 1000000) div sum(n_tokens) over ()"))
          .orderBy("source", "lang")
      },
      oracle = Some("""
        WITH m AS (
          SELECT source, lang, count(*) AS n_docs,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1, 2)
        SELECT source, lang, n_docs, n_tokens,
               CAST((n_tokens * 1000000) // (sum(n_tokens) OVER ()) AS BIGINT)
                 AS share_ppm
        FROM m ORDER BY source, lang""")),

    // ── Incremental materialized-view maintenance ──────────────────────
    // The always-on pipeline's cheapest trick: a daily rollup MV is
    // kept fresh by aggregating ONLY the delta (rows after the last
    // refresh cutoff) and algebraically MERGING partial aggregates
    // with the stored MV — sum-of-sums and sum-of-counts — instead of
    // re-reading history. Here both halves are computed from the
    // fixture (there is no stored state in a query), but the plan
    // shape is the real one: the pre-cutoff branch stands in for the
    // stored MV table, the cutoff deliberately lands MID-DAY so the
    // boundary day genuinely merges two partials, and the final
    // groupBy proves count/sum are re-aggregable. At 100 TB the left
    // branch is a tiny MV table scan and only the delta's raw bytes
    // are touched per refresh.
    "p09_incremental_mv" -> Q(
      run = (s, d) => {
        import graft.queries.Cents.cents
        val cut = lit("2024-01-15 12:00:00").cast("timestamp")
        val e = Tables.events(s, d)
          .select(col("ts"), to_date(col("ts")).as("day"),
            col("event_type"), cents(col("value")).as("v"))
        def rollup(part: DataFrame): DataFrame = part
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("cents"))
        val mv = rollup(e.filter(col("ts") < cut))     // "stored" MV
        val delta = rollup(e.filter(col("ts") >= cut)) // fresh rows only
        mv.unionByName(delta)
          .groupBy("day", "event_type")                // algebraic merge
          .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("n"), col("cents"))
          .orderBy("day", "event_type")
      },
      oracle = Some("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type, count(*) AS n,
               CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),

    // ── Sequence packing for training batches ──────────────────────────
    // The last step before a trainer sees the corpus: concatenate
    // documents in a deterministic order and cut 2048-token training
    // sequences, reporting per-bin document count and fill. Contract =
    // contiguous packing (docs appended in (source, doc_id) order; a
    // doc belongs to the bin its EXCLUSIVE token prefix-sum lands in),
    // which is exactly what a streaming packer produces and — unlike
    // greedy best-fit bin packing — is order-deterministic, so the
    // oracle can replay it. One keyed window (prefix sum per source) +
    // one hash aggregate. Scale posture: packing is per-source so the
    // window partitions by source; a skew-heavy source would pack per
    // (source, shard-of-doc_id) — same plan, finer key, noted here
    // rather than built.
    "p10_sequence_pack" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("cum_before",
            coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("bin", expr("cum_before div 2048"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("source", "bin")
      },
      oracle = Some("""
        WITH t AS (
          SELECT source, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT source, doc_id, n_tokens,
                 COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM t)
        SELECT source, CAST(cum_before // 2048 AS BIGINT) AS bin,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1, 2 ORDER BY source, bin""")),

    // ── Temperature-scaled source mixing weights ───────────────────────
    // The sampling-weights table of a multi-source training mix:
    // raw proportional weights overfit the biggest source, so corpora
    // mix with temperature — weight ∝ share^(1/T), here T=2 (the
    // common upsample-the-tail setting), i.e. w ∝ √tokens. Exactness:
    // √ is the ONE power that is IEEE-correctly-rounded in every
    // engine (a general pow(x, 1/T) is libm-dependent and NOT
    // cross-engine stable), and it is applied to an exactly-
    // representable integer, so floor(√n)::BIGINT is deterministic on
    // both sides; the ppm normalizations are integer div over integer
    // window sums. Scale posture: one partial-aggregated groupBy to
    // |sources| rows; both ppm windows run over that metadata-sized
    // aggregate (p08's pattern).
    "p11_temperature_mix" -> Q(
      run = (s, d) => {
        val toks = size(split(col("text"), " ")).cast("long")
        Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(toks).as("n_tokens"))
          .withColumn("w", floor(sqrt(col("n_tokens"))))
          .withColumn("raw_ppm",
            expr("(n_tokens * 1000000) div sum(n_tokens) over ()"))
          .withColumn("weight_ppm",
            expr("(w * 1000000) div sum(w) over ()"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("raw_ppm"), col("weight_ppm"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH m AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1),
        w AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w FROM m)
        SELECT source, n_docs, n_tokens,
               CAST((n_tokens * 1000000) // (sum(n_tokens) OVER ()) AS BIGINT)
                 AS raw_ppm,
               CAST((w * 1000000) // (sum(w) OVER ()) AS BIGINT)
                 AS weight_ppm
        FROM w ORDER BY source""")),

    // ── Token-budget curriculum selection (quality-ranked greedy) ──────
    // Data selection under a budget — the QuRating/DsDm-style step
    // where each source contributes its BEST documents until a token
    // budget fills: rank docs by quality (desc, doc_id tiebreak for a
    // total order), keep while the EXCLUSIVE token prefix-sum is under
    // budget (so the doc that straddles the boundary is kept — the
    // streaming-selector contract, same as p10's packing). One keyed
    // window (prefix sum per source) + one aggregate; the shuffle key
    // is source, so a skew-heavy source shards to (source, hash
    // bucket) exactly like p10 — noted, not built.
    "p12_token_budget" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 2000L
        val toks = split(col("text"), " ")
        val nStop = size(filter(toks, t => t.isin(stop: _*)))
        val quality = round(nStop * lit(5000.0) / size(toks)
          + least(col("n_chars"), lit(500)) * lit(5000.0) / lit(500.0), 0)
          .cast("long")
        val w = Window.partitionBy("source")
          .orderBy(col("quality_e4").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            quality.as("quality_e4"))
          .withColumn("cum_before",
            coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .filter(col("cum_before") < budget)
          .groupBy("source")
          .agg(count(lit(1)).as("n_selected"),
            sum(col("n_tokens")).as("selected_tokens"),
            min(col("quality_e4")).as("min_quality_e4"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH scored AS (
          SELECT source, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(round(len(list_filter(string_split(text, ' '),
                        t -> t IN ($sqlStop))) * 5000.0
                        / len(string_split(text, ' '))
                      + least(n_chars, 500) * 5000.0 / 500.0) AS BIGINT)
                   AS quality_e4
          FROM documents),
        c AS (
          SELECT *, COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality_e4 DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM scored)
        SELECT source, count(*) AS n_selected,
               CAST(sum(n_tokens) AS BIGINT) AS selected_tokens,
               min(quality_e4) AS min_quality_e4
        FROM c WHERE cum_before < 2000
        GROUP BY 1 ORDER BY source""")),

    // ── Deterministic fixed-k sample per stratum ───────────────────────
    // The other sampling contract (p05 keeps a RATE per stratum; this
    // keeps an exact COUNT): per language, the k docs with the smallest
    // content-stable hash — the determinized reservoir sample, uniform
    // because md5 order is independent of every doc attribute, and
    // reproducible across engines/runs/reshards where true reservoir
    // sampling is RNG-and-order dependent (hence oracle-checkable).
    // One shuffle on the stratum key; the rank filter is the top-k
    // window pattern WindowGroupLimit prunes before the full sort — a
    // pathologically hot stratum would swap in the bounded-heap
    // aggregate (w08's topk_longs) for the same answer.
    "p13_fixed_k_sample" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(col("h"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("lang"), col("rn"), col("doc_id"))
          .orderBy("lang", "rn")
      },
      oracle = Some("""
        SELECT lang, rn, doc_id FROM (
          SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS INTEGER) AS rn
          FROM documents)
        WHERE rn <= 20 ORDER BY lang, rn""")),

    // ── Seeded epoch shuffle (deterministic global permutation) ────────
    // Training loops need each epoch's corpus order to be (a) uniformly
    // shuffled, (b) reproducible bit-for-bit from a seed, (c) buildable
    // without one machine holding the corpus. Sort key = md5(seed|id)
    // (uniform, seed-parameterized, engine-agnostic); position comes
    // from the two-pass GlobalRank — repartitionByRange on the hash +
    // per-partition offsets — so NOTHING runs on a single partition
    // (the naive row_number() OVER (ORDER BY h) would; the oracle can
    // afford it, the 100 TB plan cannot). At scale the output is
    // written as range-partitioned shards whose concatenation IS the
    // epoch order; a new seed re-deals the corpus for the next epoch.
    "p14_seeded_shuffle" -> Q(
      run = (s, d) => {
        val hashed = Tables.documents(s, d)
          .select(col("doc_id"),
            md5(concat(lit("7|"), col("doc_id").cast("string"))).as("h"))
        graft.operators.GlobalRank.withRowNumber(hashed,
            Seq(col("h"), col("doc_id")), "pos")
          .select(col("pos"), col("doc_id"))
          .orderBy("pos")
      },
      oracle = Some("""
        SELECT CAST(row_number() OVER (
                 ORDER BY md5('7|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS pos, doc_id
        FROM documents ORDER BY pos""")),

    // ── Near-dup-aware train/val/test split (leakage-safe) ─────────────
    // p03's doc-hash split leaks: two near-duplicate docs hash to
    // different splits, so the test set contains paraphrases of training
    // docs. The leakage-safe unit of assignment is the DUP CLUSTER:
    // every doc is rooted at its d06 connected-component id (singletons
    // root at themselves), and the p03 md5 bucket is taken over the
    // ROOT — whole clusters land in one split by construction. Scale
    // posture: the cluster map covers only docs that appear in a dup
    // pair (a small fraction of the corpus), so the root join is a
    // broadcast/AQE-small join keyed on doc_id; everything after is
    // p03's one-shuffle agg. The oracle replays d06's recursive-CTE
    // components and the same md5 bucket over roots.
    "p15_cluster_split" -> Q(
      run = (s, d) => {
        val clusters = graft.SparkEntry.queries("d06_dup_clusters")(s, d)
        val rooted = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
          .join(broadcast(clusters), Seq("doc_id"), "left")
          .select(col("n_chars"),
            coalesce(col("cluster_id"), col("doc_id")).as("root"))
        val bucket = conv(substring(md5(col("root").cast("string")), 1, 8),
          16, 10).cast("long") % 100
        val split = when(bucket < 80, "train")
          .when(bucket < 90, "val").otherwise("test")
        rooted.select(split.as("split"), col("n_chars"), col("root"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("root")).as("n_groups"),
            sum(col("n_chars").cast("long")).as("total_chars"))
          .orderBy("split")
      },
      oracle = Some(s"""
        WITH RECURSIVE pairs AS (${DedupPack.d03OracleSql}),
        edges AS (SELECT da AS a, db AS b FROM pairs
                  UNION SELECT db, da FROM pairs),
        reach(n, m) AS (
          SELECT a, a FROM edges
          UNION
          SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
        comp AS (SELECT n AS doc_id, min(m) AS cluster_id
                 FROM reach GROUP BY n),
        rooted AS (
          SELECT d.n_chars, coalesce(c.cluster_id, d.doc_id) AS root
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        b AS (SELECT root, n_chars,
                     ('0x' || substr(md5(CAST(root AS VARCHAR)), 1, 8))::BIGINT
                       % 100 AS bk
              FROM rooted)
        SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               count(DISTINCT root) AS n_groups,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM b GROUP BY 1 ORDER BY split""")),

    // ── Deterministic weighted source interleave (data-loader order) ───
    // p11 decides HOW MUCH of each source; p14 deals a global order;
    // p16 materializes the order a training loader actually consumes:
    // sources interleaved in proportion to weight w_s = √(chars_s),
    // deterministically. Construction: per-source rank r over a seeded
    // md5 deal, interleave key = r / w_s — source s holds a ≈ w_s share
    // of every prefix of the key order (the classic weighted-merge
    // trick). Both ranks are two-pass range ranks: the PER-KEY rank
    // uses GlobalRank.withRowNumberPerKey — rows of one source span
    // many range partitions, offsets from a (partition × key) count
    // map — because Window.partitionBy(source) would hand one task an
    // entire source (the low-cardinality hot-partition trap). Float
    // parity: w is one IEEE sqrt of an exact integer, key one division;
    // ties broken by doc_id.
    "p16_weighted_interleave" -> Q(
      run = (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            md5(col("doc_id").cast("string")).as("h"))
        val ranked = graft.operators.GlobalRank.withRowNumberPerKey(
          docs, "source", Seq(col("h"), col("doc_id")), "rk")
        val w = Tables.documents(s, d).groupBy("source")
          .agg(sqrt(sum(col("n_chars").cast("long")).cast("double"))
            .as("w"))
        val keyed = ranked.join(broadcast(w), "source")
          .select(col("source"), col("doc_id"),
            (col("rk").cast("double") / col("w")).as("key"))
        graft.operators.GlobalRank.withRowNumber(keyed,
            Seq(col("key"), col("doc_id")), "pos")
          .select(col("pos"), col("source"), col("doc_id"))
          .orderBy("pos")
      },
      oracle = Some("""
        WITH r AS (SELECT source, doc_id,
                          CAST(row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                            AS BIGINT) AS rk
                   FROM documents),
        w AS (SELECT source,
                     sqrt(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)) AS w
              FROM documents GROUP BY 1),
        k AS (SELECT r.source, r.doc_id, CAST(r.rk AS DOUBLE) / w.w AS key
              FROM r JOIN w USING (source))
        SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT)
                 AS pos, source, doc_id
        FROM k ORDER BY pos""")),

    // ── Benchmark contamination SCORE (fraction + verdict) ─────────────
    // p06 counts absolute 8-gram overlap for docs that hit the benchmark
    // at all; this is the decision-grade completion: per-doc CONTAMINATED
    // FRACTION (distinct 8-grams shared ÷ distinct 8-grams, integer ppm)
    // for EVERY doc — zero-overlap docs included via the left join — and
    // the ≥10% flag a pipeline actually filters on (GPT-3 appx-C style).
    // Scale shape: one distinct-reduce of (doc, gram), a broadcast of the
    // benchmark gram set (benchmark suites are dim-sized by definition),
    // totals carried from a pre-join agg so the left join is row-per-doc
    // against row-per-doc — the corpus is touched once.
    "p17_contamination_score" -> Q(
      run = (s, d) => {
        val grams = expr(
          """transform(sequence(1, size(split(text, ' ')) - 7),
            |  i -> array_join(slice(split(text, ' '), i, 8), ' '))""".stripMargin)
        val flat = Tables.documents(s, d)
          .filter(size(split(col("text"), " ")) >= 8)
          .select(col("doc_id"), explode(grams).as("g"))
          .distinct()
        val bench = flat.filter(col("doc_id") % 50 === 0)
          .select("g").distinct()
        val corpus = flat.filter(col("doc_id") % 50 =!= 0)
        val tot = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val hit = corpus.join(broadcast(bench), "g")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        tot.join(hit, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            expr("coalesce(n_hit, 0L) * 1000000L div n_grams").as("contam_ppm"),
            (expr("coalesce(n_hit, 0L) * 1000000L div n_grams") >= 100000L)
              .as("flagged"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        flat AS (SELECT DISTINCT doc_id,
                        unnest(list_transform(range(1, len(w) - 6),
                          i -> array_to_string(w[i:i+7], ' '))) AS g
                 FROM w WHERE len(w) >= 8),
        bench AS (SELECT DISTINCT g FROM flat WHERE doc_id % 50 = 0),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                FROM flat WHERE doc_id % 50 <> 0 GROUP BY 1),
        hit AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_hit
                FROM flat f JOIN bench b ON f.g = b.g
                WHERE f.doc_id % 50 <> 0 GROUP BY 1)
        SELECT t.doc_id, t.n_grams,
               COALESCE(h.n_hit, 0) AS n_hit,
               CAST(COALESCE(h.n_hit, 0) * 1000000 // t.n_grams AS BIGINT)
                 AS contam_ppm,
               COALESCE(h.n_hit, 0) * 1000000 // t.n_grams >= 100000 AS flagged
        FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
        ORDER BY t.doc_id""")),

    // ── Per-language token cap with surplus redistribution ─────────────
    // Mix design under a dominance cap: no language may exceed 30 % of
    // the token budget (the fixture's `en` is ~44 %); a capped
    // language's surplus is redistributed to the uncapped ones
    // proportionally to their size — one unrolled round of water-
    // filling (recipients that a second round would re-cap are a
    // documented non-goal; p11's temperature mix is the smooth
    // alternative). Everything after the first aggregation is
    // metadata: ONE corpus-sized hash agg to lang totals (5 rows,
    // partial-agg'd), then the cap/surplus math as unpartitioned
    // window aggregates OVER that 5-row relation — the corpus is
    // scanned once (a naive cross-join-of-aggregates formulation
    // re-plans the corpus subtree per reference: 5 scans), and the
    // single-partition windows hold lang-cardinality rows, not data.
    // All shares in exact integer arithmetic (div, not double ratios)
    // so both engines agree bit-for-bit.
    "p18_source_cap" -> Q(
      run = (s, d) => {
        Tables.documents(s, d)
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("n"))
          .groupBy("lang").agg(sum("n").as("orig_tokens"))
          .selectExpr("lang", "orig_tokens",
            "sum(orig_tokens) OVER () * 30 div 100 AS cap")
          .selectExpr("lang", "orig_tokens", "cap",
            """sum(CASE WHEN orig_tokens > cap
                        THEN orig_tokens - cap ELSE 0L END) OVER ()
               AS surplus""",
            """sum(CASE WHEN orig_tokens <= cap
                        THEN orig_tokens ELSE 0L END) OVER ()
               AS uncapped_tot""")
          .selectExpr("lang", "orig_tokens",
            "orig_tokens > cap AS capped",
            """CASE WHEN orig_tokens > cap THEN cap
               ELSE orig_tokens + surplus * orig_tokens div uncapped_tot
               END AS final_tokens""")
          .orderBy("lang")
      },
      oracle = Some("""
        WITH per AS (SELECT lang,
                            CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                              AS orig_tokens
                     FROM documents GROUP BY 1),
        cap AS (SELECT CAST(sum(orig_tokens) * 30 // 100 AS BIGINT) AS cap
                FROM per),
        st AS (SELECT CAST(sum(CASE WHEN orig_tokens > cap
                                    THEN orig_tokens - cap ELSE 0 END)
                        AS BIGINT) AS surplus,
                      CAST(sum(CASE WHEN orig_tokens <= cap
                                    THEN orig_tokens ELSE 0 END)
                        AS BIGINT) AS uncapped_tot
               FROM per, cap)
        SELECT lang, orig_tokens, orig_tokens > cap AS capped,
               CAST(CASE WHEN orig_tokens > cap THEN cap
                    ELSE orig_tokens + surplus * orig_tokens // uncapped_tot
                    END AS BIGINT) AS final_tokens
        FROM per, cap, st ORDER BY lang""")),

    // ── Snapshot diff (incremental-ingestion change ledger) ────────────
    // The report every incremental crawl run starts from: keyed
    // full-outer join of two corpus snapshots on doc_id, change class
    // from null-ness + content-hash compare (added / removed /
    // modified / unchanged), rolled up to class counts + byte deltas.
    // Snapshots are deterministic fixture slices (v1 drops doc_id%10=0,
    // v2 drops %7=0 and rewrites %5=0 uppercase) — the operator under
    // test is the diff, not the slicing. Scale shape: ONE doc_id-keyed
    // full-outer shuffle joins row-per-doc relations carrying only
    // (id, md5, bytes) — content compares by 16-byte hash, never by
    // payload — then a 4-group rollup. This is q40's CDC machinery
    // pointed at corpus management; d07 is the same idea keyed by
    // content instead of id.
    "p19_snapshot_diff" -> Q(
      run = (s, d) => {
        val docs = Tables.documents(s, d)
        val v1 = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h1"),
            octet_length(col("text")).cast("long").as("b1"))
        val v2 = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0, upper(col("text")))
              .otherwise(col("text")).as("t2"))
          .select(col("doc_id"), md5(col("t2").cast("binary")).as("h2"),
            octet_length(col("t2")).cast("long").as("b2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(
            when(col("h1").isNull, "added")
              .when(col("h2").isNull, "removed")
              .when(col("h1") === col("h2"), "unchanged")
              .otherwise("modified").as("class"),
            coalesce(col("b2"), lit(0L)).as("b2"),
            coalesce(col("b1"), lit(0L)).as("b1"))
          .groupBy("class")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("b2") - col("b1")).as("byte_delta"))
          .orderBy("class")
      },
      oracle = Some("""
        WITH v1 AS (SELECT doc_id, md5(text) AS h1,
                           octet_length(text::BLOB) AS b1
                    FROM documents WHERE doc_id % 10 <> 0),
        v2 AS (SELECT doc_id, md5(t2) AS h2, octet_length(t2::BLOB) AS b2
               FROM (SELECT doc_id,
                            CASE WHEN doc_id % 5 = 0 THEN upper(text)
                                 ELSE text END AS t2
                     FROM documents WHERE doc_id % 7 <> 0))
        SELECT CASE WHEN h1 IS NULL THEN 'added'
                    WHEN h2 IS NULL THEN 'removed'
                    WHEN h1 = h2 THEN 'unchanged'
                    ELSE 'modified' END AS class,
               count(*) AS n_docs,
               CAST(sum(coalesce(b2, 0) - coalesce(b1, 0)) AS BIGINT)
                 AS byte_delta
        FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        GROUP BY 1 ORDER BY class""")),

    // ── Data-loader shard manifest (balanced by construction) ──────────
    // The last mile of the pipeline: deal the (seeded, p14-ordered)
    // corpus onto 16 loader shards round-robin — shard = pos % 16 —
    // and emit the manifest a distributed loader consumes: per-shard
    // doc and token totals plus each shard's deviation from the mean
    // token load (ppm). Round-robin over the hash order balances BOTH
    // count (exactly ±1) and tokens (hash order is token-independent),
    // unlike contiguous range sharding which inherits any length
    // drift. Shape: the rank comes from GlobalRank's two-pass
    // range-partitioned machinery (p14 — no single-partition stage);
    // then one 16-group agg and a mean from a window OVER the 16-row
    // manifest. The deviation column is the audit: a loader reading
    // this manifest knows its stragglers BEFORE the epoch starts.
    "p20_shard_manifest" -> Q(
      run = (s, d) => {
        val hashed = Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            md5(concat(lit("7|"), col("doc_id").cast("string"))).as("h"))
        graft.operators.GlobalRank.withRowNumber(hashed,
            Seq(col("h"), col("doc_id")), "pos")
          .select(((col("pos") - 1) % 16).as("shard"), col("n_tokens"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("tokens"))
          // dev = tokens/mean − 1 in ppm, with the division kept over
          // POSITIVE operands: Spark's `div` truncates toward zero while
          // DuckDB's `//` floors, so a negative numerator would make the
          // engines disagree by one ulp on some fixtures
          .selectExpr("shard", "n_docs", "tokens",
            """tokens * 1000000L div (sum(tokens) OVER () div 16)
               - 1000000L AS dev_ppm""")
          .orderBy("shard")
      },
      oracle = Some("""
        WITH r AS (SELECT doc_id,
                          len(string_split(text, ' ')) AS n_tokens,
                          CAST(row_number() OVER (
                            ORDER BY md5('7|' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS BIGINT) AS pos
                   FROM documents),
        sh AS (SELECT (pos - 1) % 16 AS shard,
                      CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_tokens) AS BIGINT) AS tokens
               FROM r GROUP BY 1),
        m AS (SELECT CAST(sum(tokens) // 16 AS BIGINT) AS mean FROM sh)
        SELECT shard, n_docs, tokens,
               tokens * 1000000 // mean - 1000000 AS dev_ppm
        FROM sh, m ORDER BY shard""")),

    // ── Tokenizer fertility by language ────────────────────────────────
    // The tokenizer-eval number a mix designer needs before p11/p12's
    // token budgeting means anything: fertility = subword tokens per
    // whitespace word (t06's BPE-ish pre-tokenizer), and bytes per
    // subword token, per language — a language whose fertility runs
    // hot consumes budget faster than its byte share suggests, and a
    // budget computed in WORDS for one language and TOKENS for another
    // is silently wrong. One scan, per-row regexp counts, one
    // lang-keyed two-phase agg; integer ppm/e4 outputs.
    "p21_tokenizer_fertility" -> Q(
      run = (s, d) => {
        val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
        Tables.documents(s, d)
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("words"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0)))
              .cast("long").as("subs"),
            col("n_chars"))
          .groupBy("lang")
          .agg(sum("words").as("words"), sum("subs").as("subtokens"),
            sum("n_chars").as("bytes"))
          .select(col("lang"), col("words"), col("subtokens"),
            expr("subtokens * 1000000L div words").as("fertility_ppm"),
            expr("bytes * 10000L div subtokens").as("bytes_per_tok_e4"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH per AS (
          SELECT lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                 CAST(len(regexp_extract_all(text,
                   '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS subs,
                 n_chars
          FROM documents),
        agg AS (SELECT lang,
                       CAST(sum(words) AS BIGINT) AS words,
                       CAST(sum(subs) AS BIGINT) AS subtokens,
                       CAST(sum(n_chars) AS BIGINT) AS bytes
                FROM per GROUP BY 1)
        SELECT lang, words, subtokens,
               subtokens * 1000000 // words AS fertility_ppm,
               bytes * 10000 // subtokens AS bytes_per_tok_e4
        FROM agg ORDER BY lang""")),

    // ── Canary-string leak scan (eval-integrity sweep) ─────────────────
    // The eval-integrity check n-gram decontamination (p06/p17) cannot
    // replace: canaries are matched as raw SUBSTRINGS, so they catch
    // re-tokenized, re-wrapped, or punctuation-mangled copies that
    // token-n-gram joins miss. Canary phrases are derived from the
    // fixture itself (first 3 tokens of every 100th doc — the stand-in
    // for a benchmark's planted GUIDs); the scan is the canonical
    // tiny-broadcast shape: the canary list broadcasts (benchmark
    // canary sets are dozens of strings by construction) and the
    // corpus takes ONE substring-predicate pass — a 5-row BNLJ, the
    // adjudicated q17/p06 pattern, NOT a corpus-sized join. Emits
    // hits-per-canary + first occurrence; n_hits > 1 is a leak.
    // CONTRACT (enforced): canaryScan REFUSES a list above MaxCanaries —
    // the fixture's doc_id%100 derivation is corpus-proportional and
    // would cross the ceiling near sf≈20, long before the BNLJ's
    // O(n·m) cost could silently pass for a scan at scale.
    "p22_canary_scan" -> Q(
      run = (s, d) => {
        val can = Tables.documents(s, d)
          .filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("canary_doc"),
            expr("array_join(slice(split(text, ' '), 1, 3), ' ')")
              .as("canary"))
        canaryScan(Tables.documents(s, d).select(col("doc_id"), col("text")),
          can)
      },
      oracle = Some("""
        WITH can AS (
          SELECT doc_id AS canary_doc,
                 array_to_string(string_split(text, ' ')[1:3], ' ')
                   AS canary
          FROM documents WHERE doc_id % 100 = 0)
        SELECT canary_doc,
               CAST(count(*) AS BIGINT) AS n_hits,
               CAST(min(d.doc_id) AS BIGINT) AS first_hit_doc
        FROM can JOIN documents d ON contains(d.text, can.canary)
        GROUP BY 1 ORDER BY canary_doc""")),

    // ── Weighted k-sample without replacement (Efraimidis–Spirakis) ────
    // p13 samples UNIFORMLY per stratum; real corpus subsampling is
    // usually WEIGHTED (by length, quality score, dedup weight — d14's
    // output is literally a weight column). A-ES makes that one-pass
    // and distributed: draw u_i ~ U(0,1), priority k_i = u_i^(1/w_i),
    // keep the global top-k — provably equivalent to sequential
    // weighted sampling without replacement. Here monotone-transformed
    // to ln(u)/w (same ranking, better float behavior) with u from the
    // p03 hash gate (md5 → 32-bit uniform), so the draw is
    // content-stable across engines, runs, and re-shards — an RNG
    // sample would not be oracle-checkable (why s06 moved to a hash
    // gate in round 8).
    // Weight = n_chars: long docs proportionally likelier, the
    // token-budget-aware subsample. Priorities round to e4 BEFORE the
    // top-k compare (per-row rounding, t06's ln-parity discipline);
    // rounded ties break on doc_id in both engines. One narrow map +
    // TakeOrdered(25) — no shuffle beyond the top-k tree fold; at
    // 100 TB this is exactly how you cut a 10% weighted subcorpus:
    // threshold the same priority instead of top-k'ing it.
    "p23_weighted_sample" -> Q(
      run = (s, d) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(log((h + 1).cast("double") / lit(4294967296.0))
              / col("n_chars") * 10000, 0).cast("long").as("priority_e4"))
          .orderBy(col("priority_e4").desc, col("doc_id"))
          .limit(25)
      },
      oracle = Some("""
        SELECT doc_id, source, n_chars,
               CAST(round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                1, 8))::BIGINT + 1) / 4294967296.0)
                          / n_chars * 10000) AS BIGINT) AS priority_e4
        FROM documents
        ORDER BY priority_e4 DESC, doc_id LIMIT 25""")),

    // ── Length-bucketed batch manifest + padding-waste audit ───────────
    // Batched inference/training pads every sequence to its batch's
    // max, so batch COMPOSITION decides what fraction of compute is
    // padding; the standard fix is length-sorted batching, and this
    // emits its manifest plus the number that justifies it: docs in
    // length-desc order (ties by doc_id — the total-order rule), fixed
    // batches of 32, per-batch waste_ppm = padded-minus-real over
    // padded. Near-0 says the bucketing works; a shuffled loader
    // typically wastes 30-60%. The global order comes from
    // GlobalRank's two-pass range rank — `Window.orderBy` with no
    // partition key would plan the single-partition sort this pack
    // exists to avoid — and batch stats are one keyed aggregate.
    "p24_padding_waste" -> Q(
      run = (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          col("n_chars").cast("long").as("len"))
        graft.operators.GlobalRank.withRowNumber(docs,
            Seq(col("len").desc, col("doc_id")), "rn")
          .withColumn("batch_id", expr("(rn - 1) div 32"))
          .groupBy(col("batch_id"))
          .agg(count(lit(1)).as("n_docs"), max(col("len")).as("max_len"),
            sum(col("len")).as("real_chars"))
          .select(col("batch_id"), col("n_docs"), col("max_len"),
            (col("n_docs") * col("max_len")).as("padded_chars"),
            // a batch of only zero-length docs has zero padded volume —
            // report 0 waste in both engines (Spark's div would NULL,
            // DuckDB's // would error; the d15/g12 zero-den convention)
            expr("""CASE WHEN n_docs * max_len = 0 THEN 0
                    ELSE (n_docs * max_len - real_chars) * 1000000L
                         div (n_docs * max_len) END""").as("waste_ppm"))
          .orderBy("batch_id")
      },
      oracle = Some("""
        WITH ranked AS (
          SELECT CAST(n_chars AS BIGINT) AS len,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents),
        batches AS (
          SELECT (rn - 1) // 32 AS batch_id, count(*) AS n_docs,
                 max(len) AS max_len, sum(len) AS real_chars
          FROM ranked GROUP BY 1)
        SELECT CAST(batch_id AS BIGINT) AS batch_id,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(max_len AS BIGINT) AS max_len,
               CAST(n_docs * max_len AS BIGINT) AS padded_chars,
               CAST(CASE WHEN n_docs * max_len = 0 THEN 0
                    ELSE (n_docs * max_len - real_chars) * 1000000
                         // (n_docs * max_len) END AS BIGINT) AS waste_ppm
        FROM batches ORDER BY batch_id""")),

    // ── Fuzzy (MinHash-banded) benchmark decontamination ───────────────
    // p06 catches VERBATIM leakage (exact 8-gram overlap); real eval
    // contamination is often paraphrased — reworded questions, shuffled
    // answer options — which survives exact n-gram screens. This is the
    // fuzzy tier every published data recipe pairs with the exact one:
    // d03's banded MinHash signatures, but as a CROSS-TABLE join —
    // corpus bands ⋈ benchmark bands on (band, key) — then an exact
    // confirm with TWO gates: Jaccard at a LOOSER threshold (0.2 vs
    // dedup's 0.3: contamination review is cheap, a missed leak is
    // not) OR benchmark-side CONTAINMENT ≥ 0.5 — the asymmetric case
    // Jaccard misses by construction (a short benchmark item embedded
    // in a long web page has tiny |∩|/|∪| but high |∩|/|bench|, and
    // that is the COMMON real leak). Scale
    // posture is p06's argument transplanted: the benchmark is tiny and
    // FIXED while the corpus grows, so its banded signatures BROADCAST
    // (pinned) and candidate generation is map-side over the corpus
    // bands; only candidates shuffle into the keyed confirm joins. The
    // signature relation is the memoized one d03/d06/d07 share — a
    // pipeline runs dedup and decontamination off ONE signature pass.
    "p25_fuzzy_decontam" -> Q(
      run = (s, d) => {
        val bands = DedupPack.bandedSignatures(s, d)
        val corpus = bands.filter(col("doc_id") % 50 =!= 0)
        val bench = bands.filter(col("doc_id") % 50 === 0)
        val cand = corpus.as("c")
          .join(broadcast(bench.as("b")),
            col("c.band") === col("b.band") && col("c.key") === col("b.key"))
          .select(col("c.doc_id").as("corpus_id"),
            col("b.doc_id").as("bench_id"))
          .distinct()
        val sets = DedupPack.shingleSets(s, d)
        graft.functions.GraftFunctions.register(s)
        val scored = cand
          .join(sets.select(col("doc_id"), col("s").as("sa")),
            col("corpus_id") === col("doc_id")).drop("doc_id")
          .join(sets.select(col("doc_id"), col("s").as("sb")),
            col("bench_id") === col("doc_id"))
          .select(col("corpus_id"),
            graft.functions.GraftFunctions.jaccardE4(col("sa"), col("sb"))
              .as("j"),
            // benchmark-side containment |∩|/|bench| in exact e4 ints;
            // sb is never empty here: empty shingle sets carry all-null
            // signatures, which bandedSignatures DROPS before banding
            // (concat_ws would otherwise skip the nulls and emit a hot
            // "" band key — see the helper's scaladoc), so no
            // empty-shingle doc ever reaches the candidate join
            expr("size(array_intersect(sa, sb)) * 10000 div size(sb)")
              .cast("long").as("c"))
          .filter(col("j") >= 2000 || col("c") >= 5000)
        scored.groupBy(col("corpus_id").as("doc_id"))
          .agg(count(lit(1)).as("n_bench_hits"),
            max(col("j")).as("max_jaccard_e4"),
            max(col("c")).as("max_containment_e4"))
          .orderBy("doc_id")
      },
      oracle = Some(DedupPack.bandsCtePrefix + """,
        cand AS (SELECT DISTINCT c.doc_id AS corpus_id, b.doc_id AS bench_id
                 FROM bands c JOIN bands b
                   ON c.band = b.band AND c.key = b.key
                  AND c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0),
        scored AS (SELECT corpus_id, bench_id,
                          CAST(round(len(list_intersect(x.s, y.s)) * 10000.0
                               / (len(x.s) + len(y.s)
                                  - len(list_intersect(x.s, y.s))))
                            AS BIGINT) AS j,
                          CAST(len(list_intersect(x.s, y.s)) * 10000
                               // len(y.s) AS BIGINT) AS c
                   FROM cand JOIN sh x ON corpus_id = x.doc_id
                             JOIN sh y ON bench_id = y.doc_id)
        SELECT corpus_id AS doc_id, count(*) AS n_bench_hits,
               max(j) AS max_jaccard_e4, max(c) AS max_containment_e4
        FROM scored WHERE j >= 2000 OR c >= 5000
        GROUP BY 1 ORDER BY doc_id""")),

    // ── Repeat-budget feasibility audit (data-constrained scaling) ─────
    // The planning table between p11 (mix weights) and p16 (the loader
    // order): given a token budget (2× the corpus here) split by p11's
    // T=2 temperature shares, how many EPOCHS of each source does the
    // plan imply? Data-constrained scaling results say value decays
    // fast past ~4 epochs of repetition, so any source pushed above
    // 4.00 epochs is flagged — the remedy is re-weighting or sourcing
    // more data, and this is the audit that says so BEFORE a training
    // run, not after. Integer-exact: √ is the one IEEE-correctly-
    // rounded power (p11's argument), shares are integer ppm,
    // required-token products are split-scaled (budget div 1e3 ·
    // share_ppm div 1e3) so nothing overflows int64 even at 100 TB
    // corpus sizes, and epochs_e2 is an exact ceiling. One
    // metadata-sized aggregate + windows over |sources| rows.
    "p26_repeat_budget" -> Q(
      run = (s, d) => {
        val toks = size(split(col("text"), " ")).cast("long")
        Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(toks).as("available_tokens"))
          .withColumn("w", floor(sqrt(col("available_tokens"))))
          .withColumn("share_ppm", expr("(w * 1000000) div sum(w) over ()"))
          .withColumn("budget",
            expr("2 * sum(available_tokens) over ()"))
          .withColumn("required_tokens",
            expr("(budget div 1000) * share_ppm div 1000"))
          .withColumn("epochs_e2",
            expr("""(required_tokens * 100 + available_tokens - 1)
                    div available_tokens"""))
          .select(col("source"), col("available_tokens"), col("share_ppm"),
            col("required_tokens"), col("epochs_e2"),
            expr("CAST(CASE WHEN epochs_e2 > 400 THEN 1 ELSE 0 END AS BIGINT)")
              .as("over_repeat_cap"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH m AS (SELECT source,
                          CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                            AS available_tokens
                   FROM documents GROUP BY 1),
        w AS (SELECT *, CAST(floor(sqrt(available_tokens)) AS BIGINT) AS w
              FROM m),
        sh AS (SELECT *,
                      CAST((w * 1000000) // (sum(w) OVER ()) AS BIGINT)
                        AS share_ppm,
                      CAST(2 * sum(available_tokens) OVER () AS BIGINT)
                        AS budget
               FROM w),
        req AS (SELECT *,
                       CAST((budget // 1000) * share_ppm // 1000 AS BIGINT)
                         AS required_tokens
                FROM sh),
        ep AS (SELECT *,
                      CAST((required_tokens * 100 + available_tokens - 1)
                           // available_tokens AS BIGINT) AS epochs_e2
               FROM req)
        SELECT source, available_tokens, share_ppm, required_tokens,
               epochs_e2,
               CAST(CASE WHEN epochs_e2 > 400 THEN 1 ELSE 0 END AS BIGINT)
                 AS over_repeat_cap
        FROM ep ORDER BY source""")),

    // ── Incremental corpus refresh, END-TO-END (round 14, r13 verdict
    // stretch): p19's change detection → ClusterRepair.refresh (the
    // splice API) → d09's keep policy, over a two-snapshot fixture.
    // The PRIOR snapshot is the d21 "changed" bucket (doc_id-md5 ≥ 90)
    // with its content in an old revision (word order reversed —
    // rewrites the shingle set, so prior clusters genuinely differ);
    // the NEW snapshot is the documents table itself. The query walks
    // the production path: hash-compare detects the changed docs, the
    // prior snapshot's full clustering plays the saved state, refresh
    // BFS-scopes the affected components over prior ∪ new pairs,
    // re-clusters only the new-graph delta, splices, and applies the
    // keep policy. ORACLE = the full-recompute pipeline on the new
    // snapshot — d09's oracle verbatim — so any splice error (stale
    // assignment kept, abandoned neighbor missed, wrong min id)
    // hash-fails. Scale: the incremental path's cost tracks the
    // refresh delta (BFS frontier-sized, CC on |affected|); the
    // prior-snapshot clustering here is fixture construction, which a
    // real refresh reads from its previous run's output.
    "p27_incremental_refresh" -> Q(
      run = (s, d) => {
        val lc = new graft.operators.LineageCut(None)
        val docs = Tables.documents(s, d)
        // d21's changed bucket, via the shared helper (round 15, the
        // r14 advice): the fixture predicate tracks d21's by definition
        val changedPred = DedupPack.changedBucketPred(col("doc_id"))
        val prior = docs.select(col("doc_id"),
          when(changedPred,
            concat_ws(" ", reverse(split(col("text"), " "))))
            .otherwise(col("text")).as("text"))
        // 1. change detection (p19's machinery: keyed hash compare)
        val v1 = prior.select(col("doc_id"),
          md5(col("text").cast("binary")).as("h1"))
        val v2 = docs.select(col("doc_id"),
          md5(col("text").cast("binary")).as("h2"))
        val changed = v1.join(v2, Seq("doc_id"), "full_outer")
          .filter(col("h1").isNull || col("h2").isNull ||
            col("h1") =!= col("h2"))
          .select(col("doc_id").as("node"))
        // 2. the saved state: prior snapshot's pairs + full clustering
        //    (pinned — refresh and the BFS read the pair lists twice)
        val priorPairs = lc.pin(DedupPack.lshPairsOf(s, prior))
        val priorAssign = graft.operators.ConnectedComponents
          .minLabel(priorPairs)
        // 3. incremental refresh over the new snapshot's pairs (d03's
        //    memoized pipeline — the corpus the oracle recomputes on)
        val newPairs = lc.pin(graft.SparkEntry
          .queries("d03_minhash_lsh")(s, d).select(col("da"), col("db")))
        val refreshed = graft.operators.ClusterRepair
          .refresh(priorPairs, newPairs, changed, priorAssign)
        // 4. d09's keep policy over the refreshed assignments
        DedupPack.canonicalKeep(
          refreshed.select(col("node").as("doc_id"),
            col("component").as("cluster_id")),
          graft.SparkEntry.queries("t02_quality_score")(s, d)
            .select(col("doc_id"), col("quality_e4")))
      },
      oracle = Some(s"""
        WITH RECURSIVE pairs AS (${DedupPack.d03OracleSql}),
        edges AS (SELECT da AS a, db AS b FROM pairs
                  UNION SELECT db, da FROM pairs),
        reach(n, m) AS (
          SELECT a, a FROM edges
          UNION
          SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
        comp AS (SELECT n AS doc_id, min(m) AS cluster_id
                 FROM reach GROUP BY n),
        qual AS (SELECT doc_id,
                        CAST(round(len(list_filter(string_split(text, ' '),
                                   t -> t IN ($sqlStop))) * 5000.0
                                   / len(string_split(text, ' '))
                             + least(n_chars, 500) * 5000.0 / 500.0) AS BIGINT)
                          AS quality_e4
                 FROM documents),
        ranked AS (SELECT c.cluster_id, c.doc_id, q.quality_e4,
                          row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality_e4 DESC, c.doc_id) AS rn
                   FROM comp c JOIN qual q USING (doc_id))
        SELECT cluster_id, count(*) AS n_members,
               max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
               max(CASE WHEN rn = 1 THEN quality_e4 END) AS kept_quality_e4
        FROM ranked GROUP BY cluster_id ORDER BY cluster_id"""))
  )
}
