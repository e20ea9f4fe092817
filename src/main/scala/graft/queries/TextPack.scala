package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics, quality scoring, language ID,
  * fingerprinting, n-gram statistics.
  *
  * All tokenization is a plain single-space split (the fixture corpus is
  * single-spaced word salad), kept byte-identical between Spark
  * (`split`) and DuckDB (`string_split`). Scores are integer-arithmetic
  * (scaled e4) so both engines agree bit-for-bit.
  *
  * Scale posture: every query is a narrow map over `documents` followed
  * by (at most) one hash aggregation — embarrassingly parallel, no
  * skew-sensitive shuffle; the only wide op (`t05` global top-k bigrams)
  * is partial-aggregated map-side before its single shuffle.
  */
object TextPack extends QueryPack {

  /** Stopword list shared by the quality score (t02). */
  private val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private def sqlStop = stop.map(s => s"'$s'").mkString(", ")

  /** Tiny per-language stopword lists for the langid heuristic (t03). */
  private val langStop: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "es"),
    "fr" -> Seq("le", "la", "et", "est"),
    "zh" -> Seq("de", "shi", "zai", "he"))

  private def toks: Column = split(col("text"), " ")

  def queries: Seq[(String, Q)] = Seq(

    // ── Token counting ─────────────────────────────────────────────────
    "t01_token_stats" -> Q(
      run = (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_uniq"),
            // mean token length ×1e4, exactly: total token chars =
            // n_chars - (n_tokens-1) single-space separators.
            round((col("n_chars") - (size(toks) - lit(1)))
              * lit(10000.0) / size(toks), 0).cast("long").as("tok_len_e4"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_uniq,
               CAST(round((n_chars - (len(string_split(text, ' ')) - 1))
                    * 10000.0 / len(string_split(text, ' '))) AS BIGINT) AS tok_len_e4
        FROM documents ORDER BY doc_id""")),

    // ── Quality scoring (stopword ratio + length prior) ────────────────
    "t02_quality_score" -> Q(
      run = (s, d) => {
        val nTok = size(toks)
        val nStop = size(filter(toks, t => t.isin(stop: _*)))
        Tables.documents(s, d)
          .select(col("doc_id"), nTok.as("n_tokens"), nStop.as("n_stop"),
            round(nStop * lit(5000.0) / nTok
              + least(col("n_chars"), lit(500)) * lit(5000.0) / lit(500.0), 0)
              .cast("long").as("quality_e4"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ($sqlStop))) AS n_stop,
               CAST(round(len(list_filter(string_split(text, ' '),
                          t -> t IN ($sqlStop))) * 5000.0
                          / len(string_split(text, ' '))
                    + least(n_chars, 500) * 5000.0 / 500.0) AS BIGINT) AS quality_e4
        FROM documents ORDER BY doc_id"""),
      bench = true),

    // ── Language identification (stopword-hit argmax heuristic) ────────
    // Ties break to the alphabetically-first language; compared against
    // the fixture's `lang` label as a confusion matrix.
    "t03_langid" -> Q(
      run = (s, d) => {
        val hits = langStop.map { case (l, ws) =>
          l -> size(filter(toks, t => t.isin(ws: _*)))
        }
        val g = greatest(hits.map(_._2): _*)
        val pred = hits.foldLeft(lit(null).cast("string")) {
          case (acc, (l, h)) => when(acc.isNotNull, acc)
            .otherwise(when(h === g, lit(l)))
        }
        Tables.documents(s, d)
          .select(col("lang"), pred.as("pred"))
          .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred")
      },
      oracle = Some {
        val hitsSql = langStop.map { case (l, ws) =>
          l -> s"len(list_filter(string_split(text, ' '), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
        }
        val gSql = s"greatest(${hitsSql.map(_._2).mkString(", ")})"
        val predSql = "CASE " + hitsSql.map { case (l, h) =>
          s"WHEN $h = $gSql THEN '$l'"
        }.mkString(" ") + " END"
        s"""
        SELECT lang, $predSql AS pred, count(*) AS n
        FROM documents GROUP BY 1, 2 ORDER BY lang, pred"""
      }),

    // ── Document fingerprinting ────────────────────────────────────────
    "t04_fingerprint" -> Q(
      run = (s, d) => {
        val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
        Tables.documents(s, d)
          .select(col("doc_id"), md5(norm).as("fp"),
            conv(substring(md5(norm), 1, 8), 16, 10).cast("long").as("bucket"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               ('0x' || substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8))::BIGINT AS bucket
        FROM documents ORDER BY doc_id""")),

    // ── BPE-ish regex token counting ───────────────────────────────────
    // subword-style segmentation: letter runs, digit runs, and single
    // non-alphanumeric marks — the whitespace-split twin is t01
    "t06_bpe_tokens" -> Q(
      run = (s, d) => {
        val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
        val subs = regexp_extract_all(col("text"), lit(pat), lit(0))
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(subs).as("n_subtokens"),
            size(array_distinct(subs)).as("n_uniq_subtokens"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subtokens,
               len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS n_uniq_subtokens
        FROM documents ORDER BY doc_id""")),

    // ── Rolling-hash document fingerprint ──────────────────────────────
    // order-sensitive polynomial fold over token hashes (unlike the
    // content-hash fingerprint t04, this changes when tokens reorder);
    // identical integer arithmetic on both engines
    "t07_rolling_fingerprint" -> Q(
      run = (s, d) => {
        val vals = transform(toks,
          t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
        val rolling = aggregate(vals, lit(0L),
          (h, v) => (h * lit(131L) + v) % lit(1000000007L))
        Tables.documents(s, d)
          .select(col("doc_id"), rolling.as("fingerprint"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '),
                     t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
                 (h, v) -> (h * 131 + v) % 1000000007) AS fingerprint
        FROM documents ORDER BY doc_id""")),

    // ── Global top-k bigrams ───────────────────────────────────────────
    "t05_top_bigrams" -> Q(
      run = (s, d) =>
        Tables.documents(s, d)
          .select(explode(zip_with(
            expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
            expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
            (x, y) => concat(x, lit(" "), y))).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20),
      oracle = Some("""
        SELECT bigram, count(*) AS n FROM (
          SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
          FROM documents)
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")),

    // ── TF-IDF top terms per document ──────────────────────────────────
    // The classic corpus-weighting operator: tf over the doc, idf over
    // the whole corpus (df from one shuffle on term; N broadcast from a
    // one-row aggregate), per-doc top-3 by a keyed window. The ln() is
    // the one transcendental in the oracle surface — scores are rounded
    // scaled ints, and the fixed fixtures hash-match at all three SFs
    // (an ulp flip at a .5 rounding boundary never materialized; a new
    // corpus would need re-validation).
    "t08_tfidf_topterms" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("t"))
        // Round 15 (guide §2.4): tf is cut once and document frequency
        // derives FROM it — tf is already distinct per (doc_id, t), so
        // dfreq's countDistinct(doc_id) is a plain count over tf rows.
        // Before: the raw token explode ran TWICE (once per consumer)
        // and the dfreq side paid a two-phase distinct aggregate over
        // raw tokens; after: one explode, one cut, and dfreq is a
        // cheap count over the cut's blocks.
        val tf = tok.groupBy(col("doc_id"), col("t"))
          .agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
        graft.Caches.trackCut(tf)
        val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score_e4").desc, col("t"))
        tf.join(dfreq, "t").crossJoin(broadcast(n))
          .select(col("doc_id"), col("t"),
            round(col("tf") * log(col("n").cast("double") / col("df"))
              * lit(10000), 0).cast("long").as("score_e4"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3 && col("doc_id") < 500)
          .select(col("doc_id"), col("rnk"), col("t").as("term"),
            col("score_e4"))
          .orderBy("doc_id", "rnk")
      },
      oracle = Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                     FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT t, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (SELECT doc_id, t,
                          CAST(round(tf * ln(CAST(n AS DOUBLE) / df) * 10000) AS BIGINT) AS score_e4
                   FROM tf JOIN dfreq USING (t) CROSS JOIN n),
        ranked AS (SELECT doc_id, t, score_e4,
                          row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_e4 DESC, t) AS rnk
                   FROM scored)
        SELECT doc_id, rnk, t AS term, score_e4
        FROM ranked WHERE rnk <= 3 AND doc_id < 500
        ORDER BY doc_id, rnk""")),

    // ── Repetition / diversity signals (Gopher-style quality rules) ────
    // Per-doc: unique-token fraction, the share of tokens taken by the
    // single most frequent token, and the share of bigram slots taken by
    // the most repeated bigram — the "repetitious document" filters a
    // corpus pipeline cuts on. All counts are exact integers; fractions
    // are scaled-e4 ints. Two narrow explode→count branches joined on
    // doc_id; everything partial-aggregates map-side.
    "t09_repetition" -> Q(
      run = (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_toks"), count(lit(1)).as("n_uniq"),
            max(col("c")).as("top_tok_n"))
        val bigramExpr = expr(
          """transform(sequence(1, size(bt) - 1),
            |  i -> concat_ws(' ', element_at(bt, i), element_at(bt, i + 1)))"""
            .stripMargin)
        val big = Tables.documents(s, d)
          .withColumn("bt", toks)
          .select(col("doc_id"), explode(bigramExpr).as("b"))
          .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))
        tok.join(big, "doc_id")
          .select(col("doc_id"), col("n_toks"), col("n_uniq"),
            round(col("n_uniq") * lit(10000.0) / col("n_toks"), 0)
              .cast("long").as("uniq_frac_e4"),
            round(col("top_tok_n") * lit(10000.0) / col("n_toks"), 0)
              .cast("long").as("top_tok_frac_e4"),
            round(col("top_bigram_n") * lit(10000.0) / col("n_bigrams"), 0)
              .cast("long").as("top_bigram_frac_e4"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tc AS (SELECT doc_id, t, count(*) AS c FROM
                      (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                       FROM documents)
                    GROUP BY 1, 2),
        tok AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
                       count(*) AS n_uniq, max(c) AS top_tok_n
                FROM tc GROUP BY 1),
        bc AS (SELECT doc_id, b, count(*) AS c FROM
                 (SELECT doc_id,
                         unnest(list_transform(range(1, len(string_split(text, ' '))),
                           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS b
                  FROM documents)
               GROUP BY 1, 2),
        big AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                       max(c) AS top_bigram_n
                FROM bc GROUP BY 1)
        SELECT doc_id, n_toks, n_uniq,
               CAST(round(n_uniq * 10000.0 / n_toks) AS BIGINT) AS uniq_frac_e4,
               CAST(round(top_tok_n * 10000.0 / n_toks) AS BIGINT) AS top_tok_frac_e4,
               CAST(round(top_bigram_n * 10000.0 / n_bigrams) AS BIGINT) AS top_bigram_frac_e4
        FROM tok JOIN big USING (doc_id)
        ORDER BY doc_id""")),

    // ── Sketch-prefiltered exact heavy hitters ─────────────────────────
    // φ-heavy-hitters (count ≥ N/800) over corpus bigrams via the
    // classic two-pass Count-Min pattern: pass 1 folds the whole corpus
    // into one ~100 KB CMS (partial-merged map-side, near-zero shuffle)
    // plus the exact total N; pass 2 re-streams the bigrams and drops
    // the long tail MAP-SIDE using the broadcast sketch — CMS only ever
    // OVER-estimates, so survivors are a strict superset of the true
    // heavy hitters and the final exact recount + HAVING makes the
    // output deterministic regardless of sketch error. At 100 TB the
    // win is that tail keys (the overwhelming majority) never enter the
    // group-by shuffle; only sketch-candidate keys do.
    "t10_sketch_heavy_hitters" -> Q(
      run = (s, d) => {
        import org.apache.spark.util.sketch.CountMinSketch
        import java.io.ByteArrayInputStream
        def bigrams = Tables.documents(s, d)
          .select(explode(zip_with(
            expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
            expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
            (x, y) => concat(x, lit(" "), y))).as("big"))
        val head = bigrams
          .agg(expr("count_min_sketch(big, 0.001d, 0.99d, 42)").as("cms"),
            count(lit(1)).as("n"))
          .head()
        val thr = head.getLong(1) / 800.0
        val bcSketch = s.sparkContext.broadcast(head.getAs[Array[Byte]](0))
        import s.implicits._
        val survivors = bigrams.as[String].mapPartitions { it =>
          val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bcSketch.value))
          it.filter(b => cms.estimateCount(b) >= thr)
        }.toDF("big")
        survivors.groupBy("big").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= lit(thr))
          .orderBy(col("cnt").desc, col("big"))
      },
      oracle = Some("""
        WITH bg AS (
          SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS big
          FROM documents),
        tot AS (SELECT count(*) AS n FROM bg)
        SELECT big, CAST(count(*) AS BIGINT) AS cnt
        FROM bg, tot GROUP BY big, tot.n
        HAVING count(*) >= tot.n / 800.0
        ORDER BY cnt DESC, big""")),

    // ── Bigram LM familiarity score (LM-based quality gating) ─────────
    // The integer-exact stand-in for perplexity filtering: train bigram
    // conditional frequencies on the corpus itself (c2(w1,w2)/c1(w1)),
    // score each doc by the mean scaled conditional frequency of its
    // bigrams. Every step is integer division ((1e6*c2) div c1, then
    // div n_bigrams), so the score is partitioning-independent and the
    // oracle replays it exactly — a real perplexity's float log-sums
    // never are. Scale posture: the two count tables are VOCAB-sized
    // (broadcastable); the corpus makes one narrow pass emitting
    // bigrams, one keyed join against each count table, one per-doc
    // aggregate — the exact shape of KenLM-style scoring at 100 TB
    // with the model table broadcast.
    "t11_bigram_lm_score" -> Q(
      run = (s, d) => {
        val bigrams = Tables.documents(s, d)
          .select(col("doc_id"), explode(zip_with(
            expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
            expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
            (x, y) => concat(x, lit(" "), y))).as("big"))
          .withColumn("w1", substring_index(col("big"), " ", 1))
        val c2 = bigrams.groupBy("big").agg(count(lit(1)).as("c2"))
        val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
        bigrams
          .join(broadcast(c2), "big")
          .join(broadcast(c1), "w1")
          .withColumn("f_e6", expr("(1000000 * c2) div c1"))
          .groupBy("doc_id")
          .agg(expr("CAST(sum(f_e6) div count(1) AS BIGINT)")
            .as("lm_score_e6"),
            count(lit(1)).as("n_bigrams"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' '))),
                   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS big
          FROM documents),
        b AS (SELECT doc_id, big, string_split(big, ' ')[1] AS w1 FROM bg),
        c2 AS (SELECT big, count(*) AS c2 FROM b GROUP BY 1),
        c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1)
        SELECT b.doc_id,
               CAST(sum((1000000 * c2.c2) // c1.c1) // count(*) AS BIGINT)
                 AS lm_score_e6,
               count(*) AS n_bigrams
        FROM b JOIN c2 USING (big) JOIN c1 USING (w1)
        GROUP BY b.doc_id ORDER BY b.doc_id""")),

    // ── PII-style masking / redaction ──────────────────────────────────
    // The scrubbing pass every training pipeline runs before tokenizing:
    // replace sensitive spans with a placeholder and report redaction
    // volume. The synthetic `documents` text has no digits, so this
    // runs on `events.props` (the JSON payloads carry numbers). The
    // regex stays in the RE2 ∩ java.util.regex dialect (no
    // backreferences / lookaround) so both engines match identically;
    // Spark's regexp_replace is replace-all by default, DuckDB needs
    // the 'g' flag. Pure narrow map + one small agg — embarrassingly
    // parallel at any scale.
    "t12_redact" -> Q(
      run = (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            regexp_replace(col("props"), "[0-9]+", "<NUM>").as("red"),
            size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
              .as("n_hits"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_hits")).cast("long").as("n_redacted"),
            countDistinct(col("red")).as("n_shapes"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type, count(*) AS n_rows,
               CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
                 AS n_redacted,
               count(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g'))
                 AS n_shapes
        FROM events
        GROUP BY event_type ORDER BY event_type""")),

    // ── Native table-generating function: word trigrams ────────────────
    // The UDTF leg of the extension trio (scalar s04, aggregate w08):
    // [[graft.functions.NGramExplode]] is a first-class Catalyst
    // `Generator`, lifted into a `Generate` node by the analyzer exactly
    // like built-in `explode` — the reference's whole mapper contract
    // (0..n output lines per input line, worker/__main__.py:128-144) as
    // one native operator. Top-20 corpus trigrams with their earliest
    // in-document offset; one narrow generate pass, then a map-side
    // partial-aggregated single shuffle — same scale shape as t05.
    "t13_ngram_explode" -> Q(
      run = (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(expr("ngram_explode(split(text, ' '), 3)"))
          .groupBy("ngram")
          .agg(count(lit(1)).as("n"), min(col("pos")).as("min_pos"))
          .orderBy(col("n").desc, col("ngram"))
          .limit(20)
      },
      oracle = Some("""
        WITH tg AS (
          SELECT t.i - 1 AS pos,
                 w[t.i] || ' ' || w[t.i+1] || ' ' || w[t.i+2] AS ngram
          FROM (SELECT string_split(text, ' ') AS w FROM documents),
               unnest(range(1, len(w) - 1)) AS t(i))
        SELECT ngram, count(*) AS n, CAST(min(pos) AS INTEGER) AS min_pos
        FROM tg GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""")),

    // ── BPE vocabulary induction (merge learning) ──────────────────────
    // The tokenizer-training step of an LLM pipeline: learn merge rules
    // by repeatedly fusing the corpus's most frequent adjacent symbol
    // pair. The scale insight that makes BPE feasible at 100 TB: after
    // ONE corpus-sized aggregate (word → frequency), every round
    // operates on the VOCAB (thousands of rows), not the corpus — pair
    // counting, top-pair selection, and the merge rewrite all run over
    // (word, n) with counts carrying the corpus weight. Three unrolled
    // rounds here; each is one vocab-sized aggregate + a TakeOrdered
    // top-1 + a broadcast-joined string rewrite — fully declarative, no
    // driver-side collect feeding the plan. Ties break lexicographically
    // so the learned merges are deterministic in both engines; symbol
    // strings are space-joined with sentinel-space replace so a merge
    // never fuses across symbol boundaries.
    "t14_bpe_learn" -> Q(
      run = (s, d) => {
        val chars = expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        val words = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")).between(2, 12)
            && col("word").rlike("^[a-z]+$"))
          .groupBy("word").agg(count(lit(1)).as("n"))
        // Round 15 (guide §2.4, the engines' lineage-cut doctrine
        // applied to this 3-round merge loop): each round's top-pair
        // scan, the merge, and the compression metric all re-embedded
        // the previous rounds' whole plan — the executed query held 21
        // copies of the word derivation (explode + filter + aggregate
        // over documents). Cutting the working set per round makes each
        // derivation run ONCE; every later consumer reads blocks.
        var cur = words.select(col("word"), col("n"),
          concat_ws(" ", chars).as("s"))
          .localCheckpoint(true)
        graft.Caches.trackCut(cur)
        var out: DataFrame = null
        for (r <- 1 to 3) {
          val top = cur
            .select(col("n"), split(col("s"), " ").as("a"))
            .select(col("n"), explode(expr(
              "transform(sequence(1, size(a) - 1)," +
                " i -> concat(a[i-1], ' ', a[i]))")).as("pair"))
            .groupBy("pair").agg(sum(col("n")).as("cnt"))
            .orderBy(col("cnt").desc, col("pair")).limit(1)
          cur = cur.crossJoin(broadcast(top.select(col("pair").as("mp"))))
            .withColumn("s", trim(replace(
              concat(lit(" "), col("s"), lit(" ")),
              concat(lit(" "), col("mp"), lit(" ")),
              concat(lit(" "), replace(col("mp"), lit(" ")), lit(" ")))))
            .drop("mp")
            .localCheckpoint(true)
          graft.Caches.trackCut(cur)
          // the metric merges are learned FOR: corpus symbols remaining
          // after this round (each merge occurrence saves one symbol)
          val compressed = cur.agg(sum(col("n")
            * size(split(col("s"), " "))).as("corpus_symbols"))
          val round = top.crossJoin(compressed)
            .select(lit(r).as("round"), col("pair"),
              replace(col("pair"), lit(" ")).as("new_token"), col("cnt"),
              col("corpus_symbols"))
          out = if (out == null) round else out.unionByName(round)
        }
        out.orderBy("round")
      },
      oracle = Some {
        def pairsOf(src: String, name: String) = s"""
          $name AS (
            SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
              SELECT n, unnest(list_transform(range(1, len(a)),
                       i -> a[i] || ' ' || a[i+1])) AS pair
              FROM (SELECT n, string_split(s, ' ') AS a FROM $src))
            GROUP BY 1)"""
        def topOf(p: String, name: String) =
          s"$name AS (SELECT pair, cnt FROM $p ORDER BY cnt DESC, pair LIMIT 1)"
        def mergeOf(src: String, m: String, name: String) = s"""
          $name AS (
            SELECT word, n,
                   trim(replace(' ' || s || ' ',
                     ' ' || (SELECT pair FROM $m) || ' ',
                     ' ' || replace((SELECT pair FROM $m), ' ', '') || ' '))
                     AS s
            FROM $src)"""
        s"""
        WITH words AS (
          SELECT w AS word, count(*) AS n
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE len(w) BETWEEN 2 AND 12 AND regexp_matches(w, '^[a-z]+$$')
          GROUP BY 1),
        s0 AS (
          SELECT word, n,
                 array_to_string(list_transform(range(1, len(word) + 1),
                   i -> word[i]), ' ') AS s
          FROM words),
        ${pairsOf("s0", "p1")}, ${topOf("p1", "m1")},
        ${mergeOf("s0", "m1", "s1")},
        ${pairsOf("s1", "p2")}, ${topOf("p2", "m2")},
        ${mergeOf("s1", "m2", "s2")},
        ${pairsOf("s2", "p3")}, ${topOf("p3", "m3")},
        ${mergeOf("s2", "m3", "s3")},
        c1 AS (SELECT CAST(sum(n * len(string_split(s, ' '))) AS BIGINT)
                 AS corpus_symbols FROM s1),
        c2 AS (SELECT CAST(sum(n * len(string_split(s, ' '))) AS BIGINT)
                 AS corpus_symbols FROM s2),
        c3 AS (SELECT CAST(sum(n * len(string_split(s, ' '))) AS BIGINT)
                 AS corpus_symbols FROM s3)
        SELECT * FROM (
          SELECT 1 AS round, pair, replace(pair, ' ', '') AS new_token, cnt,
                 (SELECT corpus_symbols FROM c1) AS corpus_symbols
          FROM m1
          UNION ALL
          SELECT 2, pair, replace(pair, ' ', ''), cnt,
                 (SELECT corpus_symbols FROM c2) FROM m2
          UNION ALL
          SELECT 3, pair, replace(pair, ' ', ''), cnt,
                 (SELECT corpus_symbols FROM c3) FROM m3)
        ORDER BY round"""
      }),

    // ── Gopher-style quality rule flags ────────────────────────────────
    // The rule-based document filter family from the Gopher/MassiveText
    // recipe, as per-rule boolean flags plus the combined verdict:
    //   words_ok  — token count in [50, 100000]
    //   mwl_ok    — mean word length in [3, 10]
    //   alpha_ok  — ≥80% of words contain an alphabetic character
    //   stop_ok   — at least one common-stopword hit
    // Unlike t02's scalar quality SCORE, this emits the per-rule
    // breakdown a pipeline uses to audit WHY documents were dropped.
    // All arithmetic is integer (×1e6 ratios via integer division) so
    // both engines agree bit-for-bit; total word chars reuses t01's
    // exact n_chars identity for single-spaced text.
    // Scale shape: one narrow map over documents, no shuffle except
    // the presentation sort — embarrassingly parallel at any corpus.
    "t15_gopher_rules" -> Q(
      run = (s, d) => {
        val gopherStop = Seq("the", "and", "of", "to", "in", "is",
          "that", "for")
        val nW = size(toks).cast("long")
        val sumLen = (col("n_chars") - (size(toks) - lit(1))).cast("long")
        val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
        val nStop = size(array_intersect(
          transform(toks, w => lower(w)),
          array(gopherStop.map(lit): _*))).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"), nW.as("n_words"), sumLen.as("sum_len"),
            nAlpha.as("n_alpha"), nStop.as("n_stop"))
          .select(col("doc_id"), col("n_words"),
            expr("sum_len * 1000000L div n_words").as("mwl_e6"),
            expr("n_alpha * 1000000L div n_words").as("alpha_e6"),
            col("n_stop"))
          .withColumn("words_ok",
            col("n_words").between(50L, 100000L))
          .withColumn("mwl_ok",
            col("mwl_e6").between(3000000L, 10000000L))
          .withColumn("alpha_ok", col("alpha_e6") >= 800000L)
          .withColumn("stop_ok", col("n_stop") >= 1L)
          .withColumn("passes",
            col("words_ok") && col("mwl_ok")
              && col("alpha_ok") && col("stop_ok"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH w AS (SELECT doc_id, n_chars,
                          string_split(text, ' ') AS words FROM documents),
        m AS (SELECT doc_id,
                CAST(len(words) AS BIGINT) AS n_words,
                CAST(n_chars - (len(words) - 1) AS BIGINT) AS sum_len,
                CAST(len(list_filter(words,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
                CAST(len(list_intersect(list_transform(words, x -> lower(x)),
                  ['the','and','of','to','in','is','that','for']))
                  AS BIGINT) AS n_stop
              FROM w),
        r AS (SELECT doc_id, n_words,
                     sum_len * 1000000 // n_words AS mwl_e6,
                     n_alpha * 1000000 // n_words AS alpha_e6,
                     n_stop
              FROM m)
        SELECT doc_id, n_words, mwl_e6, alpha_e6, n_stop,
               n_words BETWEEN 50 AND 100000 AS words_ok,
               mwl_e6 BETWEEN 3000000 AND 10000000 AS mwl_ok,
               alpha_e6 >= 800000 AS alpha_ok,
               n_stop >= 1 AS stop_ok,
               (n_words BETWEEN 50 AND 100000
                 AND mwl_e6 BETWEEN 3000000 AND 10000000
                 AND alpha_e6 >= 800000 AND n_stop >= 1) AS passes
        FROM r ORDER BY doc_id""")),

    // ── Zipf-fit slope per source (corpus-health diagnostic) ───────────
    // OLS slope of the log-log rank–frequency curve over each source's
    // top-100 terms: natural text sits near −1; a slope far from that
    // flags boilerplate floods or spam (too steep) and word-salad /
    // deduplication failures (too flat). Exactness: each (rank, count)
    // point becomes e3-scaled integer logs — every log term is computed
    // from integers identically in both engines, rounded to an integer
    // ONCE — so the OLS sums are integer arithmetic, order-independent,
    // and the slope is integer ppm via one sign-handled positive
    // division (integer div truncation differs across engines below
    // zero; abs-then-negate keeps both sides on positive operands).
    // Scale shape: one corpus-sized term-count agg, then a top-100
    // bounded window and a 5-long-column fold per source — everything
    // after the first shuffle is metadata-sized.
    "t16_zipf_slope" -> Q(
      run = (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .filter(col("t") =!= "")
          .groupBy("source", "t").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("source").orderBy(col("n").desc, col("t"))
        val pts = tc.withColumn("r", row_number().over(w))
          .filter(col("r") <= 100)
          .select(col("source"),
            round(log(col("r").cast("double")) * 1000, 0).cast("long").as("x"),
            round(log(col("n").cast("double")) * 1000, 0).cast("long").as("y"))
        pts.groupBy("source").agg(
            count(lit(1)).as("k"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("num", expr("k * sxy - sx * sy"))
          .withColumn("den", expr("k * sxx - sx * sx"))
          .select(col("source"),
            expr("""CASE WHEN num >= 0 THEN abs(num) * 1000000L div den
                         ELSE -(abs(num) * 1000000L div den) END""")
              .as("slope_ppm"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
                     FROM documents),
        tc AS (SELECT source, t, count(*) AS n FROM tok WHERE t <> ''
               GROUP BY 1, 2),
        rk AS (SELECT source, t, n,
                      row_number() OVER (PARTITION BY source
                        ORDER BY n DESC, t) AS r
               FROM tc),
        pts AS (SELECT source,
                       CAST(round(1000 * ln(CAST(r AS DOUBLE))) AS BIGINT) AS x,
                       CAST(round(1000 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS y
                FROM rk WHERE r <= 100),
        s AS (SELECT source, CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x*y) AS BIGINT) AS sxy,
                     CAST(sum(x*x) AS BIGINT) AS sxx
              FROM pts GROUP BY 1),
        fit AS (SELECT source, k*sxy - sx*sy AS num, k*sxx - sx*sx AS den
                FROM s)
        SELECT source,
               CASE WHEN num >= 0 THEN CAST(abs(num) * 1000000 // den AS BIGINT)
                    ELSE -CAST(abs(num) * 1000000 // den AS BIGINT) END
                 AS slope_ppm
        FROM fit ORDER BY source""")),

    // ── Classifier-eval rollup: per-language precision/recall/F1 ───────
    // t03 emits the raw confusion matrix; this is the metrics table a
    // model eval actually reads — per-class tp/fp/fn and integer-ppm
    // precision, recall, F1 (harmonic mean computed from the ppm values,
    // so it stays pure BIGINT arithmetic; zero-denominator classes —
    // never-predicted languages — report 0, exercised by es/fr/zh whose
    // stopword lists lose every tie to earlier languages here). Shape:
    // the matrix is |classes|² rows after one corpus-sized agg, so the
    // whole rollup — two tiny re-aggs and a left join keeping
    // never-predicted classes — is metadata-sized at any corpus.
    "t17_langid_eval" -> Q(
      run = (s, d) => {
        val hits = langStop.map { case (l, ws) =>
          l -> size(filter(toks, t => t.isin(ws: _*)))
        }
        val g = greatest(hits.map(_._2): _*)
        val pred = hits.foldLeft(lit(null).cast("string")) {
          case (acc, (l, h)) => when(acc.isNotNull, acc)
            .otherwise(when(h === g, lit(l)))
        }
        val cm = Tables.documents(s, d)
          .select(col("lang"), pred.as("pred"))
          .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        val tpfn = cm.groupBy("lang").agg(
          coalesce(sum(when(col("pred") === col("lang"), col("n"))), lit(0L))
            .as("tp"),
          coalesce(sum(when(not(col("pred") <=> col("lang")), col("n"))),
            lit(0L)).as("fn"))
        val fp = cm.filter(col("pred").isNotNull && col("pred") =!= col("lang"))
          .groupBy(col("pred").as("lang")).agg(sum(col("n")).as("fp"))
        tpfn.join(fp, Seq("lang"), "left")
          .select(col("lang"), col("tp"),
            coalesce(col("fp"), lit(0L)).as("fp"), col("fn"))
          .withColumn("precision_ppm",
            expr("CASE WHEN tp + fp = 0 THEN 0L ELSE tp * 1000000L div (tp + fp) END"))
          .withColumn("recall_ppm",
            expr("CASE WHEN tp + fn = 0 THEN 0L ELSE tp * 1000000L div (tp + fn) END"))
          .withColumn("f1_ppm",
            expr("""CASE WHEN precision_ppm + recall_ppm = 0 THEN 0L
                    ELSE 2 * precision_ppm * recall_ppm
                         div (precision_ppm + recall_ppm) END"""))
          .orderBy("lang")
      },
      oracle = Some {
        val hitsSql = langStop.map { case (l, ws) =>
          l -> s"len(list_filter(string_split(text, ' '), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
        }
        val gSql = s"greatest(${hitsSql.map(_._2).mkString(", ")})"
        val predSql = "CASE " + hitsSql.map { case (l, h) =>
          s"WHEN $h = $gSql THEN '$l'"
        }.mkString(" ") + " END"
        s"""
        WITH cm AS (SELECT lang, $predSql AS pred, count(*) AS n
                    FROM documents GROUP BY 1, 2),
        tpfn AS (SELECT lang,
                        CAST(COALESCE(sum(n) FILTER (pred = lang), 0) AS BIGINT)
                          AS tp,
                        CAST(COALESCE(sum(n) FILTER (pred IS DISTINCT FROM lang),
                          0) AS BIGINT) AS fn
                 FROM cm GROUP BY 1),
        fp AS (SELECT pred AS lang, CAST(sum(n) AS BIGINT) AS fp FROM cm
               WHERE pred IS NOT NULL AND pred <> lang GROUP BY 1),
        m AS (SELECT t.lang, t.tp, COALESCE(f.fp, 0) AS fp, t.fn,
                     CASE WHEN t.tp + COALESCE(f.fp, 0) = 0 THEN 0
                          ELSE t.tp * 1000000 // (t.tp + COALESCE(f.fp, 0))
                     END AS precision_ppm,
                     CASE WHEN t.tp + t.fn = 0 THEN 0
                          ELSE t.tp * 1000000 // (t.tp + t.fn)
                     END AS recall_ppm
              FROM tpfn t LEFT JOIN fp f ON t.lang = f.lang)
        SELECT lang, tp, fp, fn,
               CAST(precision_ppm AS BIGINT) AS precision_ppm,
               CAST(recall_ppm AS BIGINT) AS recall_ppm,
               CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
                    ELSE 2 * precision_ppm * recall_ppm
                         // (precision_ppm + recall_ppm)
                    END AS BIGINT) AS f1_ppm
        FROM m ORDER BY lang"""
      }),

    // ── Linear classifier inference via feature hashing ────────────────
    // The quality-classifier shape (fastText / logistic filters) as a
    // pipeline operator: hash each token into a fixed F=1024-bucket
    // feature space (md5 → first 8 hex digits → mod F — the hashing
    // trick, no vocabulary to build or broadcast), look the bucket's
    // weight up in a model that here is a deterministic integer formula
    // (a real deployment broadcasts the trained weight array; same
    // plan), and score each document as bias + Σ token-weights. All
    // arithmetic is int64 (weights ∈ [-1000,1000], ≤1e3 tokens/doc —
    // no overflow, no float drift), so DuckDB replays it bit-for-bit;
    // the keep/drop decision is the sign of the logit. Shape: one
    // narrow explode→map, ONE doc_id hash agg (map-side partial) — the
    // classifier adds zero shuffles beyond the tokenize pass, which is
    // why this inference style scales to 100 TB while a per-doc model
    // RPC does not.
    "t18_hashed_classifier" -> Q(
      run = (s, d) => {
        val bucket =
          conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 1024
        Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("tok"))
          .select(col("doc_id"),
            ((bucket * lit(2654435761L)) % 2001 - 1000).as("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            (lit(37L) + sum(col("w"))).as("logit"))
          .select(col("doc_id"), col("n_tokens"), col("logit"),
            when(col("logit") > 0, lit("keep")).otherwise(lit("drop"))
              .as("label"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        feat AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS bucket
          FROM tok),
        scored AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(37 + sum((bucket * 2654435761) % 2001 - 1000) AS BIGINT)
                   AS logit
          FROM feat GROUP BY doc_id)
        SELECT doc_id, n_tokens, logit,
               CASE WHEN logit > 0 THEN 'keep' ELSE 'drop' END AS label
        FROM scored ORDER BY doc_id""")),

    // ── Lexical diversity per source (type-token ratio + hapax rate) ───
    // Corpus-quality profiling: low TTR / low hapax share flags
    // template-generated or heavily repeated sources (the same signal
    // t09's intra-doc repetition gives, lifted to the source level).
    // Scale shape: explode → ONE (source, token) hash agg — the only
    // corpus-sized shuffle, partial-agg'd map-side so each task emits
    // its local vocabulary once, not its token stream — then a
    // source-cardinality rollup. distinct/hapax/total all derive from
    // the same term-frequency relation: one exchange feeds every
    // metric, where the naive plan would rescan the corpus per metric
    // (countDistinct + two filtered counts = three shuffles).
    "t19_lexical_diversity" -> Q(
      run = (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("source"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        tf.groupBy("source")
          .agg(sum("c").as("total_tokens"),
            count(lit(1)).as("distinct_tokens"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
          .select(col("source"), col("total_tokens"),
            col("distinct_tokens"), col("hapax"),
            expr("distinct_tokens * 1000000L div total_tokens")
              .as("ttr_ppm"),
            expr("hapax * 1000000L div total_tokens").as("hapax_ppm"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH tf AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        c AS (SELECT source, tok, count(*) AS c FROM tf GROUP BY 1, 2),
        agg AS (SELECT source,
                       CAST(sum(c) AS BIGINT) AS total_tokens,
                       CAST(count(*) AS BIGINT) AS distinct_tokens,
                       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS hapax
                FROM c GROUP BY 1)
        SELECT source, total_tokens, distinct_tokens, hapax,
               distinct_tokens * 1000000 // total_tokens AS ttr_ppm,
               hapax * 1000000 // total_tokens AS hapax_ppm
        FROM agg ORDER BY source""")),

    // ── N-gram novelty curve (first-occurrence attribution) ────────────
    // Originality profiling by ingestion order: a doc's novelty is the
    // share of its distinct 5-grams whose GLOBAL first occurrence
    // (min doc_id) is this doc — boilerplate-heavy docs score low,
    // template sources decay fast. This is the memorization-risk
    // ranking that picks what to re-crawl. Shape: one distinct-reduce
    // of (doc, gram), one gram-keyed min agg (partial map-side), one
    // gram-keyed join back — all three stages shuffle on the gram key,
    // nothing all-pairs; at 100 TB the gram relation is the working
    // set and it behaves exactly like d02's shingle relation (same
    // hot-gram caveat, same mitigation).
    "t20_ngram_novelty" -> Q(
      run = (s, d) => {
        val grams = expr(
          """transform(sequence(1, size(split(text, ' ')) - 4),
            |  i -> array_join(slice(split(text, ' '), i, 5), ' '))""".stripMargin)
        val flat = Tables.documents(s, d)
          .filter(size(split(col("text"), " ")) >= 5)
          .select(col("doc_id"), explode(grams).as("g"))
          .distinct()
        val first = flat.groupBy("g").agg(min("doc_id").as("first_doc"))
        flat.join(first, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            expr("n_novel * 1000000L div n_grams").as("novelty_ppm"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        flat AS (SELECT DISTINCT doc_id,
                        unnest(list_transform(range(1, len(w) - 3),
                          i -> array_to_string(w[i:i+4], ' '))) AS g
                 FROM w WHERE len(w) >= 5),
        first AS (SELECT g, min(doc_id) AS first_doc FROM flat GROUP BY 1)
        SELECT f.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN fi.first_doc = f.doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN fi.first_doc = f.doc_id THEN 1 ELSE 0 END)
                 * 1000000 // count(*) AS BIGINT) AS novelty_ppm
        FROM flat f JOIN first fi USING (g)
        GROUP BY f.doc_id ORDER BY f.doc_id""")),

    // ── Term burstiness (variance/mean of doc-timeline gaps) ───────────
    // Dispersion analysis over the ingestion timeline (doc_id as time):
    // a term whose occurrences CLUMP (burst_ppm ≫ 1e6, i.e. var ≫ mean)
    // signals topical/templated injections; uniform background vocab
    // sits near/below 1e6. Computed for common terms (≥50 docs) from
    // per-term gap series: one distinct-reduce of (tok, doc), one
    // tok-PARTITIONED lag window (high-cardinality key — never a
    // global sort), one tok rollup. var/mean is folded into a single
    // integer expression, burst_ppm = 1e6·(m·Σg² − (Σg)²) / (m·Σg)
    // with m = gaps — exact int64 end-to-end, no float variance
    // (engines disagree on Welford vs two-pass; integers don't).
    "t21_burstiness" -> Q(
      run = (s, d) => {
        val occ = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val w = Window.partitionBy(col("tok")).orderBy(col("doc_id"))
        occ
          .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1).over(w))
          .groupBy("tok")
          .agg(count(lit(1)).as("n_docs"),
            count(col("gap")).as("m"),
            sum(col("gap")).as("sg"),
            sum(col("gap") * col("gap")).as("sg2"))
          .filter(col("n_docs") >= 50)
          .select(col("tok"), col("n_docs"),
            expr("1000000L * (m * sg2 - sg * sg) div (m * sg)")
              .as("burst_ppm"))
          .orderBy("tok")
      },
      oracle = Some("""
        WITH occ AS (SELECT DISTINCT doc_id,
                            unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        gaps AS (SELECT tok,
                        doc_id - lag(doc_id) OVER (PARTITION BY tok
                          ORDER BY doc_id) AS gap
                 FROM occ),
        agg AS (SELECT tok,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(count(gap) AS BIGINT) AS m,
                       CAST(sum(gap) AS BIGINT) AS sg,
                       CAST(sum(gap * gap) AS BIGINT) AS sg2
                FROM gaps GROUP BY 1)
        SELECT tok, n_docs,
               CAST(1000000 * (m * sg2 - sg * sg) // (m * sg) AS BIGINT)
                 AS burst_ppm
        FROM agg WHERE n_docs >= 50 ORDER BY tok"""))
    ,

    // ── RAKE keyword extraction (stopword-delimited phrases) ───────────
    // Rapid Automatic Keyword Extraction (Rose et al. 2010), integer-
    // exact: candidate phrases are maximal stopword-free token runs;
    // word score = degree/freq in ppm (degree = Σ lengths of phrases
    // containing the word — co-occurrence weighting that favors words
    // living in long collocations); phrase score = Σ member-word
    // scores; emit the global top 15. Shape: phrase segmentation is a
    // doc-PARTITIONED running count of stopwords (high-cardinality
    // window key), then three hash aggs — (doc,phrase) bounds, corpus
    // word stats, distinct-phrase scores — and a TakeOrdered top-15.
    // Word stats are vocabulary-sized; nothing joins the corpus to
    // itself. All scores are integer ppm (div), so both engines agree
    // bit-for-bit.
    "t22_rake_keywords" -> Q(
      run = (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val pos = toks
          .select(col("doc_id"), col("toks"),
            posexplode(col("toks")).as(Seq("pos", "tok")))
          .withColumn("is_stop", col("tok").isin(stop: _*).cast("int"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = pos.withColumn("phrase_id", sum(col("is_stop")).over(w))
          .filter(col("is_stop") === 0)
        val phrases = seg.groupBy(col("doc_id"), col("phrase_id"))
          .agg(min(col("pos")).as("p0"), max(col("pos")).as("p1"),
            count(lit(1)).as("plen"), first(col("toks")).as("toks"))
          .select(expr("array_join(slice(toks, p0 + 1, p1 - p0 + 1), ' ')")
            .as("phrase"), col("plen"))
        val wordStats = phrases
          .select(col("plen"), explode(split(col("phrase"), " ")).as("wd"))
          .groupBy("wd")
          .agg(count(lit(1)).as("freq"), sum("plen").as("degree"))
          .select(col("wd"),
            expr("degree * 1000000L div freq").as("wscore_ppm"))
        phrases.select(col("phrase")).distinct()
          .select(col("phrase"),
            explode(split(col("phrase"), " ")).as("wd"))
          .join(wordStats, "wd")
          .groupBy("phrase")
          .agg(count(lit(1)).as("n_words"),
            sum("wscore_ppm").as("score_ppm"))
          .orderBy(col("score_ppm").desc, col("phrase"))
          .limit(15)
      },
      oracle = Some(s"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
        pos AS (SELECT doc_id, toks,
                       unnest(range(1, len(toks) + 1)) AS pos
                FROM tk),
        tagged AS (SELECT doc_id, toks, pos, toks[pos] AS tok,
                          CASE WHEN toks[pos] IN ($sqlStop)
                               THEN 1 ELSE 0 END AS is_stop
                   FROM pos),
        seg AS (SELECT doc_id, toks, pos,
                       sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS phrase_id, is_stop
                FROM tagged),
        ph AS (SELECT array_to_string(
                        any_value(toks)[min(pos):max(pos)], ' ') AS phrase,
                      CAST(count(*) AS BIGINT) AS plen
               FROM seg WHERE is_stop = 0
               GROUP BY doc_id, phrase_id),
        ws AS (SELECT wd,
                      CAST(sum(plen) * 1000000 // count(*) AS BIGINT)
                        AS wscore_ppm
               FROM (SELECT plen, unnest(string_split(phrase, ' ')) AS wd
                     FROM ph)
               GROUP BY 1),
        dp AS (SELECT DISTINCT phrase FROM ph),
        scored AS (SELECT p.phrase,
                          CAST(count(*) AS BIGINT) AS n_words,
                          CAST(sum(ws.wscore_ppm) AS BIGINT) AS score_ppm
                   FROM (SELECT phrase,
                                unnest(string_split(phrase, ' ')) AS wd
                         FROM dp) p
                   JOIN ws USING (wd)
                   GROUP BY 1)
        SELECT phrase, n_words, score_ppm
        FROM scored ORDER BY score_ppm DESC, phrase LIMIT 15""")),

    // ── Source distribution drift (Jensen–Shannon divergence) ──────────
    // The drift instrument corpus ops runs between snapshots/sources:
    // how far is each SOURCE's unigram distribution from the corpus
    // distribution, in nats, ranked? JS (symmetric, bounded by ln 2,
    // defined when one side has zero mass — unlike raw KL) over the
    // (source × vocab) grid:
    //   JS(P‖Q) = ½ Σ_t [ p·ln(2p/(p+q)) + q·ln(2q/(p+q)) ]
    // Determinism discipline: floats never cross an aggregation —
    // each grid ROW rounds its contribution to integer e9 first, so
    // the per-source sum is exact int64 addition in any partition
    // order, and the ln parity is per-row (t06/t08's argument at e9).
    // Scale: two token counts (source-keyed and corpus-keyed) off ONE
    // tokenize pass; the grid is |S|·|V| rows — sources are dozens and
    // vocab is Heaps-law-bounded, so the grid is metadata-sized next
    // to the corpus; p=0 cells (token absent from source) still
    // contribute q·ln 2 and are materialized by the grid cross join,
    // which is |S|·|V| by construction, never corpus-sized.
    "t23_js_divergence" -> Q(
      run = (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val stf = toks.groupBy("source", "tok").agg(count(lit(1)).as("sc"))
        val ctf = toks.groupBy("tok").agg(count(lit(1)).as("cc"))
        val stot = stf.groupBy("source").agg(sum("sc").as("sn"))
        val ctot = toks.agg(count(lit(1)).as("cn"))
        val grid = stot.crossJoin(ctf).crossJoin(broadcast(ctot))
          .join(stf, Seq("source", "tok"), "left")
          .select(col("source"),
            (coalesce(col("sc"), lit(0L)).cast("double") / col("sn"))
              .as("p"),
            (col("cc").cast("double") / col("cn")).as("q"))
        grid.select(col("source"),
            round((when(col("p") > 0,
                col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
              .otherwise(lit(0.0))
              + col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
              * 1e9, 0).cast("long").as("c_e9"))
          .groupBy("source")
          // un-halved on purpose: js2 = 2·JS keeps the output a pure
          // int64 SUM — halving would reintroduce a division whose
          // floor/truncate semantics differ across engines near zero
          .agg(sum("c_e9").as("js2_e9"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
        stf AS (SELECT source, tok, count(*) AS sc FROM toks GROUP BY 1, 2),
        ctf AS (SELECT tok, count(*) AS cc FROM toks GROUP BY 1),
        stot AS (SELECT source, CAST(sum(sc) AS BIGINT) AS sn FROM stf
                 GROUP BY 1),
        ctot AS (SELECT count(*) AS cn FROM toks),
        grid AS (SELECT stot.source,
                        CAST(coalesce(stf.sc, 0) AS DOUBLE) / stot.sn AS p,
                        CAST(ctf.cc AS DOUBLE) / ctot.cn AS q
                 FROM stot CROSS JOIN ctf CROSS JOIN ctot
                 LEFT JOIN stf ON stf.source = stot.source
                              AND stf.tok = ctf.tok),
        c AS (SELECT source,
                     CAST(round((CASE WHEN p > 0
                            THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END
                          + q * ln(2.0 * q / (p + q))) * 1e9) AS BIGINT)
                       AS c_e9
              FROM grid)
        SELECT source, CAST(sum(c_e9) AS BIGINT) AS js2_e9
        FROM c GROUP BY 1 ORDER BY source""")),

    // ── Heaps' law fit (vocabulary-growth exponent) ────────────────────
    // t16 fits the Zipf slope (frequency vs rank); this fits its dual,
    // Heaps' law V(n) ≈ K·n^β — the number the whole "vocab is
    // metadata-sized" scale posture rests on (t19/t23/d18 all cite it).
    // The trick that makes it one pass: vocabulary size at ingestion
    // prefix t is COUNT(tokens whose FIRST document ≤ t), so one
    // token-keyed min(doc_id) agg + a 10-bucket histogram replaces 10
    // prefix rescans. Decile thresholds t_i = i·max_id/10; bucket
    // membership via integer ceil((10·x)/max) — exact and identical in
    // both engines (positive operands, div/// agree). Cumulates ride
    // the 10-row decile spine (metadata window, p08 pattern), the
    // ln-OLS is t16's e3-scaled integer math verbatim. Output: one row
    // (n_pts, beta_ppm) — β≈1 says open vocabulary (hash features,
    // d10's deletion index sizing), β≪1 says closed (broadcast
    // dictionaries stay broadcastable at 100 TB).
    "t24_heaps_law" -> Q(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val mx = docs.agg(max("doc_id").as("mx"))
        // bucket takes the column NAME, not a Column: interpolating a
        // Column into a SQL string only works when toString happens to
        // pretty-print a bare attribute — a derived/qualified column
        // would produce an unparseable or wrongly-resolved expression
        def bucket(name: String) =
          greatest(lit(1L), expr(s"(10 * $name + mx - 1) div mx"))
        val nd = docs.crossJoin(broadcast(mx))
          .groupBy(bucket("doc_id").as("i"))
          .agg(count(lit(1)).as("nd"))
        val fd = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("tok").agg(min("doc_id").as("fdoc"))
        val nv = fd.crossJoin(broadcast(mx))
          .groupBy(bucket("fdoc").as("i"))
          .agg(count(lit(1)).as("nv"))
        val w = Window.orderBy("i")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pts = nd.join(nv, Seq("i"), "left")
          .select(col("i"), sum(col("nd")).over(w).as("cd"),
            sum(coalesce(col("nv"), lit(0L))).over(w).as("cv"))
          .select(round(log(col("cd").cast("double")) * 1000, 0)
              .cast("long").as("x"),
            round(log(col("cv").cast("double")) * 1000, 0)
              .cast("long").as("y"))
        pts.agg(count(lit(1)).as("k"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("num", expr("k * sxy - sx * sy"))
          .withColumn("den", expr("k * sxx - sx * sx"))
          .select(col("k").as("n_pts"),
            expr("""CASE WHEN num >= 0 THEN abs(num) * 1000000L div den
                         ELSE -(abs(num) * 1000000L div den) END""")
              .as("beta_ppm"))
      },
      oracle = Some("""
        WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        nd AS (SELECT greatest(1, (10 * doc_id + mx - 1) // mx) AS i,
                      count(*) AS nd
               FROM documents, mx GROUP BY 1),
        fd AS (SELECT tok, min(doc_id) AS fdoc FROM
                 (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
               WHERE tok <> '' GROUP BY 1),
        nv AS (SELECT greatest(1, (10 * fdoc + mx - 1) // mx) AS i,
                      count(*) AS nv
               FROM fd, mx GROUP BY 1),
        cum AS (SELECT nd.i,
                       sum(nd.nd) OVER (ORDER BY nd.i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cd,
                       sum(coalesce(nv.nv, 0)) OVER (ORDER BY nd.i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cv
                FROM nd LEFT JOIN nv ON nd.i = nv.i),
        pts AS (SELECT CAST(round(1000 * ln(CAST(cd AS DOUBLE))) AS BIGINT)
                         AS x,
                       CAST(round(1000 * ln(CAST(cv AS DOUBLE))) AS BIGINT)
                         AS y
                FROM cum),
        s AS (SELECT CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x*y) AS BIGINT) AS sxy,
                     CAST(sum(x*x) AS BIGINT) AS sxx
              FROM pts),
        fit AS (SELECT k, k*sxy - sx*sy AS num, k*sxx - sx*sx AS den FROM s)
        SELECT k AS n_pts,
               CASE WHEN num >= 0 THEN CAST(abs(num) * 1000000 // den AS BIGINT)
                    ELSE -CAST(abs(num) * 1000000 // den AS BIGINT) END
                 AS beta_ppm
        FROM fit"""))
  )
}
