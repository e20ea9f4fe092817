package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: opaque
  * `binary` payloads with typed metadata, batched per-partition
  * decode/feature-extract, and frame sampling.
  *
  * No image/audio codecs exist in this environment, so the DECODE STEP
  * IS A STUB: payloads are the documents' UTF-8 bytes and "decoding"
  * derives deterministic pseudo-features from md5 of the payload (see
  * [[Fake.features]]). Everything around the stub — binary schema,
  * per-partition batching with a reused per-batch handle (the
  * `mapInPandas` / model-handle pattern), frame-window slicing,
  * metadata extraction — is real, tested Spark plumbing; swapping
  * [[Fake.features]] for a real decoder changes no plan shape.
  *
  * Scale posture: all three queries are narrow per-row/per-partition
  * maps over the binary column (no shuffle except final small aggs);
  * binary payloads stream through the scan without driver
  * materialization, and the batched extractor amortizes handle setup
  * per partition exactly as a GPU/codec handle would need.
  */
object MultimodalPack extends QueryPack {

  private[queries] object Fake {
    /** Deterministic stand-in for a real decoder: 4 pseudo-features from
      * md5 of the payload — `(md5 hex)[8k..8k+8) as int64 % 1000`.
      * Mirrored exactly by the oracle SQL, so the plumbing is verified
      * end-to-end even though the "model" is fake. */
    def features(payload: Array[Byte]): Seq[Long] = {
      val hex = MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString
      (0 until 4).map { k =>
        java.lang.Long.parseLong(hex.substring(8 * k, 8 * k + 8), 16) % 1000
      }
    }
  }

  def queries: Seq[(String, Q)] = Seq(

    // ── Binary ingestion + metadata columns ────────────────────────────
    "m01_binary_meta" -> Q(
      run = (s, d) =>
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast("binary"))
          .select(col("doc_id"),
            octet_length(col("text")).as("n_bytes"),
            md5(col("payload")).as("content_md5"),
            lower(hex(substring(col("payload"), 1, 16))).as("head_hex"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               octet_length(text::BLOB) AS n_bytes,
               md5(text) AS content_md5,
               lower(hex(substr(text, 1, 16)::BLOB)) AS head_hex
        FROM documents ORDER BY doc_id""")),

    // ── Batched per-partition decode / feature extraction (STUB) ───────
    "m02_feature_extract" -> Q(
      run = (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions { batch =>
            // one "decoder handle" per partition (amortized setup, the
            // way a real codec/model handle would be held)
            batch.map { case (id, text) =>
              val f = Fake.features(text.getBytes(StandardCharsets.UTF_8))
              (id, f(0), f(1), f(2), f(3))
            }
          }
          .toDF("doc_id", "f0", "f1", "f2", "f3")
          .orderBy("doc_id")
      },
      oracle = Some {
        val fs = (0 until 4).map { k =>
          s"('0x' || substr(md5(text), ${8 * k + 1}, 8))::BIGINT % 1000 AS f$k"
        }.mkString(",\n               ")
        s"""
        SELECT doc_id,
               $fs
        FROM documents ORDER BY doc_id"""
      }),

    // ── Frame sampling: fixed-stride windows over the payload ──────────
    "m03_frame_sample" -> Q(
      run = (s, d) =>
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast("binary"))
          .select(col("doc_id"),
            posexplode(expr(
              "transform(sequence(1, octet_length(text) - 7, 32)," +
                " i -> lower(hex(substring(payload, i, 8))))"))
              .as(Seq("frame_no", "frame_hex")))
          .orderBy("doc_id", "frame_no"),
      oracle = Some("""
        SELECT doc_id, CAST((start_pos - 1) // 32 AS INT) AS frame_no,
               lower(hex(substr(text, CAST(start_pos AS INT), 8)::BLOB)) AS frame_hex
        FROM (SELECT doc_id, text,
                     unnest(range(1, octet_length(text::BLOB) - 6, 32)) AS start_pos
              FROM documents)
        ORDER BY doc_id, frame_no""")),

    // ── Perceptual-hash near-dup over decoded media (aHash) ────────────
    // Media dedup: decode each payload to a fixed-size grid, average-
    // hash it (bit = cell ≥ mean), find pairs within hamming ≤ 2 via
    // d04's banded pigeonhole join — never an all-pairs cartesian. The
    // DECODE IS THE STUB (as in m02): a real decoder emits an 8×8 luma
    // grid; here the deterministic stand-in is a 32-bin content
    // histogram, which — unlike m02's md5 pseudo-features — PRESERVES
    // SIMILARITY, so near-identical payloads land within the hamming
    // ball and the banding actually exercises the near-dup contract.
    // Everything downstream of the stub (mean-threshold hash, band
    // keys, equi-join candidates, exact verify) is the production
    // pHash pipeline unchanged.
    "m04_phash_neardup" -> Q(
      run = (s, d) => {
        val cnts = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .withColumn("b",
            (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long") % 32)
              .cast("int"))
          .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        // aHash: bit per cell, set iff count >= per-payload mean (>=1)
        val sh = cnts
          .withColumn("mn", greatest(lit(1L),
            expr("sum(c) OVER (PARTITION BY doc_id) div 32")))
          .groupBy("doc_id")
          .agg(sum(when(col("c") >= col("mn"),
            expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("h"))
        val bandExprs = Seq((0, 11), (11, 11), (22, 10)).zipWithIndex.map {
          case ((off, len), i) =>
            struct(lit(i).as("band"),
              shiftright(col("h"), off).bitwiseAND(lit((1L << len) - 1))
                .as("key"))
        }
        val bands = sh.select(col("doc_id"), col("h"),
          explode(array(bandExprs: _*)).as("bk"))
        bands.as("a")
          .join(bands.as("b"),
            col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            expr("bit_count(a.h ^ b.h)").cast("int").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 2)
          .orderBy("da", "db")
      },
      oracle = Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                     FROM documents),
        binned AS (SELECT doc_id,
                          ('0x' || substr(md5(t), 1, 8))::BIGINT % 32 AS b
                   FROM tok),
        cnts AS (SELECT doc_id, b, count(*) AS c FROM binned GROUP BY 1, 2),
        tot AS (SELECT doc_id,
                       greatest(1, CAST(sum(c) AS BIGINT) // 32) AS mn
                FROM cnts GROUP BY 1),
        sh AS (SELECT c.doc_id,
                      CAST(sum(CASE WHEN c.c >= t.mn
                        THEN (CAST(1 AS BIGINT) << CAST(c.b AS INT))
                        ELSE 0 END) AS BIGINT) AS h
               FROM cnts c JOIN tot t ON c.doc_id = t.doc_id GROUP BY 1)
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.h, b.h)) <= 2
        ORDER BY da, db""")),

    // ── Byte-entropy triage of binary payloads (native kernel) ─────────
    // The pre-decode gate of a multimodal ingest: Shannon entropy of the
    // raw bytes tells apart text (~2–3 nats), already-compressed or
    // encrypted media (→ ln 256 ≈ 5.545) and truncated/zero-filled junk
    // (→ 0) WITHOUT decoding anything. `byte_stats` (functions/
    // ByteStats.scala) fuses histogram + entropy fold into one codegen
    // loop per row — no per-byte explosion, no shuffle; the oracle
    // replays the identical per-term e6-rounded arithmetic from an
    // unnested byte table (the plan m05 exists to avoid). Downstream is
    // exact integer math, so the query is hash-stable cross-engine.
    "m05_byte_entropy" -> Q(
      run = (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .withColumn("st",
            graft.functions.GraftFunctions.byteStats(col("text").cast("binary")))
          .select(col("doc_id"),
            col("st").getItem(0).as("n_bytes"),
            col("st").getItem(1).as("n_distinct"),
            expr("st[2] div st[0]").as("entropy_e6"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH pos AS (SELECT doc_id, text,
                            unnest(range(1, octet_length(text::BLOB) + 1)) AS i
                     FROM documents),
        byt AS (SELECT doc_id,
                       ('0x' || hex(substr(text, CAST(i AS INT), 1)::BLOB))::INT
                         AS b
                FROM pos),
        hist AS (SELECT doc_id, b, count(*) AS c FROM byt GROUP BY 1, 2),
        tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS n_distinct
                FROM hist GROUP BY 1),
        terms AS (SELECT h.doc_id,
                         CAST(round(1000000 * h.c *
                           ln(CAST(t.n AS DOUBLE) / CAST(h.c AS DOUBLE)))
                           AS BIGINT) AS term
                  FROM hist h JOIN tot t USING (doc_id))
        SELECT t.doc_id, t.n AS n_bytes, t.n_distinct,
               CAST(sum(term) // t.n AS BIGINT) AS entropy_e6
        FROM terms JOIN tot t USING (doc_id)
        GROUP BY t.doc_id, t.n, t.n_distinct
        ORDER BY t.doc_id""")),

    // ── Payload integrity quarantine (pre-decode validation pass) ──────
    // The audit every multimodal ingest runs BEFORE spending decoder
    // cycles: does the payload's magic byte match its declared
    // modality, and does the stored checksum match the recomputed one?
    // The magic/modality rules are stubs in this pack's contract (no
    // real codecs here: declared modality from the source id, "magic"
    // = first payload byte class; checksum corruption injected at
    // doc_id % 97 = 0), but the plan is the production one: a narrow
    // per-row map over the binary column (substr + md5, no decode),
    // one source-keyed two-phase rollup, zero joins — quarantine at
    // 100 TB costs one scan, which is why it runs before m02's decoder
    // and not after.
    "m06_payload_quarantine" -> Q(
      run = (s, d) => {
        // to-end suffix + TRY_CAST on BOTH engines: a fixture whose
        // source ids grow or go non-numeric fails the gate comparably
        // instead of diverging on silent substr/cast differences
        val declared = when(
          expr("TRY_CAST(substr(source, 4) AS INT)") % 2 === 0, "img")
          .otherwise("audio")
        val head = substring(col("text"), 1, 1)
        val magicOk = when(col("modality") === "img",
          head >= "a" && head <= "m")
          .otherwise(head >= "n" && head <= "z")
        val actualSum = substring(md5(col("text").cast("binary")), 1, 2)
        val storedSum = when(col("doc_id") % 97 === 0, lit("!!"))
          .otherwise(actualSum)
        Tables.documents(s, d)
          .withColumn("modality", declared)
          .select(col("source"), col("modality"),
            (!magicOk).cast("long").as("bad_magic"),
            (storedSum =!= actualSum).cast("long").as("bad_sum"))
          .groupBy("source", "modality")
          .agg(count(lit(1)).as("n_payloads"),
            sum("bad_magic").as("n_wrong_magic"),
            sum("bad_sum").as("n_checksum_fail"),
            sum(greatest(col("bad_magic"), col("bad_sum")))
              .as("n_quarantined"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH v AS (
          SELECT source,
                 CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0
                      THEN 'img' ELSE 'audio' END AS modality,
                 substr(text, 1, 1) AS head,
                 CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS bad_sum,
                 doc_id
          FROM documents),
        f AS (SELECT source, modality,
                     CASE WHEN modality = 'img'
                          THEN CASE WHEN head BETWEEN 'a' AND 'm'
                                    THEN 0 ELSE 1 END
                          ELSE CASE WHEN head BETWEEN 'n' AND 'z'
                                    THEN 0 ELSE 1 END END AS bad_magic,
                     bad_sum
              FROM v)
        SELECT source, modality,
               count(*) AS n_payloads,
               CAST(sum(bad_magic) AS BIGINT) AS n_wrong_magic,
               CAST(sum(bad_sum) AS BIGINT) AS n_checksum_fail,
               CAST(sum(greatest(bad_magic, bad_sum)) AS BIGINT)
                 AS n_quarantined
        FROM f GROUP BY 1, 2 ORDER BY source"""))
  )
}
