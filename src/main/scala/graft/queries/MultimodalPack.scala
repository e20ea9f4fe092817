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
        ORDER BY doc_id, frame_no"""))
  )
}
