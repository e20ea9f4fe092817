package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star-schema fixtures (TESTDATA.md).
  *
  * Reference analogue: the reference's only "source" is a directory of text
  * files enumerated sorted-by-name (reference manager/__main__.py:371-374);
  * the analytics surface instead reads typed parquet, letting Spark push
  * filters/projections into the scan.
  *
  * Note: the fixture dirs contain 10 parquet tables — the 8 listed in
  * TESTDATA.md plus `documents` and `embeddings` (used by the dedup /
  * similarity / text-analysis packs).
  *
  * `events.parquet` has shipped `ts` in two encodings across fixture
  * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
  * rejects outright ([PARQUET_TYPE_ILLEGAL]), so [[events]] reads it via
  * `spark.sql.legacy.parquet.nanosAsLong` and rebuilds a microsecond
  * TimestampType column with integer division (ns values ~1.7e18 exceed
  * double's 2^53 exact range, so a double roundtrip would corrupt them) —
  * and plain timestamp[us] (no tz → Spark infers TIMESTAMP_NTZ), which is
  * cast to TimestampType. The session timezone is UTC in every entrypoint,
  * so the NTZ→LTZ cast is value-identical to DuckDB's naive read. Oracle
  * SQL on `events.ts` must only observe µs-or-coarser views of the column
  * (epoch_us, date_trunc, strftime), which both encodings preserve.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) fixture
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>                                   // timestamp[us] fixture
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
