package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compact tail record Bench prints AFTER its full JSON line
  * (round-8 verdict item 5): the driver's BENCH_r{N}.json keeps only
  * the last ~2000 chars of output, and r7/r8's single full-JSON line
  * was sliced mid-record ("parsed": null). The summary line must stay
  * parseable inside any such tail window — < 500 chars, valid JSON,
  * headline fields present — including under pathological inputs
  * (long failure lists, long sf paths). json4s ships with Spark, so
  * "valid JSON" here is a real parser, not a regex. */
class BenchSummarySpec extends AnyFunSuite {

  private val fields = Seq("summary", "total", "iter_total", "heavy_total",
    "total_norm", "iter_total_norm", "heavy_total_norm",
    "par_over_scalar", "basis",
    "stream_rows_per_sec", "stream_rows_per_sec_norm", "stream_ok",
    "batch_ms_p50", "batch_ms_p95",
    "calib_sec", "calib_par_sec", "n_failed", "failed", "sf")

  test("summary line is < 500 chars, valid JSON, all headline fields") {
    val line = Bench.summaryLine(7.873456, 14.2345, 3.1,
      7.1234, 13.5678, 2.9876, 1.0412, 153000L, 159000L,
      streamOk = true, 210L, 480L, 0.8123, 0.6345, Nil,
      "/root/testdata/sf0.1")
    assert(line.length < 500, s"summary line is ${line.length} chars")
    val parsed = JsonMethods.parse(line)
    for (f <- fields)
      assert((parsed \ f) !== JNothing, s"summary line is missing '$f'")
    assert((parsed \ "total").values === 7.873)
    assert((parsed \ "total_norm").values === 7.123)
    assert((parsed \ "stream_rows_per_sec").values === 153000L)
  }

  test("summary line stays < 500 chars under pathological inputs") {
    // every query failed with long names, sf path is absurdly long —
    // the cap (3 names + count) and the path tail-trim must hold
    val manyFailed = (1 to 60).map(i => s"q${i}_some_long_query_name_here")
    val line = Bench.summaryLine(-1.0, -1.0, -1.0,
      -1.0, -1.0, -1.0, 99.876543, -1L, -1L,
      streamOk = false, -1L, -1L, 99.987654, 99.123456, manyFailed,
      "/very/long/prefix/" + ("x" * 300))
    assert(line.length < 500, s"summary line is ${line.length} chars")
    val parsed = JsonMethods.parse(line)
    assert((parsed \ "n_failed").values === 60L)
    assert((parsed \ "failed").asInstanceOf[JArray].arr.length === 3)
  }

  test("basis declares the comparison field per the par_over_scalar gate") {
    // ≤ 1.15 → raw numbers are the round-over-round basis; above it,
    // the normalized totals are (the r10 gray-zone close: a 1.24
    // reading now self-declares instead of needing adjudication)
    def basisAt(ratio: Double): String = {
      val line = Bench.summaryLine(10.0, 14.0, 4.0, 9.0, 13.0, 3.7,
        ratio, 125000L, 130000L, streamOk = true, 210L, 480L, 0.9, 1.1,
        Nil, "/x")
      (JsonMethods.parse(line) \ "basis").values.toString
    }
    assert(basisAt(1.02) === "raw")
    assert(basisAt(1.15) === "raw")
    assert(basisAt(1.24) === "norm")
    assert(basisAt(1.48) === "norm")
    assert(Bench.RawBasisCeiling === 1.15)
  }

  test("per-query line: short names unique, both tables, fits the tail") {
    // the whole-board record (round 12): 23 rows on both bases must
    // fit the driver's ~2000-char tail WINDOW together with the
    // summary line — pin the bound at 900 chars and real-parser
    // validity, and pin that the short-prefix keys cannot collide
    // across the actual bench membership
    val all = SparkEntry.benchQueries ++ SparkEntry.benchIterQueries ++
      SparkEntry.benchHeavyQueries
    val shorts = all.map(_.takeWhile(_ != '_'))
    assert(shorts.distinct.length === shorts.length,
      s"short-prefix collision in bench membership: $shorts")
    val mins = all.map(n => n -> 123.456789)
    val line = Bench.perQueryLine(mins, mins)
    assert(line.length < 900, s"per-query line is ${line.length} chars")
    val parsed = JsonMethods.parse(line)
    assert((parsed \ "per_query").values === 1L)
    val tab = (parsed \ "mins").asInstanceOf[JObject].obj
    assert(tab.length === all.length)
    assert(tab.forall(_._2.values === 123.457))
    assert((parsed \ "mins_norm").asInstanceOf[JObject].obj.length ===
      all.length)
  }

  test("stream floor is a norm-basis constant (round 13)") {
    // the floor gates stream_rows_per_sec_norm, which is already
    // contention-corrected, so the floor must be a PINNED constant —
    // the pre-r13 floor scaled a raw-era base by the live parallel
    // probe, correcting for contention twice. 40k ≈ 1/3 of the r12
    // norm reading (122.7k rows/s), the raw-era floor's same
    // one-third-of-observed doctrine.
    assert(Bench.StreamFloorNormRowsPerSec === 40000L)
  }
}
