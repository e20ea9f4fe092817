package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Pins d20's hot-block guard: prefix blocking bounds the quadratic
  * within-block pair join ONLY while blocks stay small. A natural-name
  * corpus where many names share the blocking prefix (all but the last
  * 2 chars) concentrates into one hot block — the exact failure mode
  * the query exists to prevent — and must FAIL LOUDLY at plan-build
  * time (the d05 200k-vector refusal pattern), not silently run a
  * quadratic join. */
class EntityBlocksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("adversarial shared-prefix corpus is refused at plan-build time") {
    // 20 distinct names, identical except the last 2 chars → ONE block
    // of 20; with cap 10 the within-block join would score 190 pairs
    // per 20 names — quadratic growth the guard exists to stop
    val hot = (10 to 29).map(i => s"Acme Global Holdings $i").toDF("c_name")
    val e = intercept[IllegalArgumentException] {
      DedupPack.entityBlocks(hot, maxBlock = 10L)
    }
    assert(e.getMessage.contains("hot-block guard"))
    assert(e.getMessage.contains("20"), "message should name the hot size")
  }

  test("well-blocked corpus passes the same cap and reports max_block") {
    // 30 names in 10 blocks of 3 (prefix differs per block) — under cap
    val ok = (0 until 30)
      .map(i => f"Vendor-${i / 3}%03d ${i % 3}%02d").toDF("c_name")
    val row = DedupPack.entityBlocks(ok, maxBlock = 10L).head
    assert(row.getAs[Long]("n_blocks") === 10L)
    assert(row.getAs[Long]("n_distinct_names") === 30L)
    assert(row.getAs[Long]("max_block") === 3L,
      "max_block audit column must carry the hottest block's size")
  }

  test("block key derives from each name's own length, not a fixed 16") {
    // 9-digit-key names (22 chars) drifting only in the last 2 chars
    // must still share a block — a fixed 16-char prefix would coarsen
    // blocking for long names and miss these as candidates
    val long = Seq("Customer#000123456789a", "Customer#000123456789b")
      .toDF("c_name")
    val row = DedupPack.entityBlocks(long, maxBlock = 10L).head
    assert(row.getAs[Long]("n_blocks") === 1L)
    assert(row.getAs[Long]("n_cand_pairs") === 1L,
      "same-block pair not scored — block key is not length-derived")
    assert(row.getAs[Long]("n_linked_row_pairs") === 1L)
  }
}
