package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession
import graft.queries.{DedupPack, GraphPack, SimilarityPack}

/** Pins the session-cache registry (round 10, verdict item 5): the
  * full-suite Verify run sweeps pack memos at query-group boundaries,
  * and the sweep must actually release EVERY pack's pinned blocks — a
  * registry that misses one memo recreates exactly the unbounded
  * accumulation that collapsed the shared-session sf10 run. The per-
  * pack clears have their own specs (DedupCacheSpec, PqCacheSpec,
  * GraphCacheSpec); this spec pins the REGISTRY: one sweep, all three
  * populated memos gone, and consumers still answer afterwards. */
class CachesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def persisted = spark.sparkContext.getPersistentRDDs.keySet

  test("one sweep releases every pack's memoized blocks") {
    Caches.sweep(spark)
    val before = persisted
    // populate all three pack memos through memo-only consumers (the
    // per-pack specs' choices: no LineageCut engine pins in these)
    assert(SparkEntry.queries("d03_minhash_lsh")(spark, sfDir).count() > 0)
    assert(SparkEntry.queries("s12_pq_adc_topk")(spark, sfDir).count() > 0)
    assert(SparkEntry.queries("g12_degree_skew")(spark, sfDir).count() > 0)
    assert((persisted -- before).nonEmpty,
      "expected the three consumers to materialize their pack memos")
    Caches.sweep(spark)
    assert((persisted -- before).isEmpty,
      s"sweep left blocks pinned: ${(persisted -- before).toSeq.sorted}")
    // swept memos rebuild transparently on the next request
    assert(SparkEntry.queries("g12_degree_skew")(spark, sfDir).count() > 0)
    Caches.sweep(spark)
  }

  test("storageBytes reports the block-manager footprint") {
    Caches.sweep(spark)
    SparkEntry.queries("g12_degree_skew")(spark, sfDir).count()
    val (n, mem, disk) = Caches.storageBytes(spark)
    assert(n > 0, "expected at least the edge memo to be resident")
    assert(mem + disk > 0, "resident memo reported zero bytes")
    Caches.sweep(spark)
  }
}
