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

  test("strayUnpersist reclaims engine leftovers but never pack memos") {
    import spark.implicits._
    Caches.sweep(spark)
    Caches.strayUnpersist(spark)
    // populate a pack memo (the graph edge relation) ...
    assert(SparkEntry.queries("g12_degree_skew")(spark, sfDir).count() > 0)
    val withMemo = persisted
    assert(withMemo.nonEmpty, "expected the edge memo resident")
    // ... then run an iterative engine directly: its final LineageCut
    // generations stay pinned after the result is consumed — the
    // per-query leak SHARED_r11's sweep arm OOM'd on
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (4L, 5L), (5L, 4L)).toDF("a", "b")
    assert(operators.ConnectedComponents.minLabel(edges).count() === 5)
    assert((persisted -- withMemo).nonEmpty,
      "expected the engine to leave transient cuts behind")
    // the rotation released superseded generations itself (untrack):
    // the stray count is the final keep-window + pins, not one per
    // round — a handful, never tens
    val released = Caches.strayUnpersist(spark)
    assert(released > 0 && released < 10,
      s"expected a bounded leftover set, got $released")
    assert((persisted -- withMemo).isEmpty,
      s"strays survived: ${(persisted -- withMemo).toSeq.sorted}")
    assert(withMemo.subsetOf(persisted),
      "strayUnpersist must never touch pack-owned memos")
    // memo still answers without rebuild
    assert(SparkEntry.queries("g12_degree_skew")(spark, sfDir).count() > 0)
    Caches.sweep(spark)
    Caches.strayUnpersist(spark)
  }

  test("strayUnpersist deletes reliable-checkpoint leftover dirs") {
    import spark.implicits._
    import java.nio.file.{Files, Path}
    Caches.strayUnpersist(spark)
    val dir = Files.createTempDirectory("graft-stray-ckpt")
    def rddDirs: Seq[Path] = {
      val s = Files.walk(dir)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.filter(p => p.getFileName.toString.startsWith("rdd-"))
        .toList
      finally s.close()
    }
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("a", "b")
    assert(operators.ConnectedComponents
      .minLabel(edges, checkpointDir = Some(dir.toString)).count() === 3)
    // the final generations' checkpoint files survive the run (the
    // rotation only deleted SUPERSEDED ones)
    assert(rddDirs.nonEmpty, "expected leftover rdd-N checkpoint dirs")
    assert(Caches.strayUnpersist(spark) > 0)
    assert(rddDirs.isEmpty,
      s"reliable leftovers survived: $rddDirs")
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
