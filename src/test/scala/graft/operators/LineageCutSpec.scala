package graft.operators

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Pins the bounded-storage contract of [[LineageCut]]: superseded
  * per-round checkpoints are unpersisted BY CONSTRUCTION (FIFO
  * rotation), not left to ContextCleaner GC timing — so a
  * 100-iteration production run holds ≤ pins + keep node-sized states
  * no matter how long it runs. */
class LineageCutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cutRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.get

  test("rotation unpersists everything more than `keep` generations old") {
    val lc = new LineageCut(None, keep = 2)
    val gens = (1 to 5).map { i =>
      cutRdd(lc(Seq((i.toLong, i.toLong)).toDF("a", "b")))
    }
    // generations 1-3 evicted, 4-5 (the last `keep`) still persisted
    assert(gens.take(3).forall(_.getStorageLevel == StorageLevel.NONE),
      "superseded generations still hold blocks")
    assert(gens.drop(3).forall(_.getStorageLevel != StorageLevel.NONE),
      "live generations were evicted — later rounds would recompute " +
        "through a truncated lineage and fail")
  }

  test("pinned setup relations never rotate out") {
    val lc = new LineageCut(None, keep = 1)
    val pinned = cutRdd(lc.pin(Seq((1L, 2L)).toDF("a", "b")))
    (1 to 4).foreach(i => lc(Seq((i.toLong, i.toLong)).toDF("a", "b")))
    assert(pinned.getStorageLevel != StorageLevel.NONE,
      "a pinned edge list was evicted by the per-round rotation")
  }

  test("a 12-iteration PageRank leaves O(1) persisted RDDs, not O(rounds)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (3L, 2L), (1L, 3L)).toDF("u", "v")
    // trustSymmetry=true (the ring IS symmetric): keeps the r14 pin
    // budget this test counts — the strict default adds a third pin
    val got = PageRank.ranks(ring, 12, trustSymmetry = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // symmetric ring fixed point survives the long run + rotation
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    val added = sc.getPersistentRDDs.keySet -- before
    // 2 pins (e, ed) + keep=2 rank states; 12 rounds WITHOUT the
    // rotation would leave 14+
    assert(added.size <= 4,
      s"expected ≤4 persisted RDDs after 12 rounds, found ${added.size} — " +
        "the rotation is not releasing superseded rounds")
  }

  test("reliable mode deletes evicted generations' checkpoint files") {
    // a 100-round production run must not accumulate 100 node-sized
    // tables on HDFS: only pins + keep generations may remain on disk
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lc-ckpt")
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (3L, 2L), (1L, 3L)).toDF("u", "v")
    val got = PageRank.ranks(ring, 10, checkpointDir = Some(ckpt.toString),
        trustSymmetry = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    val rddDirs = {
      val s = java.nio.file.Files.walk(ckpt)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .count(p => p.getFileName.toString.startsWith("rdd-"))
      } finally s.close()
    }
    // 2 pins (e, ed) + keep=2 rank generations; 10 rounds WITHOUT the
    // cleanup would leave 12+
    assert(rddDirs <= 4,
      s"expected ≤4 rdd-* checkpoint dirs after 10 reliable rounds, " +
        s"found $rddDirs — evicted generations' files are not deleted")
  }

  test("reliable cut evaluates its input plan ONCE (round 15): the " +
      "persist shields doCheckpoint's write pass from recomputing") {
    // Dataset.checkpoint(eager=true) runs the count job, then
    // RDD.doCheckpoint re-executes the lineage to write the files —
    // 2× the plan unless blocks shield it. An accumulator-bumping UDF
    // makes the evaluation count observable: 100 rows must bump it
    // exactly 100 times, not 200 (the pre-round-15 reliable behavior).
    import org.apache.spark.sql.functions.{col, udf}
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lc-once")
    val evals = spark.sparkContext.longAccumulator("plan-evals")
    val bump = udf((x: Long) => { evals.add(1L); x })
    val lc = new LineageCut(Some(ckpt.toString))
    val cut = lc(spark.range(100).select(bump(col("id")).as("a")))
    assert(cut.count() === 100L)
    assert(evals.value === 100L,
      s"reliable cut evaluated its plan ${evals.value / 100.0} times — " +
        "the checkpoint write pass is recomputing instead of reading blocks")
  }

  test("Sssp long relaxation chain survives the rotation (eviction stress)") {
    // path 1→2→…→9 forces 8 relaxation rounds; every round's dist AND
    // frontier read the previous merged cut (round 15: both are
    // projections/filters of ONE keep=2 generation — before that, the
    // frontier was its own cut reading dist two generations back), so a
    // rotation bug that evicts a still-referenced generation breaks here
    val chain = (1L to 8L).map(i => (i, i + 1, 10L)).toDF("u", "v", "w")
    val src = Seq(1L).toDF("node")
    val got = Sssp.distances(chain, src, maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 9L).map(i => i -> (i - 1) * 10L).toMap)
  }
}
