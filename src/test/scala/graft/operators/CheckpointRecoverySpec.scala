package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Fault-injection for reliable-checkpoint mode (round-8 verdict item):
  * the stated reason `checkpointDir` exists is surviving process loss,
  * but until this spec the operator specs only pinned local ≡ reliable
  * on HEALTHY runs. Here the driver "dies": the SparkContext is STOPPED
  * after a partial PageRank run, a fresh context starts, and the last
  * round's state is reconstructed from the checkpoint FILES alone —
  * proving (a) the files are sufficient without any surviving block or
  * lineage, (b) [[LineageCut]]'s rotation never deleted a generation a
  * restart needs, and (c) the `initialRanks` resume surface continues
  * the remaining rounds bit-identically to an uninterrupted run.
  *
  * Runs against the shared test session deliberately: sbt executes
  * suites sequentially in one forked JVM and [[SparkTestSession]]
  * rebuilds on a stopped context, so later suites transparently get a
  * fresh session (documented there).
  */
class CheckpointRecoverySpec extends AnyFunSuite {

  private val star = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
  private val rankSchema = StructType(Seq(
    StructField("node", LongType, nullable = false),
    StructField("r", LongType, nullable = false)))

  test("PageRank state survives a SparkContext restart and resumes " +
      "bit-identically from the checkpoint files") {
    val ckptDir = Files.createTempDirectory("graft-recovery")
    // ── session A: the run that will "lose its driver" ──────────────
    val sparkA = SparkTestSession.spark
    val edgesA = sparkA.createDataFrame(star).toDF("u", "v")
    // the uninterrupted 5-round answer, captured to plain driver
    // memory BEFORE the restart (nothing Spark-owned survives it)
    val expected5 = PageRank.ranks(edgesA, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // partial run: 2 rounds through the reliable-checkpoint path
    val r2 = PageRank.ranks(edgesA, 2, checkpointDir = Some(ckptDir.toString))
    val expected2 = r2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stateFile = CheckpointRecovery.checkpointFileOf(r2)
      .getOrElse(fail("final round state has no reliable checkpoint file"))
    // ── the fault: driver process state is gone ─────────────────────
    sparkA.stop()
    assert(sparkA.sparkContext.isStopped)
    // ── session B: fresh context, reconstruct from files alone ──────
    val sparkB = SparkTestSession.spark
    assert(sparkB.sparkContext ne sparkA.sparkContext,
      "test harness handed back the stopped context")
    val restored = CheckpointRecovery.reload(sparkB, stateFile, rankSchema)
    val restoredMap =
      restored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(restoredMap === expected2,
      "checkpoint files did not reproduce the last completed round")
    // ── resume rounds 3..5 and match the uninterrupted run ──────────
    val edgesB = sparkB.createDataFrame(star).toDF("u", "v")
    val resumed = PageRank.ranks(edgesB, 3, initialRanks = Some(restored))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === expected5,
      "post-restart resume diverged from the uninterrupted 5-round run")
  }
}
