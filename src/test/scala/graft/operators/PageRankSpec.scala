package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("u", "v"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // star a(1)-b(2), a(1)-c(3), symmetrized; hand-computed integer steps:
  //   i1: b=c=150000+85*(1000000 div 2) div 100 = 575000
  //       a  =150000+85*(1000000+1000000) div 100 = 1850000
  //   i2: b=c=150000+85*(1850000 div 2) div 100 = 936250
  //       a  =150000+85*(575000+575000)  div 100 = 1127500
  //   i3: b=c=150000+85*(1127500 div 2) div 100 = 629187 (floor)
  //       a  =150000+85*(936250+936250)  div 100 = 1741625
  private val star = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))

  test("hand-computed integer steps on a 3-node star") {
    assert(ranks(star, 1) === Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    assert(ranks(star, 2) === Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
    assert(ranks(star, 3) === Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
  }

  test("symmetric ring is rank-uniform at every iteration") {
    // 1-2-3-1 bidirectional: perfect symmetry must stay exactly uniform
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
    val got = ranks(ring, 3)
    assert(got.values.toSet.size === 1)
    // each node: r' = 150000 + 85*(2*(r div 2)) div 100, from r0=1000000:
    // i1: 1000000 → 150000+850000 = 1000000 (fixed point)
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("results are partitioning-independent") {
    val df = star.toDF("u", "v").repartition(7)
    val got = PageRank.ranks(df, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
  }

  test("reliable checkpoint mode: identical ranks, files on disk") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
    val reliable = PageRank
      .ranks(star.toDF("u", "v"), 3, checkpointDir = Some(ckpt.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === ranks(star, 3),
      "reliable-checkpoint mode changed the answer")
    assert(java.nio.file.Files.list(ckpt).count() > 0,
      "checkpoint dir is empty — rounds did not go through the reliable path")
  }

  test("teleportTo: hand-computed personalized steps on the star") {
    // seed = {2}; base 150000 lands only on node 2:
    //   i1: a=0+85*(1000000+1000000) div 100      = 1700000
    //       b=150000+85*(1000000 div 2) div 100   = 575000
    //       c=0+85*(1000000 div 2) div 100        = 425000
    //   i2: a=0+85*(575000+425000) div 100        = 850000
    //       b=150000+85*(1700000 div 2) div 100   = 872500
    //       c=0+85*(1700000 div 2) div 100        = 722500
    val got = PageRank.ranks(star.toDF("u", "v"), 2,
      teleportTo = Some(Seq(2L).toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 850000L, 2L -> 872500L, 3L -> 722500L))
  }

  test("teleportTo = all nodes degenerates to the default mode exactly") {
    val all = Seq(1L, 2L, 3L).toDF("node")
    val got = PageRank.ranks(star.toDF("u", "v"), 3, teleportTo = Some(all))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ranks(star, 3))
  }

  test("teleportTo under redistributeDangling is refused") {
    assertThrows[IllegalArgumentException] {
      PageRank.ranks(star.toDF("u", "v"), 2, redistributeDangling = true,
        teleportTo = Some(Seq(1L).toDF("node")))
    }
  }

  test("asymmetric input without dangling redistribution is refused") {
    // 1→2, 1→3: nodes 2 and 3 are pure sinks — the default contract
    // must fail loudly instead of silently dropping their mass
    val sinks = Seq((1L, 2L), (1L, 3L))
    val ex = intercept[IllegalArgumentException] {
      PageRank.ranks(sinks.toDF("u", "v"), 1).collect()
    }
    assert(ex.getMessage.contains("symmetrized"))
  }

  // dangling mode on 1→2, 1→3 (N=3, sinks {2,3}), hand-computed:
  //   i1: dsum = 2000000, dsum div 3 = 666666
  //       r(1) = 150000 + 85*666666 div 100          = 716666
  //       r(2) = r(3) = 150000 + 85*(500000+666666) div 100 = 1141666
  //   i2: dsum = 2283332, dsum div 3 = 761110
  //       r(1) = 150000 + 85*761110 div 100          = 796943
  //       r(2) = r(3) = 150000 + 85*(358333+761110) div 100 = 1101526
  test("dangling-mass redistribution: hand-computed integer steps") {
    val sinks = Seq((1L, 2L), (1L, 3L))
    def dr(iters: Int): Map[Long, Long] =
      PageRank.ranks(sinks.toDF("u", "v"), iters,
          redistributeDangling = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dr(1) === Map(1L -> 716666L, 2L -> 1141666L, 3L -> 1141666L))
    assert(dr(2) === Map(1L -> 796943L, 2L -> 1101526L, 3L -> 1101526L))
  }

  test("dangling mode on a symmetric graph matches the default mode") {
    // no dangling nodes → dsum = 0 every round → the two modes coincide
    val got = PageRank.ranks(star.toDF("u", "v"), 3,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
  }

  test("tol=0 ≡ fixed rounds (the oracle-replayable surface, unchanged)") {
    val got = PageRank.ranks(star.toDF("u", "v"), 3, tol = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ranks(star, 3))
  }

  test("tol mode stops at its convergence round and returns exactly " +
      "that round's fixed-round state") {
    // Self-calibrating (no hand-picked round number): a driver-side
    // integer simulator — the exact update rule, r'(v) = 150000 +
    // (85·Σ r(u) div d(u)) div 100, on this 3-node graph — walks the
    // fixed-round trajectory r_1..r_cap, finds the first round i*
    // whose max|Δ| vs the previous round is ≤ tol, and the spec pins
    // BOTH that the engine agrees with the simulator at i* (one fixed-
    // round run) AND that the tol run (capped far above i*) returns
    // r_{i*} exactly — falsifiable if early-stop fires a round off or
    // not at all. (Walking the trajectory with 40 Spark runs would
    // cost O(cap²) rounds; the simulator is why this test is cheap.)
    def simulate(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = deg.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val contrib = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _) => r(u) / deg(u) }.sum
        }
        r = contrib.map { case (v, s) => v -> (150000L + 85L * s / 100L) }
      }
      r
    }
    // simulator ≡ engine on the hand-computed prefix
    assert(simulate(star, 3) ===
      Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
    val tol = 50000L
    val cap = 40
    val traj = (1 to cap).map(k => simulate(star, k))
    val iStar = (1 until cap).find { k =>
      val prev = traj(k - 1); val cur = traj(k)
      cur.keys.map(n => math.abs(cur(n) - prev(n))).max <= tol
    }.map(_ + 1).getOrElse(fail(s"star never converged within $cap rounds"))
    assert(iStar > 1, "graph converges immediately — test has no power")
    assert(ranks(star, iStar) === traj(iStar - 1),
      s"engine diverged from the simulator at round $iStar")
    val tolRun = PageRank.ranks(star.toDF("u", "v"), cap, tol = tol)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tolRun === traj(iStar - 1),
      s"tol run did not stop at round $iStar with the fixed-round state")
  }

  test("initialRanks resume: ranks(e,5) ≡ ranks(e,3, init = ranks(e,2))") {
    val full = ranks(star, 5)
    val r2 = PageRank.ranks(star.toDF("u", "v"), 2)
    val resumed = PageRank.ranks(star.toDF("u", "v"), 3,
        initialRanks = Some(r2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === full, "resume from an intermediate state diverged")
  }

  test("initialRanks resume holds in dangling-redistribution mode") {
    val sinks = Seq((1L, 2L), (1L, 3L))
    def dr(iters: Int, init: Option[org.apache.spark.sql.DataFrame] = None) =
      PageRank.ranks(sinks.toDF("u", "v"), iters,
          redistributeDangling = true, initialRanks = init)
    val full = dr(4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val resumed = dr(2, Some(dr(2)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === full)
  }

  test("shuffle fallback (broadcastRankMax=0) ≡ broadcast mode, all modes") {
    // the billion-node posture must be bit-identical to the zero-shuffle
    // broadcast round shape (the round-13 rebuild's equivalence contract,
    // KCoreSpec's fallback-≡-broadcast case for this operator)
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(PageRank.ranks(star.toDF("u", "v"), 3, broadcastRankMax = 0L))
      === ranks(star, 3), "default mode diverged under the fallback")
    assert(m(PageRank.ranks(star.toDF("u", "v"), 2,
        teleportTo = Some(Seq(2L).toDF("node")), broadcastRankMax = 0L))
      === Map(1L -> 850000L, 2L -> 872500L, 3L -> 722500L),
      "teleport mode diverged under the fallback")
    val sinks = Seq((1L, 2L), (1L, 3L))
    assert(m(PageRank.ranks(sinks.toDF("u", "v"), 3,
        redistributeDangling = true, broadcastRankMax = 0L))
      === m(PageRank.ranks(sinks.toDF("u", "v"), 3,
        redistributeDangling = true)),
      "dangling mode diverged under the fallback")
  }

  test("trustSymmetry=true (reversed-projection destination pin) ≡ " +
      "default independent repartition on symmetric input") {
    // the round-14 setup optimization derives the destination-
    // partitioned edge copy by column-swapping the source pin, valid
    // exactly when the input equals its own reversal — pin that both
    // paths agree on a symmetric graph, at two round counts, and with
    // a hand-computed expectation so a double-reversal bug (which
    // would also agree with itself) can't hide. Since round 15 the
    // DEFAULT is the strict path (the r14 advice: the runtime guard
    // checks dangling-freeness, not symmetry) and symmetric-union
    // builders opt IN — this test is the opt-in's license.
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (iters <- Seq(1, 3)) {
      val trusted = m(PageRank.ranks(star.toDF("u", "v"), iters,
        trustSymmetry = true))
      assert(trusted === ranks(star, iters),
        s"trustSymmetry=true diverged from the default at iterations=$iters")
    }
    assert(m(PageRank.ranks(star.toDF("u", "v"), 1, trustSymmetry = true))
      === Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
  }
}
