package graft.plans

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.{Plans, SparkEntry}
import graft.mr.SparkTestSession

/** PLANS.md freshness gate (round-10 stretch item): the committed
  * artifact records the headline/heavy queries' physical-plan shapes,
  * and round 9 proved it can silently go stale — three plans changed
  * (d02's shuffle_hash hint, Hits' single-evaluation, the edge cache)
  * under an r8-generated file. This spec recomputes every query's
  * plan-shape fingerprint (operator-name sequence, see
  * [[Plans.treeOps]]) under Plans' own session config (AQE on,
  * shuffle partitions 8, sf0.01) and fails on any divergence from the
  * committed `## Fingerprints` index — the fix is one command:
  * `sbt "runMain graft.Plans"`. */
class PlanFreshnessSpec extends AnyFunSuite {

  private def committed: Map[String, String] = {
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("PLANS.md")).asScala
    val start = lines.indexWhere(_.startsWith("## Fingerprints"))
    assert(start >= 0,
      "PLANS.md has no '## Fingerprints' section — regenerate it: " +
        "sbt \"runMain graft.Plans\"")
    lines.drop(start + 1)
      .dropWhile(!_.startsWith("```")).drop(1)
      .takeWhile(!_.startsWith("```"))
      .filter(_.trim.nonEmpty)
      .map { l =>
        val i = l.indexOf(' ')
        l.take(i) -> l.drop(i + 1).trim
      }.toMap
  }

  test("committed fingerprints match the plans the queries build today") {
    // mirror graft.Plans' session config in a child session — SQLConf
    // is per-session, so this doesn't disturb the shared test session;
    // master core count doesn't enter the plan shape. Round 11: the
    // index covers the WHOLE registry (219 names), walked by the same
    // Plans.fingerprintAll the generator uses (pack order + group-
    // boundary sweeps), so memo-dependent shapes recompute identically.
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val sfDir = "/root/testdata/sf0.01"
    val pinned = committed
    val current = Plans.fingerprintAll(spark, sfDir)
    assert(current.map(_._1).toSet === pinned.keySet,
      "PLANS.md fingerprint index covers a different query set than the " +
        "current registry — regenerate: sbt \"runMain graft.Plans\"")
    val stale = current.flatMap { case (name, (now, _)) =>
      if (now != pinned(name)) Some(s"$name:\n  committed ${pinned(name)}\n  current   $now")
      else None
    }
    assert(stale.isEmpty,
      s"PLANS.md is stale for ${stale.size} quer${if (stale.size == 1) "y" else "ies"} — " +
        "regenerate it (sbt \"runMain graft.Plans\") and review the diff:\n" +
        stale.mkString("\n"))
  }

  test("treeOps extracts the operator sequence and ignores volatile ids") {
    val formatted =
      """== Physical Plan ==
        |AdaptiveSparkPlan (9)
        |+- Sort (8)
        |   +- Exchange (7)
        |      +- HashAggregate (6)
        |         :- Project (3)
        |         +- Scan parquet  (1)
        |
        |(1) Scan parquet
        |Output [7]: [l_quantity#4]
        |""".stripMargin
    assert(Plans.treeOps(formatted) === Seq("AdaptiveSparkPlan", "Sort",
      "Exchange", "HashAggregate", "Project", "Scan parquet"))
    assert(Plans.treeOps("no plan here") === Seq.empty)
  }
}
