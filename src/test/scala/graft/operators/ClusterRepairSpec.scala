package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.SparkTestSession

/** Pins [[ClusterRepair]]'s contract: output covers EXACTLY the
  * seed-touched components (the untouched-component no-op), ids equal
  * the full recompute's, and the production splice (prior assignments
  * of untouched components ∪ repaired) reproduces a full re-run. */
class ClusterRepairSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three components: {1,2,3} (chain 1-2-3), {10,11}, {20,21,22}
  private val pairs =
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))

  private def repairMap(seeds: Seq[Long]): Map[Long, Long] =
    ClusterRepair.repair(pairs.toDF("da", "db"), seeds.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fullMap: Map[Long, Long] =
    ConnectedComponents.minLabel(pairs.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("repairs exactly the touched component, ids match full recompute") {
    // seed 3 touches only {1,2,3}; a mid-chain update must still reach
    // the whole component (BFS closes over it), labeled by the SAME
    // min id the full run assigns
    assert(repairMap(Seq(3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("untouched components are a no-op (absent from the output)") {
    val got = repairMap(Seq(21L))
    assert(got === Map(20L -> 20L, 21L -> 20L, 22L -> 20L))
    assert(!got.keySet.exists(Set(1L, 2L, 3L, 10L, 11L)),
      "repair recomputed a component no changed doc touches")
  }

  test("splice identity: prior(untouched) ∪ repaired ≡ full recompute") {
    val full = fullMap
    val repaired = repairMap(Seq(2L, 11L))
    val touchedComponents = repaired.values.toSet
    val priorUntouched = full.filterNot {
      case (_, c) => touchedComponents(c)
    }
    assert(priorUntouched ++ repaired === full)
  }

  test("isolated seeds (not in the pair graph) contribute nothing") {
    assert(repairMap(Seq(999L)) === Map.empty)
  }

  test("maxDiameter below the component diameter throws, never truncates") {
    // {1,2,3} has diameter 2 from seed 1; maxDiameter=1 would truncate
    // the affected set (r13 advice: the splice identity would fail
    // silently) — the BFS exhaustion guard must throw instead
    val ex = intercept[IllegalArgumentException] {
      ClusterRepair.repair(pairs.toDF("da", "db"), Seq(1L).toDF("node"),
        maxDiameter = 1).collect()
    }
    assert(ex.getMessage.contains("TRUNCATED"))
  }
}
