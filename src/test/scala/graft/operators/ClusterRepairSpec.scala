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

  test("refresh ≡ full recompute on the new snapshot, incl. the " +
      "bridge-abandonment case repair() alone cannot handle") {
    // prior graph: 2 bridges 1-2-3 (one component {1,2,3}), plus
    // untouched {20,21}. Doc 2's content changes: in the NEW graph it
    // abandons 1 and 3 entirely and pairs with 9 instead. A full
    // recompute on the new snapshot: {2,9} -> 2, {20,21} -> 20, and
    // 1/3 are now UNPAIRED singletons (absent from the relation).
    val priorPairs = Seq((1L, 2L), (2L, 3L), (20L, 21L)).toDF("a", "b")
    val newPairs = Seq((2L, 9L), (20L, 21L)).toDF("a", "b")
    val changed = Seq(2L).toDF("node")
    val priorAssign = ConnectedComponents.minLabel(priorPairs)
    val full = ConnectedComponents.minLabel(newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === Map(2L -> 2L, 9L -> 2L, 20L -> 20L, 21L -> 20L))
    val refreshed = ClusterRepair
      .refresh(priorPairs, newPairs, changed, priorAssign)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refreshed === full,
      "refresh diverged from the full new-snapshot recompute — stale " +
        "prior assignments for the abandoned neighbors 1/3 survived, or " +
        "the untouched component was disturbed")
    // the seed-scoped repair() cannot see the abandoned neighbors: its
    // new-graph BFS from 2 reaches only {2,9}, so a naive splice keeps
    // 1 and 3 under their stale prior cluster — pin that refresh's
    // union-graph BFS is what closes the gap
    val naive = ClusterRepair.repair(newPairs, changed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(naive === Map(2L -> 2L, 9L -> 2L),
      "fixture lost its power: repair() now sees abandoned neighbors")
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
