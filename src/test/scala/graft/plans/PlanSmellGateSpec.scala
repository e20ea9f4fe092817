package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{PlanSmells, SparkEntry}
import graft.mr.SparkTestSession

/** The plan-smell inventory (SCALE.md "Plan-smell audit") turned from a
  * manual `graft.Scratch` re-run into a FAILING GATE: every registered
  * query's executed plan is audited for the three shapes that do not
  * survive scale-up (BroadcastNestedLoopJoin / CartesianProduct /
  * SinglePartition), and the result must EXACTLY match the committed
  * allowlist below — each accepted flag carries its one-line
  * adjudication. A new query (or a plan regression in an old one)
  * introducing an unadjudicated cartesian now fails `sbt test` instead
  * of waiting for a human to re-run the sweep; a flag that VANISHES
  * also fails, so the inventory can never go stale in either direction.
  *
  * Environment note: flags are audited at sf0.001 under the shared
  * test session (local[4]); the committed set was generated in this
  * exact environment and is deterministic for the fixed fixture.
  */
class PlanSmellGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private val B = "BroadcastNestedLoopJoin"
  private val S = "SinglePartition"

  /** query → (accepted flags, one-line adjudication). Three recurring
    * accepted shapes:
    *   CARD  — global scalar aggregate: the single final partition
    *           consumes one partial row per upstream task, never data;
    *           the correct plan for a one-row answer.
    *   CROSS — a 1-row (or bounded-literal) aggregate broadcast into a
    *           per-row computation via cross join (the p01 pattern):
    *           BNLJ whose inner side is O(1)-O(10) rows is a map-side
    *           flatMap, not a scale risk.
    *   SPINE — unpartitioned window/cumulate over an ALREADY-AGGREGATED
    *           metadata-sized relation (hours, sources, deciles,
    *           manifest rows — the p08 pattern).
    */
  val allowed: Map[String, (Set[String], String)] = Map(
    "d01_exact_dedup" -> (Set(S), "CARD: 1-row duplicate-census answer"),
    "d05_embedding_neardup" -> (Set(B),
      "designed O(n^2) recall yardstick; 200k-vector plan-build cap is the fence"),
    "d13_dup_census" -> (Set(B, S), "CROSS: 1-row corpus totals into per-row share"),
    "d15_lsh_eval" -> (Set(S), "CARD: 1-row LSH recall/precision card"),
    "d16_hot_shingles" -> (Set(B, S), "CROSS: 1-row total-pairs agg into per-shingle share"),
    "d17_lsh_precision" -> (Set(S), "CARD: 1-row precision card"),
    // d18's former CROSS (1-row norm totals) vanished in round 15: the
    // weighted relation is now cut, so the scalar injection runs once
    // at cut-build time and the final plan is a block-scan join.
    "d19_banding_sweep" -> (Set(B, S), "CROSS: 3-row (b,r) grid x 1-row truth totals"),
    "d20_entity_blocks" -> (Set(B, S),
      "CROSS: 1-row block census x 1-row pair agg; blocks are hot-block-guarded"),
    "e10_funnel" -> (Set(S), "CARD: 1-row funnel conversion card"),
    "e13_cumulative_users" -> (Set(S), "SPINE: cumulate over the month spine"),
    "e21_bounded_funnel" -> (Set(S), "CARD: 1-row bounded-funnel card"),
    "e22_late_events" -> (Set(S), "SPINE: running max over arrival batches"),
    "e23_delay_sweep" -> (Set(S), "SPINE: 3-row allowed-lateness sweep"),
    "e24_peak_concurrency" -> (Set(S), "SPINE: running sum over distinct minutes"),
    "g11_modularity" -> (Set(B, S), "CROSS: 1-row 2m edge total into per-community terms"),
    "g12_degree_skew" -> (Set(B, S),
      "CROSS: 1-row degree card x 1-row ln-ln fit (the skew instrument itself)"),
    "p01_corpus_pipeline" -> (Set(S), "CARD: 1-row pipeline audit card"),
    "p07_quality_checks" -> (Set(S), "CARD: five 1-row check branches unioned"),
    "p08_source_mix" -> (Set(S), "SPINE: shares over the source relation"),
    "p11_temperature_mix" -> (Set(S), "SPINE: ppm weights over the 5-row lang relation"),
    "p18_source_cap" -> (Set(S), "SPINE: water-filling over the 5-row lang relation"),
    "p20_shard_manifest" -> (Set(S), "SPINE: deviation over the 16-row manifest"),
    "p22_canary_scan" -> (Set(B), "CROSS: bounded canary-literal list into doc scan"),
    "p26_repeat_budget" -> (Set(S),
      "SPINE: share/budget windows over the |sources| aggregate"),
    "q02_filter_pushdown" -> (Set(S), "CARD: 1-row pushdown-probe aggregate"),
    "q12_setops" -> (Set(S), "CARD: 1-row-per-branch set-op census"),
    "q17_range_join" -> (Set(B), "CROSS: 5-row range-bucket table broadcast"),
    "q21_sql_subquery" -> (Set(S), "CARD: 1-row scalar subquery is the answer shape"),
    "q22_bag_setops" -> (Set(S), "CARD: 1-row-per-branch bag set-op census"),
    "q24_cross_join" -> (Set(B), "the cross-join surface itself (bounded dims)"),
    "q40_cdc_upsert" -> (Set(B, S), "CROSS: 1-row cutoff bounds broadcast"),
    "q43_histogram" -> (Set(B, S), "CROSS: 1-row min/max bounds into bucket map"),
    "q46_null_aware_anti" -> (Set(S), "CARD: 1-row null-existence scalar is the answer shape"),
    "q56_dq_profile" -> (Set(S), "CARD: global audit card over column stats"),
    "q59_histogram_quantile_merge" -> (Set(B, S),
      "CROSS: monthly-grain merged sketch (metadata-sized) into quantile probe"),
    "q60_join_skew_audit" -> (Set(B, S),
      "CROSS: 1-row totals card into per-key shares (the salting instrument itself)"),
    "s01_cosine_topk" -> (Set(B), "CROSS: ~10 broadcast query vectors (exact scan)"),
    "s04_cosine_topk_native" -> (Set(B), "CROSS: same 10-query broadcast, codegen kernel"),
    "s05_ann_recall" -> (Set(B), "CROSS: s01's 10-query exact yardstick embedded"),
    "s09_int_kmeans" -> (Set(B, S),
      "CROSS: 1-row k-centroid array broadcast per Lloyd round (round 15)"),
    "s17_mips_topk" -> (Set(B), "CROSS: 10-query broadcast MIPS scan"),
    "s18_multiprobe_lsh" -> (Set(B), "CROSS: query-side probe expansion, 10 queries"),
    "s19_recall_curve" -> (Set(B), "CROSS: s01 yardstick embedded per curve point"),
    // s22's former SinglePartition card vanished when the shared PQ
    // pipeline became a memoized checkpoint (round 8): its codebook
    // input is now a pre-materialized table, so the census no longer
    // plans a single-partition exchange of its own. The build's plans
    // (narrow explode + bounded-seed collect + per-(vec,m) windows)
    // execute once at cache fill and are shape-audited in pqParts'
    // scaladoc, not per consuming query.
    "s24_ivf_cell_balance" -> (Set(S), "CARD: 1-row balance audit card"),
    "t08_tfidf_topterms" -> (Set(B, S), "CROSS: 1-row corpus doc count broadcast"),
    "t14_bpe_learn" -> (Set(B, S), "CROSS: 1-row top-pair merge rule per BPE round"),
    "t23_js_divergence" -> (Set(B, S),
      "CROSS: |S|x|V| vocab grid from bounded source/vocab relations"),
    "t24_heaps_law" -> (Set(B, S),
      "CROSS: 1-row max-id broadcast + 10-row decile-spine window"))

  test("every registered query's plan smells match the committed allowlist") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val observed = names.map { n =>
      n -> (try PlanSmells.audit(spark, sfDir, n).toSet
      catch { case e: Throwable =>
        fail(s"$n failed to execute during the smell sweep: ${e.getMessage}")
      })
    }
    val problems = observed.flatMap { case (n, flags) =>
      val ok = allowed.get(n).map(_._1).getOrElse(Set.empty[String])
      val fresh = flags -- ok
      val gone = ok -- flags
      (if (fresh.nonEmpty)
        Seq(s"$n: NEW unadjudicated ${fresh.mkString(",")} — either fix " +
          "the plan or adjudicate it in PlanSmellGateSpec.allowed")
      else Nil) ++
        (if (gone.nonEmpty)
          Seq(s"$n: adjudicated ${gone.mkString(",")} no longer present — " +
            "plan improved? remove the stale allowlist entry")
        else Nil)
    }
    val staleEntries = allowed.keySet -- names.toSet
    assert(staleEntries.isEmpty,
      s"allowlist names unregistered queries: ${staleEntries.mkString(",")}")
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("the detector actually sees an unadjudicated cartesian") {
    // guards the gate itself: if Spark renames the plan node, the sweep
    // would silently report everything clean
    import spark.implicits._
    val a = (1 to 50).toDF("x")
    val b = (1 to 50).toDF("y")
    val df = a.join(b, $"x" =!= $"y") // non-equi, both sides too big to broadcast?
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
    assert(PlanSmells.Smells.exists(p.contains),
      "a 50x50 non-equi self-join produced none of the smell nodes — " +
        "detector strings are stale against this Spark version")
  }
}
