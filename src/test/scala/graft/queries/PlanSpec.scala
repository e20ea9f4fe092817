package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.mr.SparkTestSession

/** Plan-shape audits: the properties that decide whether these plans
  * survive a 100 TB scale-up (SURVEY.md §7.3.6). Asserting on plan text
  * is deliberate — a regression that, say, stops pushing the q02 filter
  * into the scan or un-broadcasts the q04 dims is a scale bug even
  * while every value stays correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    // execute THIS QueryExecution's plan (a .write/.count would build a
    // separate one) so AQE finalizes stages — codegen wrappers only
    // appear in the final plan; scan nodes truncate PushedFilters in
    // toString, so assertions use prefixes that survive truncation
    df.queryExecution.executedPlan.execute().count()
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters and projection reach the parquet scan") {
    val p = planOf("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
    // column pruning: the scan reads only the four needed columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"), "scan not pruned to needed columns")
    assert(!p.contains("l_returnflag"), "scan reads columns the query never uses")
  }

  test("q04: dimension joins broadcast, fact side never shuffles for the join") {
    val p = planOf("q04_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dim join degraded to sort-merge")
  }

  test("q13: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = planOf("q13_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = planOf("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("w04: global ntile runs without any WindowExec or single partition") {
    val p = planOf("w04_ntile_deciles")
    assert(!p.contains("Window"), "w04 regressed to a WindowExec global sort")
    assert(!p.contains("SinglePartition"), "w04 has a single-partition exchange")
  }

  test("d04: simhash pair stage is a banded equi-join, not a cartesian") {
    val p = planOf("d04_simhash")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "d04 candidate stage degraded to all-pairs BNLJ")
    assert(!p.contains("CartesianProduct"),
      "d04 candidate stage degraded to a cartesian product")
  }

  test("runtime bloom filter from a selective dim reaches the fact side " +
    "of a shuffle join") {
    // the 100 TB lever DPP can't give: when the fact table is NOT
    // partitioned by the join key, InjectRuntimeFilter builds a bloom
    // filter from the dim's selective predicate and applies
    // might_contain on the fact side BEFORE the shuffle — rows that
    // can't join never cross the wire. Thresholds are lowered because
    // the fixture is tiny; at production scale the defaults (10 GB app
    // side) gate it to genuinely large scans.
    import graft.Tables
    import org.apache.spark.sql.functions.col
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.lineitem(spark, sfDir)
      val dim = Tables.part(spark, sfDir).filter(col("p_size") === 1)
      val j = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy().count()
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${opt.take(800)}")
      // and it must sit on the FACT side (filtering l_partkey)
      assert(opt.contains("might_contain") && opt.contains("l_partkey"),
        "bloom filter not applied to the fact scan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("s03: sign-LSH candidate stage is a bucketed equi-join, not all-pairs") {
    val p = planOf("s03_signlsh_ann")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "s03 candidate stage degraded to all-pairs BNLJ")
    assert(!p.contains("CartesianProduct"),
      "s03 candidate stage degraded to a cartesian product")
  }

  test("d10: SymSpell deletion-neighborhood join never goes all-pairs") {
    val p = planOf("d10_fuzzy_vocab")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "d10 candidate stage degraded to all-pairs BNLJ")
    assert(!p.contains("CartesianProduct"),
      "d10 candidate stage degraded to a cartesian product")
  }

  test("m04: pHash banded hamming join never goes all-pairs") {
    val p = planOf("m04_phash_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "m04 candidate stage degraded to all-pairs BNLJ")
    assert(!p.contains("CartesianProduct"),
      "m04 candidate stage degraded to a cartesian product")
  }

  test("s12: PQ serving scan joins codes via broadcast, never all-pairs") {
    val p = planOf("s12_pq_adc_topk")
    assert(p.contains("BroadcastHashJoin"),
      "distance-table join should broadcast (td is M×k cells)")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "s12 degraded to an all-pairs plan")
  }

  test("s20: IVF-ADC scan broadcasts the cell-tagged distance table") {
    val p = planOf("s20_ivf_adc_topk")
    assert(p.contains("BroadcastHashJoin"),
      "distance-table⋈query-label lookup should broadcast (qids×M×k cells)")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "s20 degraded to an all-pairs plan")
  }

  test("s21: rerank stage joins the candidate list by broadcast") {
    val p = planOf("s21_adc_rerank")
    assert(p.contains("BroadcastHashJoin"),
      "candidate list (qids×20 rows) should broadcast into the vector table")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "s21 degraded to an all-pairs plan")
  }

  test("q52: joining the bucketed tables needs NO exchange on either side") {
    // the whole point of bucketed storage: after q52 writes both tables
    // bucketBy(8, key), a fresh join on the key is a SortMergeJoin whose
    // children read co-located buckets — zero Exchange anywhere in the
    // join plan. This is the property that deletes the dominant shuffle
    // of a 100 TB fact⋈fact join.
    SparkEntry.queries("q52_bucketed_join")(spark, sfDir).collect()
    import org.apache.spark.sql.functions.col
    val j = spark.table("graft_ord_bkt").hint("merge")
      .join(spark.table("graft_li_bkt"),
        col("o_orderkey") === col("l_orderkey"))
    j.queryExecution.executedPlan.execute().count()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(500))
    assert(!p.contains("Exchange"),
      "bucketed join re-shuffled: bucket spec not picked up")
  }

  test("s13: random projection is a narrow map — no join, no hash shuffle") {
    val p = planOf("s13_random_projection")
    assert(!p.contains("Join"), "projection should never join")
    assert(!p.contains("Exchange hashpartitioning"),
      "projection introduced a data shuffle; only the presentation " +
        "range sort is allowed")
  }

  test("p15: cluster-root join onto documents is broadcast, never shuffled") {
    val p = planOf("p15_cluster_split")
    assert(p.contains("BroadcastHashJoin"),
      "root map (dup docs only) should broadcast onto the corpus side")
  }

  test("s04: native cosine expression sits inside whole-stage codegen") {
    val p = planOf("s04_cosine_topk_native")
    assert(p.contains("cosine_similarity"), p.take(500))
    // tree strings mark codegen'd spans with "*(n)" prefixes
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, "plan lost codegen entirely")
  }

  test("d02: exact-jaccard candidates come from an equi-join, no set ops in plan") {
    val p = planOf("d02_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "d02 candidate stage degraded to all-pairs")
    assert(!p.contains("array_intersect"),
      "d02 regressed to per-row set intersection (the 10x-slower verify path)")
  }

  test("w07: RANGE-frame window stays partitioned by customer") {
    val p = planOf("w07_range_rolling")
    assert(p.contains("Window"), p.take(300))
    assert(!p.contains("SinglePartition"),
      "w07 window collapsed to a single partition")
  }

  test("w08: native top-k agg runs as partial+final ObjectHashAggregate, no window") {
    val p = planOf("w08_topk_agg_native")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final ObjectHashAggregate pair for topk_longs")
    assert(!p.contains("Window"),
      "w08 regressed to the full-shuffle window formulation")
  }

  test("q34: statistics aggregate in one two-phase pass, no window, no join") {
    val p = planOf("q34_stats_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
    assert(!p.contains("Join"), "q34 should be a single-pass aggregation")
  }

  test("g03: every triangle join is an equi-join, no nested-loop stage") {
    val p = planOf("g03_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "triangle counting degraded to a nested-loop/cartesian join")
  }

  test("e10: three chained funnel windows share ONE user_id exchange, no joins") {
    val p = planOf("e10_funnel").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "funnel stages stopped sharing the user_id partitioning")
    assert("Window ".r.findAllIn(p).size === 3,
      "expected exactly the three chained conditional-min windows")
    assert(!p.contains("Join"), "funnel regressed to self-joins")
  }

  test("e11: spine is generated on-executor and joined by equi-keys") {
    val p = planOf("e11_gapfill")
    assert(p.contains("Generate explode"),
      "daily spine no longer generated via explode(sequence)")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "spine join degraded to nested-loop/cartesian")
  }

  test("q44: HLL sketches partial-aggregate before each shuffle") {
    val p = planOf("q44_hll_union")
    // two-phase pairs for both the daily sketch agg and the weekly union
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 4,
      "sketch aggregation lost its map-side partial phase")
  }

  test("join strategy hints steer the planner (merge vs shuffle_hash vs broadcast)") {
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, sfDir)
    val l = graft.Tables.lineitem(spark, sfDir)
    def planFor(hint: String): String = {
      val j = l.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)))
      j.queryExecution.executedPlan.execute().count()
      j.queryExecution.executedPlan.toString
    }
    assert(planFor("merge").contains("SortMergeJoin"), "merge hint ignored")
    val shj = planFor("shuffle_hash")
    assert(shj.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n${shj.take(400)}")
    assert(planFor("broadcast").contains("BroadcastHashJoin"), "broadcast hint ignored")
  }

  test("s10: gram matrix folds in ONE two-phase aggregate, products stay in-pipeline") {
    val p = planOf("s10_gram_matrix")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
    assert(p.contains("Generate"), "pair products no longer generated in-pipeline")
    assert(!p.contains("Join"), "gram matrix must not join — it is a pure fold")
  }

  test("e13: cumulative users' only data-sized exchange is the user_id shuffle") {
    val p = planOf("e13_cumulative_users")
    assert(p.contains("hashpartitioning(user_id"),
      "missing the per-user first-seen shuffle")
    // the unpartitioned running-sum window must sit above the per-hour
    // aggregate (metadata-sized input), never above raw events
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected two two-phase aggregates below the running-sum window")
  }

  test("e18: transitions shuffle once on user_id; marginals join broadcasts") {
    val p = planOf("e18_markov_transitions")
    assert(p.contains("hashpartitioning(user_id"),
      "missing the per-user lead() window shuffle")
    assert(p.contains("BroadcastHashJoin"),
      "|types|-row marginals must broadcast, not sort-merge")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "marginals join degraded from broadcast")
  }

  test("AQE coalesces post-shuffle partitions to the actual data volume") {
    import org.apache.spark.sql.functions._
    // at 100 TB you over-provision spark.sql.shuffle.partitions and let
    // AQE shrink each exchange to real output size — pin that the
    // machinery is live in this session's plans
    val df = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead coalesced"),
      s"AQE did not coalesce the tiny shuffle:\n${p.take(600)}")
  }

  test("p12: budget selection is one keyed window, no join, no global sort of docs") {
    val p = planOf("p12_token_budget")
    assert(p.contains("hashpartitioning(source"),
      "prefix-sum window no longer partitioned by source")
    assert(!p.contains("Join"), "selection should not join")
  }

  test("s14: semdedup pairwise stage is cluster-keyed, never all-pairs") {
    val p = planOf("s14_semdedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "s14 within-cluster pair join degraded to all-pairs")
  }

  test("g04: pair generation stays a middle-keyed equi-join, degrees broadcast") {
    val p = planOf("g04_link_prediction")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "g04 common-neighbor pair stage degraded to all-pairs")
    assert(p.contains("BroadcastHashJoin"),
      "degree tables should broadcast back onto the pair counts")
  }

  test("s16: range search keeps the bucketed candidate join, no all-pairs") {
    val p = planOf("s16_range_search")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "s16 candidate stage degraded to all-pairs")
    assert(!p.contains("Window"),
      "range search needs no window — the rank stage should be gone")
  }

  test("t18: classifier inference is one two-phase doc agg, no join") {
    val p = planOf("t18_hashed_classifier")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate around the doc_id exchange")
    assert(!p.contains("Join"),
      "hashed weights are arithmetic — inference must not join a model table")
  }

  test("e20: activity histogram partial-aggregates before its one data shuffle") {
    val p = planOf("e20_activity_histogram")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair on (type, user)")
    assert(!p.contains("Window") && !p.contains("Join"),
      "class rollup needs neither windows nor joins")
  }

  test("q56: dq scan metrics fold in one pass; FK audit is an anti-join") {
    val p = planOf("q56_dq_profile")
    // every scan-wide metric (incl. the distinct) sits in ONE aggregate
    // that the stack() unpivot reads — no per-metric rescans
    assert(p.contains("Generate stack(9"),
      "metric card no longer unpivots a single wide aggregate")
    assert(p.contains("LeftAnti"),
      "FK orphan audit must be a left-anti join")
    assert(!p.contains("CartesianProduct"), "dq profile must not cross-join")
  }

  test("d14: weight joins onto documents stay LEFT so singletons survive") {
    val p = planOf("d14_dup_weighting")
    assert(p.contains("LeftOuter"),
      "soft-dedup weight join degraded from LEFT — singletons would drop")
  }

  test("p17: benchmark gram set broadcasts; zero-overlap docs kept via outer join") {
    val p = planOf("p17_contamination_score")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark n-gram dictionary no longer broadcast")
    assert(p.contains("LeftOuter"),
      "totals-vs-hits join must be outer or zero-overlap docs vanish")
  }

  test("runtime bloom filter prunes the large join side from a selective dim") {
    import org.apache.spark.sql.functions._
    // InjectRuntimeFilter: at 100 TB a selective dim filter should cut
    // fact-side shuffle volume via a bloom filter evaluated in the fact
    // scan stage — pin that the machinery engages (thresholds lowered to
    // fire at test SF; the default 10 MB/10 GB gates are size-, not
    // shape-, dependent)
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "32KB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val o = graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val l = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${p.take(800)}")
      // and it prunes the FACT side: the filter sits on the lineitem scan
      assert(p.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
        "bloom filter not applied to the fact side")
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.sessionState.conf
    val olds = pairs.map { case (k, _) =>
      k -> (if (conf.contains(k)) Some(conf.getConfString(k)) else None)
    }
    pairs.foreach { case (k, v) => conf.setConfString(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.setConfString(k, v)
      case (k, None)    => conf.unsetConf(k)
    }
  }

  test("q53: lang predicate prunes hive partitions at listing time") {
    val p = planOf("q53_partition_pruning")
    val scanLines = p.split("\n").filter(_.contains("FileScan")).mkString("\n")
    assert(p.contains("PartitionFilters: [lang#") && p.contains(" IN (en,fr)]"),
      s"partition predicate not pruning the lang=… dirs; scans:\n$scanLines")
    // the lang filter is satisfied by directory listing alone: no
    // row-level parquet filter, and lang never read from file data
    assert(p.contains("DataFilters: []") && p.contains("PushedFilters: []"),
      s"lang filter degraded to a row-level data filter; scans:\n$scanLines")
    assert(p.contains("ReadSchema: struct<source:string,n_chars:bigint>"),
      s"scan reads more than the two needed data columns; scans:\n$scanLines")
  }

  test("e22: watermark broadcasts back onto the corpus; no global sort of events") {
    val p = planOf("e22_late_events")
    assert(p.contains("BroadcastHashJoin"),
      "per-batch watermark table should broadcast back onto the events")
    assert(!p.contains("SortMergeJoin"),
      "watermark join degraded to sort-merge — the wm side is metadata")
    // the only Sort feeds the metadata-sized running-max window / final
    // ORDER BY, never a corpus-sized exchange before a join
    assert(!p.contains("CartesianProduct"), "e22 must not cross-join")
  }

  test("t19: all three diversity metrics derive from ONE term-frequency exchange") {
    val p = planOf("t19_lexical_diversity")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected two partial+final agg pairs: (source,tok) then source")
    assert(!p.contains("Join"),
      "distinct/hapax/total must share the tf relation, not re-join the corpus")
    assert(!p.contains("Expand"),
      "countDistinct-style Expand means the corpus is aggregated per-metric")
  }

  test("p18: corpus aggregates once; cap math is broadcast-tiny cross joins") {
    val p = planOf("p18_source_cap")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "lang totals must partial-aggregate before their one shuffle")
    // cap/surplus math is windows over the 5-row lang relation; what
    // must NOT appear is a second corpus scan (AQE's toString repeats
    // the plan under "== Initial Plan ==", so count the final section)
    val finalSection = p.split("== Initial Plan ==")(0)
    assert(finalSection.split("\n").count(_.contains("FileScan")) <= 1,
      "corpus scanned more than once — cap math should reuse the lang totals")
  }

  test("s18: multi-probe candidates stay a bucket-keyed equi-join") {
    val p = planOf("s18_multiprobe_lsh")
    // the plan embeds s01's exact top-k as the recall yardstick, which
    // IS brute-force by design (one BNLJ from that subtree is expected);
    // the multi-probe candidate stage itself must join on the bucket key
    assert("BroadcastHashJoin \\[pbucket".r.findFirstIn(p).isDefined,
      "multi-probe candidate stage is not a bucket-keyed equi-join")
    assert(p.contains("Generate explode"),
      "probe expansion should be an explode on the query side")
  }

  test("g06: propagation rounds are node-keyed joins, never all-pairs") {
    // the final g06 plan is a sort over the operator's checkpointed
    // labels (lineage cuts hide the rounds), so audit the exact
    // per-round dataflow the LabelPropagation loop runs
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (2L, 1L), (3L, 2L)).toDF("u", "v")
    val labels = Seq((1L, 10L)).toDF("node", "label")
    val df = graft.operators.LabelPropagation.round(e, labels)
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "label-vote stage degraded to all-pairs")
    assert(p.contains("LeftAnti"),
      "clamping (labeled nodes don't re-vote) must be a left-anti join")
    // the final assembled query stays all-pairs-free too
    val full = planOf("g06_label_propagation")
    assert(!full.contains("BroadcastNestedLoopJoin")
      && !full.contains("CartesianProduct"))
  }

  test("t20: novelty derives from gram-keyed agg + join, no corpus re-expansion") {
    val p = planOf("t20_ngram_novelty")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "first-occurrence join degraded to all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final aggs for both the distinct-reduce and min(first_doc)")
  }

  test("q57: null-safe equality plans as a hash-joinable key, not a residual") {
    val p = planOf("q57_nullsafe_join")
    // Catalyst rewrites `a <=> b` keys to (coalesce(a,_), isnull(a)) so
    // the join stays hash-partitionable; a BNLJ here would mean <=> fell
    // out of the equi-key set and became an all-pairs residual
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "null-safe join degraded to all-pairs")
    assert(p.contains("Join") && p.contains("coalesce"),
      "expected the coalesce/isnull null-safe key rewrite in a hash join")
  }

  test("p19: snapshot diff is ONE keyed full-outer join of hash-per-doc relations") {
    val p = planOf("p19_snapshot_diff")
    assert(p.contains("FullOuter"), "diff join must be full-outer")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "diff degraded to all-pairs")
  }

  test("m06: quarantine audit is one scan + one two-phase rollup, no joins") {
    val p = planOf("m06_payload_quarantine")
    assert(!p.contains("Join"), "integrity audit must not join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final source rollup")
  }

  test("t21: gap series is a tok-PARTITIONED window, never a global sort") {
    val p = planOf("t21_burstiness")
    assert(p.contains("Window"), "lag over the doc timeline should be a window")
    assert(!p.contains("Exchange SinglePartition"),
      "burstiness window lost its tok partitioning")
    assert(!p.contains("Join"), "burstiness needs no join")
  }

  test("ty04: reduceGroups pre-folds map-side (partial typed aggregate)") {
    val p = planOf("ty04_typed_reducegroups")
    assert(p.contains("partial_reduceaggregator"),
      "reduceGroups lost its map-side partial fold — each task should pre-reduce")
  }

  test("d16: hot-shingle audit tops out via TakeOrdered, never a full sort") {
    val p = planOf("d16_hot_shingles")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 hot shingles degraded to a global sort")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "shingle frequency must partial-aggregate before its shuffle")
  }

  test("e23: three delays cost ONE aggregate — no per-delay rescan, wm broadcast") {
    val p = planOf("e23_delay_sweep")
    assert(p.contains("BroadcastHashJoin"),
      "watermark base should broadcast back onto the events")
    assert(!p.contains("SortMergeJoin"), "wm join degraded to sort-merge")
    assert(p.contains("Generate stack(3"),
      "delay curve should unpivot the single scalar aggregate")
  }

  test("d17: precision eval joins two pair relations, never re-expands the corpus") {
    val p = planOf("d17_lsh_precision")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "candidate/exact pair comparison degraded to all-pairs")
    assert(p.contains("FullOuter"),
      "TP/FP/FN accounting needs the full-outer pair join")
  }

  test("t22: RAKE is doc-keyed windows + vocab-sized aggs, top-15 via TakeOrdered") {
    val p = planOf("t22_rake_keywords")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "phrase/word scoring degraded to all-pairs")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-15 phrases degraded to a full sort")
  }

  test("e24: sweep-line peaks via TakeOrdered; sessions never expand per-minute") {
    val p = planOf("e24_peak_concurrency")
    assert(p.contains("TakeOrderedAndProject"),
      "peak top-5 degraded to a full sort")
    assert(!p.contains("Generate explode") && !p.contains("sequence("),
      "session intervals expanded to per-minute rows — use the 2-delta sweep-line")
  }

  test("p21: fertility is one scan + one lang-keyed two-phase agg") {
    val p = planOf("p21_tokenizer_fertility")
    assert(!p.contains("Join"), "fertility needs no join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "lang totals must partial-aggregate before their one shuffle")
  }

  test("q58: cube with grouping flags is one Expand + one two-phase agg") {
    val p = planOf("q58_grouping_id")
    assert(p.contains("Expand"),
      "CUBE lost its Expand — grouping sets should multiply rows once")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "cube agg must stay partial+final")
  }

  test("p22: canary list broadcasts; corpus takes one substring pass") {
    val p = planOf("p22_canary_scan")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "substring scan should be the tiny-broadcast BNLJ (canary side is dozens of rows)")
    assert(p.split("\n").count(_.contains("SortMergeJoin")) == 0,
      "canary join degraded to a corpus-sized shuffle join")
  }

  // d18/d19 fold one-row totals back in via crossJoin(broadcast(agg)) —
  // the d16/p01 scalar pattern. That shows up as `BroadcastNestedLoopJoin
  // BuildRight, Cross` with a 1-row build side, which is bounded by
  // construction; the pins therefore allow Cross-BNLJ but ban
  // CartesianProduct and any Inner-BNLJ (a real all-pairs shape).
  test("d18: tf-idf dots are a term-keyed equi-join with the df prune applied first") {
    val p = planOf("d18_tfidf_similarity")
    assert(!p.contains("CartesianProduct"),
      "doc-doc similarity degraded to all-pairs — must stay an inverted-index join")
    assert(!"BroadcastNestedLoopJoin (?!BuildRight, Cross)".r.findFirstIn(p).isDefined,
      "non-scalar nested-loop join appeared in the tf-idf path")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 pairs degraded to a global sort")
  }

  test("d19: banding sweep re-bands cached signatures — bucket joins only") {
    val p = planOf("d19_banding_sweep")
    assert(!p.contains("CartesianProduct"),
      "a banding config degraded to all-pairs")
    assert(!"BroadcastNestedLoopJoin (?!BuildRight, Cross)".r.findFirstIn(p).isDefined,
      "non-scalar nested-loop join appeared in the sweep")
  }

  test("p23: weighted sample is one narrow map + TakeOrdered — no join, no window") {
    val p = planOf("p23_weighted_sample")
    assert(!p.contains("Join"), "A-ES priority needs no join")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-k degraded to a full sort")
    assert(!p.contains("Window"), "priority rank fell back to a window")
  }

  test("t23: JS grid joins are vocab-sized (Cross-BNLJ/broadcast), never corpus-sized") {
    val p = planOf("t23_js_divergence")
    assert(!p.contains("CartesianProduct"),
      "grid construction degraded to a corpus-sized cartesian")
    assert(!p.contains("SortMergeJoin"),
      "vocab-sized grid join degraded to a shuffle join")
  }

  test("e28: EWMA lags ride ONE type-keyed window over the day-grain aggregate") {
    val p = planOf("e28_ewma_smoothing")
    assert(!p.contains("Join"), "EWMA needs no join")
    // AQE prints Final + Initial plan sections; count the final one only
    assert("Window".r.findAllIn(p.split("== Initial Plan ==")(0)).size == 1,
      "the 8 lag terms must share one window, not one window each")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "day-grain series must partial-aggregate before its shuffle")
  }

  test("e29: attribution is a user-keyed running carry — no self-join, no backward scan") {
    val p = planOf("e29_attribution")
    assert(!p.contains("Join"), "last-touch lookup degraded to a self-join")
    assert(!p.contains("Exchange SinglePartition") ||
      p.indexOf("Exchange SinglePartition") > p.indexOf("HashAggregate"),
      "attribution window lost its user_id partitioning")
  }

  test("d20: entity linkage scores pairs only inside prefix blocks (equi-join)") {
    val p = planOf("d20_entity_blocks")
    assert(!p.contains("CartesianProduct"),
      "record linkage degraded to all-pairs")
    assert(!"BroadcastNestedLoopJoin (?!Build(?:Left|Right), Cross)".r.findFirstIn(p).isDefined,
      "non-scalar nested-loop join appeared in the linkage path")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the exact-collapse tier must partial-aggregate before its shuffle")
  }

  test("g11: modularity labels both endpoints via broadcast, no cartesian") {
    // round 15: the labeled relation is CUT (it feeds both m2 and the
    // per-community aggregate), so the final plan scans blocks — the
    // broadcast-shape pin moved to the labeling stage itself
    val p = planOf("g11_modularity")
    assert(!p.contains("CartesianProduct"), "community labeling went all-pairs")
    val edges = spark.range(3).selectExpr("id AS u", "id + 1 AS v")
    val comm = spark.range(5).selectExpr("id AS node", "id % 2 AS c")
    val stage = GraphPack.g11LabeledEdges(edges, comm)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!stage.contains("CartesianProduct"),
      "community labeling went all-pairs")
    assert("BroadcastHashJoin".r.findAllIn(stage).size >= 2,
      "node→community map should broadcast onto both edge endpoints")
  }

  test("t24: Heaps fit is two aggs + a 10-row decile spine — never a corpus window") {
    val p = planOf("t24_heaps_law")
    assert(!p.contains("CartesianProduct"), "decile bucketing went all-pairs")
    assert(!"BroadcastNestedLoopJoin (?!BuildRight, Cross)".r.findFirstIn(p).isDefined,
      "non-scalar nested-loop join appeared in the fit path")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "first-doc and decile histograms must partial-aggregate")
  }

  test("s23: drift audit is pure keyed aggregation — no join at all") {
    val p = planOf("s23_embedding_drift")
    assert(!p.contains("Join"), "half-vs-half compare degraded to a self-join")
    assert("HashAggregate".r.findAllIn(p.split("== Initial Plan ==")(0)).size >= 4,
      "centroid sums must partial-aggregate before their shuffle")
  }

  test("p20: shard ranks come from the range-partitioned two-pass, no 1-partition stage") {
    val p = planOf("p20_shard_manifest")
    // GlobalRank's range shuffle runs in its own upstream job (the plan
    // shows its output as Scan ExistingRDD); what must NOT appear is a
    // WindowExec row_number over the raw corpus — that's the w04 pin
    assert(p.contains("Scan ExistingRDD"),
      "expected GlobalRank's two-pass RDD output feeding the manifest")
    assert(!p.contains("row_number"),
      "rank fell back to a window row_number — the single-partition trap")
  }
}
