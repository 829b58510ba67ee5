package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-SHAPE regression tests: the scale-critical physical-plan
  * properties (parquet filter pushdown, column-pruned read schemas,
  * broadcast joins for dimension tables, no accidental cartesian or
  * sort-merge fallbacks) asserted as substrings of the formatted plan,
  * so a refactor that silently drops one fails here — not at 100 TB.
  * Executed on sf0.001 so AQE finalizes the same plan family the bench
  * runs; the properties asserted are size-independent.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // execute so AQE finalizes THIS plan
    df.queryExecution.explainString(FormattedMode)
  }

  test("q6: every filter reaches the parquet scan; schema pruned to 4 columns") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(p.contains("LessThan(l_shipdate"), "shipdate upper bound not pushed")
    assert(p.contains("GreaterThanOrEqual(l_discount"), "discount filter not pushed")
    assert(p.contains("LessThan(l_quantity"), "quantity filter not pushed")
    assert(p.contains(
      "struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      "lineitem scan reads more than the 4 needed columns")
  }

  test("q5: all four dimension joins broadcast; no cartesian or sort-merge fallback") {
    val p = plan("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), "dimension joins are not broadcast")
    assert(!p.contains("CartesianProduct"), "plan degraded to a cartesian product")
    assert(!p.contains("SortMergeJoin"), "a dimension join fell back to sort-merge")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "order-date filter not pushed")
    // every table's scan is column-pruned
    assert(p.contains("struct<c_custkey:bigint,c_nationkey:int>"), "customer scan not pruned")
    assert(p.contains("struct<s_suppkey:bigint,s_nationkey:int>"), "supplier scan not pruned")
  }

  test("x1: exact dedup shuffles 32-byte digests, never text blobs") {
    val p = plan("x1_dedup_exact")
    // the scan reads only (doc_id, text); text dies before the exchange
    assert(p.contains("struct<doc_id:bigint,text:string>"), "documents scan not pruned")
    val exchangeSections = p.split("\\(\\d+\\) Exchange").drop(1)
    assert(exchangeSections.nonEmpty)
    assert(!p.contains("CartesianProduct"))
  }

  test("x6/x35: similarity tier reads the shared cached quantized relation") {
    val p6 = plan("x6_cosine_topk")
    assert(p6.contains("vec_id:bigint,embedding:array<float>"),
      "the quantized relation's source scan lost its schema")
    assert(p6.contains("InMemoryTableScan"),
      "x6 recomputes the quantized silver relation instead of reading the cache")
    val p35 = plan("x35_kmeans")
    assert(p35.contains("InMemoryTableScan"),
      "x35 recomputes the quantized silver relation instead of reading the cache")
    assert(!p35.contains("CartesianProduct"))
  }

  /** AQE's formatted output prints the final plan, the initial plan,
    * and a node index; assertions about the EXECUTED shape must read
    * only the top-level final section (the top-level initial marker is
    * the unindented one — nested cached relations embed their own).
    */
  private def finalSection(p: String): String = {
    val i = p.indexOf("\n+- == Initial Plan ==")
    if (i >= 0) p.take(i) else p
  }

  test("q2/q8/q21: new TPC-H shapes broadcast every dimension path; no cartesian") {
    for (name <- Seq("q2_min_cost_supplier", "q8_market_share",
        "q9_product_profit", "q21_waiting_suppliers",
        "q12_priority_shipments", "q16_supplier_count", "q20_excess_quantity")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: dimensions not broadcast")
      assert(!p.contains("CartesianProduct"), s"$name: cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: nested-loop join")
    }
    // q11's threshold is a 1-ROW broadcast relation: its conditionless
    // cross join correctly plans as a single BroadcastNestedLoopJoin
    // (constant-size build side at any scale); the dimension path must
    // still broadcast-hash and nothing may go cartesian
    val p11 = plan("q11_important_stock")
    assert(p11.contains("BroadcastHashJoin"), "q11: dimensions not broadcast")
    assert(!p11.contains("CartesianProduct"), "q11: cartesian product")
    // q8's selective filters reach the scans
    val p8 = plan("q8_market_share")
    assert(p8.contains("GreaterThanOrEqual(o_orderdate"), "q8: date filter not pushed")
    assert(p8.contains("EqualTo(p_type,ECONOMY)"), "q8: part-type filter not pushed")
    // q21 status filter pushed to the orders scan
    val p21 = plan("q21_waiting_suppliers")
    assert(p21.contains("EqualTo(o_orderstatus,F)"), "q21: status filter not pushed")
  }

  test("p60: nested subquery grid has no per-instant union") {
    val p = plan("p60_promql_nested_subquery")
    // the union path materializes one branch per instant under a Union
    // node; the grid strategy has none — its instants come from a
    // broadcast range and ONE sliding window
    assert(!p.contains("Union"), "grid plan degenerated to a per-instant union")
    assert(p.contains("Window"), "sliding-bucket window missing from the grid plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("p105/p106: recorded-rule grid panels are ONE plan, no per-instant union") {
    // p105 (name-retaining rule renamed on the grid) and p106 (rate
    // over a recorded series as a lag(k) endpoint difference): both
    // must ride the single-pass series×grid strategy — a Union node
    // means the panel degenerated to per-instant evaluation
    for (name <- Seq("p105_recorded_grid_renamed", "p106_recorded_grid_rate",
        "p107_recorded_grid_avg", "p111_recorded_grid_deriv",
        "p112_recorded_grid_changes", "p117_recorded_grid_quantile",
        "p118_recorded_grid_ts_of_max", "p119_recorded_grid_stddev")) {
      val p = plan(name)
      assert(!p.contains("Union"), s"$name degenerated to a per-instant union")
      assert(p.contains("Window"), s"$name lost the series×grid running window")
      assert(!p.contains("CartesianProduct") || p.contains("Broadcast"),
        s"$name has a non-broadcast cartesian")
    }
  }

  test("x41/x42: per-row text rewrites have no exchange before the final sort") {
    for (name <- Seq("x41_pii_redact", "x42_chunks")) {
      val p = finalSection(plan(name))
      // one narrow projection over the scan: the only exchange allowed
      // is the final global-sort range partitioning
      val exchanges = "\\bExchange\\b".r.findAllIn(p).length
      assert(exchanges <= 1, s"$name shuffles $exchanges times before its sort")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("x39: k-means|| candidate joins broadcast even in the static plan") {
    val p = plan("x39_kmeanspp_init")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "candidate set is not broadcast")
    // the broadcast hints on sel/weights keep even AQE's INITIAL plan
    // off sort-merge — the any-scale contract, not a runtime rescue
    assert(!p.contains("SortMergeJoin"), "a candidate join fell back to sort-merge")
  }

  test("x45: centroid joins back by broadcast; corpus never sort-merges") {
    val p = plan("x45_embedding_outliers")
    assert(p.contains("BroadcastHashJoin"), "centroid relation is not broadcast")
    assert(!p.contains("SortMergeJoin"), "the scoring join fell back to sort-merge")
    assert(p.contains("InMemoryTableScan"),
      "x45 recomputes the quantized silver relation instead of reading the cache")
    assert(!p.contains("CartesianProduct"))
  }

  test("p62: windowed resets is one series-key window pass over the scan") {
    val p = finalSection(plan("p62_promql_resets"))
    assert(p.contains("Window"), "wrapped-cumulative window missing")
    // the only join allowed is the broadcast 1-row evaluation instant
    assert(!p.contains("SortMergeJoin"), "resets plan grew a shuffle join")
    assert(!p.contains("CartesianProduct"))
  }

  test("x46: covariance is one mergeable-buffer aggregate; triangle joins broadcast") {
    val p = finalSection(plan("x46_embedding_covariance"))
    // partial buffers combine map-side; the only exchanges are the
    // single-partition final merge and the final sort
    val exchanges = "\\bExchange\\b".r.findAllIn(p).length
    assert(exchanges <= 2, s"covariance shuffles $exchanges times")
    assert(p.contains("BroadcastHashJoin"), "triangle index join is not broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("x47/x48: sampling gates broadcast their tiny sides; no shuffle joins") {
    for (name <- Seq("x47_temperature_sample", "x48_bloom_contamination")) {
      val p = finalSection(plan(name))
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$name does not broadcast its per-group stats/bitset")
      assert(!p.contains("SortMergeJoin"), s"$name fell back to sort-merge")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("x52/x55: pair-side joins broadcast; the corpus projection never sort-merges") {
    for (name <- Seq("x52_neardup_sources", "x55_split_leakage")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name does not broadcast the candidate-pair side")
      assert(!p.contains("SortMergeJoin"), s"$name fell back to sort-merge")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("x53/x58: K-row centroid/majority relations broadcast; corpus keeps its shuffle key") {
    for (name <- Seq("x53_cluster_margins", "x58_cluster_purity")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$name does not broadcast its K-row side")
      assert(!p.contains("CartesianProduct"),
        s"$name degraded to a non-broadcast cartesian product")
    }
  }

  test("x54/x56: one lang exchange serves both the window and the aggregate") {
    for (name <- Seq("x54_length_percentiles", "x56_shard_manifest")) {
      val p = plan(name)
      // the scan must be pruned to the consumed columns only (no source/n_chars)
      assert(!p.contains("n_chars"), s"$name reads n_chars it never uses")
      assert(!p.contains("CartesianProduct"))
      assert(p.contains("struct<doc_id:bigint,text:string,lang:string>"),
        s"$name documents scan not pruned")
    }
  }

  test("x59: dup-span pass reads the shared shingle cache; no cartesian") {
    val p = plan("x59_corpus_dup_spans")
    assert(p.contains("InMemoryTableScan"),
      "x59 recomputes the shingle explode instead of reading the corpus cache")
    // the dup-set semi-join keys on the shingle — broadcast (small sf,
    // AQE) or shuffled are both fine; a cartesian never is
    assert(!p.contains("CartesianProduct"))
  }

  test("x60: BPE pair counting joins nothing and never global-sorts its top-k") {
    val p = plan("x60_bpe_pairs")
    assert(!p.contains("Join"), "x60 grew a join; pair stats are aggregate-only")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 merge candidates use a global sort instead of a bounded top-k")
    assert(p.contains("struct<text:string>"),
      "documents scan reads more than the text column")
    assert(!p.contains("CartesianProduct"))
  }

  test("x61: K-row centroid self-join broadcasts; member stats read the kmeans cache") {
    val p = plan("x61_cluster_separation")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "x61 does not broadcast its K-row centroid relation")
    assert(p.contains("InMemoryTableScan"),
      "x61 recomputes the k-means assignment instead of reading the cache")
    assert(!p.contains("SortMergeJoin"), "a K-row join fell back to sort-merge")
  }

  test("x62: band equi-join generates candidates; never a cartesian all-pairs") {
    val p = plan("x62_simhash_neardup")
    assert(!p.contains("CartesianProduct"),
      "x62 degraded to all-pairs; the band join must key on (b, bv)")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "x62 candidate generation lost its equi-join keys")
    assert(p.contains("InMemoryTableScan"),
      "x62 recomputes signatures instead of reading the shared simhash cache")
  }

  test("x73: encoded vocab broadcasts into the corpus join; no cartesian") {
    // since r16 the registered x73 reads the SESSION-CACHED encoded
    // corpus (an InMemoryTableScan when another consumer built it
    // first), so the join shape is pinned on the UNCACHED builder —
    // a non-default round count routes around the cache and contains
    // the actual word→ids join
    val p = graft.operators.TextAnalysis
      .bpeEncode(spark, dir, rounds = 7)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "x73's word->ids join is not a broadcast hash join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "the vocab-sized encode join fell back to sort-merge")
    // and the registered (cached) form never degrades to a cartesian
    val pc = plan("x73_bpe_encode")
    assert(!pc.contains("CartesianProduct"))
  }

  test("x74: span scrub reuses the shingle cache; doc_id-keyed joins only") {
    val p = plan("x74_span_scrub")
    assert(p.contains("InMemoryTableScan"),
      "x74 recomputes the shingle explode instead of reading the corpus cache")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "a scrub join lost its equi-join keys")
  }

  test("x65: the 1-row winner broadcasts into the merge; top-k stays bounded") {
    val p = plan("x65_bpe_merge")
    assert(!p.contains("CartesianProduct"),
      "the 1-row winner relation must broadcast, not cartesian")
    assert(p.contains("TakeOrderedAndProject"),
      "round-2 top-10 uses a global sort instead of a bounded top-k")
  }

  test("x63/x64: degree and growth reuse their session caches; no cartesian") {
    for (name <- Seq("x63_neardup_degree", "x64_vocab_growth")) {
      val p = plan(name)
      assert(p.contains("InMemoryTableScan"),
        s"$name recomputes its silver relation instead of reading the cache")
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product")
    }
    // x64's prefix sum is TWO-LEVEL: the bucket-scale window partitions
    // by range (never a global sort of the bucket relation), and only
    // the tiny range-offset relation broadcasts back
    val p64 = plan("x64_vocab_growth")
    assert(p64.contains("windowspecdefinition(range"),
      "x64's bucket-level window lost its range partitioning (global sort at scale)")
    assert(p64.contains("BroadcastHashJoin"),
      "x64's range offsets must broadcast, not shuffle")
  }

  test("q14: part broadcasts; ship-date bounds reach the parquet scan") {
    val p = plan("q14_promo_revenue")
    assert(p.contains("BroadcastHashJoin"), "part dimension is not broadcast")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(p.contains("LessThan(l_shipdate"), "shipdate upper bound not pushed")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q19: OR-of-conjunctions stays a hash join with a residual filter") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin"),
      "the disjunction pushed the join off its equi-key")
    assert(!p.contains("CartesianProduct"),
      "q19 degraded to a cartesian product")
    assert(!p.contains("SortMergeJoin"))
  }

  test("b35: funnel stage filters push to the events scan; stage joins stay keyed") {
    val p = plan("b35_funnel")
    assert(p.contains("EqualTo(event_type,click)"), "click filter not pushed")
    assert(p.contains("EqualTo(event_type,view)"), "view filter not pushed")
    assert(p.contains("EqualTo(event_type,purchase)"), "purchase filter not pushed")
    assert(!p.contains("SortMergeJoin"), "a user-keyed stage join fell back to sort-merge")
    assert(!p.contains("CartesianProduct"),
      "only the three 1-row counts may cross-join, and those broadcast")
  }

  test("x76/x78/x79: DetMath scorers stay keyed and codegen'd — native det_* calls, no cartesian") {
    for (name <- Seq("x76_perplexity", "x78_token_entropy", "x79_source_drift")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product")
      assert(!p.contains("SortMergeJoin"),
        s"$name: a keyed join fell back to sort-merge at fixture scale")
      // the scorer must be the compact native expression, never the
      // tree-duplicated Column mirror (which falls out of codegen)
      assert(p.contains("det_log2"),
        s"$name lost the native det_log2 expression")
    }
    // x76's LM scorer reads the SHARED 2-gram cache, like x19/x23
    assert(plan("x76_perplexity").contains("InMemoryTableScan"),
      "x76 recomputes the bigram explode instead of reading the shared cache")
    // x77: the threshold side broadcasts; the doc scan stays codegen'd
    val p77 = plan("x77_temperature_alpha")
    assert(p77.contains("BroadcastHashJoin") && !p77.contains("CartesianProduct"))
    assert(p77.contains("det_exp2"), "x77 lost the native det_exp2 expression")
  }

  test("x80: DSIR bucket model broadcasts; doc scoring stays keyed, no global window") {
    val p = plan("x80_dsir_importance")
    assert(p.contains("BroadcastHashJoin"),
      "x80's 4096-row bucket model must broadcast to the occurrence scan")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "only the 1-row totals may cross-join, and those broadcast")
    assert(!p.contains("SortMergeJoin"),
      "x80: a keyed join fell back to sort-merge at fixture scale")
    assert(p.contains("det_log2"), "x80 lost the native det_log2 expression")
    // keep-gate is a per-row comparison, never a ranking window
    assert(!p.contains("Window"), "x80 must not rank through a global window")
    assert(p.contains("InMemoryTableScan"),
      "x80 recomputes the bigram explode instead of reading the shared cache")
  }

  test("x81: byte entropy runs in the partition iterator — no shuffle before the final sort") {
    val p = plan("x81_byte_entropy")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
      && !p.contains("Window"), "x81 must be a pure per-partition map")
    // the only exchange is the presentation orderBy's range partition —
    // no hash shuffle anywhere (scores are computed where the bytes sit)
    assert(!p.contains("hashpartitioning"),
      s"x81 hash-shuffles beyond the final sort:\n$p")
    assert(p.contains("MapPartitions"), "x81 lost the partition-batched iterator")
  }

  test("x83: margin mining joins stay keyed on bucket and vec ids — no cartesian") {
    val p = plan("x83_margin_mining")
    assert(!p.contains("CartesianProduct"), "x83 has a cartesian product")
    assert(p.contains("InMemoryTableScan"),
      "x83 recomputes the quantized embeddings instead of reading the shared cache")
  }

  test("x82: LSH audit stays keyed — ground-doc semi-join broadcast, no cartesian") {
    val p = plan("x82_lsh_sensitivity")
    assert(!p.contains("CartesianProduct"), "x82 has a cartesian product")
    assert(p.contains("BroadcastHashJoin"),
      "x82's ground-doc slice must broadcast-semi-join the shingle cache")
    assert(p.contains("InMemoryTableScan"),
      "x82 recomputes the shingle explode instead of reading the shared cache")
  }

  test("x67: overlap matrix reads the shingle cache; pair fan-out stays keyed") {
    val p = plan("x67_source_overlap")
    assert(p.contains("InMemoryTableScan"),
      "x67 recomputes the shingle explode instead of reading the corpus cache")
    assert(!p.contains("CartesianProduct"),
      "the source self-join lost its shingle equi-key")
  }

  test("q13: outer join keeps zero-order customers without a cartesian; priority pushed") {
    val p = plan("q13_customer_distribution")
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      "the priority filter did not push to the orders scan")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("struct<c_custkey:bigint>"), "customer scan not pruned to the key")
  }

  test("q15: the 1-row max and the supplier dimension both broadcast") {
    val p = plan("q15_top_supplier")
    assert(p.contains("BroadcastHashJoin"), "max/supplier joins are not broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q18: the HAVING survivor set joins on the order key, customer broadcasts") {
    val p = plan("q18_large_volume")
    assert(p.contains("BroadcastHashJoin"), "customer dimension is not broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "the ordered limit is a global sort instead of TakeOrderedAndProject")
  }

  test("q7: both nation paths broadcast after their two-nation prune") {
    val p = plan("q7_nation_volume")
    assert(p.contains("BroadcastHashJoin"), "supplier/customer paths are not broadcast")
    assert(!p.contains("CartesianProduct"))
    // nation prune feeds the dimension join, not the fact scan
    assert(p.contains("In(n_name"), "the two-nation filter did not push to the nation scan")
  }

  test("no query in the relational/join family degrades to a cartesian product") {
    for (name <- Seq("q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
        "q10_returned_revenue", "q17_small_quantity_revenue", "b8_binary_op",
        "x3_minhash_lsh", "q22_dormant_balance")) {
      assert(!plan(name).contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }

  test("streaming classifier gate is a single stateless stage: no exchange at all") {
    import org.apache.spark.sql.functions.col
    val w = graft.operators.Classifier.train(spark, dir).last
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val df = graft.operators.Classifier.classifierGateStream(docs, w)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"),
      "the row-local gate plan acquired a shuffle — it can no longer stream statelessly")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the gate plan acquired a join — weights must stay literals")
  }

  test("x88: PQ codebook assignment broadcasts centroids; no cartesian on the corpus") {
    val p = plan("x88_pq_codes")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid relations are not broadcast")
    assert(!p.contains("CartesianProduct"),
      "a K-row centroid join degraded to a partitioned cartesian")
  }

  test("x92: the Hamming cut folds into the banded join, never a post-join filter stage") {
    val p = plan("x92_phash_neardup")
    assert(p.contains("bit_count"), "hamming not computed in the plan")
    assert(!p.contains("CartesianProduct"))
    // the pair join must be keyed on the band columns (hash or
    // broadcast-hash on band_k/band_v), not an all-pairs loop join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "banded candidate join lost its equi-join keys")
  }

  test("p76/p77/p79/p81/p83/p84/p85: dense-grid query_range is one event pass, never a per-instant union") {
    for (name <- Seq("p76_query_range_grid", "p77_query_range_rate",
        "p79_query_range_hq", "p81_query_range_ratio",
        "p83_query_range_subquery", "p84_query_range_quantile",
        "p85_query_range_alerts")) {
      val p = plan(name)
      // the union path would materialize 240 plan branches; the grid
      // path has none — instants come from a broadcast range relation
      // and ONE running/sliding window over the series×grid
      assert(!p.contains("Union"), s"$name degenerated to a per-instant union")
      assert(p.contains("Window"), s"$name lost the series×grid window")
      assert(!p.contains("CartesianProduct"), name)
      // both grid joins (instant row, 240-row range) stay broadcast
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$name grid join not broadcast")
      // events are read from the shared session cache, not re-scanned
      assert(p.contains("InMemoryTableScan"), s"$name re-scans the events parquet")
    }
  }

  test("p96/p97: served downsample routes read the ROLLUP cache, not raw event columns") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // the EXECUTED leaves (the formatted string also renders each
    // cached relation's build plan, so a substring check would see the
    // rollup cache's events-scan lineage — walk the tree instead)
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case q: QueryStageExec => leaves(q.plan)
      case l if l.children.isEmpty => Seq(l)
      case o => o.children.flatMap(leaves)
    }
    for (name <- Seq("p96_served_downsample", "p97_pyramid_over_time")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val ls = leaves(df.queryExecution.executedPlan)
      val scans = ls.collect { case s: InMemoryTableScanExec => s }
      // the aligned panel executes against the cached rollup relation
      // (series × buckets); raw event columns never reach a scan — the
      // 100 TB claim ("panel cost independent of raw event count once
      // the pyramid exists"), pinned
      assert(scans.nonEmpty, s"$name does not read the rollup cache")
      assert(scans.forall(_.output.map(_.name).contains("bucket_s")),
        s"$name scans a non-rollup cached relation")
      assert(scans.forall(s => !s.output.map(_.name).contains("event_id")),
        s"$name re-reads raw event columns")
      assert(!ls.exists(_.nodeName.toLowerCase.contains("scan parquet")),
        s"$name re-reads the event log from parquet")
      val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("Union"), s"$name degenerated to per-instant branches")
      assert(!p.contains("CartesianProduct"), name)
    }
  }

  test("p88/p90/p91: pyramid panels slide windows over rollups; lattices broadcast; no cartesian") {
    for (name <- Seq("p88_rollup_panel", "p90_rollup_histogram",
        "p91_rollup_native_hq", "p92_pyramid_router", "p93_pyramid_gauge",
        "p94_pyramid_totals", "p95_pyramid_hq",
        // the generic vector-aggregation layer keeps the same shape:
        // per-series windows over rollups, one hash-agg per instant
        // group on top — never a union, never a cartesian
        "p100_pyramid_agg", "p101_pyramid_topk")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), name)
      assert(p.contains("Window"), s"$name lost the sliding rollup window")
      // the 43-instant lattice and the 1-row bucket anchor are
      // constant-size broadcast relations at any corpus scale
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$name lattice join not broadcast")
      assert(!p.contains("Union"), s"$name degenerated to per-instant branches")
    }
  }

  test("a1m: tombstone exclusion is a pure scan predicate — no join, no extra shuffle") {
    val p = plan("a1m_delete_series")
    val base = plan("a2_counter_snapshot")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"),
      "delete_series must not introduce any join")
    def exchanges(s: String): Int = "Exchange".r.findAllIn(s).length
    assert(exchanges(p) <= exchanges(base),
      "tombstones added a shuffle the plain counter snapshot doesn't have")
    assert(p.contains("Filter"), "the exclusion predicate vanished from the plan")
  }

  test("p103: a recorded-series query plans exactly like its inlined expression") {
    val p = plan("p103_promql_recorded")
    assert(!p.contains("CartesianProduct"), "recorded inlining went cartesian")
    assert(!p.contains("Union"), "recorded inlining degenerated to branches")
    // the view inlines: one aggregate over the events scan, ranked once
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      "rule aggregation missing")
    assert(p.contains("Window") || p.contains("TakeOrderedAndProject") ||
      p.contains("Sort"), "topk ranking missing over the recorded operand")
  }
}
