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

  test("no query in the relational/join family degrades to a cartesian product") {
    for (name <- Seq("q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
        "q10_returned_revenue", "q17_small_quantity_revenue", "b8_binary_op",
        "x3_minhash_lsh")) {
      assert(!plan(name).contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }
}
