package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Star-schema join/aggregation surface (TPC-H-shaped) — exercises the
  * scan/filter/join/agg/sort/limit categories the reference lacks
  * (SURVEY.md §2.3) at bench scale.
  *
  * Scale design:
  *  - Filters are plain column predicates → Catalyst pushes them into the
  *    parquet scan (`PushedFilters`), and only referenced columns are read
  *    (`ReadSchema`).
  *  - Dimension tables (customer/nation/region: ≤ thousands of rows at any
  *    sf; bounded at 100 TB too) carry an explicit `broadcast()` hint, so
  *    fact-table joins are broadcast-hash joins with zero fact shuffle.
  *  - Aggregations are partial+final hash aggregates; the only full
  *    shuffle per query is the final groupBy on low-cardinality keys.
  *  - Monetary sums use exact DECIMAL accumulation cast to DOUBLE at the
  *    end (associative ⇒ partition-order independent ⇒ oracle-stable).
  */
object Relational {

  private def dec2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def dec6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** TPC-H Q4-shaped order-priority check: orders of one quarter with at
    * least one line shipped more than 60 days after the order date,
    * counted per priority — the EXISTS/semi-join category (the driver
    * tables carry no commitdate/receiptdate, so the late-shipment
    * predicate stands in for Q4's commit<receipt). The semi join hashes
    * on the order key with the date comparison as residual condition;
    * orders is the build side after its quarter filter is pushed to the
    * scan, and no lineitem row is ever duplicated (EXISTS, not join).
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val OrderPriorityCheckSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q10-shaped returned-item revenue: top-20 customers by
    * revenue on returned lines of one quarter — a 4-relation join where
    * every dimension (orders-filtered-to-quarter via broadcast? no:
    * orders is a fact; customer and nation broadcast) feeds one hash
    * aggregate and an ordered limit (TakeOrderedAndProject, no global
    * sort). Revenue accumulates in DECIMAL(18,6).
    */
  def returnedItemRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val ReturnedItemRevenueSql: String =
    """WITH r AS (
      |  SELECT c_custkey, c_name, n_name,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |      AS DOUBLE) AS revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-04-01'
      |  GROUP BY c_custkey, c_name, n_name)
      |SELECT * FROM r
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q1-shaped pricing summary over lineitem. Single scan, single
    * shuffle on (l_returnflag, l_linestatus) — 6 groups.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dec2(col("l_quantity")).as("sum_qty"),
        dec2(col("l_extendedprice")).as("sum_base_price"),
        dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dec6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        col("avg_qty"), col("avg_price"), col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped shipping priority: revenue of undelivered orders in
    * one market segment. customer (small) is broadcast into orders;
    * orders→lineitem is the only shuffled join at scale (both sides
    * hash-partitioned on orderkey).
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val ShippingPrioritySql: String =
    """SELECT l_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q17-shaped small-quantity revenue: average yearly revenue lost
    * if small orders (below 20% of the part's average quantity) were not
    * filled. Exercises a correlated scalar subquery — Catalyst
    * decorrelates it into an aggregate + join; the per-part average is
    * tiny and broadcast. Threshold arithmetic is the identical double
    * expression in both engines, so row selection matches exactly.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val avgQty = li.groupBy(col("l_partkey").as("p_key"))
      .agg((dec2(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(broadcast(avgQty), col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg((dec2(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val SmallQuantityRevenueSql: String =
    """WITH a AS (
      |  SELECT l_partkey AS p_key,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem JOIN a ON l_partkey = p_key
      |WHERE l_quantity < avg_qty * 0.2""".stripMargin

  /** TPC-H Q14-shaped promotion effect: the promo share of one month's
    * revenue. Part is the broadcast dimension; promo and total revenue
    * accumulate as exact DECIMAL sums side by side in ONE aggregate
    * pass (no second scan for the denominator), and the percentage is
    * a single double divide of the two exact sums — oracle-stable.
    * Ship-date bounds push to the parquet scan.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        dec6(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0))).as("promo_rev"),
        dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_rev"))
      .select(
        (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"),
        col("promo_rev"), col("total_rev"))
  }

  val PromoRevenueSql: String =
    """SELECT
      |  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |    AS promo_pct,
      |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
      |    AS promo_rev,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |    AS total_rev
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  /** TPC-H Q19-shaped disjunctive revenue: an OR of three
    * brand/size/quantity conjunctions spanning both join sides — the
    * category where naive planners fall back to a cartesian because no
    * single conjunct covers the join key. Here the equi-key
    * (`l_partkey = p_partkey`) stays a broadcast-hash join and the
    * disjunction evaluates as a codegen'd residual; the part-side
    * conjuncts cannot be pushed below the OR, which is exactly what
    * the plan pin asserts (join stays hash, no cartesian).
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val cond =
      (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(1, 30) &&
        col("l_quantity").between(20, 35))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val DisjunctiveRevenueSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
      |       AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 30
      |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  /** TPC-H Q6-shaped forecast revenue: the pure scan-side query — every
    * predicate is a plain column comparison pushed into the parquet scan
    * (`PushedFilters`), only the 4 referenced columns are read
    * (`ReadSchema`), and the rest is one partial+final hash aggregate to
    * a single row: zero joins, zero wide shuffle. The canonical
    * "the scan does the work" plan — at 100 TB this query's cost is
    * I/O-bound and embarrassingly parallel.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dec6(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  val ForecastRevenueSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q5-shaped local-supplier volume: revenue per nation where the
    * customer and supplier share a nation. All dimensions broadcast; the
    * fact tables join once on orderkey.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val LocalSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q13-shaped customer order-count distribution: how many
    * customers placed 0, 1, 2, … urgent orders — the LEFT OUTER JOIN
    * category (customers with no matching order must survive as
    * c_count = 0; 203 of 1500 do at sf0.01, so the null path is
    * exercised, not vacuous). Two-level aggregation: the first groupBy
    * shuffles on c_custkey (the same key the join just hashed on, so
    * AQE coalesces), the second collapses to the handful of distinct
    * counts. All integers — oracle-exact by construction.
    */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val CustomerDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15-shaped top supplier: the supplier(s) whose revenue over
    * one quarter equals the maximum — the scalar-subquery-on-an-
    * aggregate category. The per-supplier revenue relation is computed
    * once; its single-row MAX is broadcast back and matched by exact
    * double equality (both sides are the same DECIMAL sum cast to
    * DOUBLE, so the comparison is bit-identical in both engines — ties
    * all surface, no LIMIT 1 nondeterminism). Supplier is the broadcast
    * dimension.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(top), col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON supplier_no = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q18-shaped large-volume customers: orders whose total line
    * quantity exceeds 350 (8 of 15 000 at sf0.01), with their customer.
    * The HAVING-on-aggregate gate runs BEFORE any join (the per-order
    * quantity sum stays DECIMAL through the > 350 comparison — exact, so
    * both engines keep the identical order set — and casts to DOUBLE only
    * for output). The filtered relation is joined back to orders on the
    * order key — a shuffle join, NOT a broadcast: the survivor set is
    * proportionally tiny but unbounded at 100 TB, while customer stays
    * the broadcast dimension. Ordered limit → TakeOrderedAndProject.
    */
  def largeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("bk"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
      .filter(col("qty") > lit(350).cast(DecimalType(18, 2)))
      .select(col("bk"), col("qty").cast("double").as("total_qty"))
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("bk"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val LargeVolumeCustomersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey AS bk,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 350)
      |SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_totalprice, CAST(qty AS DOUBLE) AS total_qty
      |FROM orders
      |JOIN big ON o_orderkey = bk
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q22-shaped dormant balances: per market segment, customers
    * whose balance exceeds the positive-balance average but who placed
    * no order since 2000 — the anti-join + uncorrelated scalar-subquery
    * category (55 such customers at sf0.01). The 1-row average is a
    * broadcast cross join (the one legitimate crossJoin shape); the
    * threshold is the identical DECIMAL-sum-over-COUNT double in both
    * engines, so the > comparison selects the same rows. The anti join
    * hashes on custkey with the date filter pushed to the orders scan.
    */
  def dormantBalances(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((dec2(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), dec2(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val DormantBalancesSql: String =
    """WITH a AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    AS avg_bal
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, a
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q7-shaped nation-pair volume: shipping revenue between two
    * nations per year, in both directions — the query whose join graph
    * reaches nation through TWO independent dimension paths (supplier's
    * nation via lineitem, customer's nation via orders). Each path is
    * pre-filtered to the two nations of interest and broadcast, so the
    * fact rows are pruned by the broadcast joins before the pair
    * residual ((N3,N7) or (N7,N3)) runs — the fact tables join once on
    * orderkey, nothing else shuffles.
    */
  def nationVolume(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_3", "NATION_7"))
    val supp = Tables.supplier(spark, dir)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val NationVolumeSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |    l_extendedprice * (1 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q2-shaped minimum-cost supplier: for every STANDARD part of
    * size ≤ 15, the EUROPE-region supplier(s) whose line offers the
    * part at its region-wide minimum extended price — the
    * correlated-scalar-MIN-subquery shape (the driver schema carries no
    * partsupp, so lineitem stands in as the (part, supplier, cost)
    * offer relation and `l_extendedprice` as the cost).
    *
    * Spark-first decorrelation: the correlated `= (SELECT MIN ...)`
    * becomes one partkey-grouped MIN over the offers relation joined
    * back on (partkey, price) — two scans of the filtered offer
    * relation, both pruned to 3-4 columns, with every dimension
    * (supplier⋈nation⋈region, part) broadcast. The price-equality join
    * keys on (l_partkey, price): doubles compare exactly because both
    * sides carry the SAME parquet value, never an arithmetic result.
    * DISTINCT collapses repeated identical offers (TPC-H's partsupp is
    * unique per (part,supp); a line relation is not).
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eurSupp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val offers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
    // the grouped-min relation renames its key: a same-name self-join
    // against a derived frame leans on Spark's dataset-id disambiguation
    // (and warns); the rename makes the equi-join unambiguous
    val minCost = offers.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min(col("l_extendedprice")).as("min_cost"))
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_name")))
    offers
      .join(minCost,
        col("l_partkey") === col("mc_partkey") &&
          col("l_extendedprice") === col("min_cost"))
      .drop("mc_partkey")
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("min_cost").as("supply_cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val MinCostSupplierSql: String =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  l_extendedprice AS supply_cost
      |FROM part, lineitem, supplier, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_type = 'STANDARD' AND p_size <= 15
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q8-shaped market share: of all ECONOMY-part revenue sold
    * into the AMERICA customer market over two years, the fraction
    * supplied by NATION_3's suppliers, per order year — the multi-fact
    * shape (lineitem⋈orders fact-fact shuffle joined to FOUR broadcast
    * dimension paths: part, supplier→nation, customer→nation→region).
    * Numerator and denominator accumulate as exact DECIMAL(18,6) and
    * divide once per year row.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey")))
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey")))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        dec6(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0d))
          .as("nation_volume"),
        dec6(col("volume")).as("total_volume"))
      .select(col("o_year"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"),
        col("nation_volume"), col("total_volume"))
      .orderBy(col("o_year"))
  }

  val MarketShareSql: String =
    """WITH v AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'),
      |a AS (
      |  SELECT o_year,
      |    CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
      |                       ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS nation_volume,
      |    CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS total_volume
      |  FROM v GROUP BY o_year)
      |SELECT o_year, nation_volume / total_volume AS mkt_share,
      |  nation_volume, total_volume
      |FROM a
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q9-shaped product-type profit: per supplier nation and order
    * year, revenue minus an inventory-cost proxy on PROMO parts — the
    * second multi-fact shape (no partsupp, so `p_retailprice ×
    * l_quantity × 0.1` stands in for `ps_supplycost × l_quantity`).
    * Both product terms are double arithmetic on raw parquet values
    * (bit-identical in both engines) summed inside exact DECIMAL(18,6).
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_retailprice")))
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dec6(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val ProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6))) AS DOUBLE)
      |    AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'PROMO'
      |GROUP BY n_name, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q21-shaped waiting suppliers: suppliers whose line was the
    * ONLY late one on a finished multi-supplier order — the
    * double-correlated EXISTS / NOT-EXISTS shape ("late" = shipped
    * more than 60 days after the order date, as in Q4's adaptation;
    * the driver schema has no commit/receipt dates).
    *
    * Spark-first decorrelation: the late-line relation (lineitem ⋈
    * orders[status F] with the date residual) is built ONCE and reused
    * for both the probe side and the NOT-EXISTS side — the correlated
    * `l3.l_shipdate > o_orderdate + 60` rebinds to the SAME order row,
    * so a self-anti-join on (orderkey, supplier≠) is exact. The EXISTS
    * becomes a semi-join against the pruned (orderkey, suppkey) line
    * projection. All shuffles key on l_orderkey; supplier⋈nation
    * broadcasts.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val l3 = late
      .select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"))
    late
      .join(l2,
        col("l2_orderkey") === col("l_orderkey") &&
          col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(l3,
        col("l3_orderkey") === col("l_orderkey") &&
          col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val WaitingSuppliersSql: String =
    """SELECT s_name, n_name, COUNT(*) AS numwait
      |FROM supplier, nation, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND s_nationkey = n_nationkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name, n_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** TPC-H Q11-shaped important stock: per part supplied from the ASIA
    * region, the total line value, keeping parts whose value exceeds
    * 1.5× the average per-part value — the HAVING-vs-uncorrelated-
    * scalar-subquery shape (no partsupp; lineitem value stands in for
    * supplycost×availqty, and the threshold is relative to the average
    * share so it stays meaningful at every scale factor, unlike
    * TPC-H's literal FRACTION/SF constant).
    *
    * Oracle-parity note: the threshold divides the exact DECIMAL total
    * by the exact distinct-part count, both engine-identical, so the
    * one double multiply/divide is bit-equal too.
    */
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    val asiaSupp = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")))
    val offers = Tables.lineitem(spark, dir)
      .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("v"))
    val thresh = offers.agg(
      (lit(1.5) * dec6(col("v")) / countDistinct(col("l_partkey")))
        .as("thresh"))
    offers.groupBy(col("l_partkey"))
      .agg(dec6(col("v")).as("part_value"))
      .crossJoin(broadcast(thresh))
      .filter(col("part_value") > col("thresh"))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val ImportantStockSql: String =
    """WITH offers AS (
      |  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |SELECT l_partkey,
      |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS part_value
      |FROM offers
      |GROUP BY l_partkey
      |HAVING CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) > (
      |  SELECT 1.5 * CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(DISTINCT l_partkey)
      |  FROM offers)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** TPC-H Q12-shaped shipment priority distribution: for one ship
    * year, per line status, how many lines belong to high-priority
    * (URGENT/HIGH) vs lower-priority orders — the CASE-sum pivot over
    * a fact-fact join (the driver schema has no l_shipmode, so
    * l_linestatus is the pivot axis). Counts are exact integers.
    */
  def priorityShipments(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val PriorityShipmentsSql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q16-shaped supplier count: distinct suppliers able to
    * supply each (brand, type, size) bucket of qualifying parts,
    * excluding a NOT-IN supplier denylist (low account balance stands
    * in for Q16's complaint-comment scan — the schema carries no
    * s_comment). NOT IN over a non-nullable key decorrelates to an
    * anti-join against the broadcast denylist; part is broadcast; the
    * one shuffle is the final distinct-count aggregate.
    */
  def supplierCount(spark: SparkSession, dir: String): DataFrame = {
    val denylist = broadcast(Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 2000.0)
      .select(col("s_suppkey").as("bad_suppkey")))
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 14, 23, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(denylist, col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val SupplierCountSql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 14, 23, 45)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20-shaped excess quantity: suppliers who shipped more than
    * 40% of a SMALL part's one-year volume — the nested-IN +
    * correlated-HAVING shape. Decorrelated Spark-first: the filtered
    * offer relation aggregates once per (supplier, part) and once per
    * part, the 40% comparison joins the two on the part key, and the
    * qualifying supplier set semi-joins back to supplier. Quantities
    * accumulate as exact DECIMAL(18,2); the one 0.4× multiply is
    * double on exact inputs, identical in both engines.
    */
  def excessQuantity(spark: SparkSession, dir: String): DataFrame = {
    val sl = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "SMALL").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val perPart = sl.groupBy(col("l_partkey").as("pk"))
      .agg(dec2(col("l_quantity")).as("part_total"))
    val qualifying = sl.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(dec2(col("l_quantity")).as("sp_total"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("sp_total") > lit(0.4) * col("part_total"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val ExcessQuantitySql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l1.l_suppkey
      |  FROM lineitem l1
      |  JOIN part ON l1.l_partkey = p_partkey
      |  WHERE p_type = 'SMALL'
      |    AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l1.l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l1.l_suppkey, l1.l_partkey
      |  HAVING CAST(SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 0.4 * (
      |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    FROM lineitem l2
      |    WHERE l2.l_partkey = l1.l_partkey
      |      AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
      |ORDER BY s_name""".stripMargin
}
