package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface over the TPC-H-ish testdata: the aggregate /
  * join / window / set-op capabilities Catalyst supplies for free once the
  * engine exposes DataFrames (SURVEY.md §2.7-2.8 notes the reference has
  * only trivial aggregates; these queries prove the engine's relational
  * tier at scale). All money sums rounded for cross-engine hashing.
  *
  * Scale notes per query are inline: what shuffles, what broadcasts,
  * where partial aggregation happens.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan-heavy, two-phase hash aggregate
    * (partial map-side combine → 4-group final). The shuffle moves only
    * |groups| rows per task regardless of scan size. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style shipping priority: customer (small) broadcast to
    * orders, orders⨝lineitem on the orderkey shuffle, top-10 by revenue.
    * Revenue rounded BEFORE ordering so rank ties are engine-stable. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String = "BUILDING"): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style local-supplier revenue: the dimension chain
    * region→nation is tiny → broadcast all the way; the only real
    * shuffle is lineitem⨝orders. Grouped by nation name. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** Per-nation top-3 customers by account balance — rank window with
    * WindowGroupLimit pushdown (per-task top-3 before the shuffle). */
  def topCustomersPerNation(customer: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(round(col("c_acctbal"), 2).desc, col("c_custkey"))
    customer
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("c_nationkey"), col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
        col("rank"))
  }

  /** Running order total per customer — a ROWS-frame cumulative window.
    * One shuffle on o_custkey; frame state is O(1). */
  def runningOrderTotals(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
      round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
  }

  /** Semi/anti join surface: customers with ≥1 order vs. customers with
    * none — `left_semi` / `left_anti`, the plans Catalyst rewrites
    * IN/EXISTS (and S14-style deletes) into. */
  def customerOrderPresence(customer: DataFrame, orders: DataFrame): DataFrame = {
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey")).withColumn("has_orders", lit(true))
    val noO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey")).withColumn("has_orders", lit(false))
    withO.unionByName(noO)
  }

  /** Grouping-sets rollup over (returnflag, linestatus) — free from
    * Catalyst (§2.7: "the engine gets them free if we expose SQL"). */
  def rollupQuantities(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  /** TPC-H Q4-style order-priority check: left-semi join (EXISTS) on the
    * orderkey, then a tiny hash aggregate. Semi-join shuffles only the
    * distinct keys of the probe side. */
  def orderPriorityCounts(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.select(col("l_orderkey")), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** TPC-H Q6-style forecast revenue: pure scan + filter + single-row
    * aggregate — the predicate-pushdown showcase (all three filters reach
    * the parquet scan; `.explain` shows them under PushedFilters). */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Distinct aggregates per nation (Catalyst plans count-distinct as a
    * two-level expand+aggregate; partials still combine map-side). */
  def nationCustomerStats(customer: DataFrame): DataFrame =
    customer
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        count_distinct(col("c_mktsegment")).as("n_segments"),
        // exact integer cents, UNROUNDED quotient: avg(acctbal) can land
        // on a half cent (…1.315), where HALF_UP vs float-multiply
        // rounding disagree across engines; the integer sum ÷ (100·n) is
        // the same IEEE op on both sides
        (sum(round(col("c_acctbal") * 100, 0).cast("long")).cast("double") /
          (count(lit(1)) * 100)).as("avg_acctbal"))

  /** Salted two-phase aggregation — the skew-mitigation pattern for hot
    * keys at scale (a handful of languages dominating 100 TB of
    * documents): phase 1 aggregates on (key, salt) spreading each hot key
    * over `saltBuckets` reducers; phase 2 merges the partials on the bare
    * key. Same result as a direct groupBy, but no single reducer ever
    * sees a whole hot key. (AQE skew handling covers joins; aggregation
    * skew still wants explicit salting.) */
  def saltedCountSum(df: DataFrame, keyCol: String, valCol: String,
                     saltBuckets: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("sum_val"))

  /** Window-frame variety on one pass over orders: lag, a 3-row moving
    * average (ROWS frame), and quartile bucketing — all sharing one
    * (custkey, orderdate) sort so Catalyst plans a single Window node. */
  def customerOrderWindows(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
      round(avg(col("o_totalprice")).over(w.rowsBetween(-2, 0)), 4).as("mavg3"),
      ntile(4).over(w).as("quartile"))
  }

  /** Exact interpolated percentiles per group (both engines define the
    * continuous quantile identically; rounded for hashing). */
  def eventValuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"))

  /** CUBE over (returnflag, linestatus): all four grouping-set layers in
    * one pass via Expand — the reference has nothing like it; Catalyst
    * gives it free (SURVEY.md §2.7). */
  def cubeQuantities(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  /** INTERSECT ALL / EXCEPT ALL — the multiset variants (bag semantics:
    * occurrences pair up, so 3 vs 1 copies intersect as 1 and subtract
    * as 2). Catalyst rewrites both into a count-compare aggregate +
    * generate — no distinct collapse, duplicates preserved exactly. */
  def multisetPriorityOps(orders: DataFrame): DataFrame = {
    val fast = orders.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
    val open = orders.filter(col("o_orderstatus") === "O").select(col("o_orderpriority"))
    fast.intersectAll(open).groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      .unionByName(
        fast.exceptAll(open).groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all")))
  }

  /** RANGE-frame window over event time: per user, the running sum and
    * count of event values within the trailing `windowSec` seconds —
    * a value-based frame (RANGE), not a row-count frame (ROWS): frame
    * membership follows the ORDER BY value, so irregular event spacing
    * is handled exactly. One shuffle on user_id; frame state is a
    * sliding aggregate. */
  def trailingEventWindow(events: DataFrame, windowSec: Int = 600): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_s"))
      .rangeBetween(-windowSec.toLong, 0L)
    events
      // integer div: ts_ns ~1.7e18 exceeds double's 53-bit mantissa, a
      // float division here would silently lose sub-second precision
      .withColumn("ts_s", expr("ts_ns div 1000000000"))
      // fixed-point values: sliding-frame float sums accumulate in
      // engine-specific order (Spark running add/remove vs segment
      // trees); long sums are exact and order-free
      .withColumn("v6", round(col("value") * 1e6, 0).cast("long"))
      .select(col("event_id"), col("user_id"), col("ts_s"),
        count(lit(1)).over(w).as("n_in_window"),
        round(sum(col("v6")).over(w) / 1e6, 4).as("sum_in_window"))
  }

  /** Sketch-based approximate aggregates — the 100 TB form of distinct
    * counting and quantiles: `approx_count_distinct` is a HyperLogLog++
    * sketch (fixed ~kB state per group, partial-combinable, one shuffle
    * of sketches instead of a distinct-expand), `approx_percentile` a
    * KLL-style quantile sketch. Exact counterparts ride along so callers
    * can bound the relative error, and BOTH bounds are also cashed out
    * here as verdict booleans — `users_ok` (HLL estimate within 5·rsd of
    * exact, with an absolute floor of 10 for tiny groups) and `p50_ok`
    * (the sketch median lands between the exact 45th and 55th
    * percentiles; accuracy=1000 guarantees rank error ≤ n/1000, far
    * inside that window). The sketch VALUES are engine-specific, but the
    * verdicts are deterministic given the data (both sketches are
    * hash-based, no RNG), so an oracle that recomputes the exact twins
    * and asserts `true` verdicts fully checks this operator. */
  def approxEventStats(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_p50"),
        // ONE exact-percentile aggregate for all three quantiles — the
        // Percentile buffer is shared, vs three independent sorts
        expr("percentile(value, array(0.45, 0.5, 0.55))").as("_pcts"),
        count(lit(1)).as("n_events"))
      .withColumn("exact_p50", round(element_at(col("_pcts"), 2), 4))
      .withColumn("users_ok",
        abs(col("approx_users") - col("exact_users")).cast("double") <=
          greatest(round(col("exact_users") * (5 * rsd), 0), lit(10.0)))
      .withColumn("p50_ok",
        col("approx_p50").between(
          element_at(col("_pcts"), 1), element_at(col("_pcts"), 3)))
      .drop("_pcts")

  /** PIVOT: order totals by priority × status. Pivot values are given
    * EXPLICITLY — no extra distinct-values job, and a stable output
    * schema at any scale. Catalyst plans pivot as two aggregates (a
    * pre-aggregate on (groupBy, pivot) keys, then PivotFirst on the
    * groupBy key); that shape is scale-correct because the first
    * aggregate collapses the scan to |groups × pivot values| rows
    * before the second shuffle. The aggregate is a bare `sum` (rounding
    * on the pivoted output) so the pre-aggregate stays partial-combinable. */
  def pivotOrderStatus(orders: DataFrame,
                       statuses: Seq[String] = Seq("F", "O", "P")): DataFrame =
    orders
      // fixed-point cents before the sum: double addition is
      // order-dependent and this aggregate feeds a hash-compared output
      .withColumn("_cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .agg(sum(col("_cents")))
      .select(col("o_orderpriority") +:
        statuses.map(v => round(col(v) / 100.0, 2).as(v)): _*)

  /** UNPIVOT (melt): wide numeric customer columns to (key, metric,
    * value) long form — the inverse reshape, a zero-shuffle Expand:
    * each input row fans out to one row per metric in place. */
  def unpivotCustomer(customer: DataFrame): DataFrame =
    customer
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(Array(col("c_custkey")), Array(col("acctbal"), col("nationkey")),
        "metric", "value")

  /** INTERSECT / EXCEPT set ops: nations present on both the customer and
    * supplier side, customer-only, and supplier-only — tagged union of the
    * three disjoint layers. Catalyst rewrites INTERSECT to a left-semi and
    * EXCEPT to a left-anti over the distinct keys, so each layer shuffles
    * only the (tiny) distinct nation-key sets. */
  def nationSetOps(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val cn = customer.select(col("c_nationkey").as("nationkey")).distinct()
    val sn = supplier.select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("side", lit("both"))
      .unionByName(cn.except(sn).withColumn("side", lit("customer_only")))
      .unionByName(sn.except(cn).withColumn("side", lit("supplier_only")))
  }

  /** Correlated LATERAL subquery (SQL-surface twin of the window-rank
    * top-k): per nation, the top-`k` customers by account balance. The
    * optimizer decorrelates the LATERAL into the same
    * rank-then-limit-per-group plan as the DataFrame form — exposed here
    * because a reference user migrating SQL workloads writes it this
    * way. */
  def lateralTopPerNation(nation: DataFrame, customer: DataFrame,
                          k: Int = 2): DataFrame = {
    val spark = nation.sparkSession
    nation.createOrReplaceTempView("graft_nation_lat")
    customer.createOrReplaceTempView("graft_customer_lat")
    spark.sql(s"""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM graft_nation_lat n,
      LATERAL (SELECT c_custkey, c_acctbal
               FROM graft_customer_lat
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT $k) t""")
  }

  /** Recursive CTE (Spark 4.x `WITH RECURSIVE` / `UnionLoopExec`): a
    * data-driven year spine — every year between the corpus' min and max
    * order date, even empty ones — joined back for per-year order and
    * customer counts. The recursion carries its bound `hi` as a COLUMN:
    * a scalar subquery in the step predicate would re-aggregate `orders`
    * once per iteration (measured 20 s vs 1 s at sf0.1). Depth = year
    * span, independent of data volume — the one recursion shape that
    * stays cheap at 100 TB. (Spark does not yet allow UNION-dedup
    * recursion, so cyclic closures stay with
    * [[graft.operators.Dedup.connectedComponents]]'s fixed-point.) */
  def yearSpineAgg(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    orders.createOrReplaceTempView("graft_orders_spine")
    spark.sql("""
      WITH RECURSIVE bounds AS (
        SELECT year(min(o_orderdate)) AS lo, year(max(o_orderdate)) AS hi
        FROM graft_orders_spine),
      years(y, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT y + 1, hi FROM years WHERE y < hi
      )
      SELECT y, count(o_orderkey) AS n_orders,
             count(DISTINCT o_custkey) AS n_customers
      FROM years LEFT JOIN graft_orders_spine ON year(o_orderdate) = y
      GROUP BY y""")
  }
}
