package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators._

/** Relational tier (SURVEY §2.7-2.8): TPC-H-style aggregates, joins, windows, set ops, sketches.
  * One `queries` entry per operator with its DuckDB oracle twin;
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. */
private[graft] trait EntryRelational extends EntryShared {

  protected def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational tier (SURVEY §2.7-2.8) -----------------------------
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q03_shipping_priority" -> ((s, d) =>
      Relational.shippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q05_local_supplier" -> ((s, d) =>
      Relational.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q07_top_customers" -> ((s, d) => Relational.topCustomersPerNation(Tables.customer(s, d))),
    "q08_running_totals" -> ((s, d) => Relational.runningOrderTotals(Tables.orders(s, d))),
    "q09_semi_anti" -> ((s, d) =>
      Relational.customerOrderPresence(Tables.customer(s, d), Tables.orders(s, d))),
    "q10_rollup" -> ((s, d) => Relational.rollupQuantities(Tables.lineitem(s, d))),
    "q04_order_priority" -> ((s, d) =>
      Relational.orderPriorityCounts(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q06_forecast_revenue" -> ((s, d) => Relational.forecastRevenue(Tables.lineitem(s, d))),
    "q11_distinct_agg" -> ((s, d) => Relational.nationCustomerStats(Tables.customer(s, d))),
    "q12_cube" -> ((s, d) => Relational.cubeQuantities(Tables.lineitem(s, d))),
    "q13_window_frames" -> ((s, d) => Relational.customerOrderWindows(Tables.orders(s, d))),
    // explicit GROUPING SETS (the general form behind rollup/cube):
    // per-returnflag and per-linestatus layers only, no cross terms,
    "q15_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs") match { case _ =>
        s.sql("""SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
                 FROM lineitem_gs
                 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
      }),
    "q14_percentiles" -> ((s, d) => Relational.eventValuePercentiles(Tables.events(s, d))),
    "q16_pivot" -> ((s, d) => Relational.pivotOrderStatus(Tables.orders(s, d))),
    "q17_unpivot" -> ((s, d) => Relational.unpivotCustomer(Tables.customer(s, d))),
    // correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join; the oracle runs the identical SQL,
    "q18_corr_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_corr")
      s.sql("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
               FROM orders_corr o
               WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                                     FROM orders_corr o2
                                     WHERE o2.o_custkey = o.o_custkey)""")
    }),
    "q19_set_ops" -> ((s, d) =>
      Relational.nationSetOps(Tables.customer(s, d), Tables.supplier(s, d))),
    // HLL/KLL sketch aggregates: the sketch ESTIMATES are
    // engine-specific, so the checked projection is the exact twins plus
    // the bounded-error verdict booleans (deterministic — both sketches
    // are hash-based, no RNG); the oracle recomputes the exact side and
    // asserts the verdicts are true. The approx values themselves stay
    // on the operator's full output for API users.,
    "approx_stats" -> ((s, d) =>
      Relational.approxEventStats(Tables.events(s, d))
        .select("event_type", "exact_users", "exact_p50", "n_events",
          "users_ok", "p50_ok")),
    "q20_multiset_ops" -> ((s, d) =>
      Relational.multisetPriorityOps(Tables.orders(s, d))),
    "q21_range_frame" -> ((s, d) =>
      Relational.trailingEventWindow(Tables.events(s, d), windowSec = 600)),
    "doc_keywords" -> ((s, d) =>
      TextAnalysis.topTfidfTerms(Tables.documents(s, d), k = 3)),

    // --- chunking (SURVEY §2.3) ----------------------------------------,
  )

  protected def relationalOracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
        | o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q05_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin,
    "q07_top_customers" ->
      """SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal, rank FROM (
        | SELECT c_nationkey, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2) DESC, c_custkey) AS rank
        | FROM customer) WHERE rank <= 3""".stripMargin,
    "q08_running_totals" ->
      """SELECT o_custkey, o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders""".stripMargin,
    "q09_semi_anti" ->
      """SELECT c_custkey, true AS has_orders FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, false AS has_orders FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q11_distinct_agg" ->
      """SELECT c_nationkey, count(*) AS n_customers,
        | count(DISTINCT c_mktsegment) AS n_segments,
        | CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
        |   / (count(*) * 100) AS avg_acctbal
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q12_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "q20_multiset_ops" ->
      """SELECT o_orderpriority, count(*) AS n, 'intersect_all' AS op FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT o_orderpriority, count(*) AS n, 'except_all' AS op FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY o_orderpriority""".stripMargin,

    // sketch aggregates: the oracle recomputes the exact twins and
    // asserts the bounded-error verdicts hold — the sketch values
    // themselves are engine-specific but the verdicts are deterministic
    // (hash-based sketches, no RNG; see Relational.approxEventStats),
    "approx_stats" ->
      """SELECT event_type,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        | round(median(value), 4) AS exact_p50,
        | CAST(count(*) AS BIGINT) AS n_events,
        | true AS users_ok, true AS p50_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q21_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s,
        | count(*) OVER w AS n_in_window,
        | round(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w / 1000000.0, 4)
        |   AS sum_in_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "doc_keywords" ->
      s"""WITH toks AS (
        | SELECT doc_id, t AS term FROM (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
        |  FROM documents)
        | WHERE t <> '' AND NOT list_contains($stopSql, t)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |corpus AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        | SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |  tf.tf * CAST(round(round(ln(CAST(corpus.n_docs AS DOUBLE) / dfreq.df), 6)
        |    * 1000000) AS BIGINT) AS w6
        | FROM tf JOIN dfreq USING (term), corpus),
        |ranked AS (SELECT *, row_number() OVER (
        |  PARTITION BY doc_id ORDER BY w6 DESC, term) AS rank FROM scored)
        |SELECT doc_id, term, tf, df, round(w6 / 1000000.0, 4) AS tfidf, rank
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q16_pivot" ->
      """SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus = 'F'
        |   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) / 100.0, 2) AS "F",
        | round(sum(CASE WHEN o_orderstatus = 'O'
        |   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) / 100.0, 2) AS "O",
        | round(sum(CASE WHEN o_orderstatus = 'P'
        |   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) / 100.0, 2) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q17_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer""".stripMargin,
    "q18_corr_subquery" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin,
    "q19_set_ops" ->
      """SELECT nationkey, 'both' AS side FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT s_nationkey AS nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'customer_only' AS side FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT s_nationkey AS nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'supplier_only' AS side FROM (
        |  SELECT s_nationkey AS nationkey FROM supplier
        |  EXCEPT SELECT c_nationkey AS nationkey FROM customer)""".stripMargin,
    "q13_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        | round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q14_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
        |FROM events GROUP BY event_type""".stripMargin,
  )
}
