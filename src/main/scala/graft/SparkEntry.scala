package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * `queries`; operators expressible in ANSI/DuckDB SQL also get an
  * `oracleSql` entry (the driver hash-compares the two result sets after
  * sorting columns by name). Column names and types are kept identical on
  * both sides; float aggregates use the decimal-accumulation policy
  * documented in [[graft.ops.Relational]] so results are bit-reproducible
  * under any partitioning.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries ++ ExtCatalog.queries ++ Map(
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.q3ShippingPriority(s, d)),
    "q5_local_supplier_volume" -> ((s, d) => Relational.q5LocalSupplierVolume(s, d)),
    "q_semi_join" -> ((s, d) => Relational.qSemiJoin(s, d)),
    "q_anti_join" -> ((s, d) => Relational.qAntiJoin(s, d)),
    "q_window_topk" -> ((s, d) => Relational.qWindowTopK(s, d)),
    "q_rollup" -> ((s, d) => Relational.qRollup(s, d)),
    "q_rolling_sum" -> ((s, d) => Relational.qRollingSum(s, d)),
    "q_asof_join" -> ((s, d) => Relational.qAsofJoin(s, d)),
    "q_range_join" -> ((s, d) => Relational.qRangeJoin(s, d)),
    "q6_forecast_revenue" -> ((s, d) => Relational.q6ForecastRevenue(s, d)),
    "q_cube" -> ((s, d) => Relational.qCube(s, d)),
    "q_pivot" -> ((s, d) => Relational.qPivot(s, d)),
    "q_set_ops" -> ((s, d) => Relational.qSetOps(s, d)),
    "q_scalar_funcs" -> ((s, d) => Relational.qScalarFuncs(s, d)),
    "q_corr_subquery" -> ((s, d) => Relational.qCorrSubquery(s, d)),
    "q_outer_join" -> ((s, d) => Relational.qOuterJoin(s, d)),
    "q_window_suite" -> ((s, d) => Relational.qWindowSuite(s, d)),
    "q_grouping_sets" -> ((s, d) => Relational.qGroupingSets(s, d)),
    "q_nearest_event" -> ((s, d) => Relational.qNearestEvent(s, d)),
    "q10_returned_items" -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q14_promo_revenue" -> ((s, d) => Relational.q14PromoRevenue(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q19_bracket_revenue" -> ((s, d) => Relational.q19BracketRevenue(s, d)),
    "q_enrich_events" -> ((s, d) => Relational.qEnrichEvents(s, d)),
    "q7_volume_shipping" -> ((s, d) => Relational.q7VolumeShipping(s, d)),
    // S1 CSV header+infer scan under the ordinary hash gate (r10 verdict
    // ask #6 — it was the one spec-only source): S2 writes nation as a
    // header'd CSV, S1 reads it back with schema inference, and the
    // oracle re-reads the SAME file via DuckDB read_csv_auto — both
    // engines must agree on the parsed values AND the inferred column
    // types (int-family vs string vs date), or the hash gate fails.
    "s1_csv_scan" -> ((s, d) => {
      val path = s1CsvPath(d)
      io.Csv.write(Tables.load(s, d, "nation"), path)
      io.Csv.read(s, path).orderBy("n_nationkey")
    }),
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    QueryCatalog.oracleSql ++ ExtCatalog.oracleSqlWithAliases ++ Map(
    // integer-unit sums + scale-0 decimal→double casts, the a8 recipe:
    // a DECIMAL(38,2)-style fractional cast to double double-rounds in
    // DuckDB past 2^53 unscaled (the one x16 CLOSE row before r13)
    "q1_pricing_summary" -> {
      val qc = ops.Exact.centsSql("l_quantity")
      val pc = ops.Exact.centsSql("l_extendedprice")
      val dc = ops.Exact.centsSql("l_discount")
      val tc = ops.Exact.centsSql("l_tax")
      def usum(u: String) = s"CAST(SUM(CAST($u AS DECIMAL(38,0))) AS DOUBLE)"
      val discU = s"($pc * (100 - $dc))"
      val chargeU = s"($discU * (100 + $tc))"
      s"""SELECT l_returnflag, l_linestatus,
         |  ${usum(qc)} / 100.0 AS sum_qty,
         |  ${usum(pc)} / 100.0 AS sum_base_price,
         |  ${usum(discU)} / 10000.0 AS sum_disc_price,
         |  ${usum(chargeU)} / 1000000.0 AS sum_charge,
         |  ${usum(qc)} / 100.0 / COUNT(l_quantity) AS avg_qty,
         |  ${usum(pc)} / 100.0 / COUNT(l_extendedprice) AS avg_price,
         |  ${usum(dc)} / 100.0 / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
    },
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    // integer-unit revenue (the q1 recipe): exact at any magnitude, and
    // order-free so the Spark side's per-order pre-aggregate is free
    "q5_local_supplier_volume" -> {
      val pc = ops.Exact.centsSql("l_extendedprice")
      val dc = ops.Exact.centsSql("l_discount")
      s"""SELECT n_name,
         |  CAST(SUM(CAST(($pc * (100 - $dc)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin
    },
    "q_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45.0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q_rolling_sum" ->
      """WITH b AS (SELECT l_suppkey, l_shipdate,
        |  CAST(epoch(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS ep,
        |  CAST(l_quantity AS DECIMAL(18,2)) AS q FROM lineitem),
        |r AS (SELECT l_suppkey, l_shipdate,
        |  CAST(SUM(q) OVER (PARTITION BY l_suppkey ORDER BY ep
        |    RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_7d
        |  FROM b)
        |SELECT l_suppkey, l_shipdate, MAX(qty_7d) AS qty_7d
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |               FROM events WHERE event_type = 'click'),
        |p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        |       FROM events WHERE event_type = 'purchase'),
        |purch AS (SELECT user_id, ts AS purchase_ts, value AS purchase_value
        |          FROM p0 WHERE rn = 1)
        |SELECT c.event_id, c.user_id, c.ts, p.purchase_ts, p.purchase_value
        |FROM clicks c ASOF JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
        |ORDER BY c.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT band, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN (VALUES (1, 1.0, 11.0), (2, 11.0, 21.0), (3, 21.0, 31.0),
        |             (4, 31.0, 41.0), (5, 41.0, 51.0)) b(band, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q6_forecast_revenue" -> Relational.q6Sql("lineitem"),
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS "F",
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_set_ops" ->
      """SELECT 'with_orders' AS segment, COUNT(*) AS n_customers FROM (
        |  SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) t
        |UNION ALL
        |SELECT 'without_orders' AS segment, COUNT(*) AS n_customers FROM (
        |  SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t
        |ORDER BY segment""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  lower(o_orderstatus) AS status_lower,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
        |  o_orderstatus || '-' || o_orderpriority AS status_prio,
        |  trim(o_orderpriority) AS prio_trim,
        |  CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INTEGER) AS y,
        |  CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INTEGER) AS m,
        |  CAST(day(CAST(o_orderdate AS TIMESTAMP)) AS INTEGER) AS d,
        |  date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month_start,
        |  abs(o_totalprice * -1.0) AS abs_price,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
        |  greatest(o_totalprice, 1000.0) AS price_floor_1k
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "q_corr_subquery" -> Relational.qCorrSubquerySql("customer"),
    "q_outer_join" -> Relational.qOuterJoinSql,
    "q_window_suite" -> Relational.qWindowSuiteSql,
    "q_grouping_sets" -> Relational.qGroupingSetsSql("orders"),
    "q_nearest_event" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.user_id, click_id, click_ts, purchase_id,
        |        ABS(epoch_us(purchase_ts) - epoch_us(click_ts)) AS delta_us
        |      FROM c JOIN p ON c.user_id = p.user_id
        |      WHERE ABS(epoch_us(purchase_ts) - epoch_us(click_ts)) <= 1800000000),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY click_id
        |        ORDER BY delta_us, purchase_id) AS rk FROM j)
        |SELECT click_id, user_id, click_ts,
        |  purchase_id AS nearest_purchase_id, delta_us
        |FROM r WHERE rk = 1 ORDER BY click_id""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT 100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |  AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sq AS DOUBLE) AS sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q19_bracket_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1.0 AND l_quantity <= 21.0)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10.0 AND l_quantity <= 30.0)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20.0 AND l_quantity <= 40.0)""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_enrich_events" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) AS total_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    // the Spark side S2-writes this exact directory during Verify, so the
    // oracle's read_csv_auto re-parses the SAME bytes with ITS inference.
    // The {S1_CSV_DIR} placeholder is substituted by Verify.dump with the
    // FIXTURE-scoped path (one directory per source sfDir): a fixed
    // shared path raced when two fixtures (driver sf0.01 vs a fuzz dir,
    // or concurrent suites) wrote it with different nation tables.
    "s1_csv_scan" ->
      """SELECT * FROM read_csv_auto('{S1_CSV_DIR}/*.csv', header = true)
        |ORDER BY n_nationkey""".stripMargin,
  )

  /** Scratch CSV directory for the s1 round-trip, scoped to the source
    * fixture so concurrent fixtures never re-parse each other's bytes. */
  def s1CsvPath(sfDir: String): String =
    "/tmp/graft_s1_csv_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** [[oracleSql]] with the x16-fixture overrides applied: above their
    * input ceilings the dedup autos dispatch to banded-minhash sides, so
    * the at-scale oracle must pin THOSE semantics instead of the exact
    * small-corpus side's (Verify dumps this map under `--x16`). */
  def oracleSqlX16: Map[String, String] = oracleSql ++ ExtCatalog.oracleSqlX16
}
