package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Relational family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object RelationalReg {
  // ── Relational breadth (SURVEY §2 extension: joins/topk/distinct/window) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) => Relational.q1Pricing(Tables.lineitem(s, dir))),
    // referential-integrity audit AFTER a parent-side curation delete
    // (parents with key ≡ 0 mod 97 removed, mirrored in the oracle) —
    // the sibling of the clean-state fk_orphans row: that one proves
    // integrity holds, this one proves the DAMAGE measurement works
    // (rates, stranded-key counts) when it does not
    "fk_orphans_curated" -> { (s, dir) =>
      import graft.operators.Profiling
      def del(df: org.apache.spark.sql.DataFrame, k: String) =
        df.filter(pmod(col(k), lit(97)) =!= 0)
      // grouped by child table (guide §6): lineitem's three edges share
      // ONE scan through the keyed explode instead of three scan+agg
      // chains — row values identical (see fkOrphansGrouped)
      Profiling.fkOrphansGrouped(Seq(
        (Tables.customer(s, dir), Seq(
          ("customer_nation", "c_nationkey",
            del(Tables.nation(s, dir), "n_nationkey"), "n_nationkey"))),
        (Tables.lineitem(s, dir), Seq(
          ("lineitem_orders", "l_orderkey",
            del(Tables.orders(s, dir), "o_orderkey"), "o_orderkey"),
          ("lineitem_part", "l_partkey",
            del(Tables.part(s, dir), "p_partkey"), "p_partkey"),
          ("lineitem_supplier", "l_suppkey",
            del(Tables.supplier(s, dir), "s_suppkey"), "s_suppkey"))),
        (Tables.nation(s, dir), Seq(
          ("nation_region", "n_regionkey",
            del(Tables.region(s, dir), "r_regionkey"), "r_regionkey"))),
        (Tables.orders(s, dir), Seq(
          ("orders_customer", "o_custkey",
            del(Tables.customer(s, dir), "c_custkey"), "c_custkey"))),
        (Tables.supplier(s, dir), Seq(
          ("supplier_nation", "s_nationkey",
            del(Tables.nation(s, dir), "n_nationkey"), "n_nationkey")))))
    },
    // key-uniqueness audit: true identifiers next to almost-keys, so
    // the dup counting is exercised, not vacuous
    "key_uniqueness" -> { (s, dir) =>
      import graft.operators.Profiling
      // grouped by table (guide §6): lineitem's and orders' two
      // candidates each share ONE scan+aggregate (7 scans → 5) —
      // row values identical (see keyUniquenessGrouped)
      Profiling.keyUniquenessGrouped(Seq(
        (Tables.customer(s, dir), Seq(
          ("customer_c_custkey", Seq("c_custkey")))),
        (Tables.documents(s, dir), Seq(
          ("documents_doc_id", Seq("doc_id")))),
        (Tables.events(s, dir), Seq(
          ("events_event_id", Seq("event_id")))),
        (Tables.lineitem(s, dir), Seq(
          ("lineitem_l_orderkey", Seq("l_orderkey")),
          ("lineitem_pk", Seq("l_orderkey", "l_linenumber")))),
        (Tables.orders(s, dir), Seq(
          ("orders_o_custkey", Seq("o_custkey")),
          ("orders_o_orderkey", Seq("o_orderkey"))))))
    },
    "q3_shipping" -> ((s, dir) => Relational.q3Shipping(
      Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q5_region_revenue" -> ((s, dir) => Relational.q5RegionRevenue(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
      Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "topk_orders" -> ((s, dir) => Relational.topkOrders(Tables.orders(s, dir))),
    "q14_promo_share" -> ((s, dir) => Relational.q14PromoShare(
      Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q17_small_quantity" -> ((s, dir) => Relational.q17SmallQuantity(
      Tables.lineitem(s, dir), Tables.part(s, dir))),
    "group_distinct" -> ((s, dir) => Relational.groupDistinct(Tables.orders(s, dir))),
    "rollup_revenue" -> ((s, dir) => Relational.rollupRevenue(Tables.orders(s, dir))),
    "grouping_sets_revenue" -> ((s, dir) => Relational.groupingSetsRevenue(Tables.orders(s, dir))),
    "cube_revenue" -> ((s, dir) => Relational.cubeRevenue(Tables.orders(s, dir))),
    "exists_shapes" -> ((s, dir) => Relational.existsShapes(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "pivot_status_counts" -> ((s, dir) => Relational.pivotStatusCounts(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "window_top_orders" -> ((s, dir) => Relational.windowTopOrders(Tables.orders(s, dir))),
    "rank_bands" -> ((s, dir) => Relational.rankBands(Tables.orders(s, dir))),
    "customer_value_deciles" -> ((s, dir) =>
      Relational.customerValueDeciles(Tables.orders(s, dir))),
    "q10_returned" -> ((s, dir) => Relational.q10Returned(
      Tables.customer(s, dir), Tables.orders(s, dir),
      Tables.lineitem(s, dir), Tables.nation(s, dir))),
    "nation_activity_full" -> ((s, dir) => Relational.nationActivityFull(
      Tables.customer(s, dir), Tables.supplier(s, dir))),
    "doc_set_ops" -> ((s, dir) => Relational.docSetOps(Tables.documents(s, dir))),
    "q18_big_orders" -> ((s, dir) => Relational.q18BigOrders(
      Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q4_priority_counts" -> ((s, dir) => Relational.q4PriorityCounts(
      Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q6_forecast" -> ((s, dir) => Relational.q6Forecast(Tables.lineitem(s, dir))),
    // SQL-text dispatch parity (graft.Sql): the oracle string IS the query
    "q1_pricing_sql" -> ((s, dir) => Sql.run(s, dir, Q1PricingSql)),
    "q6_forecast_sql" -> ((s, dir) => Sql.run(s, dir, Q6ForecastSql)),
    "q7_nation_volume" -> ((s, dir) => Relational.q7NationVolume(
      Tables.nation(s, dir), Tables.customer(s, dir), Tables.orders(s, dir),
      Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "q13_custdist" -> ((s, dir) => Relational.q13CustDist(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "q19_disjunctive" -> ((s, dir) => Relational.q19Disjunctive(
      Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q22_idle_rich" -> ((s, dir) => Relational.q22IdleRich(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "customer_price_drift" -> ((s, dir) =>
      Relational.customerPriceDrift(Tables.orders(s, dir))),
    "q21_late_suppliers" -> ((s, dir) => Relational.q21LateSuppliers(
      Tables.supplier(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q15_top_supplier" -> ((s, dir) => Relational.q15TopSupplier(
      Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    "q11_important_nations" -> ((s, dir) => Relational.q11ImportantNations(
      Tables.customer(s, dir), Tables.orders(s, dir), Tables.nation(s, dir))),
    "q2_min_cost_supplier" -> ((s, dir) => Relational.q2MinCostSupplier(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.supplier(s, dir),
      Tables.part(s, dir), Tables.lineitem(s, dir))),
    "q8_market_share" -> ((s, dir) => Relational.q8MarketShare(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
      Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir),
      Tables.part(s, dir))),
    "q9_profit_shape" -> ((s, dir) => Relational.q9ProfitShape(
      Tables.nation(s, dir), Tables.supplier(s, dir), Tables.lineitem(s, dir),
      Tables.part(s, dir), Tables.orders(s, dir))),
    "q12_ship_delay" -> ((s, dir) => Relational.q12ShipDelay(
      Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q16_supplier_cnt" -> ((s, dir) => Relational.q16SupplierCnt(
      Tables.supplier(s, dir), Tables.part(s, dir), Tables.lineitem(s, dir))),
    "q20_bulk_shippers" -> ((s, dir) => Relational.q20BulkShippers(
      Tables.supplier(s, dir), Tables.nation(s, dir), Tables.part(s, dir),
      Tables.lineitem(s, dir)))
  )

  def sql: Map[String, String] = Map(
    // Money arithmetic in exact DECIMAL (2-dp sources) then cast to double —
    // identical across engines regardless of float summation order.
    "q1_pricing" -> Q1PricingSql,
    // FK-orphan audit: per edge, child key-counts anti-joined against
    // the seeded-delete parent key set (key ≡ 0 mod 97 removed — the
    // gate's mirrored curation delete), rates on the micro grid
    "fk_orphans_curated" -> {
      val edges = Seq(
        ("customer_nation", "customer", "c_nationkey", "nation",
          "n_nationkey"),
        ("lineitem_orders", "lineitem", "l_orderkey", "orders",
          "o_orderkey"),
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem_supplier", "lineitem", "l_suppkey", "supplier",
          "s_suppkey"),
        ("nation_region", "nation", "n_regionkey", "region",
          "r_regionkey"),
        ("orders_customer", "orders", "o_custkey", "customer",
          "c_custkey"),
        ("supplier_nation", "supplier", "s_nationkey", "nation",
          "n_nationkey"))
      val parts = edges.map { case (e, c, fk, p, pk) =>
        s"""SELECT '$e' AS edge,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $c) AS n_child_rows,
           |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_orphan_rows,
           |  CAST(count(*) AS BIGINT) AS n_orphan_keys
           |FROM (SELECT $fk AS k, count(*) AS cnt FROM $c
           |      WHERE $fk IS NOT NULL GROUP BY 1) ch
           |WHERE NOT EXISTS (SELECT 1 FROM $p
           |      WHERE $pk % 97 <> 0 AND $pk = ch.k)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT edge, n_child_rows, n_orphan_rows, n_orphan_keys,
         |  CASE WHEN n_child_rows > 0 THEN
         |    n_orphan_rows * 1000000 // n_child_rows ELSE NULL END
         |    AS orphan_micro
         |FROM (
         |$parts
         |) ORDER BY edge""".stripMargin
    },
    // key-uniqueness audit: one exact count-distinct per candidate
    "key_uniqueness" -> {
      val cands = Seq(
        ("customer_c_custkey", "customer", Seq("c_custkey")),
        ("documents_doc_id", "documents", Seq("doc_id")),
        ("events_event_id", "events", Seq("event_id")),
        ("lineitem_l_orderkey", "lineitem", Seq("l_orderkey")),
        ("lineitem_pk", "lineitem", Seq("l_orderkey", "l_linenumber")),
        ("orders_o_custkey", "orders", Seq("o_custkey")),
        ("orders_o_orderkey", "orders", Seq("o_orderkey")))
      cands.map { case (name, t, cols) =>
        val d = if (cols.length == 1) cols.head
          else s"(${cols.mkString(", ")})"
        s"""SELECT '$name' AS candidate,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(DISTINCT $d) AS BIGINT) AS n_keys,
           |  CAST(count(*) - count(DISTINCT $d) AS BIGINT) AS n_dup_rows,
           |  CAST(CASE WHEN count(*) = count(DISTINCT $d)
           |    THEN 1 ELSE 0 END AS BIGINT) AS is_key
           |FROM $t""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY candidate")
    },
    "q1_pricing_sql" -> Q1PricingSql,
    "q6_forecast_sql" -> Q6ForecastSql,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q14_promo_share" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items,
        |  round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,
    // Integer-exact correlated-subquery threshold: 5·qty·n < Σqty per part.
    "q17_small_quantity" ->
      """WITH li AS (
        |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#4'
        |), agg AS (
        |  SELECT qty, price,
        |    sum(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
        |    count(*) OVER (PARTITION BY l_partkey) AS n_li
        |  FROM li
        |)
        |SELECT round(CAST(sum(price) AS DOUBLE) / 7, 6) AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM agg WHERE qty * 5 * n_li < sum_qty""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    // Q2 shape adapted (no partsupp): lineitem is the supply relation,
    // pair cost = cheapest shipment price; correlated min decorrelated as
    // a per-part window min, textbook form on the oracle side too.
    "q2_min_cost_supplier" ->
      """WITH regional AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), pairs AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_dec
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'STANDARD' AND p_size = 5
        |  JOIN regional ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5, 6
        |), best AS (
        |  SELECT *, min(cost_dec) OVER (PARTITION BY p_partkey) AS best_dec
        |  FROM pairs
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  CAST(cost_dec AS DOUBLE) AS supply_cost
        |FROM best WHERE cost_dec = best_dec
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q8_market_share" ->
      """WITH vols AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(vol) AS DOUBLE) AS total_volume,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,
    // Q9 shape adapted (no ps_supplycost): cost term = retailprice × qty.
    "q9_profit_shape" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(7,0))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    // Q12 shape adapted (no shipmode/commit/receipt dates): category =
    // order→ship delay bucket, integer DATE-day arithmetic both engines.
    "q12_ship_delay" ->
      """SELECT CASE
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 0 THEN 'EARLY'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'QUICK'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 'NORMAL'
        |    ELSE 'SLOW' END AS delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY delay_bucket""".stripMargin,
    // Q16 shape adapted: lineitem bridges part↔supplier; the complaint
    // exclusion is suppliers in arrears (NOT IN → broadcast anti join).
    "q16_supplier_cnt" ->
      """SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin,
    // Q20 shape adapted: availqty threshold becomes shipped-qty HAVING;
    // the nested IN chain stays nested on the oracle side.
    "q20_bulk_shippers" ->
      """SELECT s_name, n_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 400)
        |ORDER BY s_name""".stripMargin,
    "group_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "cube_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "exists_shapes" ->
      """SELECT c_custkey,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_orderpriority = '1-URGENT') AS has_urgent
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,
    "pivot_status_counts" ->
      """SELECT c_mktsegment,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // NULLS FIRST to match Spark's asc_nulls_first (DuckDB defaults NULLS LAST)
    "rollup_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "grouping_sets_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,4))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q18_big_orders" ->
      """SELECT o_orderkey, o_custkey, sum_qty FROM orders
        |JOIN (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 250
        |) ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q4_priority_counts" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast" -> Q6ForecastSql,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    // DECIMAL-exact max-equality: the scalar subquery re-aggregates the
    // CTE, mirroring the Spark plan's reuse of the grouped aggregate.
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // HAVING vs a global scalar, multiplied through to DECIMAL-exact
    // integer form (rev·25 > total) — no float fraction.
    "q11_important_nations" ->
      """WITH rev AS (
        |  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue
        |FROM rev
        |WHERE rev_dec * 25 > (SELECT sum(rev_dec) FROM rev)
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // The oracle keeps the textbook double-correlated EXISTS/NOT EXISTS;
    // the Spark plan decorrelates both into one per-order aggregate —
    // the hash match proves the rewrite.
    "q21_late_suppliers" ->
      """WITH cand AS (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey
        |                  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM cand JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    // Explicit full frame: last_value over the default frame would be
    // the current row — the cross-engine silent-wrong this query guards.
    "customer_price_drift" ->
      """WITH fl AS (
        |  SELECT o_custkey,
        |    first_value(o_totalprice) OVER w AS first_price,
        |    last_value(o_totalprice) OVER w AS last_price,
        |    count(*) OVER w AS n_orders
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT DISTINCT o_custkey, first_price, last_price,
        |  CAST(CAST(last_price AS DECIMAL(18,2)) - CAST(first_price AS DECIMAL(18,2)) AS DOUBLE) AS drift,
        |  n_orders
        |FROM fl ORDER BY o_custkey""".stripMargin,
    // DECIMAL-exact above-average test (bal·n > Σbal) — no float mean.
    "q22_idle_rich" ->
      """WITH pos AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
        |    count(*) AS bal_n
        |  FROM customer WHERE c_acctbal > 0
        |)
        |SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "nation_activity_full" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1
        |), s AS (
        |  SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal < 0 GROUP BY 1
        |)
        |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,
    "doc_set_ops" ->
      """WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        |lng AS (SELECT doc_id FROM documents WHERE n_chars > 500)
        |SELECT 'long_en' AS tag, doc_id FROM (
        |  SELECT doc_id FROM en INTERSECT SELECT doc_id FROM lng)
        |UNION ALL
        |SELECT 'short_en' AS tag, doc_id FROM (
        |  SELECT doc_id FROM en EXCEPT SELECT doc_id FROM lng)
        |ORDER BY tag, doc_id""".stripMargin,
    "rank_bands" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    // customer LTV deciles: the oracle states the global ntile the
    // engine computes closed-form (Ranks) — same contract as
    // length_deciles/rfm_segments. Money crosses as BIGINT cents on
    // BOTH sides (determinism ladder): the DECIMAL sum is exact, the
    // ×100 cast lossless at scale 2, and no raw DECIMAL column reaches
    // the driver's hash boundary (round-7 red row; the HUGEINT class's
    // sibling — check_oracle_types.py patrols both).
    "customer_value_deciles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS spend_cents
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT spend_cents,
        |    ntile(10) OVER (ORDER BY spend_cents, o_custkey) AS decile
        |  FROM spend)
        |SELECT decile, COUNT(*) AS n_customers,
        |  CAST(SUM(spend_cents) AS BIGINT) AS decile_spend_cents,
        |  MIN(spend_cents) AS min_spend_cents,
        |  MAX(spend_cents) AS max_spend_cents
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
