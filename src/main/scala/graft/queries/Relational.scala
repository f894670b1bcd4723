package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface of the rebuild (SURVEY.md §2.B): scans,
  * projection/filter, every join flavor, aggregation incl. distinct and
  * rollup/cube/grouping-sets, set ops, sort/limit, having, subqueries.
  *
  * All built-in Catalyst operators — the work is the query corpus + the
  * DuckDB-oracle parity (column names, NULL sort order, rounding of
  * floating-point aggregates to absorb summation-order differences).
  *
  * Scale notes (100 TB posture): dimension tables (region/nation/supplier/
  * customer/part at TPC-H ratios) are explicitly `broadcast()`; the only
  * shuffles are on the fact-fact joins (lineitem⋈orders) and final
  * aggregations, which partial-aggregate map-side first.
  */
object Relational extends QueryModule {

  /** TPC-H Q1-style pricing summary: scan → filter (pushed to parquet) →
    * partial+final hash agg → sort. One shuffle total. */
  private val q01 = QueryDef(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Rnd.halfUp(sum(col("l_quantity")), 2).as("sum_qty"),
          Rnd.halfUp(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          Rnd.halfUp(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          Rnd.halfUp(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          Rnd.halfUp(avg(col("l_quantity")), 2).as("avg_qty"),
          Rnd.halfUp(avg(col("l_extendedprice")), 2).as("avg_price"),
          Rnd.halfUp(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty,
             floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_base_price,
             floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
             floor(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) / 100.0 AS sum_charge,
             floor((avg(l_quantity)) * 100.0 + 0.5) / 100.0 AS avg_qty,
             floor((avg(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price,
             floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Predicate surface: BETWEEN, IN, LIKE, AND/OR/NOT, IS NOT NULL.
    * All conjuncts reach the parquet scan as PushedFilters. */
  private val q02 = QueryDef(
    "q02_filter_predicates",
    (s, d) => {
      Tables.part(s, d)
        .filter(
          col("p_size").between(5, 30) &&
          col("p_type").isin("ECONOMY", "SMALL", "STANDARD") &&
          col("p_name").like("%red%") &&
          !(col("p_brand") === "Brand#13") &&
          col("p_retailprice").isNotNull)
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
          col("p_size"), round(col("p_retailprice"), 2).as("p_price"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey, p_name, p_brand, p_type, p_size,
             round(p_retailprice, 2) AS p_price
      FROM part
      WHERE p_size BETWEEN 5 AND 30
        AND p_type IN ('ECONOMY', 'SMALL', 'STANDARD')
        AND p_name LIKE '%red%'
        AND NOT (p_brand = 'Brand#13')
        AND p_retailprice IS NOT NULL
      ORDER BY p_partkey"""))

  /** TPC-H Q5-style multi-way join: two broadcast dims + one fact-fact
    * shuffle join, then agg. Revenue per nation for one order year. */
  private val q03 = QueryDef(
    "q03_join_revenue_by_nation",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1997)
      val cust = Tables.customer(s, d)
      val supp = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Rnd.halfUp(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
             floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
             count(*) AS n_items
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1997 AND c_nationkey = s_nationkey
      GROUP BY n_name
      ORDER BY n_name"""))

  /** Left outer join + null-aware agg: customers with zero orders kept. */
  private val q04 = QueryDef(
    "q04_left_outer_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_rows_no_order"),
          Rnd.halfUp(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment,
             count(o_orderkey) AS n_orders,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_no_order,
             floor(sum(coalesce(o_totalprice, 0.0)) * 100.0 + 0.5) / 100.0 AS total
      FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
        ON c_custkey = o_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Full outer join on disjoint-ish keysets (suppliers vs customers per
    * nation aggregate), exercising null fill on both sides. */
  private val q05 = QueryDef(
    "q05_full_outer_join",
    (s, d) => {
      val sByNat = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      val cByNat = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_rich_cust"))
      sByNat.join(cByNat, col("nk_s") === col("nk_c"), "full")
        .select(
          coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"))
        .orderBy(col("nationkey"))
    },
    Some("""
      SELECT coalesce(nk_s, nk_c) AS nationkey,
             coalesce(n_supp, 0) AS n_supp,
             coalesce(n_rich_cust, 0) AS n_rich_cust
      FROM (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) s
      FULL OUTER JOIN (SELECT c_nationkey AS nk_c, count(*) AS n_rich_cust
                       FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
        ON nk_s = nk_c
      ORDER BY nationkey"""))

  /** Left-semi join (EXISTS): parts that appear in some lineitem of a
    * high-quantity order line. Broadcast of the filtered fact's keys is
    * NOT safe at 100 TB, so the semi join shuffles on the key. */
  private val q06 = QueryDef(
    "q06_semi_join",
    (s, d) => {
      val p = Tables.part(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("p_type"))
    },
    Some("""
      SELECT p_type, count(*) AS n_parts
      FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_partkey = p_partkey AND l_quantity >= 49)
      GROUP BY p_type
      ORDER BY p_type"""))

  /** Left-anti join (NOT EXISTS): customers with no 'F' order. */
  private val q07 = QueryDef(
    "q07_anti_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          Rnd.halfUp(avg(col("c_acctbal")), 2).as("avg_bal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_cust,
             floor((avg(c_acctbal)) * 100.0 + 0.5) / 100.0 AS avg_bal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Theta (non-equi) self join: supplier pairs within a nation where one
    * out-balances the other. Equi conjunct on nation keeps it a hash join
    * with a residual non-equi condition — no cartesian blowup at scale. */
  private val q08 = QueryDef(
    "q08_theta_join",
    (s, d) => {
      val s1 = Tables.supplier(s, d).select(
        col("s_suppkey").as("k1"), col("s_nationkey").as("n1"), col("s_acctbal").as("b1"))
      val s2 = Tables.supplier(s, d).select(
        col("s_suppkey").as("k2"), col("s_nationkey").as("n2"), col("s_acctbal").as("b2"))
      s1.join(s2, col("n1") === col("n2") && col("b1") < col("b2") && col("k1") =!= col("k2"))
        .groupBy(col("n1").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          Rnd.halfUp(max(col("b2") - col("b1")), 2).as("max_gap"))
        .orderBy(col("nationkey"))
    },
    Some("""
      SELECT s1.s_nationkey AS nationkey, count(*) AS n_pairs,
             floor(max(s2.s_acctbal - s1.s_acctbal) * 100.0 + 0.5) / 100.0 AS max_gap
      FROM supplier s1 JOIN supplier s2
        ON s1.s_nationkey = s2.s_nationkey
       AND s1.s_acctbal < s2.s_acctbal
       AND s1.s_suppkey <> s2.s_suppkey
      GROUP BY 1
      ORDER BY nationkey"""))

  /** Cross join (tiny × tiny only — guarded use at scale). */
  private val q09 = QueryDef(
    "q09_cross_join",
    (s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      r.crossJoin(n)
        .select(col("r_regionkey"), col("n_nationkey"),
          concat_ws("/", col("r_name"), col("n_name")).as("pair"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))
    },
    Some("""
      SELECT r_regionkey, n_nationkey, concat_ws('/', r_name, n_name) AS pair
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey"""))

  /** Distinct aggregates: count(distinct), sum(distinct), plus plain agg
    * in the same GROUP BY (expand-based plan in Spark). */
  private val q10 = QueryDef(
    "q10_distinct_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          Rnd.halfUp(sum_distinct(col("l_quantity")), 2).as("sum_d_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS nd_parts,
             count(DISTINCT l_suppkey) AS nd_supp,
             floor(sum(DISTINCT l_quantity) * 100.0 + 0.5) / 100.0 AS sum_d_qty,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** ROLLUP with grouping() markers; stddev/variance in the agg list. */
  private val q11 = QueryDef(
    "q11_rollup",
    (s, d) => {
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .rollup(col("o_year"), col("o_orderstatus"))
        .agg(
          Rnd.halfUp(sum(col("o_totalprice")), 2).as("total"),
          Rnd.halfUp(stddev(col("o_totalprice")), 2).as("sd_price"),
          count(lit(1)).as("n"),
          grouping(col("o_year")).as("g_year"),
          grouping(col("o_orderstatus")).as("g_status"))
        .orderBy(col("g_year"), col("g_status"),
          col("o_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },
    Some("""
      SELECT year(o_orderdate) AS o_year, o_orderstatus,
             floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total,
             floor(stddev_samp(o_totalprice) * 100.0 + 0.5) / 100.0 AS sd_price,
             count(*) AS n,
             grouping(year(o_orderdate)) AS g_year,
             grouping(o_orderstatus) AS g_status
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
      ORDER BY g_year, g_status, o_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))

  /** CUBE over two low-cardinality dims. */
  private val q12 = QueryDef(
    "q12_cube",
    (s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          Rnd.halfUp(avg(col("l_discount")), 4).as("avg_disc"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** GROUPING SETS via SQL (the sets differ from rollup/cube closure). */
  private val q13 = QueryDef(
    "q13_grouping_sets",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               floor(sum(o_totalprice) * 100.0D + 0.5D) / 100.0D AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), (o_orderpriority, o_orderstatus))
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), (o_orderpriority, o_orderstatus))
      ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))

  /** UNION ALL vs UNION (distinct) over aligned projections. */
  private val q14 = QueryDef(
    "q14_union",
    (s, d) => {
      val hi = Tables.customer(s, d).filter(col("c_acctbal") > 9500)
        .select(col("c_nationkey").as("nationkey"))
      val lo = Tables.customer(s, d).filter(col("c_acctbal") < -900)
        .select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      val all = hi.unionAll(lo).groupBy(col("nationkey")).agg(count(lit(1)).as("n_all"))
      val dist = hi.union(sup).distinct()
        .groupBy(col("nationkey")).agg(count(lit(1)).as("n_dist"))
      all.join(dist, Seq("nationkey"), "full")
        .select(col("nationkey"),
          coalesce(col("n_all"), lit(0L)).as("n_all"),
          coalesce(col("n_dist"), lit(0L)).as("n_dist"))
        .orderBy(col("nationkey"))
    },
    Some("""
      WITH hi AS (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500),
           lo AS (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < -900),
           sup AS (SELECT s_nationkey AS nationkey FROM supplier),
           a AS (SELECT nationkey, count(*) AS n_all FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo) GROUP BY 1),
           d AS (SELECT nationkey, count(*) AS n_dist FROM (SELECT * FROM hi UNION SELECT * FROM sup) GROUP BY 1)
      SELECT coalesce(a.nationkey, d.nationkey) AS nationkey,
             coalesce(n_all, 0) AS n_all, coalesce(n_dist, 0) AS n_dist
      FROM a FULL OUTER JOIN d ON a.nationkey = d.nationkey
      ORDER BY nationkey"""))

  /** INTERSECT / EXCEPT (both distinct semantics). */
  private val q15 = QueryDef(
    "q15_intersect_except",
    (s, d) => {
      val natWithSupp = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      val natWithRichCust = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
      val both = natWithSupp.intersect(natWithRichCust)
        .withColumn("src", lit("both"))
      val onlySupp = natWithSupp.except(natWithRichCust)
        .withColumn("src", lit("supp_only"))
      both.unionAll(onlySupp).orderBy(col("src"), col("nationkey"))
    },
    Some("""
      WITH s AS (SELECT s_nationkey AS nationkey FROM supplier),
           c AS (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000)
      SELECT * FROM (
        SELECT nationkey, 'both' AS src FROM (SELECT * FROM s INTERSECT SELECT * FROM c)
        UNION ALL
        SELECT nationkey, 'supp_only' AS src FROM (SELECT * FROM s EXCEPT SELECT * FROM c))
      ORDER BY src, nationkey"""))

  /** Multi-key ORDER BY with explicit null ordering + LIMIT (global top-k:
    * Spark plans this as TakeOrderedAndProject — no full sort at scale). */
  private val q16 = QueryDef(
    "q16_order_limit",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
        .limit(100)
    },
    Some("""
      SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date
      FROM orders
      ORDER BY price DESC NULLS LAST, o_orderkey ASC
      LIMIT 100"""))

  /** HAVING over grouped aggregates. */
  private val q17 = QueryDef(
    "q17_having",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(Rnd.halfUp(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("n"))
        .filter(col("qty") > 15000)
        .orderBy(col("l_suppkey"))
    },
    Some("""
      SELECT l_suppkey, floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS qty, count(*) AS n
      FROM lineitem
      GROUP BY l_suppkey
      HAVING floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 > 15000
      ORDER BY l_suppkey"""))

  /** Scalar + IN + correlated-EXISTS subqueries in one predicate. */
  private val q18 = QueryDef(
    "q18_subqueries",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT c_mktsegment, count(*) AS n,
               floor(avg(c_acctbal) * 100.0D + 0.5D) / 100.0D AS avg_bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
          AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n,
             floor((avg(c_acctbal)) * 100.0 + 0.5) / 100.0 AS avg_bal
      FROM customer c
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        AND EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** CASE WHEN / coalesce / nullif scalar conditionals. */
  private val q19 = QueryDef(
    "q19_case_conditionals",
    (s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 400000, "high")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("low").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("NOTP")).as("status_np"))
        .groupBy(col("bucket"), col("status_np"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"), col("status_np"))
    },
    Some("""
      SELECT CASE WHEN o_totalprice > 400000 THEN 'high'
                  WHEN o_totalprice > 150000 THEN 'mid'
                  ELSE 'low' END AS bucket,
             coalesce(nullif(o_orderstatus, 'P'), 'NOTP') AS status_np,
             count(*) AS n
      FROM orders
      GROUP BY 1, 2
      ORDER BY bucket, status_np"""))

  /** first/last + min/max over strings and numerics in deterministic
    * (sorted-input) form: Spark first/last are order-sensitive, so the
    * oracle-safe formulation uses min/max + min_by/max_by instead. */
  private val q20 = QueryDef(
    "q20_minmax_by",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          min(col("o_orderdate")).cast("string").as("first_date"),
          max(col("o_orderdate")).cast("string").as("last_date"),
          min_by(col("o_orderkey"), col("o_totalprice") + col("o_orderkey") * lit(1e-9)).as("cheapest_key"),
          max_by(col("o_orderkey"), col("o_totalprice") + col("o_orderkey") * lit(1e-9)).as("priciest_key"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
             strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_date,
             strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_date,
             min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS cheapest_key,
             max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS priciest_key
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Bucketed co-located join: both sides materialized ONCE as bucketed
    * tables on the join key ([[graft.operators.Bucketing]]), so the
    * fact⋈dim equi-join itself needs no Exchange — at 100 TB this converts
    * the per-query fact-table shuffle into a one-time write. First touch
    * per JVM pays the bucketed write; afterwards the join is
    * exchange-free (plan-guarded in PlanSpec). */
  private val q80 = QueryDef(
    "q80_bucketed_join",
    (s, d) => {
      import graft.operators.Bucketing
      val tag = Bucketing.dirTag(d)
      val o = Bucketing.ensure(s, Tables.orders(s, d),
        s"graft_bkt_orders_$tag", "o_custkey", buckets = 8)
      val c = Bucketing.ensure(s, Tables.customer(s, d),
        s"graft_bkt_customer_$tag", "c_custkey", buckets = 8)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          Rnd.halfUp(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment,
             floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment NULLS FIRST"""))

  override val entries: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q80)
}
