package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Num._
import graft.Tables.t

/** The relational corpus: one-or-more queries per SURVEY.md §2.B row
  * (scans, filters, joins, aggregates, windows, set ops, subqueries/CTEs,
  * sorts/limits, scalar functions, casts). Every aggregate over a double
  * column goes through the decimal-exact trick in [[graft.Num]] so the
  * DuckDB oracle hash-matches bit-for-bit (see Num's scaladoc).
  *
  * Scale posture: filters/projections are written to push into the parquet
  * scan; small dimensions (region, nation, supplier) are broadcast; the
  * big-fact aggregations are partial-aggregate friendly (plain groupBy on
  * the shuffle key, no driver-side collection).
  */
object Relational {

  val all: Seq[Q] = Seq(

    // ---- scan + aggregate (TPC-H Q1 flavor) -------------------------------
    Q.df(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val disc = (lit(1) - col("l_discount")).cast(DecimalType(4, 2))
      val tax = (lit(1) + col("l_tax")).cast(DecimalType(4, 2))
      val ep = col("l_extendedprice").cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(ep * disc).cast("double").as("sum_disc_price"),
          sum(ep * disc * tax).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- filter + projection (pushdown) -----------------------------------
    Q.df(
      "q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 30 AND l_returnflag IS NOT NULL""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_quantity") < 30 &&
            col("l_returnflag").isNotNull)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ---- top-k (ORDER BY + LIMIT -> TakeOrderedAndProject) ----------------
    Q.df(
      "q03_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    },

    // ---- joins ------------------------------------------------------------
    Q.df(
      "q04_join_agg",
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
    },

    Q.df(
      "q05_star_join",
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      // nation/region are tiny at any scale -> always broadcast; the
      // orders<->customer join shuffles on the key, which is the right
      // plan at 100 TB (AQE turns it into broadcast at small SF).
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    },

    Q.df(
      "q06_left_join_counts",
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("order_cnt"))
    },

    Q.df(
      "q07_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 400000),
            col("o_custkey") === col("c_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    Q.df(
      "q08_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
          .select("c_custkey", "c_name")
    },

    Q.sql(
      "q09_full_outer",
      """SELECT COALESCE(c.nk, s.nk) AS nk, COALESCE(c.nc, 0) AS n_cust, COALESCE(s.ns, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS nc FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS ns FROM supplier GROUP BY s_nationkey) s
        |ON c.nk = s.nk""".stripMargin),

    Q.sql(
      "q10_theta_join",
      """SELECT a.n_nationkey AS nk1, b.n_nationkey AS nk2, a.n_regionkey AS rk
        |FROM nation a JOIN nation b
        |ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey""".stripMargin),

    Q.sql(
      "q11_cross_join",
      """SELECT r_name, st.s AS status
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders) st""".stripMargin),

    // ---- aggregates beyond the basics -------------------------------------
    Q.df(
      "q12_count_distinct",
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
    },

    Q.sql(
      "q13_having",
      """SELECT o_custkey, COUNT(*) AS n FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) > 15""".stripMargin),

    Q.sql(
      "q14_conditional_agg",
      // CAST wraps the SUM itself: DuckDB integer SUM is HUGEINT, which the
      // driver's pandas canonicalizer materializes as float64 — hash drift.
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    Q.sql(
      "q15_filter_clause",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    Q.sql(
      "q16_rollup",
      """SELECT r_name, n_name, COUNT(c_custkey) AS n_cust
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin),

    Q.sql(
      "q17_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin),

    Q.df(
      "q18_bool_or",
      """SELECT user_id, BOOL_OR(event_type = 'error') AS has_error,
        |  BOOL_AND(value >= 0) AS all_nonneg, COUNT(*) AS n
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          bool_or(col("event_type") === "error").as("has_error"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          count(lit(1)).as("n"))
    },

    // ---- windows ----------------------------------------------------------
    Q.df(
      "q19_window_rank",
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) x
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    },

    Q.df(
      "q20_window_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_total", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
    },

    Q.sql(
      "q21_window_lag",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders""".stripMargin),

    // Global NTILE: the naive window form moves every row to ONE partition
    // ("WindowExec: No Partition Defined"); GlobalRank.ntile keeps it
    // distributed (range repartition + per-partition offsets) with
    // identical bucket assignment — the oracle below stays the plain
    // window form.
    Q.df(
      "q22_window_ntile",
      """SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders""".stripMargin) { (s, dir) =>
      graft.ops.GlobalRank.ntile(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        4, Seq(col("o_totalprice"), col("o_orderkey")), "quartile")
        .select(col("o_orderkey"), col("quartile"))
    },

    Q.sql(
      "q23_window_minmax",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS min_p,
        |  MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS max_p
        |FROM orders""".stripMargin),

    // ---- set ops ----------------------------------------------------------
    Q.sql(
      "q24_union_all",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier) u
        |GROUP BY nk""".stripMargin),

    Q.sql(
      "q25_union_distinct",
      """SELECT n_regionkey AS rk FROM nation UNION SELECT r_regionkey AS rk FROM region""".stripMargin),

    Q.sql(
      "q26_intersect",
      """SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier""".stripMargin),

    Q.sql(
      "q27_except",
      """SELECT n_nationkey AS nk FROM nation EXCEPT SELECT s_nationkey AS nk FROM supplier""".stripMargin),

    // ---- subqueries / CTEs ------------------------------------------------
    Q.sql(
      "q28_cte",
      """WITH cust_tot AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment, COUNT(*) AS n_cust, CAST(SUM(total) AS DOUBLE) AS seg_total
        |FROM cust_tot JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin),

    Q.sql(
      "q29_exists_correlated",
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)""".stripMargin),

    Q.sql(
      "q30_scalar_subquery",
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part)""".stripMargin),

    Q.sql(
      "q31_in_subquery",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""".stripMargin),

    Q.sql(
      "q32_derived_table",
      """SELECT big.o_custkey AS o_custkey, COUNT(*) AS n_big
        |FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) big
        |GROUP BY big.o_custkey""".stripMargin),

    // ---- scalar functions / expressions -----------------------------------
    Q.sql(
      "q33_string_funcs",
      """SELECT c_custkey, UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
        |  SUBSTR(c_name, 1, 8) AS name8, LENGTH(c_name) AS name_len,
        |  TRIM(c_mktsegment) AS seg_trim, c_name || '-' || c_mktsegment AS tag
        |FROM customer WHERE c_name LIKE '%5%'""".stripMargin),

    Q.sql(
      "q34_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_discount - 0.05) AS d_abs,
        |  CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
        |  CAST(CEIL(l_quantity / 7) AS BIGINT) AS q_ceil,
        |  MOD(l_orderkey, 7) AS m7,
        |  SQRT(l_quantity) AS q_sqrt
        |FROM lineitem WHERE l_orderkey < 500""".stripMargin),

    Q.df(
      "q35_date_trunc",
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    Q.df(
      "q36_casts",
      // The DECIMAL cast is exercised, but the *result column* is DOUBLE:
      // DuckDB decimals decode as float64 driver-side while Spark's parquet
      // decimal stays Decimal/object — equal values, different hash.
      // ship_date: a DATE result column decodes as Python date objects from
      // Spark parquet but datetime64 from DuckDB — render ISO string instead
      // (the DATE cast itself is still exercised underneath).
      """SELECT l_orderkey, CAST(l_quantity AS INT) AS qty_int,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_shipdate").cast("date").cast("string").as("ship_date"),
          col("l_extendedprice").cast(DecimalType(12, 2)).cast("double").as("price_dec"))
    },

    Q.df(
      "q37_split_explode",
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part) w
        |GROUP BY word""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
    },

    Q.df(
      "q38_json_extract",
      // Outer CAST: SUM(BIGINT) is HUGEINT in DuckDB → float64 driver-side.
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum, COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
          count(lit(1)).as("n"))
    },

    Q.sql(
      "q39_case_coalesce",
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band
        |FROM customer""".stripMargin),

    Q.sql(
      "q40_distinct",
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders""".stripMargin),

    Q.sql2(
      "q41_values",
      """SELECT id, nm FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS v(id, nm)""",
      """SELECT id, nm FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS v(id, nm)"""),

    Q.sql(
      "q42_not_in_subquery",
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)""".stripMargin),

    // DataFrame-API pivot; the oracle states the equivalent conditional
    // aggregation (PIVOT syntax differs between the engines).
    Q.df(
      "q43_pivot",
      """SELECT c_nationkey,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS AUTOMOBILE,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BUILDING,
        |  COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS MACHINERY
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    Q.sql2(
      "q44_regex",
      // Spark: regexp_like; DuckDB calls the same predicate regexp_matches.
      """SELECT event_id,
        |  regexp_extract(props, '[0-9]+', 0) AS first_num,
        |  CASE WHEN regexp_like(props, '"k"') THEN 1 ELSE 0 END AS has_k
        |FROM events WHERE event_id < 500""".stripMargin,
      """SELECT event_id,
        |  regexp_extract(props, '[0-9]+', 0) AS first_num,
        |  CASE WHEN regexp_matches(props, '"k"') THEN 1 ELSE 0 END AS has_k
        |FROM events WHERE event_id < 500""".stripMargin),

    // Sorted array aggregation, serialized to a string at the corpus
    // boundary: the driver's pandas canonicalizer cannot sort/hash
    // array-typed cells (unhashable numpy.ndarray).
    Q.df(
      "q45_array_agg",
      """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"))
    },

    // Higher-order functions over the aggregated list; arrays are rendered
    // through DECIMAL(12,1)→string element-wise (deterministic in both
    // engines, unlike double→string scientific-notation drift) because the
    // driver canonicalizer cannot hash array cells.
    Q.df(
      "q46_higher_order",
      """SELECT o_orderkey,
        |  array_to_string(list_transform(qtys, x -> CAST(CAST(x AS DECIMAL(12,1)) AS VARCHAR)), ',') AS qtys_str,
        |  array_to_string(list_transform(qtys, x -> CAST(CAST(x * 2 AS DECIMAL(12,1)) AS VARCHAR)), ',') AS doubled_str,
        |  CAST(list_sum(qtys) AS DOUBLE) AS qty_sum
        |FROM (
        |  SELECT o_orderkey, list_sort(list(l_quantity)) AS qtys
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderkey < 2000 GROUP BY o_orderkey) x""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderkey") < 2000)
        .groupBy(col("o_orderkey"))
        .agg(array_sort(collect_list(col("l_quantity"))).as("qtys"))
        .select(
          col("o_orderkey"),
          array_join(transform(col("qtys"),
            x => x.cast(DecimalType(12, 1)).cast("string")), ",").as("qtys_str"),
          array_join(transform(col("qtys"),
            x => (x * 2).cast(DecimalType(12, 1)).cast("string")), ",").as("doubled_str"),
          expr("aggregate(qtys, 0D, (acc, x) -> acc + x)").as("qty_sum"))
    },
  )
}
