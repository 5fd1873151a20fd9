package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The declared relational surface (SURVEY.md §2.3 Q01–Q34): the host-engine
  * capabilities the reference inherits from DataFusion
  * (/root/reference/Cargo.toml:7, README.md:3-5), re-expressed as idiomatic
  * Spark DataFrame/Dataset plans that Catalyst optimizes (pushdown, pruning,
  * join strategy, AQE). Each entry carries its DuckDB oracle SQL.
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)
  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  /** exact-money cast (values < 1e10, 2 decimals) */
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  /** rate cast for (1±discount/tax): 2-decimal fractions near 1 */
  private def rate(c: Column): Column = c.cast("decimal(4,2)")
  private def dbl(c: Column): Column = c.cast("double")
  /** `dbl(sum(dec2(c)))` on a LONG hot path — bit-identical, ~20x less
    * per-row agg cost at sf1 (see [[ExactSum]]). */
  private def dsum2(c: Column): Column = ExactSum.dblSum2(ExactSum.cents(c))
  private val HOUR_NS = 3600L * 1000 * 1000 * 1000

  val all: Seq[GQuery] = Seq(

    GQuery("q01_scan_projection",
      (s, d) => t(s, d, "region")
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey")),
      Some("""SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey NULLS FIRST""")),

    GQuery("q02_filter_predicates",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31")
          && col("l_returnflag").isin("A", "R")
          && col("l_quantity") > 25
          && !(col("l_linestatus") === "O")
          && col("l_suppkey").isNotNull
          && (col("l_discount") <= 0.02 || col("l_tax") >= 0.06))
        .select(col("l_orderkey"), col("l_linenumber"), dbl(col("l_quantity")).as("qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty")),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_returnflag IN ('A','R') AND l_quantity > 25
  AND NOT (l_linestatus = 'O') AND l_suppkey IS NOT NULL
  AND (l_discount <= 0.02 OR l_tax >= 0.06)
ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, qty NULLS FIRST""")),

    GQuery("q03_inner_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "inner")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          dbl(dec2(col("o_totalprice"))).as("price"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT c_custkey, c_name, o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM customer JOIN orders ON c_custkey = o_custkey
ORDER BY o_orderkey NULLS FIRST""")),

    GQuery("q04_left_join_agg",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum2(col("o_totalprice")).as("spend"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey NULLS FIRST""")),

    GQuery("q05_right_join",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"), "right")
        .filter(col("c_custkey") < 50)
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("c_custkey"), col("o_orderkey")),
      Some("""SELECT c_custkey, o_orderkey, o_orderstatus
FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
WHERE c_custkey < 50
ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    GQuery("q06_full_outer_join",
      (s, d) => t(s, d, "nation")
        .join(t(s, d, "supplier"), col("n_nationkey") === col("s_nationkey"), "full")
        .select(col("n_nationkey"), col("n_name"), col("s_suppkey"), col("s_name"))
        .orderBy(col("n_nationkey"), col("s_suppkey")),
      Some("""SELECT n_nationkey, n_name, s_suppkey, s_name
FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""")),

    GQuery("q07_semi_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey NULLS FIRST""")),

    GQuery("q08_anti_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey NULLS FIRST""")),

    GQuery("q09_cross_join",
      (s, d) => t(s, d, "region")
        .crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    GQuery("q10_range_join",
      (s, d) => {
        val e = ev(s, d)
        val a = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
          col("ts_ns").as("a_ts"))
        val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
          col("ts_ns").as("b_ts"))
        a.join(b, col("a_user") === col("b_user")
            && col("a_ts") < col("b_ts")
            && col("b_ts") <= col("a_ts") + lit(HOUR_NS))
          .select(col("a_id"), col("b_id"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""SELECT a.event_id AS a_id, b.event_id AS b_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_ns(a.ts) < epoch_ns(b.ts)
 AND epoch_ns(b.ts) <= epoch_ns(a.ts) + 3600000000000
ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""")),

    GQuery("q11_asof_join",
      (s, d) => {
        // latest event per user strictly before the cutoff (as-of semantics via
        // ranking window — DuckDB side expresses the same with a window, the
        // canonical portable form of ASOF JOIN)
        val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z in µs
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns").desc, col("event_id").desc)
        ev(s, d).withColumn("ts_us", Tables.tsUs)
          .filter(col("ts_us") < cutoffUs)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("ts_us"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, ts_us FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE epoch_us(ts) < 1705276800000000) q
WHERE rn = 1 ORDER BY user_id NULLS FIRST""")),

    GQuery("q12_broadcast_join",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand NULLS FIRST""")),

    GQuery("q13_groupby_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).as("dq"),
          sum(dec2(col("l_extendedprice"))).as("db"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
            .cast("decimal(4,2)")).as("ddp"),
          sum((dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
            .cast("decimal(4,2)")).cast("decimal(16,4)")
            * (lit(1) + rate(col("l_tax"))).cast("decimal(4,2)")).as("dc"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          dbl(col("dq")).as("sum_qty"), dbl(col("db")).as("sum_base"),
          dbl(col("ddp")).as("sum_disc_price"), dbl(col("dc")).as("sum_charge"),
          (dbl(col("dq")) / col("n")).as("avg_qty"),
          (dbl(col("db")) / col("n")).as("avg_price"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(16,4)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    GQuery("q14_global_agg",
      (s, d) => t(s, d, "lineitem")
        .agg(count(lit(1)).as("n"),
          dsum2(col("l_quantity")).as("sum_qty"),
          min(col("l_shipdate")).cast("string").as("min_ship"),
          max(col("l_shipdate")).cast("string").as("max_ship")),
      Some("""SELECT count(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(min(l_shipdate) AS VARCHAR) AS min_ship,
  CAST(max(l_shipdate) AS VARCHAR) AS max_ship
FROM lineitem""")),

    GQuery("q14_percentile",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, array(0.25, 0.75))").as("pq"))
        .select(col("l_returnflag"), col("p50"),
          element_at(col("pq"), 1).as("p25"), element_at(col("pq"), 2).as("p75"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS p50,
  quantile_cont(l_quantity, 0.25) AS p25,
  quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""")),

    GQuery("q14_stats_agg",
      // exact two-pass-free variance/correlation from decimal-exact moments
      // (builtin stddev/corr accumulate doubles in partition order — not
      // cross-engine stable; the moment formula is)
      (s, d) => {
        // LONG fixed-point moments (see [[ExactSum]]): this global agg was
        // 13.1× slower at sf1 on BigDecimal buffers. cents(qty) ≤ ~5·10^3,
        // cents(100·disc) ≤ 10^4, so the scale-4 products stay ≤ ~5·10^7
        // per row — guarded dblSum asserts those magnitudes per group.
        val cq = ExactSum.cents(col("l_quantity"))
        val cd = ExactSum.cents(col("l_discount") * 100)
        t(s, d, "lineitem")
          .agg(count(lit(1)).as("n"),
            ExactSum.dblSum2(cq).as("sx"),
            ExactSum.dblSumGuarded(cq * cq, 4, 100000000L).as("sxx"),
            ExactSum.dblSum2(cd).as("sy"),
            ExactSum.dblSumGuarded(cq * cd, 4, 100000000L).as("sxy"))
          .select(col("n"),
            ((col("sxx").cast("double") - col("sx").cast("double")
              * col("sx").cast("double") / col("n")) / (col("n") - 1)).as("var_qty"),
            ((col("sxy").cast("double") - col("sx").cast("double")
              * col("sy").cast("double") / col("n")) / (col("n") - 1)).as("cov_qd"))
      },
      Some("""WITH m AS (SELECT count(*) AS n,
  SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
  SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS sxx,
  SUM(CAST(l_discount * 100 AS DECIMAL(12,2))) AS sy,
  SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount * 100 AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS sxy
FROM lineitem)
SELECT n,
  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) AS var_qty,
  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1) AS cov_qd
FROM m""")),

    GQuery("q15_distinct",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    GQuery("q15_count_distinct",
      (s, d) => t(s, d, "orders")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderstatus")).as("n_status"),
          countDistinct(col("o_custkey"), col("o_orderstatus")).as("n_pairs")),
      Some("""SELECT count(DISTINCT o_custkey) AS n_cust,
  count(DISTINCT o_orderstatus) AS n_status,
  count(DISTINCT (o_custkey, o_orderstatus)) AS n_pairs
FROM orders""")),

    GQuery("q16_rollup",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping(col("r_name")).cast("int").as("gr"), grouping(col("n_name")).cast("int").as("gn"),
          count(lit(1)).as("n"), dbl(sum(dec2(col("c_acctbal")))).as("bal"))
        .select(coalesce(col("r_name"), lit("_ALL_")).as("rname"),
          coalesce(col("n_name"), lit("_ALL_")).as("nname"),
          col("gr"), col("gn"), col("n"), col("bal"))
        .orderBy(col("gr"), col("gn"), col("rname"), col("nname")),
      Some("""SELECT COALESCE(r_name, '_ALL_') AS rname, COALESCE(n_name, '_ALL_') AS nname,
  CASE WHEN r_name IS NULL THEN 1 ELSE 0 END AS gr,
  CASE WHEN n_name IS NULL THEN 1 ELSE 0 END AS gn,
  count(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY gr NULLS FIRST, gn NULLS FIRST, rname NULLS FIRST, nname NULLS FIRST""")),

    GQuery("q16_cube",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .cube(col("c_mktsegment"), col("n_name"))
        .agg(grouping(col("c_mktsegment")).cast("int").as("gs"), grouping(col("n_name")).cast("int").as("gn"),
          count(lit(1)).as("n"))
        .select(coalesce(col("c_mktsegment"), lit("_ALL_")).as("seg"),
          coalesce(col("n_name"), lit("_ALL_")).as("nname"),
          col("gs"), col("gn"), col("n"))
        .orderBy(col("gs"), col("gn"), col("seg"), col("nname")),
      Some("""SELECT COALESCE(c_mktsegment, '_ALL_') AS seg, COALESCE(n_name, '_ALL_') AS nname,
  CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END AS gs,
  CASE WHEN n_name IS NULL THEN 1 ELSE 0 END AS gn, count(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE(c_mktsegment, n_name)
ORDER BY gs NULLS FIRST, gn NULLS FIRST, seg NULLS FIRST, nname NULLS FIRST""")),

    GQuery("q16_grouping_sets",
      (s, d) => {
        Tables.registerViews(s, d, Seq("customer", "nation"))
        s.sql("""SELECT COALESCE(n_name, '_ALL_') AS nname,
  COALESCE(c_mktsegment, '_ALL_') AS seg, count(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
ORDER BY nname, seg""")
      },
      Some("""SELECT COALESCE(n_name, '_ALL_') AS nname,
  COALESCE(c_mktsegment, '_ALL_') AS seg, count(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
ORDER BY nname NULLS FIRST, seg NULLS FIRST""")),

    GQuery("q17_conditional_agg",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dbl(sum(when(col("o_orderstatus") === "F", dec2(col("o_totalprice")))))
            .as("f_total"),
          count(when(col("o_orderstatus") === "O", lit(1))).as("o_cnt"),
          dbl(sum(when(col("o_totalprice") > 100000, dec2(col("o_totalprice")))))
            .as("big_total"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""")),

    GQuery("q18_rank_windows",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).cast("long").as("rn"), rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"), ntile(4).over(w).cast("long").as("nt"),
            percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey,
  row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
  ntile(4) OVER w AS nt, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""")),

    GQuery("q19_analytic_windows",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_orderdate"), 1).over(w).cast("string").as("prev_date"),
            lead(col("o_orderdate"), 1).over(w).cast("string").as("next_date"),
            first(col("o_orderkey")).over(wf).as("first_ord"),
            last(col("o_orderkey")).over(wf).as("last_ord"),
            nth_value(col("o_orderkey"), 2).over(wf).as("second_ord"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
  CAST(lag(o_orderdate, 1) OVER w AS VARCHAR) AS prev_date,
  CAST(lead(o_orderdate, 1) OVER w AS VARCHAR) AS next_date,
  first_value(o_orderkey) OVER wf AS first_ord,
  last_value(o_orderkey) OVER wf AS last_ord,
  nth_value(o_orderkey, 2) OVER wf AS second_ord
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    GQuery("q20_window_frames",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        val wRange = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
          .rangeBetween(-10L * 60 * 1000 * 1000 * 1000, 0) // 10 min in ns
        ev(s, d)
          .select(col("user_id"), col("event_id"),
            dbl(sum(dec2(col("value")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
              .as("running"),
            dbl(sum(dec2(col("value"))).over(w.rowsBetween(-3, 0))).as("mov4"),
            dbl(sum(dec2(col("value"))).over(wRange)).as("last10m"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT user_id, event_id,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov4,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
    RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last10m
FROM events ORDER BY event_id NULLS FIRST""")),

    GQuery("q21_multikey_sort",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_returnflag"), dbl(col("l_quantity")).as("qty"),
          col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag"), col("qty").desc, col("l_orderkey"),
          col("l_linenumber")),
      Some("""SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qty, l_orderkey, l_linenumber
FROM lineitem WHERE l_quantity >= 45
ORDER BY l_returnflag NULLS FIRST, qty DESC NULLS LAST,
  l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""")),

    GQuery("q22_topk",
      (s, d) => t(s, d, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)
        .select(col("c_custkey"), col("c_name"), dbl(dec2(col("c_acctbal"))).as("bal")),
      Some("""SELECT c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
FROM customer ORDER BY c_acctbal DESC NULLS LAST, c_custkey NULLS FIRST LIMIT 10""")),

    GQuery("q23_union_all",
      (s, d) => {
        val n = t(s, d, "nation")
        n.filter(col("n_regionkey") === 0).select(col("n_name"))
          .unionAll(n.filter(col("n_regionkey") <= 1).select(col("n_name")))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name FROM (
  SELECT n_name FROM nation WHERE n_regionkey = 0
  UNION ALL
  SELECT n_name FROM nation WHERE n_regionkey <= 1) u
ORDER BY n_name NULLS FIRST""")),

    GQuery("q23_union_distinct",
      (s, d) => {
        val n = t(s, d, "nation")
        n.filter(col("n_regionkey") === 0).select(col("n_name"))
          .union(n.filter(col("n_regionkey") <= 1).select(col("n_name")))
          .distinct()
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name FROM (
  SELECT n_name FROM nation WHERE n_regionkey = 0
  UNION
  SELECT n_name FROM nation WHERE n_regionkey <= 1) u
ORDER BY n_name NULLS FIRST""")),

    GQuery("q24_intersect",
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("ck"))
        .intersect(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("ck")))
        .orderBy(col("ck")),
      Some("""SELECT o_custkey AS ck FROM orders
INTERSECT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY ck NULLS FIRST""")),

    GQuery("q24_except",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("ck"))
        .except(t(s, d, "orders").select(col("o_custkey").as("ck")))
        .orderBy(col("ck")),
      Some("""SELECT c_custkey AS ck FROM customer
EXCEPT
SELECT o_custkey FROM orders
ORDER BY ck NULLS FIRST""")),

    GQuery("q24_intersect_all",
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("ck"))
        .intersectAll(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("ck")))
        .orderBy(col("ck")),
      Some("""SELECT o_custkey AS ck FROM orders
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY ck NULLS FIRST""")),

    GQuery("q24_except_all",
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("ck"))
        .exceptAll(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("ck")))
        .orderBy(col("ck")),
      Some("""SELECT o_custkey AS ck FROM orders
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY ck NULLS FIRST""")),

    GQuery("q25_string_fns",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 5).as("s_sub"),
          upper(col("p_name")).as("s_up"),
          lower(col("p_brand")).as("s_low"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("s_trim"),
          ltrim(concat(lit("  "), col("p_name"))).as("s_ltrim"),
          rtrim(concat(col("p_name"), lit("  "))).as("s_rtrim"),
          concat_ws("-", col("p_brand"), col("p_type")).as("s_cw"),
          regexp_replace(col("p_name"), "widget", "gadget").as("s_repl"),
          length(col("p_name")).cast("long").as("s_len"),
          expr("split_part(p_name, ' ', 1)").as("s_sp"),
          lpad(col("p_brand"), 10, "*").as("s_lpad"),
          rpad(col("p_brand"), 10, "*").as("s_rpad"),
          reverse(col("p_type")).as("s_rev"),
          expr("instr(p_name, 'a')").cast("long").as("s_pos"),
          expr("left(p_name, 3)").as("s_left"),
          expr("right(p_name, 3)").as("s_right"),
          col("p_name").startsWith("small").as("s_starts"),
          md5(col("p_name")).as("s_md5"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
  substr(p_name, 1, 5) AS s_sub, upper(p_name) AS s_up, lower(p_brand) AS s_low,
  trim('  ' || p_name || '  ') AS s_trim,
  ltrim('  ' || p_name) AS s_ltrim, rtrim(p_name || '  ') AS s_rtrim,
  concat_ws('-', p_brand, p_type) AS s_cw,
  replace(p_name, 'widget', 'gadget') AS s_repl,
  length(p_name) AS s_len, split_part(p_name, ' ', 1) AS s_sp,
  lpad(p_brand, 10, '*') AS s_lpad, rpad(p_brand, 10, '*') AS s_rpad,
  reverse(p_type) AS s_rev, strpos(p_name, 'a') AS s_pos,
  left(p_name, 3) AS s_left, right(p_name, 3) AS s_right,
  starts_with(p_name, 'small') AS s_starts, md5(p_name) AS s_md5
FROM part ORDER BY p_partkey NULLS FIRST""")),

    GQuery("q26_regex_fns",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("novowel"),
          col("p_name").rlike("w.*t").as("has_wt"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel,
  regexp_matches(p_name, 'w.*t') AS has_wt
FROM part ORDER BY p_partkey NULLS FIRST""")),

    GQuery("q27_date_fns",
      (s, d) => t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"))
        .agg(count(lit(1)).as("n"),
          min(year(col("o_orderdate"))).cast("long").as("yr"),
          min(month(col("o_orderdate"))).cast("long").as("mo"),
          min(dayofmonth(col("o_orderdate"))).cast("long").as("min_day"),
          max(dayofmonth(col("o_orderdate"))).cast("long").as("max_day"),
          min(datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")))
            .cast("long").as("min_dd"))
        .orderBy(col("month_start")),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS month_start,
  count(*) AS n, min(year(o_orderdate)) AS yr, min(month(o_orderdate)) AS mo,
  min(day(o_orderdate)) AS min_day, max(day(o_orderdate)) AS max_day,
  min(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')) AS min_dd
FROM orders GROUP BY 1 ORDER BY month_start NULLS FIRST""")),

    GQuery("q27_date_arith",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).cast("string").as("plus30"),
          (col("o_orderdate") - expr("INTERVAL 7 DAY")).cast("string").as("minus7"),
          add_months(col("o_orderdate").cast("date"), 2).cast("string").as("plus2mo"),
          last_day(col("o_orderdate").cast("date")).cast("string").as("eom"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
  CAST(o_orderdate + INTERVAL 30 DAY AS VARCHAR) AS plus30,
  CAST(o_orderdate - INTERVAL 7 DAY AS VARCHAR) AS minus7,
  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS plus2mo,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom
FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey NULLS FIRST""")),

    GQuery("q27_event_hours",
      (s, d) => ev(s, d)
        .groupBy(hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("hr")),
      Some("""SELECT hour(ts) AS hr, count(*) AS n FROM events
GROUP BY 1 ORDER BY hr NULLS FIRST""")),

    GQuery("q28_math_fns",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).cast("decimal(18,4)").cast("double").as("m_abs"),
          ceil(col("l_extendedprice")).as("m_ceil"),
          floor(col("l_extendedprice")).as("m_floor"),
          sqrt(col("l_extendedprice")).cast("decimal(18,6)").cast("double").as("m_sqrt"),
          pow(col("l_quantity"), 2).cast("decimal(18,2)").cast("double").as("m_pow"),
          (col("l_orderkey") % 7).as("m_mod"),
          signum(col("l_discount") - 0.05).cast("int").as("m_sign"),
          exp(col("l_discount")).cast("decimal(18,6)").cast("double").as("m_exp"),
          log(col("l_quantity")).cast("decimal(18,6)").cast("double").as("m_ln"),
          log10(col("l_extendedprice")).cast("decimal(18,6)").cast("double").as("m_log10"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("m_sqrt"),
          col("m_abs"), col("m_pow")),
      Some("""SELECT l_orderkey, l_linenumber,
  CAST(CAST(abs(l_discount - 0.05) AS DECIMAL(18,4)) AS DOUBLE) AS m_abs,
  CAST(ceil(l_extendedprice) AS BIGINT) AS m_ceil, CAST(floor(l_extendedprice) AS BIGINT) AS m_floor,
  CAST(CAST(sqrt(l_extendedprice) AS DECIMAL(18,6)) AS DOUBLE) AS m_sqrt,
  CAST(CAST(pow(l_quantity, 2) AS DECIMAL(18,2)) AS DOUBLE) AS m_pow,
  l_orderkey % 7 AS m_mod,
  CAST(sign(l_discount - 0.05) AS INTEGER) AS m_sign,
  CAST(CAST(exp(l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS m_exp,
  CAST(CAST(ln(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS m_ln,
  CAST(CAST(log10(l_extendedprice) AS DECIMAL(18,6)) AS DOUBLE) AS m_log10
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, m_sqrt NULLS FIRST,
  m_abs NULLS FIRST, m_pow NULLS FIRST""")),

    GQuery("q29_conditional_fns",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 1500)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") < 0.03, "LOW")
            .when(col("l_discount") < 0.07, "MID")
            .otherwise("HIGH").as("band"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag"),
          dbl(least(dec2(col("l_quantity")), dec2(col("l_tax") * 100))).as("lo"),
          dbl(greatest(dec2(col("l_quantity")), dec2(col("l_tax") * 100))).as("hi"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("band"),
          col("flag"), col("lo"), col("hi")),
      Some("""SELECT l_orderkey, l_linenumber,
  CASE WHEN l_discount < 0.03 THEN 'LOW' WHEN l_discount < 0.07 THEN 'MID'
       ELSE 'HIGH' END AS band,
  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag,
  CAST(least(CAST(l_quantity AS DECIMAL(12,2)), CAST(l_tax * 100 AS DECIMAL(12,2))) AS DOUBLE) AS lo,
  CAST(greatest(CAST(l_quantity AS DECIMAL(12,2)), CAST(l_tax * 100 AS DECIMAL(12,2))) AS DOUBLE) AS hi
FROM lineitem WHERE l_orderkey < 1500
ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, band NULLS FIRST,
  flag NULLS FIRST, lo NULLS FIRST, hi NULLS FIRST""")),

    GQuery("q30_array_fns",
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("sz"),
          element_at(col("embedding"), 1).cast("decimal(18,4)").cast("double").as("e1"),
          element_at(sort_array(slice(col("embedding"), 1, 3)), 1)
            .cast("decimal(18,4)").cast("double").as("min3"),
          array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has_e1"))
        .orderBy(col("vec_id")),
      Some("""SELECT vec_id, len(embedding) AS sz,
  CAST(CAST(embedding[1] AS DECIMAL(18,4)) AS DOUBLE) AS e1,
  CAST(CAST(list_sort(embedding[1:3])[1] AS DECIMAL(18,4)) AS DOUBLE) AS min3,
  list_contains(embedding, embedding[1]) AS has_e1
FROM embeddings ORDER BY vec_id NULLS FIRST""")),

    GQuery("q30_explode_wordcount",
      (s, d) => t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")),
      Some("""SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
GROUP BY word ORDER BY n DESC NULLS LAST, word NULLS FIRST""")),

    GQuery("q30_higher_order",
      (s, d) => t(s, d, "documents")
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          size(filter(col("w"), x => length(x) > 4)).cast("long").as("n_long"),
          aggregate(transform(col("w"), x => length(x)), lit(0),
            (acc, x) => acc + x).cast("long").as("total_chars"),
          exists(col("w"), x => x === "the").as("has_the"),
          forall(col("w"), x => length(x) < 12).as("all_short"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
  len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars,
  list_contains(string_split(text, ' '), 'the') AS has_the,
  len(list_filter(string_split(text, ' '), x -> length(x) >= 12)) = 0 AS all_short
FROM documents ORDER BY doc_id NULLS FIRST""")),

    GQuery("q36_pivot",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum2(col("l_quantity")))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""")),

    GQuery("q36_unpivot",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          dbl(col("l_quantity")).as("quantity"),
          dbl(col("l_extendedprice")).as("extendedprice"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice")), "metric", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("val")),
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
  SELECT l_orderkey, l_linenumber,
    CAST(l_quantity AS DOUBLE) AS quantity,
    CAST(l_extendedprice AS DOUBLE) AS extendedprice
  FROM lineitem WHERE l_orderkey < 100) p
UNPIVOT (val FOR metric IN (quantity, extendedprice))
ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, metric NULLS FIRST,
  val NULLS FIRST""")),

    GQuery("q31_map_struct",
      (s, d) => {
        // build map event_type -> count per user, then access by key; plus a
        // struct construct/field-access — DuckDB oracle computes the same
        // values via conditional aggregation (semantics, not syntax, match)
        val counts = ev(s, d).groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        counts.groupBy(col("user_id"))
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
            .as("m"))
          .select(col("user_id"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("n_clicks"),
            coalesce(element_at(col("m"), "error"), lit(0L)).as("n_errors"),
            struct(col("user_id").as("u"), size(col("m")).as("k")).getField("k")
              .cast("long").as("n_types"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
  count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
  count(*) FILTER (WHERE event_type = 'error') AS n_errors,
  count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    GQuery("q32_json",
      (s, d) => ev(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events ORDER BY event_id NULLS FIRST""")),

    GQuery("q33_cast_matrix",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          col("c_name").cast("binary").cast("string").as("bin_rt"),
          substring(col("c_name"), 10, 9).cast("bigint").as("num_from_str"),
          dec2(col("c_acctbal")).cast("string").as("dec_str"),
          lit("2024-03-05 01:02:03").cast("timestamp").cast("string").as("ts_rt"),
          col("c_custkey").cast("decimal(10,2)").cast("string").as("int_dec"),
          lit("2024-03-05").cast("date").cast("string").as("date_rt"),
          floor(col("c_acctbal")).cast("int").as("dbl_int"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
  CAST(CAST(c_name AS BLOB) AS VARCHAR) AS bin_rt,
  CAST(substr(c_name, 10, 9) AS BIGINT) AS num_from_str,
  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS dec_str,
  CAST(TIMESTAMP '2024-03-05 01:02:03' AS VARCHAR) AS ts_rt,
  CAST(CAST(c_custkey AS DECIMAL(10,2)) AS VARCHAR) AS int_dec,
  CAST(DATE '2024-03-05' AS VARCHAR) AS date_rt,
  CAST(floor(c_acctbal) AS INTEGER) AS dbl_int
FROM customer WHERE c_custkey < 100 ORDER BY c_custkey NULLS FIRST""")),

    GQuery("q34_scalar_subquery",
      (s, d) => {
        Tables.registerViews(s, d, Seq("orders"))
        s.sql("""SELECT o_custkey, o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM orders o
WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_custkey, o_orderkey""")
      },
      Some("""SELECT o_custkey, o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM orders o
WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    GQuery("q34_in_subquery",
      (s, d) => {
        Tables.registerViews(s, d, Seq("orders", "customer"))
        s.sql("""SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
  AND c_mktsegment = 'BUILDING'
ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
  AND c_mktsegment = 'BUILDING'
ORDER BY c_custkey NULLS FIRST"""))
  )
}
