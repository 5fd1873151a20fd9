package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-2 widening of the declared relational surface (SURVEY.md §2.3):
  * correlated EXISTS/NOT EXISTS, lateral joins, ordered string aggregation,
  * bitwise functions, extended date/string function batteries, interval range
  * window frames, posexplode, exact median, and file-format round-trips
  * (CSV/JSON source + sink). Every query is O-class (DuckDB oracle).
  */
object RelationalQueries2 {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)
  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private def dbl(c: Column): Column = c.cast("double")
  /** rate cast for (1±discount) factors: 2-decimal fractions near 1 */
  private def rate(c: Column): Column = c.cast("decimal(4,2)")

  val all: Seq[GQuery] = Seq(

    // Correlated EXISTS + NOT EXISTS through the SQL surface (Catalyst
    // decorrelates both into semi/anti joins — asserted by the plan specs).
    GQuery("q37_exists_subquery",
      (s, d) => {
        Tables.registerViews(s, d, Seq("customer", "orders"))
        s.sql("""SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
ORDER BY c_custkey NULLS FIRST""")),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2 orders
    // per customer) — the lateral-join operator itself, distinct from the
    // window-function formulation in q18.
    GQuery("q38_lateral_topn",
      (s, d) => {
        Tables.registerViews(s, d, Seq("customer", "orders"))
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.price
FROM customer c,
LATERAL (SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
         FROM orders WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
ORDER BY c.c_custkey, t.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.price
FROM customer c,
LATERAL (SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
         FROM orders WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
ORDER BY c.c_custkey NULLS FIRST, t.o_orderkey NULLS FIRST""")),

    // Ordered string aggregation (LISTAGG): deterministic via sort-then-join
    // on the Spark side, ORDER BY inside string_agg on the DuckDB side.
    GQuery("q39_listagg",
      (s, d) => t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
        .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey, count(*) AS n,
  string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey NULLS FIRST""")),

    // Bitwise function battery: and/or/xor/shifts/popcount over int64 keys.
    GQuery("q40_bitwise",
      (s, d) => t(s, d, "part")
        .filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          (col("p_partkey").bitwiseAND(lit(255L))).as("b_and"),
          (col("p_partkey").bitwiseOR(lit(4096L))).as("b_or"),
          (col("p_partkey").bitwiseXOR(lit(0x5aL))).as("b_xor"),
          shiftleft(col("p_partkey"), 3).as("b_shl"),
          shiftright(col("p_partkey"), 2).as("b_shr"),
          bit_count(col("p_partkey")).cast("long").as("b_pop"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
  p_partkey & 255 AS b_and, p_partkey | 4096 AS b_or, xor(p_partkey, 90) AS b_xor,
  p_partkey << 3 AS b_shl, p_partkey >> 2 AS b_shr,
  CAST(bit_count(p_partkey) AS BIGINT) AS b_pop
FROM part WHERE p_partkey < 100 ORDER BY p_partkey NULLS FIRST""")),

    // Extended date battery: last_day, quarter, ISO week, ISO day-of-week,
    // make_date, day diff from an epoch date.
    GQuery("q41_datetime_extras",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          last_day(col("o_orderdate").cast("date")).as("eom"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
            .as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1996-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
  last_day(CAST(o_orderdate AS DATE)) AS eom,
  quarter(o_orderdate) AS qtr,
  weekofyear(o_orderdate) AS iso_week,
  isodow(o_orderdate) AS iso_dow,
  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1)
    AS month_start,
  date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) AS days_since
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey NULLS FIRST""")),

    // Extended string battery: edit distance, translate, repeat, ascii, chr.
    GQuery("q42_string_extras",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).cast("long").as("lev"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          repeat(substring(col("p_name"), 1, 2), 3).as("rep"),
          ascii(col("p_name")).cast("long").as("asc"),
          chr(lit(65) + col("p_partkey") % 26).as("ch"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
  CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev,
  translate(p_name, 'aeiou', 'AEIOU') AS tr,
  repeat(substr(p_name, 1, 2), 3) AS rep,
  CAST(ascii(p_name) AS BIGINT) AS asc,
  chr(CAST(65 + p_partkey % 26 AS INT)) AS ch
FROM part ORDER BY p_partkey NULLS FIRST""")),

    // RANGE frame over an interval expressed on the exact µs epoch: trailing
    // 1-hour running sum per user (the event-time analog of q20's frames).
    GQuery("q20_range_interval",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0L)
        ev(s, d).withColumn("us", Tables.tsUs)
          .select(col("user_id"), col("us"), col("event_id"),
            dbl(sum(dec2(col("value"))).over(w)).as("rsum"))
          .orderBy(col("user_id"), col("us"), col("event_id"))
      },
      Some("""SELECT user_id, epoch_us(ts) AS us, event_id,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id
    ORDER BY epoch_us(ts)
    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rsum
FROM events
ORDER BY user_id NULLS FIRST, us NULLS FIRST, event_id NULLS FIRST""")),

    // posexplode (Generator with ordinal) ≡ unnest over an index range.
    GQuery("q43_posexplode",
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy(col("doc_id"), col("pos")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 20)
SELECT doc_id, pos, w[pos + 1] AS word FROM t, unnest(range(len(w))) u(pos)
ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""")),

    // Exact median (interpolating 0.5-percentile) per group.
    GQuery("q44_median",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dbl(median(col("l_quantity"))).as("med_qty"),
          // median must interpolate in DOUBLE on both engines: DuckDB's
          // median over DECIMAL returns the lower middle, Spark interpolates
          dbl(median(dbl(dec2(col("l_extendedprice"))))).as("med_price"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, CAST(median(l_quantity) AS DOUBLE) AS med_qty,
  median(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)) AS med_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""")),

    // CSV round-trip: parquet → CSV sink → CSV source (explicit schema) →
    // aggregate; proves the CSV reader/writer preserve values exactly
    // (doubles survive via shortest-round-trip rendering).
    GQuery("q45_csv_roundtrip",
      (s, d) => {
        val out = graft.Scratch.dir("graft_csv", d)
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("c_custkey LONG, c_name STRING, c_mktsegment STRING, c_acctbal DOUBLE")
          .csv(out)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("c_acctbal")))).as("bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""")),

    // Semi-structured VARIANT type (Spark 4): parse_json into a VARIANT
    // column, typed path extraction with variant_get — the modern engine-level
    // answer to the reference's deserialization-is-the-query's-job design.
    GQuery("q32_variant",
      (s, d) => ev(s, d)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").cast("long").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))
        .orderBy(col("k")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  count(*) AS n, max(event_id) AS max_id
FROM events GROUP BY 1 ORDER BY k NULLS FIRST""")),

    // ORC round-trip: parquet → ORC sink → ORC source → aggregate (Spark's
    // second columnar format, exercised end to end).
    GQuery("q47_orc_roundtrip",
      (s, d) => {
        val out = graft.Scratch.dir("graft_orc", d)
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_quantity"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("l_quantity")))).as("qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""")),

    // Per-row as-of join with tolerance: for every probe row (customer), the
    // latest event of that user at/before a per-row cutoff and within a 7-day
    // lookback — the general as-of JOIN (q11 is the fixed-cutoff special
    // case). Shuffle by user key + per-key window; no range explosion.
    GQuery("q55_asof_join",
      (s, d) => {
        val cut = lit("2024-01-20 00:00:00").cast("timestamp")
        val probes = t(s, d, "customer")
          .select(col("c_custkey"),
            (cut - expr("make_interval(0, 0, 0, c_custkey % 10)")).as("cutoff"))
        val e = ev(s, d).select(col("user_id"), col("event_id"), col("ts"))
        val w = Window.partitionBy(col("c_custkey"))
          .orderBy(col("ts").desc, col("event_id").desc)
        probes.join(e, col("user_id") === col("c_custkey")
            && col("ts") <= col("cutoff")
            && col("ts") >= col("cutoff") - expr("INTERVAL 7 DAYS"), "inner")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("c_custkey"), col("event_id"),
            col("ts").cast("long").as("ts_sec"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH probes AS (SELECT c_custkey,
    TIMESTAMP '2024-01-20 00:00:00' - INTERVAL (c_custkey % 10) DAY AS cutoff
  FROM customer),
j AS (SELECT c_custkey, event_id, epoch_us(ts) AS us,
    row_number() OVER (PARTITION BY c_custkey
      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM probes JOIN events ON user_id = c_custkey
    AND epoch_us(ts) <= epoch_us(cutoff)
    AND epoch_us(ts) >= epoch_us(cutoff - INTERVAL 7 DAY))
SELECT c_custkey, event_id, us // 1000000 AS ts_sec
FROM j WHERE rn = 1 ORDER BY c_custkey NULLS FIRST""")),

    // The as-of join as a FIRST-CLASS operator (custom LogicalPlan +
    // SparkStrategy + co-partitioned merge SparkPlan, graft.plans.AsOfJoin):
    // same semantics as q55's join+window formulation but left-outer and
    // O(n+m) per partition — no candidate-pair fanout. Oracle = the window
    // formulation in DuckDB.
    GQuery("q71_asof_merge_operator",
      (s, d) => {
        val probes = Tables.table(s, d, "customer")
          .select(col("c_custkey"),
            (lit("2024-01-20 00:00:00").cast("timestamp").cast("long") * 1000000L
              - (col("c_custkey") % 10) * 86400000000L).as("cut_us"))
        val events = ev(s, d)
          .select(col("user_id"), col("event_id"), Tables.tsUs.as("us"))
        graft.plans.AsOfJoin(probes, events,
            "c_custkey", "cut_us", "user_id", "us", "event_id",
            toleranceUs = 7L * 86400000000L)
          .select(col("c_custkey"), col("event_id"), col("us"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH probes AS (SELECT c_custkey,
    epoch_us(TIMESTAMP '2024-01-20 00:00:00') - (c_custkey % 10) * 86400000000 AS cut
  FROM customer),
e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
cand AS (SELECT c_custkey, event_id, us,
    row_number() OVER (PARTITION BY c_custkey ORDER BY us DESC, event_id DESC) AS rn
  FROM probes JOIN e ON user_id = c_custkey
    AND us <= cut AND us >= cut - 604800000000)
SELECT p.c_custkey, c.event_id, c.us
FROM probes p LEFT JOIN cand c ON p.c_custkey = c.c_custkey AND c.rn = 1
ORDER BY p.c_custkey NULLS FIRST""")),

    // ANSI-safe try_* functions: NULL instead of error on bad cast, division
    // by zero, and numeric overflow.
    GQuery("q51_try_fns",
      // capped row count: every row exercises the exception path by design
      // (bad cast + guaranteed overflow), and a caught exception per row is
      // the dominant cost — 2k rows demonstrate the semantics just as well
      (s, d) => t(s, d, "part")
        .filter(col("p_partkey") < 2000)
        .select(col("p_partkey"),
          expr("try_divide(p_retailprice, p_partkey % 3)")
            .cast("decimal(18,6)").cast("double").as("div3"),
          expr("try_cast(p_type AS INT)").cast("long").as("bad_cast"),
          expr("try_cast(substring(p_brand, 7, 2) AS INT)").cast("long").as("brand_num"),
          expr("try_add(p_partkey, 9223372036854775807)").as("overflow_add"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
  CAST(CAST(p_retailprice / (p_partkey % 3) AS DECIMAL(18,6)) AS DOUBLE) AS div3,
  CAST(TRY_CAST(p_type AS INT) AS BIGINT) AS bad_cast,
  CAST(TRY_CAST(substr(p_brand, 7, 2) AS INT) AS BIGINT) AS brand_num,
  TRY_CAST(CAST(p_partkey AS HUGEINT) + 9223372036854775807 AS BIGINT) AS overflow_add
FROM part WHERE p_partkey < 2000 ORDER BY p_partkey NULLS FIRST""")),

    // Array battery 2: flatten, position, remove, set ops (sorted for
    // determinism), indexed transform. Arrays rendered to strings so both
    // engines hash the same representation.
    GQuery("q52_array_fns2",
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id") < 50)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          array_join(flatten(array(slice(col("w"), 1, 3), slice(col("w"), 4, 3))), ",")
            .as("first6"),
          array_position(col("w"), "spark").as("pos_spark"),
          array_join(array_remove(col("w"), "the"), ",").as("no_the"),
          array_join(array_sort(array_distinct(col("w"))), ",").as("vocab"),
          array_join(expr("transform(slice(w, 1, 4), (x, i) -> concat(x, '#', i + 1))"), ",")
            .as("indexed"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 50)
SELECT doc_id,
  array_to_string(flatten([w[1:3], w[4:6]]), ',') AS first6,
  CAST(coalesce(list_position(w, 'spark'), 0) AS BIGINT) AS pos_spark,
  array_to_string([x for x in w if x != 'the'], ',') AS no_the,
  array_to_string(list_sort(list_distinct(w)), ',') AS vocab,
  array_to_string(list_transform(w[1:4], (x, i) -> x || '#' || i), ',') AS indexed
FROM t ORDER BY doc_id NULLS FIRST""")),

    // Date-series generation: sequence + explode ≡ generate_series.
    GQuery("q53_date_series",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") < 50)
        .withColumn("m0", make_date(year(col("o_orderdate")),
          month(col("o_orderdate")), lit(1)))
        .select(col("o_orderkey"),
          explode(expr("sequence(m0, add_months(m0, 2), interval 1 month)")).as("m"))
        .orderBy(col("o_orderkey"), col("m")),
      Some("""SELECT o_orderkey, CAST(unnest(generate_series(m0, m0 + INTERVAL 2 MONTH,
    INTERVAL 1 MONTH)) AS DATE) AS m
FROM (SELECT o_orderkey,
        make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS m0
      FROM orders WHERE o_orderkey < 50) t
ORDER BY o_orderkey NULLS FIRST, m NULLS FIRST""")),

    // explode_outer / posexplode_outer: generator null semantics — rows with
    // an empty (or null) array survive with NULL generator output, unlike
    // plain explode which drops them.
    GQuery("q64_explode_outer",
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id") < 30)
        .withColumn("rare", filter(split(col("text"), " "), x => x === "quantize"))
        .select(col("doc_id"), size(col("rare")).cast("long").as("n_rare"),
          posexplode_outer(col("rare")))
        .select(col("doc_id"), col("n_rare"),
          col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy(col("doc_id"), col("pos")),
      Some("""WITH t AS (SELECT doc_id,
    [x for x in string_split(text, ' ') if x = 'quantize'] AS rare
  FROM documents WHERE doc_id < 30)
SELECT doc_id, len(rare) AS n_rare, pos, word
FROM t LEFT JOIN LATERAL (SELECT p AS pos, rare[p + 1] AS word
  FROM unnest(range(len(rare))) u(p)) l ON true
ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""")),

    // unionByName: schema-aligned-by-name union of differently-ordered
    // projections.
    GQuery("q54_union_by_name",
      (s, d) => {
        val a = t(s, d, "customer")
          .select(col("c_custkey").as("k"), lit("cust").as("src"))
        val b = t(s, d, "supplier")
          .select(lit("supp").as("src"), col("s_suppkey").as("k"))
        a.unionByName(b)
          .groupBy(col("src")).agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
          .orderBy(col("src"))
      },
      Some("""WITH u AS (
  SELECT c_custkey AS k, 'cust' AS src FROM customer
  UNION ALL BY NAME
  SELECT 'supp' AS src, s_suppkey AS k FROM supplier)
SELECT src, count(*) AS n, max(k) AS max_k
FROM u GROUP BY src ORDER BY src NULLS FIRST""")),

    // IGNORE NULLS window semantics: lag / running last_value / running
    // first_value skipping nulls (planted via a deterministic CASE).
    GQuery("q72_ignore_nulls",
      (s, d) => {
        val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .withColumn("v",
            when(col("o_orderkey") % 3 === 0, lit(null))
              .otherwise(dbl(dec2(col("o_totalprice")))))
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("v"), 1, null, ignoreNulls = true).over(byKey).as("prev_v"),
            last(col("v"), ignoreNulls = true).over(run).as("run_last"),
            first(col("v"), ignoreNulls = true).over(run).as("run_first"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""WITH t AS (SELECT o_custkey, o_orderkey,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
         ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) END AS v
  FROM orders)
SELECT o_custkey, o_orderkey,
  lag(v IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_v,
  last_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_last,
  first_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_first
FROM t ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    // GROUPING() ids over a rollup — distinguishing real NULLs from subtotal
    // rows.
    GQuery("q73_grouping_fn",
      (s, d) => t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          count(lit(1)).as("n"))
        .orderBy(col("g_status"), col("g_prio"), col("o_orderstatus"),
          col("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
  count(*) AS n
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY g_status NULLS FIRST, g_prio NULLS FIRST,
  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // QUALIFY-style window dedup: keep the latest (highest-price, tie-broken)
    // lineitem per order via row_number — the windowed-dedup idiom.
    GQuery("q68_window_dedup",
      (s, d) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_extendedprice").desc, col("l_linenumber").desc)
        t(s, d, "lineitem")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("l_orderkey"), col("l_linenumber"),
            dbl(dec2(col("l_extendedprice"))).as("price"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rn
      FROM lineitem) t
WHERE rn = 1 ORDER BY l_orderkey NULLS FIRST""")),

    // split_part / substring_index battery over structured name strings.
    GQuery("q69_split_part",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          substring_index(col("c_name"), "#", 1).as("prefix"),
          substring_index(col("c_name"), "#", -1).as("suffix"),
          element_at(split(col("c_name"), "#"), 2).as("second"),
          size(split(col("c_name"), "#")).cast("long").as("n_parts"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
  split_part(c_name, '#', 1) AS prefix,
  split_part(c_name, '#', -1) AS suffix,
  split_part(c_name, '#', 2) AS second,
  len(string_split(c_name, '#')) AS n_parts
FROM customer WHERE c_custkey < 500 ORDER BY c_custkey NULLS FIRST""")),

    // collect_set (distinct collection) rendered sorted.
    GQuery("q70_collect_set",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"), count(lit(1)).as("n"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
  count(*) AS n
FROM orders GROUP BY o_custkey ORDER BY o_custkey NULLS FIRST""")),

    // Recursive CTE (Spark 4): data-seeded bounded recursion — per nation,
    // walk levels 0..(n_nationkey mod 5); identical SQL text on both engines.
    GQuery("q65_recursive_cte",
      (s, d) => {
        Tables.registerViews(s, d, Seq("nation"))
        s.sql("""WITH RECURSIVE levels(k, lvl) AS (
  SELECT n_nationkey, 0 FROM nation
  UNION ALL
  SELECT k, lvl + 1 FROM levels WHERE lvl < k % 5)
SELECT k, count(*) AS n_levels, max(lvl) AS max_lvl, sum(lvl) AS sum_lvl
FROM levels GROUP BY k ORDER BY k""")
      },
      Some("""WITH RECURSIVE levels(k, lvl) AS (
  SELECT n_nationkey, 0 FROM nation
  UNION ALL
  SELECT k, lvl + 1 FROM levels WHERE lvl < k % 5)
SELECT k, count(*) AS n_levels, max(lvl) AS max_lvl,
  CAST(sum(lvl) AS BIGINT) AS sum_lvl
FROM levels GROUP BY k ORDER BY k NULLS FIRST""")),

    // SQL session variables + EXECUTE IMMEDIATE (Spark 4 SQL scripting
    // surface): the oracle is the equivalent constant query.
    GQuery("q66_sql_variables",
      (s, d) => {
        Tables.registerViews(s, d, Seq("orders"))
        s.sql("DECLARE OR REPLACE VARIABLE graft_status STRING DEFAULT 'O'")
        s.sql("SET VAR graft_status = 'F'")
        s.sql("""EXECUTE IMMEDIATE
  'SELECT o_orderstatus, count(*) AS n FROM orders
   WHERE o_orderstatus = ? GROUP BY o_orderstatus' USING graft_status""")
      },
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_orderstatus = 'F' GROUP BY o_orderstatus""")),

    // GROUP BY ALL / ORDER BY ALL (identical modern-SQL shorthand on both
    // engines).
    GQuery("q67_group_by_all",
      (s, d) => {
        Tables.registerViews(s, d, Seq("orders"))
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders GROUP BY ALL ORDER BY ALL""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders GROUP BY ALL ORDER BY ALL NULLS FIRST""")),

    // Composite analytics 1 (TPC-H Q3 shape): 3-way join, filtered both
    // sides, grouped revenue, top-10 — the classic planner stress test
    // (broadcastable dims, partial aggs, TakeOrderedAndProject).
    GQuery("q60_shipping_priority",
      (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1995-03-15"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1995-03-15"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dbl(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))))
          .as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("odate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  CAST(o_orderdate AS DATE) AS odate
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey NULLS FIRST LIMIT 10""")),

    // Composite analytics 2 (TPC-H Q5 shape): 5-way snowflake join through
    // region→nation→(customer,supplier)→orders→lineitem with the
    // same-nation constraint, grouped by nation.
    GQuery("q61_local_supplier_volume",
      (s, d) => t(s, d, "region").filter(col("r_name") === "ASIA")
        .join(t(s, d, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(dbl(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))))
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  count(*) AS n
FROM region JOIN nation ON r_regionkey = n_regionkey
  JOIN customer ON n_nationkey = c_nationkey
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name ORDER BY n_name NULLS FIRST""")),

    // Composite analytics 3 (TPC-H Q10 shape): returned-item report — join
    // four tables, filter a quarter + return flag, top-20 customers by lost
    // revenue.
    GQuery("q62_returned_items",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1994-01-01")
          && col("o_orderdate") < lit("1994-07-01"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dbl(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))))
          .as("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lost_revenue
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1994-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey NULLS FIRST LIMIT 20""")),

    // Exact top-k-values aggregate: custom binary-state
    // TypedImperativeAggregate (O(k) state per group — the shuffle carries k
    // doubles per group, never the raw values, unlike collect_list+slice).
    GQuery("q63_topk_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.GraftFunctions
          .topk_vals(col("l_extendedprice").cast("decimal(12,2)").cast("double"), 5)
          .as("tk"))
        .select(col("l_returnflag"),
          element_at(col("tk"), 1).as("v1"), element_at(col("tk"), 2).as("v2"),
          element_at(col("tk"), 3).as("v3"), element_at(col("tk"), 4).as("v4"),
          element_at(col("tk"), 5).as("v5"))
        .orderBy(col("l_returnflag")),
      Some("""WITH s AS (SELECT l_returnflag,
    (list_sort(list(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)),
     'DESC'))[1:5] AS tk
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, tk[1] AS v1, tk[2] AS v2, tk[3] AS v3, tk[4] AS v4,
  tk[5] AS v5
FROM s ORDER BY l_returnflag NULLS FIRST""")),

    // Cryptographic hash + base-conversion functions.
    GQuery("q56_hash_fns",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          md5(col("c_name").cast("binary")).as("h_md5"),
          sha2(col("c_name").cast("binary"), 256).as("h_sha256"),
          conv(col("c_custkey").cast("string"), 10, 16).as("hex_key"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256,
  to_base(c_custkey, 16) AS hex_key
FROM customer WHERE c_custkey < 200 ORDER BY c_custkey NULLS FIRST""")),

    // Boolean aggregates + FILTER'd counts.
    GQuery("q57_bool_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"),
          count_if(col("l_tax") === 0.0).as("n_taxfree"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos,
  bool_or(l_discount > 0.09) AS any_big_disc,
  count(*) FILTER (WHERE l_tax = 0.0) AS n_taxfree, count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""")),

    // Map higher-order functions: build event_type→count per user, double
    // the values (transform_values), keep entries ≥ 4 (map_filter), render
    // sorted entries — DuckDB reproduces the same pipeline relationally.
    GQuery("q58_map_higher_order",
      (s, d) => {
        val counts = ev(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        counts.groupBy(col("user_id"))
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
            .as("m"))
          .withColumn("m2", expr("transform_values(m, (k, v) -> v * 2)"))
          .withColumn("mf", expr("map_filter(m2, (k, v) -> v >= 4)"))
          .filter(size(map_keys(col("mf"))) > 0)
          .select(col("user_id"),
            expr("""array_join(transform(array_sort(map_keys(mf)),
                   k -> concat(k, ':', element_at(mf, k))), ',')""").as("entries"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) * 2 AS v
  FROM events GROUP BY 1, 2)
SELECT user_id,
  string_agg(event_type || ':' || v, ',' ORDER BY event_type) AS entries
FROM c WHERE v >= 4 GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // Linear-regression aggregates (slope/intercept/r²) computed from EXACT
    // decimal moment sums, then identical scalar double arithmetic on both
    // engines — native regr_* aggregates accumulate doubles in partition
    // order and cannot cross-engine hash.
    GQuery("q59_regression",
      (s, d) => {
        // LONG fixed-point moments (see [[ExactSum]]): 23.1× slower at sf1
        // on BigDecimal buffers before. cents(qty) ≤ ~5·10^3; cents(price)
        // ≤ ~10^7, so price-bearing scale-4 products reach ~10^14 per row →
        // split-guarded sums; the qty² product fits plain guarded dblSum.
        val cq = ExactSum.cents(col("l_quantity"))
        val cp = ExactSum.cents(col("l_extendedprice"))
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("n"),
            ExactSum.dblSum2(cq).as("sx"),
            ExactSum.dblSum2(cp).as("sy"),
            ExactSum.dblSumGuarded(cq * cq, 4, 100000000L).as("sxx"),
            ExactSum.dblSumSplitGuarded(cp * cp, 4).as("syy"),
            ExactSum.dblSumSplitGuarded(cq * cp, 4).as("sxy"))
      }
        .select(col("l_returnflag"),
          ((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
          ((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx"))
            / col("n")).as("intercept"),
          (((col("n") * col("sxy") - col("sx") * col("sy"))
            * (col("n") * col("sxy") - col("sx") * col("sy")))
            / ((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
        .orderBy(col("l_returnflag")),
      Some("""WITH m AS (SELECT l_returnflag,
    CAST(count(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
  ((n * sxy - sx * sy) * (n * sxy - sx * sy))
    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM m ORDER BY l_returnflag NULLS FIRST""")),

    // Hive-style partitioned write + partition-pruned read: the layout that
    // makes 100 TB lakes scannable (the read's filter prunes to one
    // directory; PlanAuditSpec asserts the PartitionFilters).
    GQuery("q48_partitioned_write",
      (s, d) => {
        val out = graft.Scratch.dir("graft_part", d)
        ev(s, d).select(col("event_id"), col("user_id"), col("value"),
            col("event_type"))
          .write.mode("overwrite").partitionBy("event_type").parquet(out)
        s.read.parquet(out)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // SQL NULL-semantics battery: tri-valued NOT IN (a NULL in the subquery
    // empties the result), NULL-safe equality (<=>), count(col) vs count(*),
    // and aggregate null-skipping — the classic correctness traps.
    GQuery("q49_null_semantics",
      (s, d) => {
        Tables.registerViews(s, d, Seq("customer", "orders"))
        s.sql("""SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 1) FROM orders)) AS n_notin_null,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_notin,
  (SELECT count(*) FROM orders WHERE nullif(o_orderstatus, 'O') <=> NULL) AS n_nullsafe,
  (SELECT count(nullif(o_orderstatus, 'O')) FROM orders) AS n_colcount,
  (SELECT count(*) FROM orders) AS n_star,
  (SELECT CAST(avg(CAST(nullif(o_orderstatus, 'O') IS NULL AS INT)) AS DOUBLE)
   FROM orders) AS frac_o""")
      },
      Some("""SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 1) FROM orders)) AS n_notin_null,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_notin,
  (SELECT count(*) FROM orders
   WHERE nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS n_nullsafe,
  (SELECT count(nullif(o_orderstatus, 'O')) FROM orders) AS n_colcount,
  (SELECT count(*) FROM orders) AS n_star,
  (SELECT CAST(avg(CAST(nullif(o_orderstatus, 'O') IS NULL AS INT)) AS DOUBLE)
   FROM orders) AS frac_o""")),

    // Typed Dataset surface: case-class encoder, typed filter/map, groupByKey
    // + mapGroups — the Dataset[T] API lane of SURVEY §1.1 (DataFrame is the
    // primary surface; this proves the typed one works end to end).
    GQuery("q50_typed_dataset",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
          .as[(Long, Double, String)]
          .filter(_._3 != "F")
          .map(r => (r._1, BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
          .groupByKey(_._1)
          .mapGroups { (k, it) =>
            var n = 0L; var sum = BigDecimal(0)
            it.foreach { r => n += 1; sum += r._2 }
            (k, n, sum.toDouble)
          }
          .toDF("o_custkey", "n", "total")
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderstatus <> 'F'
GROUP BY o_custkey ORDER BY o_custkey NULLS FIRST""")),

    // JSON-lines round-trip: parquet → JSON sink → JSON source (explicit
    // schema) → aggregate.
    GQuery("q46_json_roundtrip",
      (s, d) => {
        val out = graft.Scratch.dir("graft_json", d)
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .write.mode("overwrite").json(out)
        s.read
          .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
          .json(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            dbl(sum(dec2(col("o_totalprice")))).as("total"),
            countDistinct(col("o_custkey")).as("n_cust"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
  count(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST""")),

    // Avro envelope round-trip via the custom codec expressions (the
    // spark-avro connector isn't on this classpath — only avro-core is, so
    // avro_encode/avro_decode are built directly on org.apache.avro;
    // functions/AvroExpressions.scala). The producer half encodes a
    // nullable-string + long + double record per event; the consumer half
    // decodes it back — a bit-exact identity the plain-projection oracle
    // verifies. Per-row expressions, no shuffle; codegen via the referenced-
    // instance call so the stage stays whole-stage-compiled.
    GQuery("q74_avro_roundtrip",
      (s, d) => {
        val schema = """{"type":"record","name":"ev","fields":[
          {"name":"event_id","type":"long"},
          {"name":"event_type","type":["null","string"],"default":null},
          {"name":"value","type":"double"}]}"""
        graft.Tables.events(s, d).filter(col("event_id") < 500)
          .select(graft.functions.GraftFunctions.avro_encode(
            struct(col("event_id"), col("event_type"), col("value")), schema).as("payload"))
          .select(graft.functions.GraftFunctions.avro_decode(col("payload"), schema).as("r"),
            length(col("payload")).cast("long").as("n_bytes"))
          .select(col("r.event_id").as("event_id"), col("r.event_type").as("event_type"),
            col("r.value").as("value"), col("n_bytes"))
          .orderBy(col("event_id"))
      },
      // oracle replays the identity + the exact binary-encoding size:
      // zigzag-varint(event_id) (1 byte below 64, 2 below 8192) + union index
      // byte + length-varint byte + utf8 bytes + 8 fixed double bytes
      Some("""SELECT event_id, event_type, value,
  CASE WHEN event_id < 64 THEN 1 ELSE 2 END
  + 1 + 1 + strlen(event_type) + 8 AS n_bytes
FROM events WHERE event_id < 500 ORDER BY event_id NULLS FIRST""")),

    // Deterministic stratified sampling — the reproducible-subset operator a
    // training pipeline needs (rerun ⇒ identical sample, no RNG state): each
    // stratum keeps rows whose seeded md5 bucket falls under its rate.
    // Lowercase-hex strings compare lexicographically = numerically, so the
    // rate cut is a plain string comparison — bit-identical on any engine,
    // embarrassingly parallel (per-row predicate, no shuffle before the
    // verification agg).
    GQuery("q75_stratified_sample",
      (s, d) => {
        val bucket = substring(md5(concat(lit("seed42:"), col("event_id"))), 1, 4)
        graft.Tables.events(s, d)
          .filter((col("event_type") === "view" && bucket < "8000") ||
            (col("event_type") === "click" && bucket < "4000") ||
            (col("event_type") === "purchase"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_sampled"),
            min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
          .orderBy(col("event_type"))
      },
      Some("""WITH b AS (SELECT event_id, event_type,
    substr(md5('seed42:' || event_id), 1, 4) AS bk FROM events)
SELECT event_type, count(*) AS n_sampled,
  min(event_id) AS min_id, max(event_id) AS max_id
FROM b
WHERE (event_type = 'view' AND bk < '8000')
   OR (event_type = 'click' AND bk < '4000')
   OR (event_type = 'purchase')
GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    // Batch sessionization: per-user 30-minute-gap sessions via lag + running
    // sum — the batch twin of the streaming session window (s04). One shuffle
    // by user, sort within partition; session numbering is a running sum over
    // the same sort, so no second exchange (plan keeps a single Window
    // operator chain). Event-time compared at µs on both engines.
    GQuery("q76_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        graft.Tables.events(s, d)
          .withColumn("ts_us", Tables.tsUs)
          .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
          .withColumn("is_new",
            when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("sess", sum(col("is_new")).over(w))
          .groupBy(col("user_id"), col("sess"))
          .agg(count(lit(1)).as("n_events"),
            ((max(col("ts_us")) - min(col("ts_us"))) / lit(1000000L)).cast("long")
              .as("duration_sec"))
          .orderBy(col("user_id"), col("sess"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
g AS (SELECT user_id, event_id, ts_us,
    ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us
  FROM e),
m AS (SELECT user_id, event_id, ts_us,
    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM g),
s AS (SELECT user_id, ts_us,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
  FROM m)
SELECT user_id, sess, count(*) AS n_events,
  CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_sec
FROM s GROUP BY user_id, sess ORDER BY user_id NULLS FIRST, sess NULLS FIRST""")),

    // Selective dim-fact join in its CLUSTER shape: the merge hint models the
    // 100 TB case where orders is too big to broadcast, so the join runs as a
    // shuffle SMJ — exactly the plan Spark's runtime bloom filter targets
    // (creation side = the filtered dim, application side = the fact scan).
    // The injection itself is size-gated (application side must scan ~10 GB),
    // so it cannot fire at sf0.1 — PlanAuditSpec lowers the thresholds and
    // pins the might_contain filter appearing on the lineitem side.
    GQuery("q77_selective_fact_join",
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderdate"))
        t(s, d, "lineitem").hint("merge")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderdate"))
          // Determinism rule 2 (SURVEY §2.3): cast the double to decimal
          // BEFORE the sum so the reduction is exact integer arithmetic on
          // both engines — a multi-term double sum is merge-order-dependent.
          // Determinism rule 3: the FINAL projection leaves no DECIMAL and no
          // bare TIMESTAMP — the driver hashes rendered values, and
          // decimal(12,2) "818372.70" vs float64 "818372.7" (and timestamp vs
          // date renderings) differ as strings even when numerically equal.
          .agg(count(lit(1)).as("n_items"),
            dbl(dec2(sum(dec2(col("l_extendedprice"))))).as("revenue"))
          .select(col("o_orderdate").cast("date").as("odate"),
            col("n_items"), col("revenue"))
          .orderBy(col("odate"))
      },
      Some("""SELECT CAST(o_orderdate AS DATE) AS odate, count(*) AS n_items,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderdate ORDER BY odate NULLS FIRST""")),

    // TPC-H Q14 shape: promo revenue share over a ship-date slice — the
    // date filter pushes into the lineitem scan, part joins on its key
    // (broadcast at this size, shuffle at 100 TB), and the ratio reduces to
    // one row via partial aggs. Ratio of two same-order sums is stable far
    // below the decimal(12,4) grain.
    GQuery("q78_promo_revenue",
      (s, d) => {
        // cast-before-sum on both sums, then ONE double multiply + ONE double
        // divide (each exactly rounded under IEEE-754 on both engines) — the
        // previous double-sum ratio was order-stable in practice but not by
        // construction.
        // LONG fixed-point (see [[ExactSum]]): 20.1× slower at sf1 on
        // BigDecimal buffers before. cents(price) × rateCents ≤ ~10^9 per
        // row (scale-4) — guarded dblSum; same exact rational as the
        // decimal-product sum, so the oracle double is bit-identical.
        val discCents = ExactSum.cents(col("l_extendedprice")) *
          ExactSum.rateCents(col("l_discount"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-07-01")
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .agg(ExactSum.dblSumGuarded(
              when(col("p_type") === "PROMO", discCents), 4, 10000000000L).as("pnum"),
            ExactSum.dblSumGuarded(discCents, 4, 10000000000L).as("pden"))
          // rule 3: round at the decimal(12,4) grain but RETURN double — a
          // decimal final column renders trailing zeros ("15.2000") that the
          // oracle's float64 ("15.2") does not.
          .select(dbl((lit(100.0) * dbl(col("pnum")) / dbl(col("pden")))
            .cast("decimal(12,4)")).as("promo_pct"))
      },
      Some("""SELECT CAST(CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) END) AS DOUBLE)
  / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE)
  AS DECIMAL(12,4)) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'""")),

    // TPC-H Q19 shape: disjunctive brand/size/quantity predicates — the
    // OR-of-ANDs stays a residual filter on one equi-join (no union-of-scans
    // rewrite needed), counting on Catalyst to push the common l_quantity
    // bound and prune part columns.
    GQuery("q79_brand_volume",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15)
            && col("l_quantity") >= 10) ||
          (col("p_brand") === "Brand#17" && col("p_size").between(10, 30)
            && col("l_quantity") >= 20))
        // cast-before-sum (q13 pattern): decimal product summed exactly, so
        // partition/merge order cannot move a cent across engines. The final
        // cast is to DOUBLE, not a narrower decimal — rounding the exact
        // scale-4 sum to 2 decimals can land on a half-cent tie that the two
        // engines break differently, while the decimal→double conversion is
        // exact (< 2^53 scaled units).
        // LONG fixed-point (see [[ExactSum]]): 33.8× slower at sf1 on
        // BigDecimal buffers before; same exact scale-4 rational → same
        // double as dbl(sum(decimal-product)).
        .agg(ExactSum.dblSumGuarded(
            ExactSum.cents(col("l_extendedprice"))
              * ExactSum.rateCents(col("l_discount")), 4, 10000000000L)
            .as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)"""))
  ,

    // Salted skew join as a declared query: one hot key becomes `salt`
    // evenly-sized shuffle partitions (the manual escape hatch when AQE's
    // skew splitting can't cut a single giant key). The oracle is the plain
    // join — salting must be result-invariant; SaltedJoinSpec additionally
    // pins the equality on a second skew profile.
    GQuery("q80_salted_skew_join",
      (s, d) => graft.GraftOps.saltedJoin(
          t(s, d, "lineitem"), t(s, d, "orders"),
          col("l_orderkey"), col("o_orderkey"), salt = 8,
          leftSaltSource = col("l_partkey"))
        .groupBy(col("o_orderstatus"))
        // cast-before-sum: only 3 output groups, but the same cross-engine
        // double-sum hazard as q77 — make the reduction exact decimal, then
        // surface it as DOUBLE (rule 3: no DECIMAL in the final schema, or
        // trailing-zero cents render differently across engines).
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec2(col("l_extendedprice")))).as("revenue"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, count(*) AS n,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST""")),

    // TPC-H Q21 shape: the classic double-correlated-subquery planner
    // stressor — EXISTS and NOT EXISTS against the SAME fact table,
    // correlated on the outer row's join key. Suppliers who are the sole
    // returned-item supplier in a finished multi-supplier order (the
    // testdata has no commit/receipt dates, so returnflag='R' plays the
    // "late" role). Catalyst must decorrelate both subqueries into one
    // LeftSemi and one LeftAnti shuffle join against lineitem — never a
    // per-row nested loop (pinned in PlanAuditSpec). The (numwait DESC,
    // s_name) order is a total order, so LIMIT 10 is tie-safe.
    GQuery("q81_waiting_supplier",
      (s, d) => {
        Tables.registerViews(s, d, Seq("supplier", "lineitem", "orders"))
        s.sql("""SELECT s_name, count(*) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
  JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""")
      },
      Some("""SELECT s_name, count(*) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
  JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name NULLS FIRST LIMIT 10""")),

    // TPC-H Q17 shape: correlated scalar AGGREGATE subquery in the filter —
    // "lineitems far below their part's average order size". Catalyst must
    // decorrelate the per-part average into one aggregate + join on
    // l_partkey (pinned), not a per-row re-scan. Determinism: the threshold
    // is sum_dec/(5*count) — an exact decimal sum cast to double, then ONE
    // IEEE division (exactly rounded on both engines); avg() over a raw
    // double would be merge-order-dependent (rule 2). Final /7.0 is likewise
    // a single exact division; output is DOUBLE (rule 3).
    GQuery("q82_small_quantity_revenue",
      (s, d) => {
        Tables.registerViews(s, d, Seq("lineitem", "part"))
        s.sql("""SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)))
    AS DECIMAL(16,2)) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2'
  AND l.l_quantity < (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                        / (5 * count(*))
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")
      },
      Some("""SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)))
    AS DECIMAL(16,2)) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2'
  AND l.l_quantity < (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                        / (5 * count(*))
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")),

    // TPC-H Q22 shape: an UNCORRELATED scalar subquery (global average,
    // broadcast as a one-row literal) + correlated NOT EXISTS (anti join) —
    // "above-average-balance customers in selected nations with no urgent
    // order". nationkey plays Q22's cntrycode role (the fixtures carry no
    // phone column). Threshold = exact decimal sum / count, one IEEE
    // division — bitwise identical on both engines, so the > comparison
    // cannot flip on a tie.
    GQuery("q83_global_sales_opportunity",
      (s, d) => {
        Tables.registerViews(s, d, Seq("customer", "orders"))
        s.sql("""SELECT c_nationkey AS cntry, count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_nationkey IN (0,3,7,11,17)
  AND c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                     / count(*)
                   FROM customer c2
                   WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (0,3,7,11,17))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY cntry""")
      },
      Some("""SELECT c_nationkey AS cntry, count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_nationkey IN (0,3,7,11,17)
  AND c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                     / count(*)
                   FROM customer c2
                   WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (0,3,7,11,17))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY cntry NULLS FIRST""")),

    // TPC-H Q7 shape: the long snowflake join chain — fact (lineitem) joined
    // through orders to BOTH dimension paths (supplier→nation, customer→
    // nation), with the same tiny dim table (nation, 25 rows) appearing twice
    // under different aliases and a disjunctive cross-path predicate. At
    // scale the two nation joins and supplier (10^4 rows at SF100k) broadcast
    // — only lineitem⋈orders shuffles, on the key both sides already need.
    // Determinism: volume = dec2(price) × dec4_2(1−disc) stays exact decimal
    // through the sum, ONE cast to double at the end (rule 2/3).
    GQuery("q84_volume_shipping",
      (s, d) => {
        Tables.registerViews(s, d,
          Seq("supplier", "lineitem", "orders", "customer", "nation"))
        s.sql("""SELECT supp_nation, cust_nation, l_year,
  CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS volume
  FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_9'))
    AND l_shipdate >= '1995-01-01' AND l_shipdate < '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST, l_year NULLS FIRST""")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
  CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS volume
  FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_9'))
    AND l_shipdate >= '1995-01-01' AND l_shipdate < '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST, l_year NULLS FIRST""")),

    // TPC-H Q8 shape: market share — an 8-table join (both nation paths plus
    // region gating the customer side) feeding a conditional-ratio aggregate:
    // share(year) = Σ(volume where supp_nation=X) / Σ(volume). The CASE
    // keeps ONE aggregation pass over the joined rows (no second scan, no
    // self-join). Numerator and denominator are exact decimal sums; one
    // IEEE division, rounded at decimal(12,6), surfaced as DOUBLE — the
    // q78 idiom, so the ratio is bitwise-stable across engines and
    // partition orders.
    GQuery("q85_market_share",
      (s, d) => {
        Tables.registerViews(s, d,
          Seq("part", "supplier", "lineitem", "orders", "customer",
            "nation", "region"))
        s.sql("""SELECT o_year, CAST(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_9'
      THEN volume ELSE 0 END) AS DOUBLE)
    / CAST(sum(volume) AS DOUBLE) AS DECIMAL(12,6)) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS volume,
    n2.n_name AS supp_nation
  FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND o_orderdate >= '1995-01-01'
    AND o_orderdate < '1997-01-01' AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year ORDER BY o_year NULLS FIRST""")
      },
      Some("""SELECT o_year, CAST(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_9'
      THEN volume ELSE 0 END) AS DOUBLE)
    / CAST(sum(volume) AS DOUBLE) AS DECIMAL(12,6)) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS volume,
    n2.n_name AS supp_nation
  FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND o_orderdate >= '1995-01-01'
    AND o_orderdate < '1997-01-01' AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year ORDER BY o_year NULLS FIRST""")),

    // TPC-H Q13 shape: count-of-counts — a LEFT join whose RESIDUAL predicate
    // lives in the join condition (filtering orders without dropping
    // order-less customers, which a WHERE would), then two stacked
    // aggregations at different grains (per-customer count, then the
    // distribution over that count). Pure integer arithmetic: no rendering
    // hazard. At scale: one shuffle on custkey serves both the join and the
    // first aggregation; the second groupBy reduces 10^9 customers to ~10^2
    // distinct counts — a near-free exchange.
    GQuery("q86_customer_distribution",
      (s, d) => {
        Tables.registerViews(s, d, Seq("customer", "orders"))
        s.sql("""SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""")
      },
      Some("""SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""")),

    // Schema evolution round-trip: a table written in two generations — the
    // old files lack a column the new files carry — read back under
    // `mergeSchema`, with the missing column null-filled for old rows. This
    // is the long-lived-dataset reality at 100 TB (no one rewrites history
    // to add a column); the oracle models the null-fill with a year-gated
    // CASE over the raw table. count(col) vs count(*) pins exactly which
    // rows carry the evolved column.
    GQuery("q87_schema_evolution",
      (s, d) => {
        val out = graft.Scratch.dir("graft_evolve", d)
        val o = t(s, d, "orders")
        o.filter(year(col("o_orderdate")) < 1997)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .write.mode("overwrite").parquet(out)
        o.filter(year(col("o_orderdate")) >= 1997)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .write.mode("append").parquet(out)
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            count(col("o_totalprice")).as("with_price"),
            dbl(sum(dec2(col("o_totalprice")))).as("late_rev"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
  count(CASE WHEN year(o_orderdate) >= 1997 THEN 1 END) AS with_price,
  CAST(sum(CASE WHEN year(o_orderdate) >= 1997
    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS late_rev
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST"""))
  )
}
