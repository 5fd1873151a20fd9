package graft.operators

import graft.{GQuery, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling, mixture & release family: stratified / weighted /
  * dedup-aware sampling, source mixtures, token budgets, sequence packing,
  * file compaction and z-order layout, drift PSI, balanced shards and the
  * shard manifest, dataset card, end-to-end curation pipelines and the
  * release funnel.
  *
  * Part of the [[PipelineQueries]] registry (split from the former
  * monolithic file in round 11); shared helpers live in [[PipelineShared]].
  */
private[operators] object PipelineReleaseQueries {
  import PipelineShared._

  val queries: Seq[GQuery] = Seq(


    // X34: compression-ratio quality filter — deflate(text)/len(text) as the
    // boilerplate/repetition signal (templated or duplicated content
    // compresses far better than natural prose; the heuristic CCNet-family
    // pipelines run beside perplexity). One codegen'd per-row expression
    // ([[graft.functions.DeflateLength]]), no shuffle until the final order.
    // G-class: the ratio depends on the zlib build, so the cross-engine
    // oracle is out of scope; determinism + the discriminative property
    // (repeated text < natural text < noise) are pinned in ExpressionsSpec.
    GQuery("x34_compression_filter",
      (s, d) => spread(t(s, d, "documents"))
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          graft.functions.GraftFunctions.deflate_len(col("text")).as("z_bytes"))
        .withColumn("ratio",
          (col("z_bytes").cast("double") / col("n_bytes").cast("double"))
            .cast("decimal(18,6)").cast("double"))
        .withColumn("band",
          when(col("ratio") < 0.3, "suspect_repetitive")
            .when(col("ratio") > 0.9, "suspect_noise")
            .otherwise("ok"))
        .orderBy(col("doc_id")),
      None),


    // X35: distribution-drift monitor (PSI) — the data-quality gate a 100 TB
    // ingest pipeline runs before letting a new batch into the training mix:
    // per event_type, the Population Stability Index between the first and
    // second half of the stream (exact ns-midpoint split — SF-independent),
    // over fixed-width value bins. Shares are Laplace-smoothed
    // ((c+0.5)/(n+B/2)) so empty bins never divide by zero; the bin spine is
    // generated (sequence × distinct types × both periods), not discovered,
    // so a bin that's empty in BOTH periods still contributes its smoothed
    // mass symmetrically (net-zero term) and the bin universe matches the
    // oracle's exactly. ln sums are rounded decimal(18,6) (the x27
    // convention) to absorb merge-order noise. Cost: one scan + two tiny
    // aggregates + a broadcast spine join — counts shuffle by
    // (type, period, bin), ~|types|×|bins| rows, regardless of input size.
    GQuery("x35_drift_psi",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(Tables.tsUs.as("ts_us"),
            col("event_type"), col("value"))
        val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("mid"))
        val maxBin = ev.agg(floor(max(col("value")) / 50.0).cast("int").as("mb"))
        val binned = ev.join(broadcast(mid))
          .select(col("event_type"),
            when(col("ts_us") < col("mid"), "ref").otherwise("cur").as("period"),
            floor(col("value") / 50.0).cast("int").as("bin"))
        val counts = binned.groupBy(col("event_type"), col("period"), col("bin"))
          .agg(count(lit(1)).as("c"))
        import s.implicits._
        val spine = binned.select(col("event_type")).distinct()
          .crossJoin(broadcast(maxBin)
            .select(explode(expr("sequence(0, mb)")).as("bin"),
              (col("mb") + 1).cast("double").as("nbins")))
          .crossJoin(Seq("ref", "cur").toDF("period"))
        val filled = spine.join(counts, Seq("event_type", "period", "bin"), "left")
          .select(col("event_type"), col("period"), col("bin"), col("nbins"),
            coalesce(col("c"), lit(0L)).as("c"))
        val withP = filled
          .withColumn("n", sum(col("c")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("event_type"), col("period"))))
          .withColumn("p", (col("c") + lit(0.5d)) /
            (col("n") + lit(0.5d) * col("nbins")))
        val wide = withP.groupBy(col("event_type"), col("bin"))
          .agg(max(when(col("period") === "ref", col("p"))).as("pr"),
            max(when(col("period") === "cur", col("p"))).as("pc"),
            sum(when(col("period") === "ref", col("c"))).as("cr"),
            sum(when(col("period") === "cur", col("c"))).as("cc"))
        wide.groupBy(col("event_type"))
          .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"),
            sum((col("pc") - col("pr")) * log(col("pc") / col("pr")))
              .cast("decimal(18,6)").cast("double").as("psi"))
          .withColumn("band",
            when(col("psi") < 0.1, "stable")
              .when(col("psi") < 0.25, "moderate").otherwise("drifted"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid,
    CAST(floor(max(value) / 50.0) AS INT) AS mb FROM ev),
binned AS (SELECT event_type,
    CASE WHEN ts_us < (SELECT mid FROM b) THEN 'ref' ELSE 'cur' END AS period,
    CAST(floor(value / 50.0) AS INT) AS bin FROM ev),
counts AS (SELECT event_type, period, bin, count(*) AS c
  FROM binned GROUP BY 1, 2, 3),
spine AS (SELECT t.event_type, g.bin, p.period
  FROM (SELECT DISTINCT event_type FROM binned) t,
       (SELECT unnest(range(0, (SELECT mb FROM b) + 1)) AS bin) g,
       (SELECT unnest(['ref', 'cur']) AS period) p),
filled AS (SELECT s.event_type, s.period, s.bin, coalesce(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c USING (event_type, period, bin)),
withp AS (SELECT event_type, period, bin, c,
    (c + 0.5) / (sum(c) OVER (PARTITION BY event_type, period)
      + 0.5 * ((SELECT mb FROM b) + 1)) AS p
  FROM filled),
wide AS (SELECT event_type, bin,
    max(CASE WHEN period = 'ref' THEN p END) AS pr,
    max(CASE WHEN period = 'cur' THEN p END) AS pc,
    sum(CASE WHEN period = 'ref' THEN c END) AS cr,
    sum(CASE WHEN period = 'cur' THEN c END) AS cc
  FROM withp GROUP BY 1, 2),
agg AS (SELECT event_type,
    CAST(sum(cr) AS BIGINT) AS n_ref, CAST(sum(cc) AS BIGINT) AS n_cur,
    CAST(CAST(sum((pc - pr) * ln(pc / pr)) AS DECIMAL(18,6)) AS DOUBLE) AS psi
  FROM wide GROUP BY 1)
SELECT event_type, n_ref, n_cur, psi,
  CASE WHEN psi < 0.1 THEN 'stable'
       WHEN psi < 0.25 THEN 'moderate' ELSE 'drifted' END AS band
FROM agg ORDER BY event_type NULLS FIRST""")),


    // X38: sequence packing — the concat-and-split step that turns a doc
    // corpus into fixed-capacity training rows (every GPT-style pipeline's
    // last mile): docs in deterministic doc_id order, global token prefix
    // sum, each doc mapped to its [start_bin, end_bin] span of 512-token
    // bins with its offset in the first bin; `split` marks boundary
    // straddlers (what a loss-masking loader needs to know). All-integer
    // arithmetic. The single global window here is the sf-test shape; at
    // 100 TB the prefix sum runs as x30's two-pass form (range-partition →
    // local cumsum → broadcast per-partition offsets) with identical output.
    GQuery("x38_sequence_packing",
      (s, d) => {
        val cap = 512L
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        t(s, d, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
          .withColumn("cb", coalesce(sum(col("tok")).over(w), lit(0L)))
          .select(col("doc_id"), col("tok"),
            expr(s"cb div $cap").as("start_bin"),
            (col("cb") % cap).as("start_off"),
            expr(s"(cb + tok - 1) div $cap").as("end_bin"))
          .withColumn("action",
            when(col("end_bin") > col("start_bin"), "split").otherwise("contig"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
c AS (SELECT doc_id, tok,
    CAST(coalesce(sum(tok) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM t)
SELECT doc_id, tok, cb // 512 AS start_bin, cb % 512 AS start_off,
  (cb + tok - 1) // 512 AS end_bin,
  CASE WHEN (cb + tok - 1) // 512 > cb // 512 THEN 'split' ELSE 'contig' END
    AS action
FROM c ORDER BY doc_id NULLS FIRST""")),


    // ---- X10: greedy sequence packing --------------------------------------
    // Context-window packing (capacity 400 tokens, shards of 100 docs):
    // sequential greedy fold per shard, parallel across shards. O-class: the
    // DuckDB oracle replays the identical fold as a recursive CTE stepping
    // row_number-by-row_number within each shard.
    GQuery("x10_pack_sequences",
      (s, d) => graft.GraftOps.packSequences(
          t(s, d, "documents").withColumn("n_tok",
            size(split(col("text"), " ")).cast("long")),
          col("doc_id"), col("n_tok"), capacity = 400L, shardSize = 100L)
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE d AS (SELECT doc_id, doc_id // 100 AS shard,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
    row_number() OVER (PARTITION BY doc_id // 100 ORDER BY doc_id) AS rn
  FROM documents),
r(shard, rn, doc_id, n, bin, acc) AS (
  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT), n FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n,
    CASE WHEN r.acc + d.n <= 400 THEN r.bin ELSE r.bin + 1 END,
    CASE WHEN r.acc + d.n <= 400 THEN r.acc + d.n ELSE d.n END
  FROM d JOIN r ON d.shard = r.shard AND d.rn = r.rn + 1)
SELECT doc_id, shard, bin, n AS n_tokens FROM r
ORDER BY doc_id NULLS FIRST""")),


    // ---- X16: source mixture weighting -------------------------------------
    // Temperature-reweighted sampling mix across sources (alpha = 0.5 via
    // sqrt — IEEE-exact in every engine, unlike pow): weight_s proportional
    // to sqrt(n_s), plus the integer doc budget each source gets out of
    // 10000. The per-source table is tiny (one row per corpus source), so
    // the normalizer join is a BROADCAST; upstream it is one hash agg over
    // the corpus. Budgets floor AFTER the decimal(18,6) rounding so both
    // engines floor the identical value. O-class.
    GQuery("x16_source_mixture",
      (s, d) => {
        val per = t(s, d, "documents").groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val z = per.agg(sum(sqrt(col("n").cast("double"))).as("z"))
        per.join(broadcast(z))
          .select(col("source"), col("n").as("n_docs"),
            (sqrt(col("n").cast("double")) / col("z"))
              .cast("decimal(18,6)").cast("double").as("weight"),
            floor((sqrt(col("n").cast("double")) / col("z") * 10000)
              .cast("decimal(18,6)")).cast("long").as("budget_docs"))
          .orderBy(col("source"))
      },
      Some("""WITH per AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
z AS (SELECT sum(sqrt(CAST(n AS DOUBLE))) AS z FROM per)
SELECT source, n AS n_docs,
  CAST(CAST(sqrt(CAST(n AS DOUBLE)) / z AS DECIMAL(18,6)) AS DOUBLE) AS weight,
  CAST(floor(CAST(sqrt(CAST(n AS DOUBLE)) / z * 10000 AS DECIMAL(18,6))) AS BIGINT)
    AS budget_docs
FROM per, z ORDER BY source NULLS FIRST""")),


    // X22: small-file compaction — fragment the events table into 48 files
    // (the streaming-sink pathology), then compact with the size-targeted
    // narrow coalesce and prove the rewrite lossless via the oracle. File
    // counts and no-shuffle shape are pinned by CompactionSpec; this query
    // pins content preservation.
    GQuery("x22_compact_files",
      (s, d) => {
        val base = graft.Scratch.dir("graft_compact", d)
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        ev.repartition(48).write.mode("overwrite").parquet(s"$base/frag")
        graft.GraftOps.compact(s.read.parquet(s"$base/frag"), 4L << 20)
          .write.mode("overwrite").parquet(s"$base/out")
        s.read.parquet(s"$base/out")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n, max(event_id) AS max_id,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),


    // ---- X24: deterministic stratified sampling ----------------------------
    // Exactly-k-per-stratum sampling, seeded and growth-stable in ORDER: docs
    // rank within their source by md5(seed || doc_id), so the sample is a
    // reproducible function of (seed, doc_id, source) — rerunning on the same
    // corpus gives the same rows, and adding docs only displaces from the
    // tail of each stratum. One window shuffle on the stratum key; at 100 TB
    // exact-k per stratum stays a single per-stratum top-k (Spark lowers
    // rank-filter windows to a bounded TakeOrdered-style operator per key —
    // no full sort of the corpus), which is the distributed answer to
    // "reservoir sample per source" with none of the reservoir's
    // sequential-scan dependence.
    GQuery("x24_stratified_sample",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(md5(concat(lit("sample42:"), col("doc_id"))), col("doc_id"))
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("lang"), col("n_chars"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 25)
          .orderBy(col("source"), col("rk"))
      },
      Some("""SELECT source, doc_id, lang, n_chars, rk FROM (
  SELECT source, doc_id, lang, n_chars,
    row_number() OVER (PARTITION BY source
      ORDER BY md5('sample42:' || doc_id), doc_id) AS rk
  FROM documents) q
WHERE rk <= 25 ORDER BY source NULLS FIRST, rk NULLS FIRST""")),


    // ---- X26: multi-dimensional z-order clustering -------------------------
    // Data-skipping layout: interleave (user, time) into a Morton z-value
    // (pure builtin bit ops — whole-stage codegen), range-partition + sort by
    // it, and write. Each parquet file's (user_id, ts) min/max envelope then
    // covers a z-curve segment — a RECTANGLE predicate on either or both
    // dimensions prunes files, where a time-sorted ingest layout can only
    // prune time. ZOrderSpec measures the claim (file envelopes overlapping a
    // user slice: z-order strictly fewer than time-sorted); this query pins
    // losslessness — the oracle computes the same rectangle aggregate over
    // the original table. The normalization bounds come from one tiny
    // broadcast aggregate, never a driver collect. At 100 TB this is the
    // OPTIMIZE ZORDER maintenance pass: rewritten once, skipped by every
    // subsequent scan's file-level stats pruning.
    GQuery("x26_zorder_layout",
      (s, d) => {
        val base = graft.Scratch.dir("graft_zorder", d)
        val ev = graft.Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts_ns"))
        val mm = ev.agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
          min(col("ts_ns")).as("t0"), max(col("ts_ns")).as("t1"))
        val un = least((col("user_id") - col("u0")) * 65535L /
          greatest(col("u1") - col("u0"), lit(1L)), lit(65535L))
        val tn = least((col("ts_ns") - col("t0")) /
          greatest((col("t1") - col("t0")) / lit(65535L), lit(1L)), lit(65535L))
        ev.crossJoin(broadcast(mm))
          .withColumn("zn", graft.functions.GraftFunctions.zvalue16(un, tn))
          .repartitionByRange(8, col("zn")).sortWithinPartitions(col("zn"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts_ns"))
          .write.mode("overwrite").parquet(s"$base/z")
        s.read.parquet(s"$base/z")
          .filter(col("user_id").between(40, 60) &&
            col("ts_ns") >= 1704672000000000000L && // 2024-01-08T00:00:00Z
            col("ts_ns") < 1705276800000000000L)    // 2024-01-15T00:00:00Z
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events
WHERE user_id BETWEEN 40 AND 60
  AND epoch_ns(ts) >= 1704672000000000000 AND epoch_ns(ts) < 1705276800000000000
GROUP BY event_type ORDER BY event_type NULLS FIRST""")),


    // ---- X30: balanced output sharding (token-budget export) ---------------
    // The export step of a curation pipeline: write the corpus as N shards of
    // ~equal TOKEN counts (downstream trainers read shards as units; doc
    // counts don't balance when lengths skew). Shard id = global token
    // prefix-sum before each doc, bucketed by total/N — computed with the
    // DISTRIBUTED two-pass prefix sum, never a global single-partition
    // window: range-partition by doc_id, local cumsum per partition, then a
    // broadcast join of the per-partition offsets (the offsets table is one
    // row per partition — the only thing that crosses the driver-side window).
    // The assignment depends only on doc_id order, not on where partition
    // boundaries land, so the result is layout-independent and the oracle is
    // a plain windowed cumsum.
    GQuery("x30_balanced_shards",
      (s, d) => {
        val nShards = 8L
        val w8 = org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wLoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val base = t(s, d, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
        val p = base.repartitionByRange(8, col("doc_id"))
          .withColumn("pid", spark_partition_id())
        val offsets = p.groupBy(col("pid")).agg(sum(col("tok")).as("psum"))
          .withColumn("off", coalesce(sum(col("psum")).over(w8), lit(0L)))
          .select(col("pid"), col("off"))
        val total = base.agg(sum(col("tok")).as("total"))
        p.withColumn("local", coalesce(sum(col("tok")).over(wLoc), lit(0L)))
          .join(broadcast(offsets), "pid")
          .join(broadcast(total))
          // integer division (div): Column./ on longs is double division
          .withColumn("shard",
            least(expr(s"(local + off) * $nShards div total"),
              lit(nShards - 1L)))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("shard"))
      },
      Some("""WITH base AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
c AS (SELECT doc_id, tok,
    coalesce(SUM(tok) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
    (SELECT sum(tok) FROM base) AS total
  FROM base)
SELECT CAST(least(cum * 8 // total, 7) AS BIGINT) AS shard, count(*) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS n_tokens, min(doc_id) AS min_id,
  max(doc_id) AS max_id
FROM c GROUP BY 1 ORDER BY shard NULLS FIRST""")),


    // ---- X46: token-budget corpus selection --------------------------------
    // Data mixing under a token budget: within each source, rank documents
    // by length (n_chars desc, doc_id — total order) and admit greedily
    // while the running token total stays within an 800-token budget. The
    // cumulative sum is one per-source window — state is a running long, so
    // a source with a billion docs streams through its sorted partition;
    // the output is the per-source mixture summary a sampler consumes.
    GQuery("x46_token_budget",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("cum") <= 800L, 1L).otherwise(0L)).as("n_selected"),
            coalesce(max(when(col("cum") <= 800L, col("cum"))), lit(0L))
              .as("tok_selected"))
          .orderBy(col("source"))
      },
      Some("""WITH r AS (SELECT source, doc_id, n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum
  FROM documents)
SELECT source, count(*) AS n_candidates,
  CAST(count(*) FILTER (WHERE cum <= 800) AS BIGINT) AS n_selected,
  COALESCE(max(cum) FILTER (WHERE cum <= 800), 0) AS tok_selected
FROM r GROUP BY source ORDER BY source NULLS FIRST""")),


    // ---- X48: dedup-aware mixture rebalancing ------------------------------
    // The sampling-weight recomputation that follows any dedup pass: exact
    // dedup keeps one doc per content hash (keeper attributed to the
    // surviving min-doc_id's source via min_by, both engines), then each
    // source's sqrt-temperature sampling share and the over/under-sampling
    // factor vs its natural share are derived from KEPT counts — dedup
    // shifts the mixture, and a sampler still using raw counts over-trains
    // on duplicate-heavy sources. Scale: one content-hash shuffle (the x01
    // shape) + a |sources|-row aggregate broadcast back; sqrt values are
    // decimal-quantized before the cross-source sum so the normalizer is
    // merge-order-free.
    GQuery("x48_dedup_aware_mixture",
      (s, d) => {
        val docs = t(s, d, "documents")
        val raw = docs.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
        val kept = docs
          .groupBy(md5(col("text")).as("h"))
          .agg(min_by(col("source"), col("doc_id")).as("source"))
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        val base = raw.join(kept, Seq("source"))
          .withColumn("dq", sqrt(col("n_kept")).cast("decimal(18,6)"))
        val tot = base.agg(sum(col("n_kept")).as("tot_kept"),
          sum(col("dq")).as("sum_dq"))
        val share = (col("dq").cast("double") / col("sum_dq").cast("double"))
          .cast("decimal(18,6)").cast("double")
        base.crossJoin(broadcast(tot))
          .select(col("source"), col("n_raw"), col("n_kept"),
            (lit(1.0) - col("n_kept").cast("double") / col("n_raw"))
              .cast("decimal(18,6)").cast("double").as("dup_ratio"),
            share.as("samp_share"),
            ((col("dq").cast("double") / col("sum_dq").cast("double"))
              * col("tot_kept") / col("n_kept"))
              .cast("decimal(18,6)").cast("double").as("oversample"))
          .orderBy(col("source"))
      },
      Some("""WITH raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY source),
keep AS (SELECT min_by(source, doc_id) AS source
  FROM documents GROUP BY md5(text)),
kept AS (SELECT source, count(*) AS n_kept FROM keep GROUP BY source),
base AS (SELECT raw.source, n_raw, n_kept,
    CAST(sqrt(n_kept) AS DECIMAL(18,6)) AS dq
  FROM raw JOIN kept ON raw.source = kept.source),
tot AS (SELECT sum(n_kept) AS tot_kept, sum(dq) AS sum_dq FROM base)
SELECT source, n_raw, n_kept,
  CAST(CAST(1.0 - CAST(n_kept AS DOUBLE) / n_raw AS DECIMAL(18,6)) AS DOUBLE)
    AS dup_ratio,
  CAST(CAST(CAST(dq AS DOUBLE) / CAST(sum_dq AS DOUBLE) AS DECIMAL(18,6))
    AS DOUBLE) AS samp_share,
  CAST(CAST(CAST(dq AS DOUBLE) / CAST(sum_dq AS DOUBLE) * tot_kept / n_kept
    AS DECIMAL(18,6)) AS DOUBLE) AS oversample
FROM base, tot ORDER BY source NULLS FIRST""")),


    // ---- X54: dataset release manifest -------------------------------------
    // The artifact a training run actually consumes: x30's token-balanced
    // shard assignment (two-pass distributed prefix sum — range partition,
    // local cumsum, broadcast per-partition offsets) finished into a
    // publishable manifest — per shard: doc/token counts, id range, token
    // share of the corpus, and an ORDER-INVARIANT md5-XOR content checksum
    // (the q106 replica-audit idiom: XOR's associativity+commutativity
    // makes the same 8 bytes come out of any partitioning), so a consumer
    // can verify every shard it downloads without trusting row order.
    // Scale: the prefix sum never funnels rows to the driver (per-partition
    // offsets are |partitions| rows); the manifest itself is |shards| rows.
    GQuery("x54_shard_manifest",
      (s, d) => {
        val nShards = 8L
        val w8 = org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wLoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val base = t(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("tok"),
            expr("CAST(conv(substr(md5(concat(doc_id, ':', text)), 1, 15), 16, 10) AS BIGINT)")
              .as("h"))
        // ONE pinned evaluation of the range exchange: the offsets branch
        // prunes `h` while the main branch keeps it, so the two exchanges
        // are no longer identical subtrees and ReuseExchange cannot dedupe
        // them — two INDEPENDENT range-bound samplings would pair `off`
        // values with mismatched `pid` boundaries and silently skew every
        // shard (x30 survives only because its branches stay byte-identical
        // and the exchange is reused). The eager localCheckpoint freezes
        // pid + bounds; for this release-manifest op that write is the
        // sharded table a production run persists anyway.
        val p = base.repartitionByRange(8, col("doc_id"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        val offsets = p.groupBy(col("pid")).agg(sum(col("tok")).as("psum"))
          .withColumn("off", coalesce(sum(col("psum")).over(w8), lit(0L)))
          .select(col("pid"), col("off"))
        val total = p.agg(sum(col("tok")).as("total"))
        p.withColumn("local", coalesce(sum(col("tok")).over(wLoc), lit(0L)))
          .join(broadcast(offsets), "pid")
          .join(broadcast(total))
          .withColumn("shard",
            least(expr(s"(local + off) * $nShards div total"),
              lit(nShards - 1L)))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("n_tokens"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"),
            expr("bit_xor(h)").as("checksum"),
            max(col("total")).as("tt"))
          .withColumn("token_share",
            (col("n_tokens").cast("double") / col("tt"))
              .cast("decimal(18,6)").cast("double"))
          .drop("tt")
          .orderBy(col("shard"))
      },
      Some("""WITH base AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
    CAST(concat('0x', substr(md5(doc_id || ':' || text), 1, 15)) AS BIGINT) AS h
  FROM documents),
c AS (SELECT doc_id, tok, h,
    coalesce(SUM(tok) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
    (SELECT sum(tok) FROM base) AS total
  FROM base)
SELECT CAST(least(cum * 8 // total, 7) AS BIGINT) AS shard,
  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
  min(doc_id) AS min_id, max(doc_id) AS max_id,
  bit_xor(h) AS checksum,
  CAST(CAST(CAST(sum(tok) AS DOUBLE) / max(total) AS DECIMAL(18,6)) AS DOUBLE)
    AS token_share
FROM c GROUP BY 1 ORDER BY shard NULLS FIRST""")),


    // ---- X55: weighted priority sample (Efraimidis–Spirakis A-ES) ----------
    // One-pass weighted sampling WITHOUT replacement: each doc draws a
    // deterministic uniform u and competes on priority ln(u)/w (the log of
    // the classic u^(1/w) key — same order, better conditioned); the global
    // top-K by priority is a size-K weighted sample. This is the 100 TB way
    // to cut a corpus to a fixed budget with quality weighting: no full
    // sort, no global shuffle — `orderBy().limit()` compiles to
    // TakeOrderedAndProject (per-partition top-K, single K-row reduction),
    // pinned in PlanAuditSpec. Cross-engine exactness: u is 24 bits of md5
    // (conv/0x-cast, the x54 idiom), the weight ln(2+n_chars) (the x59/s51
    // convention — strictly positive even for an empty doc, where ln(1+0)=0
    // would divide to -Inf and diverge across engines) is quantized
    // to decimal(18,6) BEFORE the divide so both engines divide identical
    // doubles, and the priority is quantized after (ln agrees to 1 ulp —
    // ~9 orders below the grain); rank ties break on doc_id in both ORDER
    // BYs, so the K-boundary is deterministic. O-class.
    GQuery("x55_weighted_sample",
      (s, d) => {
        val u24 = expr(
          "CAST(conv(substr(md5(concat('aes55:', doc_id)), 1, 6), 16, 10) AS BIGINT)")
        val w = log(lit(2.0) + col("n_chars").cast("double"))
          .cast("decimal(18,6)").cast("double")
        t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            w.as("w"), u24.as("u24"))
          .select(col("doc_id"), col("source"), col("n_chars"), col("w"),
            (log((col("u24") + lit(1.0)) / lit(16777217.0)) / col("w"))
              .cast("decimal(18,6)").cast("double").as("priority"))
          .orderBy(col("priority").desc, col("doc_id"))
          .limit(150)
      },
      Some("""WITH c AS (SELECT doc_id, source, n_chars,
  CAST(CAST(ln(2.0 + CAST(n_chars AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS w,
  CAST(concat('0x', substr(md5('aes55:' || doc_id), 1, 6)) AS BIGINT) AS u24
  FROM documents)
SELECT doc_id, source, n_chars, w,
  CAST(CAST(ln((u24 + 1.0) / 16777217.0) / w AS DECIMAL(18,6)) AS DOUBLE)
    AS priority
FROM c ORDER BY priority DESC, doc_id LIMIT 150""")),


    // ---- X59: per-stratum weighted sample (A-ES within each source) --------
    // Mixture construction's sampling primitive: the K highest-priority
    // docs PER SOURCE under x55's Efraimidis–Spirakis weighting — i.e. a
    // weighted sample without replacement from every stratum in one pass.
    // The scale contrast with x24 (window row_number = a full per-stratum
    // sort through the shuffle) is the point: priority+id pack into one
    // exactly-representable double (the s51 idiom, loud guard if ids
    // outgrow 2^27) and reduce through the mergeable TopKAgg — O(K) state
    // per stratum, map-side partial top-K, so the exchange carries at most
    // |sources|×K doubles no matter the corpus size. w = ln(2 + n_chars)
    // keeps the weight ≥ ln 2 even for empty docs (priority ≥ -24.0006 at
    // u24=0, inside the pack's 25e6 offset budget). O-class: same portable
    // md5 uniform / quantized
    // priority / (priority DESC, doc_id ASC) tie order as x55/s51.
    GQuery("x59_stratified_weighted_sample",
      (s, d) => {
        val u24 = expr(
          "CAST(conv(substr(md5(concat('aes59:', doc_id)), 1, 6), 16, 10) AS BIGINT)")
        val w = log(lit(2.0) + col("n_chars").cast("double"))
          .cast("decimal(18,6)").cast("double")
        val prio = (log((u24 + lit(1.0)) / lit(16777217.0)) / w)
          .cast("decimal(18,6)")
        val p6 = (prio * lit(1000000)).cast("long")
        val did = when(col("doc_id") < lit(1L << 27), col("doc_id"))
          .otherwise(expr(
            "CAST(raise_error('x59: doc_id exceeds the 2^27 pack budget') AS BIGINT)"))
        val pack = ((p6 + lit(25000000L)) * lit(1L << 27)
          + (lit((1L << 27) - 1) - did)).cast("double")
        t(s, d, "documents")
          .select(col("source"), pack.as("pk"))
          .groupBy(col("source"))
          .agg(graft.functions.GraftFunctions.topk_vals(col("pk"), 5).as("top5"))
          .select(col("source"), posexplode(expr(
            s"transform(top5, v -> CAST(${(1L << 27) - 1} - " +
            s"(CAST(v AS BIGINT) % ${1L << 27}) AS BIGINT))")))
          .toDF("source", "rank0", "doc_id")
          .select(col("source"), (col("rank0") + 1).cast("long").as("rank"),
            col("doc_id"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH c AS (SELECT source, doc_id,
  CAST(ln((CAST(concat('0x', substr(md5('aes59:' || doc_id), 1, 6)) AS BIGINT)
        + 1.0) / 16777217.0)
    / CAST(CAST(ln(2.0 + CAST(n_chars AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
    AS DECIMAL(18,6)) AS prio
  FROM documents),
r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
    ORDER BY CAST(prio * 1000000 AS BIGINT) DESC, doc_id) AS rnk
  FROM c)
SELECT source, CAST(rnk AS BIGINT) AS rank, doc_id FROM r WHERE rnk <= 5
ORDER BY source NULLS FIRST, rank NULLS FIRST""")),


    // ---- X62: dataset card -------------------------------------------------
    // The per-source summary a release SHIPS beside x54's manifest: doc and
    // token counts, mean length, lexical diversity, exact-dup rate, and the
    // dominant language with its share — the numbers a consumer reads
    // before training on the set. Shape: one corpus scan computes per-row
    // features; the dup flag needs ONE content-hash shuffle (x01's shape —
    // a doc is a dup iff it is not its hash group's min-id keeper, and a
    // cross-source dup is attributed to its OWN source); language mode is a
    // per-(source, lang) count + row_number (ties break to the smaller
    // lang on both engines). Means are exact: per-row ratios quantized to
    // decimal(18,6), summed as decimal (order-free), divided ONCE — the
    // x60 discipline, so no partition-order avg(double) divergence.
    GQuery("x62_dataset_card",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
            col("text"))
          .withColumn("ws", split(col("text"), " "))
          .withColumn("tok", size(col("ws")).cast("long"))
          .withColumn("dwr",
            (size(array_distinct(col("ws"))).cast("double") /
              greatest(size(col("ws")), lit(1)).cast("double"))
              .cast("decimal(18,6)"))
          .withColumn("h", md5(col("text")))
          .drop("ws", "text")
        val keeper = docs.groupBy(col("h")).agg(min(col("doc_id")).as("kid"))
        val flagged = docs.join(keeper, "h")
          .withColumn("is_dup", col("doc_id") =!= col("kid"))
        val agg = flagged.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("n_tokens"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("dwr")).as("sum_dwr"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
        val langTop = flagged.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("lc"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
              .orderBy(col("lc").desc, col("lang"))))
          .filter(col("rn") === 1)
          .select(col("source"), col("lang").as("top_lang"), col("lc"))
        agg.join(langTop, "source")
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("sum_chars").cast("double") / col("n_docs"))
              .cast("decimal(18,6)").cast("double").as("mean_chars"),
            (col("sum_dwr").cast("double") / col("n_docs"))
              .cast("decimal(18,6)").cast("double").as("lexical_diversity"),
            (col("n_dups").cast("double") / col("n_docs"))
              .cast("decimal(18,6)").cast("double").as("dup_rate"),
            col("top_lang"),
            (col("lc").cast("double") / col("n_docs"))
              .cast("decimal(18,6)").cast("double").as("lang_share"))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (SELECT doc_id, source, lang, n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
    CAST(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / greatest(len(string_split(text, ' ')), 1) AS DECIMAL(18,6)) AS dwr,
    md5(text) AS h
  FROM documents),
keep AS (SELECT h, min(doc_id) AS kid FROM base GROUP BY h),
f AS (SELECT b.*, b.doc_id <> k.kid AS is_dup
  FROM base b JOIN keep k USING (h)),
agg AS (SELECT source, count(*) AS n_docs,
    CAST(sum(tok) AS BIGINT) AS n_tokens,
    sum(n_chars) AS sum_chars, sum(dwr) AS sum_dwr,
    sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dups
  FROM f GROUP BY source),
lc AS (SELECT source, lang, count(*) AS lc,
    row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
  FROM f GROUP BY source, lang)
SELECT a.source, a.n_docs, a.n_tokens,
  CAST(CAST(CAST(a.sum_chars AS DOUBLE) / a.n_docs AS DECIMAL(18,6)) AS DOUBLE)
    AS mean_chars,
  CAST(CAST(CAST(a.sum_dwr AS DOUBLE) / a.n_docs AS DECIMAL(18,6)) AS DOUBLE)
    AS lexical_diversity,
  CAST(CAST(CAST(a.n_dups AS DOUBLE) / a.n_docs AS DECIMAL(18,6)) AS DOUBLE)
    AS dup_rate,
  lc.lang AS top_lang,
  CAST(CAST(CAST(lc.lc AS DOUBLE) / a.n_docs AS DECIMAL(18,6)) AS DOUBLE)
    AS lang_share
FROM agg a JOIN lc ON a.source = lc.source AND lc.rn = 1
ORDER BY a.source NULLS FIRST""")),


    // ---- X06: the pipeline end-to-end --------------------------------------
    // The training-data flagship: quality filter → exact dedup → exact
    // near-dup removal → per-language corpus stats, every stage the
    // already-oracle-proven operator, composed. At 100 TB each stage is the
    // documented scale path (integer scoring per row, one hash-partitioned
    // agg, df-pruned inverted-index join).
    GQuery("x06_pipeline_e2e",
      (s, d) => {
        val stop = Seq("the", "a", "of", "and", "to")
        val scored = t(s, d, "documents")
          .withColumn("w", split(col("text"), " "))
          .withColumn("n_tok", size(col("w")).cast("long"))
          .withColumn("n_stop",
            size(filter(col("w"), x => x.isin(stop: _*))).cast("long"))
          .withColumn("n_uniq", size(array_distinct(col("w"))).cast("long"))
          .withColumn("score",
            expr("""least(n_tok, 400) * 25 div 400
              + (25 - least(n_stop * 100 div n_tok, 25))
              + least(n_uniq * 50 div n_tok, 50)""").cast("long"))
          .filter(col("score") >= 40)
          .select(col("doc_id"), col("text"), col("lang"), col("n_tok"))
        val keepers = scored.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        val deduped = scored.join(keepers, Seq("doc_id"))
        // maxDf=10 ≈ 10× the corpus mean shingle df (measured 1.05, max 4 at
        // sf0.01/sf0.1): the boilerplate skew escape hatch is exercised but
        // prunes nothing here, so the exact oracle stays green; on a corpus
        // with shared chrome the cap bounds the inverted-index fanout.
        val dropIds = graft.GraftOps
          .jaccardNearDups(deduped, col("doc_id"), col("text"), k = 5,
            threshold = 0.5, maxDf = graft.GraftOps.DfCapPolicy.Fixed(10L))
          .select(col("doc_b").as("doc_id")).distinct()
        deduped.join(dropIds, Seq("doc_id"), "left_anti")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .orderBy(col("lang"))
      },
      Some("""WITH t0 AS (SELECT doc_id, text, lang, string_split(text, ' ') AS w
  FROM documents),
m AS (SELECT doc_id, text, lang, len(w) AS n_tok,
    len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS n_stop,
    len(list_distinct(w)) AS n_uniq FROM t0),
keep AS (SELECT doc_id, text, lang, n_tok FROM m
  WHERE least(n_tok, 400) * 25 // 400
      + (25 - least(n_stop * 100 // n_tok, 25))
      + least(n_uniq * 50 // n_tok, 50) >= 40),
keepers AS (SELECT min(doc_id) AS doc_id FROM keep GROUP BY md5(text)),
ded AS (SELECT k.* FROM keep k JOIN keepers USING (doc_id)),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM ded),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 5 THEN list_distinct(list_transform(range(1, len(w) - 3),
    i -> array_to_string(w[i:i+4], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s FROM toks),
pairs AS (SELECT b.doc_id AS drop_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
fin AS (SELECT * FROM ded WHERE doc_id NOT IN (SELECT drop_id FROM pairs))
SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM fin GROUP BY lang ORDER BY lang NULLS FIRST""")),


    // ---- X20: curation pipeline end-to-end ---------------------------------
    // The round-3 ops composed the way a curation run executes them:
    // repetition/quality gate (X14) → decontamination drop (X13) →
    // deterministic split (X15) → per-split token budget. Every stage is the
    // proven scale path (per-row exprs → broadcast probe → per-row hash →
    // one agg); the oracle replays the identical chain as CTEs.
    GQuery("x20_curation_e2e",
      (s, d) => {
        val docs = t(s, d, "documents")
        val gated = docs
          .withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 10 &&
            size(array_distinct(col("w"))).cast("double") / size(col("w")).cast("double") >= 0.4)
          .select(col("doc_id"), col("text"))
        val contaminated = graft.GraftOps.decontaminate(
            gated.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0),
            col("doc_id"), col("text"), k = 3, flagFrac = 0.2)
          .filter(col("flagged")).select(col("doc_id"))
        val kept = gated.filter(col("doc_id") % 20 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
        val bk = substring(md5(concat(lit("split42:"), col("doc_id"))), 1, 4)
        kept
          .withColumn("split",
            when(bk < "cccc", "train").when(bk < "e666", "val").otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
          .orderBy(col("split"))
      },
      Some("""WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE len(string_split(text, ' ')) >= 10
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / len(string_split(text, ' ')) >= 0.4),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' ')))
  ELSE [array_to_string(w, ' ')] END AS sl
FROM toks),
ev AS (SELECT DISTINCT unnest(sl) AS g FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT s2.doc_id, len(s2.sl) AS nsh, unnest(s2.sl) AS g FROM sh s2
  JOIN gated ON gated.doc_id = s2.doc_id WHERE s2.doc_id % 20 <> 0),
contam AS (SELECT doc_id FROM (
    SELECT tr.doc_id, any_value(nsh) AS nsh, count(*) AS n_hits
    FROM tr JOIN ev USING (g) GROUP BY tr.doc_id)
  WHERE CAST(CAST(CAST(n_hits AS DOUBLE) / nsh AS DECIMAL(18,6)) AS DOUBLE) >= 0.2),
kept AS (SELECT doc_id, text FROM gated
  WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contam))
SELECT CASE WHEN substr(md5('split42:' || doc_id), 1, 4) < 'cccc' THEN 'train'
            WHEN substr(md5('split42:' || doc_id), 1, 4) < 'e666' THEN 'val'
            ELSE 'test' END AS split,
  count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM kept GROUP BY 1 ORDER BY split NULLS FIRST""")),


    // ---- X64: release funnel ------------------------------------------------
    // The attrition report of the WHOLE release gate chain — the one table
    // a data lead reads to see where the corpus went: docs and tokens
    // surviving each cumulative stage (raw → exact-dedup keeper → near-dup
    // cluster keeper → n-gram-clean → semantic-clean), with retained
    // fraction. Every stage reuses the engine's own machinery: x01's
    // md5-keeper, x07/x56's memoized pair table + O(log n) CC, x13's
    // broadcast 3-gram probe, x57/x61's broadcast semantic probe — so the
    // funnel costs ONE extra stack()+aggregate over the per-doc flag table,
    // and the memoization means the expensive pair generation is shared
    // with x02/x07/x56/x60 in a full pipeline run. DuckDB replays the pair
    // set brute-force (oracle scale only — listed with the quadratic
    // oracles pruned at sf0.1). O-class.
    GQuery("x64_release_funnel",
      (s, d) => {
        val docs = t(s, d, "documents")
        val isEval = col("doc_id") % 20 === 0 && col("doc_id") < 2000
        val base = docs.filter(!isEval)
          .select(col("doc_id"), col("text"),
            size(split(col("text"), " ")).cast("long").as("tok"))
          .withColumn("h", md5(col("text")))
        val keeper = base.groupBy(col("h")).agg(min(col("doc_id")).as("kid"))
        val clusters = nearDupClusters(s, d) // shared CC memo (r18)
        val withC = base.join(keeper, "h")
          .join(clusters, Seq("doc_id"), "left")
          .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
        val ckeep = withC.groupBy(col("cluster")).agg(min(col("doc_id")).as("ckid"))
        val ngram = graft.GraftOps.decontaminate(
          docs.filter(!isEval), docs.filter(isEval),
          col("doc_id"), col("text"), k = 3, flagFrac = 0.2)
          .select(col("doc_id"), col("flagged").as("ngram_flag"))
        val emb = t(s, d, "embeddings")
        val isEvalV = col("vec_id") % 20 === 0 && col("vec_id") < 2000
        val ev = emb.filter(isEvalV)
          .agg(collect_list(col("embedding")).as("evs")).withColumn("jk", lit(1))
        val sem = emb.filter(!isEvalV).withColumn("jk", lit(1))
          .join(broadcast(ev), "jk")
          // x57's canary: an empty eval slice still yields one collect_list
          // row whose empty array would null max_cos into a silent
          // keep-everything stage — fail loudly instead
          .withColumn("evs",
            when(assert_true(size(col("evs")) > 0,
              lit("x64: eval slice is empty — the semantic stage would " +
                "silently pass every doc")).isNull, col("evs")))
          .select(col("vec_id"),
            array_max(transform(col("evs"), e =>
              cosine_sim(e, col("embedding")).cast("decimal(18,6)")))
              .cast("double").as("max_cos"))
        val flags = withC.join(ckeep, "cluster")
          .join(ngram, "doc_id")
          .join(sem, col("doc_id") === col("vec_id"), "left")
          .select(col("tok"),
            (col("doc_id") === col("kid")).as("p1"),
            (col("doc_id") === col("ckid")).as("p2"),
            (!col("ngram_flag")).as("p3"),
            (coalesce(col("max_cos"), lit(0.0)) < 0.45).as("p4"))
        val total = base.agg(count(lit(1)).as("total"))
        flags.select(col("tok"), expr("""stack(5,
            '0_raw', true,
            '1_exact_dedup', p1,
            '2_neardup_dedup', p1 AND p2,
            '3_ngram_clean', p1 AND p2 AND p3,
            '4_semantic_clean', p1 AND p2 AND p3 AND p4)
            AS (stage, pass)"""))
          .filter(col("pass"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
          .crossJoin(broadcast(total))
          .select(col("stage"), col("n_docs"), col("n_tokens"),
            (col("n_docs").cast("double") / col("total"))
              .cast("decimal(18,6)").cast("double").as("retained_frac"))
          .orderBy(col("stage"))
      },
      Some("""WITH RECURSIVE corpus AS (SELECT doc_id, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok, md5(text) AS h
  FROM documents WHERE NOT (doc_id % 20 = 0 AND doc_id < 2000)),
keep AS (SELECT h, min(doc_id) AS kid FROM corpus GROUP BY h),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh5 AS (SELECT doc_id,
  CASE WHEN len(w) >= 5 THEN list_distinct(list_transform(range(1, len(w) - 3),
    i -> array_to_string(w[i:i+4], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s FROM toks),
pairs AS (SELECT a.doc_id AS da, b.doc_id AS db
  FROM sh5 a JOIN sh5 b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
edges AS (SELECT da AS src, db AS dst FROM pairs
  UNION ALL SELECT db, da FROM pairs),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
clus AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
wc AS (SELECT c.doc_id, c.tok, c.h, coalesce(cl.cluster, c.doc_id) AS cluster
  FROM corpus c LEFT JOIN clus cl USING (doc_id)),
ck AS (SELECT cluster, min(doc_id) AS ckid FROM wc GROUP BY cluster),
sh3 AS (SELECT doc_id,
  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s FROM toks),
evg AS (SELECT DISTINCT unnest(s) AS g FROM sh3
  WHERE doc_id % 20 = 0 AND doc_id < 2000),
tr AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS g FROM sh3
  WHERE NOT (doc_id % 20 = 0 AND doc_id < 2000)),
hits AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN evg USING (g)
  GROUP BY doc_id),
basen AS (SELECT doc_id, len(s) AS nsh FROM sh3
  WHERE NOT (doc_id % 20 = 0 AND doc_id < 2000)),
ng AS (SELECT b.doc_id,
    CAST(CAST(CAST(coalesce(hh.n_hits, 0) AS DOUBLE) / b.nsh
      AS DECIMAL(18,6)) AS DOUBLE) >= 0.2 AS ngram_flag
  FROM basen b LEFT JOIN hits hh USING (doc_id)),
eve AS (SELECT CAST(embedding AS DOUBLE[]) AS evv FROM embeddings
  WHERE vec_id % 20 = 0 AND vec_id < 2000),
cv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE NOT (vec_id % 20 = 0 AND vec_id < 2000)),
scs AS (SELECT cv.vec_id,
    CAST(list_cosine_similarity(v, evv) AS DECIMAL(18,6)) AS sc
  FROM cv CROSS JOIN eve),
sem AS (SELECT vec_id, CAST(max(sc) AS DOUBLE) AS max_cos FROM scs
  GROUP BY vec_id),
flags AS (SELECT wc.tok,
    wc.doc_id = k.kid AS p1,
    wc.doc_id = ck.ckid AS p2,
    NOT ng.ngram_flag AS p3,
    coalesce(s2.max_cos, 0) < 0.45 AS p4
  FROM wc JOIN keep k USING (h) JOIN ck USING (cluster)
    JOIN ng ON wc.doc_id = ng.doc_id
    LEFT JOIN sem s2 ON wc.doc_id = s2.vec_id),
tot AS (SELECT count(*) AS total FROM corpus),
st AS (
  SELECT '0_raw' AS stage, tok FROM flags
  UNION ALL SELECT '1_exact_dedup', tok FROM flags WHERE p1
  UNION ALL SELECT '2_neardup_dedup', tok FROM flags WHERE p1 AND p2
  UNION ALL SELECT '3_ngram_clean', tok FROM flags WHERE p1 AND p2 AND p3
  UNION ALL SELECT '4_semantic_clean', tok FROM flags
    WHERE p1 AND p2 AND p3 AND p4)
SELECT stage, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
  CAST(CAST(CAST(count(*) AS DOUBLE) / max(total) AS DECIMAL(18,6)) AS DOUBLE)
    AS retained_frac
FROM st, tot GROUP BY stage ORDER BY stage NULLS FIRST""")),


    // ---- X69: DSIR importance resampling (Xie et al., NeurIPS 2023) --------
    // Data Selection via Importance Resampling — the published recipe for
    // cutting a raw crawl toward a TARGET domain: estimate target and raw
    // distributions over HASHED n-gram features (the paper's exact feature
    // map: word unigrams AND bigrams → hashed buckets, here md5 mod 512 at
    // oracle-checkable size), weight every doc by its log importance ratio
    // Σ count_b · ln(p̂_target(b)/p̂_raw(b)) (add-1 smoothed), then draw a
    // fixed-size sample ∝ exp(weight) WITHOUT replacement via the
    // Gumbel-max trick (score = logw + standard Gumbel from the portable
    // md5 uniform; global top-K by score IS the importance resample).
    // The 100 TB shape: ONE (doc, bucket) count shuffle feeds both sides —
    // the 512-row bucket table (reused exchange) and the per-doc fold; the
    // rate table broadcasts; the top-K is TakeOrderedAndProject (no global
    // sort). Target slice = source 'src0' (the curated-domain stand-in).
    // Cross-engine exactness: integer bucket counts; ln args built from
    // identical double divisions; each ln quantized to decimal(18,6) (ln
    // agrees to 1 ulp — the x55 analysis; the Gumbel chain's inner -ln(u)
    // ∈ [6e-8, 16.6] keeps the outer ln's relative drift ~1e-16, far below
    // the grain); per-doc Σ count·lr is exact decimal arithmetic, so the
    // K-boundary is deterministic with the doc_id tiebreak. O-class.
    GQuery("x69_dsir_resample",
      (s, d) => {
        val bucket = expr("CAST(conv(substr(md5(concat('dsir69:', feat)), " +
          "1, 6), 16, 10) AS BIGINT) % 512")
        // feature stream = unigrams ++ adjacent bigrams (guarded: Spark's
        // sequence(1, 0) would count DOWN, so 1-word docs take the empty
        // branch explicitly)
        val feats = expr("""concat(toks,
          CASE WHEN size(toks) < 2 THEN array()
               ELSE transform(sequence(1, size(toks) - 1),
                 i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          END)""")
        // materialize the (doc, bucket) counts ONCE: three consumers read
        // them (the totals, the rate table, the per-doc fold), and without
        // this the whole explode+count subtree re-executes per consumer —
        // measured ×5.5 on ×3 data at sf3 before, ~linear after. At 100 TB
        // this is the persisted feature-count table every DSIR deployment
        // writes between the estimation and scoring passes.
        val dc = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("source"), explode(feats).as("feat"))
          .select(col("doc_id"), col("source"), bucket.as("b"))
          .groupBy(col("doc_id"), col("source"), col("b"))
          .agg(count(lit(1)).as("dc"))
          .localCheckpoint(true)
        val bc = dc.groupBy(col("b"))
          .agg(sum(col("dc")).as("cc"),
            sum(when(col("source") === "src0", col("dc"))
              .otherwise(lit(0L))).as("tc"))
        val tot = bc.agg(sum(col("cc")).as("c"), sum(col("tc")).as("t"))
        val rates = bc.crossJoin(broadcast(tot))
          .select(col("b"),
            log(((col("tc") + lit(1.0)) / (col("t") + lit(512))) /
              ((col("cc") + lit(1.0)) / (col("c") + lit(512))))
              .cast("decimal(18,6)").as("lr"))
        val gum = expr("CAST(-ln(-ln((CAST(conv(substr(md5(concat('g69:', " +
          "doc_id)), 1, 6), 16, 10) AS BIGINT) + 1.0) / 16777217.0)) " +
          "AS DECIMAL(18,6))")
        dc.join(broadcast(rates), "b")
          .groupBy(col("doc_id"), col("source"))
          .agg(sum(col("dc") * col("lr")).as("lw"))
          .select(col("doc_id"), col("source"),
            col("lw").cast("double").as("logw"),
            (col("lw") + gum).cast("double").as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(60)
      },
      Some("""WITH w AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5('dsir69:' || feat), 1, 6)) AS BIGINT) % 512
      AS b
  FROM (SELECT doc_id, source,
          unnest(toks || list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i + 1])) AS feat
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents))),
dcnt AS (SELECT doc_id, source, b, count(*) AS dc FROM w GROUP BY 1, 2, 3),
bc AS (SELECT b, sum(dc) AS cc,
    sum(CASE WHEN source = 'src0' THEN dc ELSE 0 END) AS tc
  FROM dcnt GROUP BY 1),
tot AS (SELECT sum(cc) AS c, sum(tc) AS t FROM bc),
rates AS (SELECT b,
    CAST(ln(((tc + 1.0) / (t + 512)) / ((cc + 1.0) / (c + 512)))
      AS DECIMAL(18,6)) AS lr
  FROM bc, tot),
lw AS (SELECT doc_id, source, sum(dc * lr) AS lw
  FROM dcnt JOIN rates USING (b) GROUP BY 1, 2)
SELECT doc_id, source, CAST(lw AS DOUBLE) AS logw,
  CAST(lw + CAST(-ln(-ln((CAST(concat('0x', substr(md5('g69:' || doc_id),
      1, 6)) AS BIGINT) + 1.0) / 16777217.0)) AS DECIMAL(18,6)) AS DOUBLE)
    AS score
FROM lw ORDER BY score DESC, doc_id LIMIT 60""")),


    // ---- X71: cross-release corpus diff -------------------------------------
    // The release-lifecycle closer (manifest x54 → card x62 → funnel x64 →
    // DIFF): what changed between release N and N+1, per source — docs
    // added / removed / changed (same id, different content hash) /
    // unchanged, with doc and token deltas. Simulated releases derived
    // from the corpus by integer rules both engines replay exactly: the
    // previous release lacks doc_id % 7 == 0 (they are ADDED in N+1), the
    // next release drops doc_id % 5 == 0 (REMOVED), and doc_id % 11 == 0
    // survivors ship a revised body (CHANGED — md5 differs). Shape at
    // 100 TB: one full-outer join on doc_id (both sides hash-partitioned
    // on the release's natural key — bucket both releases on doc_id and
    // this is exchange-free), then a tiny (source × status) rollup.
    // Every output is an exact integer. O-class.
    GQuery("x71_release_diff",
      (s, d) => {
        val docs = t(s, d, "documents")
        val prev = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            md5(col("text")).as("h_prev"),
            size(split(col("text"), " ")).cast("long").as("tok_prev"))
        val next = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("source"),
            md5(when(col("doc_id") % 11 === 0,
                concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text"))).as("h_next"),
            (size(split(col("text"), " ")) +
              when(col("doc_id") % 11 === 0, 1).otherwise(0))
              .cast("long").as("tok_next"))
        prev.join(next, Seq("doc_id", "source"), "full_outer")
          .select(col("source"),
            when(col("h_prev").isNull, "added")
              .when(col("h_next").isNull, "removed")
              .when(col("h_prev") =!= col("h_next"), "changed")
              .otherwise("unchanged").as("status"),
            coalesce(col("tok_prev"), lit(0L)).as("tp"),
            coalesce(col("tok_next"), lit(0L)).as("tn"))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tn") - col("tp")).as("token_delta"),
            sum(col("tn")).as("tokens_next"))
          .orderBy(col("source"), col("status"))
      },
      Some("""WITH prev AS (
  SELECT doc_id, source, md5(text) AS h_prev,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_prev
  FROM documents WHERE doc_id % 7 <> 0),
nxt AS (
  SELECT doc_id, source,
    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END)
      AS h_next,
    CAST(len(string_split(text, ' '))
      + CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT) AS tok_next
  FROM documents WHERE doc_id % 5 <> 0),
j AS (
  SELECT source,
    CASE WHEN h_prev IS NULL THEN 'added'
         WHEN h_next IS NULL THEN 'removed'
         WHEN h_prev <> h_next THEN 'changed'
         ELSE 'unchanged' END AS status,
    coalesce(tok_prev, 0) AS tp, coalesce(tok_next, 0) AS tn
  FROM prev FULL OUTER JOIN nxt USING (doc_id, source))
SELECT source, status, count(*) AS n_docs,
  CAST(sum(tn - tp) AS BIGINT) AS token_delta,
  CAST(sum(tn) AS BIGINT) AS tokens_next
FROM j GROUP BY 1, 2
ORDER BY source NULLS FIRST, status NULLS FIRST""")),


    // ---- X72: k-anonymity / l-diversity release audit -----------------------
    // The privacy-governance gate a dataset release runs beside the PII
    // scrubbers (x17/x68): generalize each record to its quasi-identifier
    // tuple — here (event_type, hour-of-day, value band) — and measure
    // re-identification risk à la Sweeney's k-anonymity: every equivalence
    // class of size < k is a linkage risk (its members are distinguishable
    // among fewer than k records), and every class whose SENSITIVE
    // attribute (the user cohort) is constant leaks that attribute even at
    // k (the l-diversity refinement, l = 1). Per event type: the dataset's
    // achieved k (min class size), rows in classes below k = 5 and the
    // suppression fraction enforcing k = 5 would cost, and the l = 1
    // attribute-disclosure exposure. Shape at 100 TB: one (QI-tuple)
    // aggregation — partial map-side, class count ≪ rows — then a tiny
    // per-type rollup; the distinct-cohort count per class is over a
    // 10-value domain. All exact integers + one ratio. O-class.
    GQuery("x72_k_anonymity",
      (s, d) => {
        val classes = Tables.events(s, d)
          .select(col("event_type"),
            hour(col("ts")).cast("long").as("hr"),
            least(greatest(floor(col("value") / lit(100.0)), lit(0.0)),
              lit(9.0)).cast("long").as("vband"),
            (col("user_id") % 10).as("cohort"))
          .groupBy(col("event_type"), col("hr"), col("vband"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("cohort")).as("l"))
        classes.groupBy(col("event_type"))
          .agg(sum(col("n")).as("n_rows"),
            count(lit(1)).as("n_classes"),
            min(col("n")).as("min_k"),
            sum(when(col("n") < 5, col("n")).otherwise(lit(0L)))
              .as("rows_lt5"),
            sum(when(col("l") === 1, lit(1L)).otherwise(lit(0L)))
              .as("l1_classes"),
            sum(when(col("l") === 1, col("n")).otherwise(lit(0L)))
              .as("l1_rows"))
          .select(col("event_type"), col("n_rows"), col("n_classes"),
            col("min_k"), col("rows_lt5"),
            (col("rows_lt5").cast("double") / col("n_rows").cast("double"))
              .cast("decimal(18,6)").cast("double").as("suppress_frac_k5"),
            col("l1_classes"), col("l1_rows"))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (
  SELECT event_type, hour(ts) AS hr,
    CAST(least(greatest(floor(value / 100.0), 0), 9) AS BIGINT) AS vband,
    user_id % 10 AS cohort
  FROM events),
cls AS (
  SELECT event_type, hr, vband, count(*) AS n,
    count(DISTINCT cohort) AS l
  FROM g GROUP BY 1, 2, 3)
SELECT event_type,
  CAST(sum(n) AS BIGINT) AS n_rows,
  count(*) AS n_classes,
  CAST(min(n) AS BIGINT) AS min_k,
  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_lt5,
  CAST(CAST(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
    / CAST(sum(n) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
    AS suppress_frac_k5,
  CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1_classes,
  CAST(sum(CASE WHEN l = 1 THEN n ELSE 0 END) AS BIGINT) AS l1_rows
FROM cls GROUP BY event_type ORDER BY event_type NULLS FIRST""")),


    // ---- X82: WebDataset-style tar sharding --------------------------------
    // The packaging format multimodal training actually ships: fixed-count
    // shards, each a REAL POSIX ustar archive holding one file per sample
    // part ("{id}.txt" = the document's UTF-8 bytes, "{id}.meta" = a 16-byte
    // sidecar) — exactly what a WebDataset loader consumes. tar_pack writes
    // the genuine format (512-byte headers, octal fields, the space-seeded
    // header checksum, block padding, double-zero EOF); tar_index walks the
    // header chain back out, re-verifying every checksum and skipping
    // payload blocks by their declared sizes — the O(headers) shard-listing
    // access pattern a 100 TB corpus depends on. Every output column is
    // derived from the PARSE (entry count, names, header sizes, payload
    // byte-sums, archive length), while the oracle recomputes them from the
    // table definition with no tar round trip — so the hash match proves
    // encode→index is the identity on names, sizes, payload bytes AND that
    // every re-computed checksum equals the stored one (all_ok=true is a
    // parse output, not an assumption). Scale: one shard-key shuffle
    // (8 docs/shard bounded collect_list — the WebDataset shard-assembly
    // shape), per-row pack+index, exact-integer/string outputs. O-class.
    // The independent-decoder proof (system tar lists the same entries)
    // lives in TarSpec.
    GQuery("x82_webdataset_shard",
      (s, d) => {
        val meta = expr("unhex(array_join(transform(sequence(0, 15), p -> " +
          "lpad(hex((doc_id * 13 + p * 7) % 256), 2, '0')), ''))")
        val pair = array(
          struct(concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
            expr("encode(text, 'UTF-8')").as("data")),
          struct(concat(col("doc_id").cast("string"), lit(".meta")).as("name"),
            meta.as("data")))
        val idx = graft.functions.GraftFunctions.tar_index(col("shard"))
        t(s, d, "documents")
          .select(expr("doc_id div 8").as("shard_id"), pair.as("pair"))
          .groupBy(col("shard_id"))
          .agg(expr("sort_array(flatten(collect_list(pair)))").as("entries"))
          .select(col("shard_id"),
            graft.functions.GraftFunctions.tar_pack(col("entries"))
              .as("shard"))
          .select(col("shard_id"), idx.as("idx"), length(col("shard"))
            .cast("long").as("archive_bytes"))
          .select(col("shard_id"),
            size(col("idx")).cast("long").as("n_entries"),
            expr("forall(idx, e -> e.chksum_ok)").as("all_ok"),
            md5(expr("array_join(transform(idx, e -> e.name), ',')"))
              .as("names_fp"),
            expr("aggregate(filter(idx, e -> e.name LIKE '%.txt'), " +
              "CAST(0 AS BIGINT), (a, e) -> a + e.size)").as("payload_bytes"),
            expr("aggregate(filter(idx, e -> e.name LIKE '%.meta'), " +
              "CAST(0 AS BIGINT), (a, e) -> a + e.data_sum)").as("meta_sum"),
            col("archive_bytes"))
          .orderBy(col("shard_id"))
      },
      Some("""WITH d AS (SELECT doc_id, doc_id // 8 AS shard_id,
    octet_length(encode(text)) AS tb
  FROM documents),
m AS (SELECT doc_id,
    CAST(list_sum([(doc_id * 13 + p * 7) % 256 for p in range(0, 16)])
      AS BIGINT) AS ms
  FROM documents),
names AS (SELECT shard_id, name FROM (
    SELECT shard_id, CAST(doc_id AS VARCHAR) || '.txt' AS name FROM d
    UNION ALL
    SELECT shard_id, CAST(doc_id AS VARCHAR) || '.meta' AS name FROM d)),
nf AS (SELECT shard_id, count(*) AS n_entries,
    md5(string_agg(name, ',' ORDER BY name)) AS names_fp
  FROM names GROUP BY shard_id),
agg AS (SELECT d.shard_id,
    CAST(sum(d.tb) AS BIGINT) AS payload_bytes,
    CAST(sum(m.ms) AS BIGINT) AS meta_sum,
    CAST(sum(512 + ((d.tb + 511) // 512) * 512 + 512 + 512) + 1024
      AS BIGINT) AS archive_bytes
  FROM d JOIN m USING (doc_id) GROUP BY d.shard_id)
SELECT nf.shard_id, nf.n_entries, TRUE AS all_ok, nf.names_fp,
  a.payload_bytes, a.meta_sum, a.archive_bytes
FROM nf JOIN agg a USING (shard_id)
ORDER BY shard_id NULLS FIRST"""))
  )
}
