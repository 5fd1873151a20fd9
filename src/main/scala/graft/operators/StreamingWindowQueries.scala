package graft.operators

import java.nio.file.Files

import graft.{GQuery, Tables}
import graft.sources.replay.ReplayLog
import graft.streaming._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._

/** Windows, watermarks, streaming dedup and stream joins: the replay
  * envelope (s01), tumbling/sliding/session windows in complete AND
  * append mode (s02-s04, s31-s33), watermark late-drop (s05/s05b),
  * dedup incl. withinWatermark/content/pHash (s06/s18/s24/s48), offset
  * admission (s16/s23), and the stream-static + all four stream-stream
  * join types (s07/s08/s17/s21/s22/s25).
  *
  * Part of the [[StreamingQueries]] registry (split from the former
  * monolithic file in round 12); execution helpers (runToMemory, the
  * 8-partition harness session, replay/event/doc streams) live on
  * [[StreamingQueries]] itself.
  */
private[operators] object StreamingWindowQueries {
  import StreamingQueries._

  val queries: Seq[GQuery] = Seq(


    // S01: the reference's proven end-to-end query over the envelope —
    // binary→utf8 cast + alias + length + projection
    // (/root/reference/tests/basic_tests.rs:53-61) — via the custom source.
    GQuery("s01_replay_envelope",
      (s, d) => runToMemory(
        replayStream(s, d).select(
          col("key").cast("string").as("key"),
          col("value").cast("string").as("value"),
          length(col("value").cast("string")).cast("long").as("len"),
          col("partition").cast("long").as("partition"),
          col("offset")),
        "append").orderBy(col("partition"), col("offset")),
      Some("""SELECT 'Key ' || event_id AS key, props AS value,
  strlen(props) AS len, event_id % 3 AS "partition", event_id // 3 AS "offset"
FROM events ORDER BY "partition" NULLS FIRST, "offset" NULLS FIRST""")),

    // S02: tumbling event-time window aggregation (complete mode).
    GQuery("s02_tumbling_window",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "complete")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"), col("sv"))
        .orderBy(col("ws_sec")),
      Some("""SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events GROUP BY 1 ORDER BY ws_sec NULLS FIRST""")),

    // S03: sliding window (10 min window / 5 min slide) — every event lands
    // in exactly two windows.
    GQuery("s03_sliding_window",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "complete")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"), col("sv"))
        .orderBy(col("ws_sec")),
      Some("""WITH b AS (SELECT (epoch_us(ts) // 300000000) * 300 AS w2, value FROM events),
u AS (SELECT w2 AS ws_sec, value FROM b
      UNION ALL SELECT w2 - 300 AS ws_sec, value FROM b)
SELECT ws_sec, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM u GROUP BY 1 ORDER BY ws_sec NULLS FIRST""")),

    // S04: session windows (30 min gap) per user; session end = last + gap.
    GQuery("s04_session_window",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "complete")
        .select(col("user_id"), col("session_window.start").cast("long").as("ss"),
          col("session_window.end").cast("long").as("se"), col("n"), col("sv"))
        .orderBy(col("user_id"), col("ss")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
l AS (SELECT user_id, us, value,
  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
       THEN 1 ELSE 0 END AS nf FROM e),
g AS (SELECT user_id, us, value, SUM(nf) OVER (PARTITION BY user_id ORDER BY us
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l)
SELECT user_id, min(us) // 1000000 AS ss, (max(us) + 1800000000) // 1000000 AS se,
  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM g GROUP BY user_id, sid ORDER BY user_id NULLS FIRST, ss NULLS FIRST""")),

    // S31-S33: append-mode + watermark twins of S02-S04. Complete mode keeps
    // every window in state forever — unbounded at 100 TB; with a watermark,
    // append mode emits each window once when it CLOSES (window.end <= final
    // watermark) and evicts its state. The emitted set is deterministic for
    // in-order replays: final watermark = floor(max event-time ms) - delay,
    // and a window emits iff end_us <= wm_ms * 1000 — exactly the HAVING
    // restriction in the oracles. See SCALE.md (state eviction).
    GQuery("s31_tumbling_append",
      (s, d) => runToMemory(
        eventStream(s, d)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "append")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"), col("sv"))
        .orderBy(col("ws_sec")),
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events)
SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events, wm
GROUP BY ws_sec, wm_ms
HAVING (ws_sec + 600) * 1000 <= wm_ms
ORDER BY ws_sec NULLS FIRST""")),

    GQuery("s32_sliding_append",
      (s, d) => runToMemory(
        eventStream(s, d)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "append")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"), col("sv"))
        .orderBy(col("ws_sec")),
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
b AS (SELECT (epoch_us(ts) // 300000000) * 300 AS w2, value FROM events),
u AS (SELECT w2 AS ws_sec, value FROM b
      UNION ALL SELECT w2 - 300 AS ws_sec, value FROM b)
SELECT ws_sec, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM u, wm
GROUP BY ws_sec, wm_ms
HAVING (ws_sec + 600) * 1000 <= wm_ms
ORDER BY ws_sec NULLS FIRST""")),

    GQuery("s33_session_append",
      (s, d) => runToMemory(
        eventStream(s, d)
          .withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "append")
        .select(col("user_id"), col("session_window.start").cast("long").as("ss"),
          col("session_window.end").cast("long").as("se"), col("n"), col("sv"))
        .orderBy(col("user_id"), col("ss")),
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
l AS (SELECT user_id, us, value,
  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
       THEN 1 ELSE 0 END AS nf FROM e),
g AS (SELECT user_id, us, value, SUM(nf) OVER (PARTITION BY user_id ORDER BY us
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l)
SELECT user_id, min(us) // 1000000 AS ss, (max(us) + 1800000000) // 1000000 AS se,
  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM g, wm GROUP BY user_id, sid, wm_ms
HAVING max(us) + 1800000000 <= wm_ms * 1000
ORDER BY user_id NULLS FIRST, ss NULLS FIRST""")),

    // S05 (free-running watermark late-drop) was RETIRED from the registry
    // in round 13 (VERDICT r12 #6): its batch-boundary-dependent drop set
    // made it G-class by construction, and s05b below pins the identical
    // semantics (late replay → watermark → append windows) with an exact
    // oracle. The free-running behavior stays covered by StreamingSpec's
    // drop/keep property tests over replayStream(late = true).

    // S05b: the EXACT-oracle twin of the retired s05 (VERDICT r10 #5). Adversarial
    // late replay with the batch split PINNED to exactly THREE data
    // batches per partition (cap = ceil(|events|/3/3) rows each), which
    // makes the dropped set deterministic and expressible in SQL. Uses the
    // xlate log (lateness = 4/5 of the corpus span, ReplayLog.ensureXlateLog)
    // because under a coarse pinned split the 2-hour variant never loses a
    // row: lateness must exceed two batch spans before the previous-batch
    // filter watermark can pass a window, and three batches of a month-long
    // corpus are ~10 days wide. With the xlate shift, early-corpus events
    // resurface in batch 3 behind the batch-1 watermark and are genuinely
    // dropped at any scale factor (sf0.01: 175 of 10k; sf0.1: 1748 of 100k). The
    // subtlety this twin documents (probed empirically, round 11): Spark
    // filters late rows with the PREVIOUS batch's watermark
    // (eventTimeWatermarkForLateEvents) and evicts/emits with the CURRENT
    // one (eventTimeWatermarkForEviction) — no data loss for windows still
    // in state. So with k batches the first drop can only happen in batch 3:
    //   batch k = records (k-1)·cap < rn <= k·cap per partition (arrival
    //     order: ts + 2h for every 20th event, tie-break event_id —
    //     ReplayLog:115);
    //   wmA = floor_ms(max ts over batch 1) - 1h — the eviction watermark
    //     of batch 2 and the LATE-FILTER watermark of batch 3;
    //   a batch-3 row is DROPPED iff its window already left state:
    //     (ws+600)*1000 <= wmA (Spark's LessThanOrEqual(window.end,
    //     wm*1000) boundary, the same one s31/s44b pinned); batches 1-2
    //     are never filtered (their filter watermark is 0);
    //   emission (append) = windows with admitted rows and
    //     (ws+600)*1000 <= final wm, flushed by the no-new-data batch that
    //     AvailableNow runs after the watermark's last advance.
    // s05 (free-running ~6-batch split) stays G-class; this twin turns the
    // semantics into an O-class row.
    GQuery("s05b_watermark_late_drop_pinned",
      (s, d) => {
        val cap = (Tables.events(s, d).count() + 8) / 9
        val xlog = ReplayLog.ensureXlateLog(s, d)
        runToMemory(
          s.readStream.format("graft-replay").option("path", xlog)
            .option("maxRowsPerTrigger", cap.toString).load()
            .withColumn("ts", col("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "10 minutes"))
            .agg(count(lit(1)).as("n")),
          "append")
          .select(col("window.start").cast("long").as("ws_sec"), col("n"))
          .orderBy(col("ws_sec"))
      },
      Some("""WITH sp AS (SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 5 * 4 AS shift FROM events),
e AS (SELECT event_id, epoch_us(ts) AS us,
  epoch_us(ts) + CASE WHEN event_id % 20 = 0 THEN shift ELSE 0 END AS arrival,
  event_id % 3 AS part FROM events, sp),
m AS (SELECT (count(*) + 8) // 9 AS cap FROM events),
r AS (SELECT e.*, row_number() OVER (PARTITION BY part ORDER BY arrival, event_id) AS rn FROM e),
b AS (SELECT r.*, least((rn + cap - 1) // cap, 3) AS batch FROM r, m),
wma AS (SELECT max(us) // 1000 - 3600000 AS wma_ms FROM b WHERE batch = 1),
wmc AS (SELECT max(us) // 1000 - 3600000 AS wmc_ms FROM b),
adm AS (SELECT (us // 600000000) * 600 AS ws_sec FROM b, wma
  WHERE batch <= 2 OR ((us // 600000000) * 600 + 600) * 1000 > wma_ms)
SELECT ws_sec, count(*) AS n FROM adm, wmc
GROUP BY ws_sec, wmc_ms
HAVING (ws_sec + 600) * 1000 <= wmc_ms
ORDER BY ws_sec NULLS FIRST""")),

    // S06: streaming dedup on the envelope key via the custom source — two
    // replay streams unioned (every record twice), exact dedup on
    // (partition, offset), then batch-side per-partition totals.
    GQuery("s06_stream_dedup",
      (s, d) => runToMemory(
        replayStream(s, d).unionAll(replayStream(s, d))
          .dropDuplicates("partition", "offset"),
        // NOTE (r18): unwatermarked dedup never schedules a terminal no-data
        // batch (nothing to evict), so the s18-style opt-out is a no-op here
        // — A/B measured 1.20 vs 1.35 s (noise); left at the default
        "append")
        .groupBy(col("partition").cast("long").as("partition"))
        .agg(count(lit(1)).as("n"), max(col("offset")).as("max_offset"))
        .orderBy(col("partition")),
      Some("""SELECT event_id % 3 AS "partition", count(*) AS n,
  max(event_id // 3) AS max_offset
FROM events GROUP BY 1 ORDER BY "partition" NULLS FIRST""")),

    // S07: stream-static join — streaming events enriched with the static
    // customer dim (broadcast by Catalyst), aggregated per segment.
    GQuery("s07_stream_static_join",
      (s, d) => runToMemory(
        eventStream(s, d)
          .join(Tables.table(s, d, "customer"), col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "complete").orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY c_mktsegment NULLS FIRST""")),

    // S08: stream-stream time-bounded equi join: purchases within 1h after a
    // view by the same user, both sides watermarked.
    GQuery("s08_stream_stream_join",
      (s, d) => {
        val views = eventStream(s, d).filter(col("event_type") === "view")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
        val purchases = eventStream(s, d).filter(col("event_type") === "purchase")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
        runToMemory(
          views.join(purchases,
            col("v_user") === col("p_user")
              && col("p_ts") >= col("v_ts")
              && col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR")),
          "append", noDataBatch = false) // inner join: terminal batch
                                         // evicts only, never emits
          .select(col("view_id"), col("purchase_id"))
          .orderBy(col("view_id"), col("purchase_id"))
      },
      Some("""SELECT v.event_id AS view_id, p.event_id AS purchase_id
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND epoch_us(p.ts) >= epoch_us(v.ts)
 AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
ORDER BY view_id NULLS FIRST, purchase_id NULLS FIRST""")),

    // S18: dropDuplicatesWithinWatermark — the state-bounded dedup API for
    // unbounded key spaces (state for a key is held only one watermark delay
    // past its event time, unlike s06's unbounded dropDuplicates state). Same
    // doubled replay as s06; duplicates arrive in the same micro-batches, so
    // the bounded run removes them all.
    GQuery("s18_dedup_within_watermark",
      (s, d) => runToMemory(
        replayStream(s, d).unionAll(replayStream(s, d))
          .withColumn("ts", col("timestamp"))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("partition", "offset"),
        // terminal-batch proof: watermarked dedup emits each kept row in the
        // data batch it first arrives in; the terminal no-data batch only
        // EVICTS expired dedup keys and provably cannot emit — and a bounded
        // run's checkpoint is scratch, so the eviction itself is dead work
        "append", noDataBatch = false)
        .groupBy(col("partition").cast("long").as("partition"))
        .agg(count(lit(1)).as("n"), max(col("offset")).as("max_offset"))
        .orderBy(col("partition")),
      Some("""SELECT event_id % 3 AS "partition", count(*) AS n,
  max(event_id // 3) AS max_offset
FROM events GROUP BY 1 ORDER BY "partition" NULLS FIRST""")),

    // S16: explicit starting offset on the custom source — the half of the
    // Kafka startingOffsets contract the reference lacks (it can only replay
    // from the beginning, execution.rs:77-79). Every partition starts at
    // count/12 (≈ a quarter of each partition's records).
    GQuery("s16_offset_start",
      (s, d) => {
        val startOff = Tables.events(s, d).count() / 12
        val log = ReplayLog.ensureLog(s, d)
        runToMemory(
          s.readStream.format("graft-replay").option("path", log)
            .option("startingOffset", startOff.toString).load(),
          "append")
          .groupBy(col("partition").cast("long").as("partition"))
          .agg(count(lit(1)).as("n"), min(col("offset")).as("min_offset"))
          .orderBy(col("partition"))
      },
      Some("""WITH s AS (SELECT count(*) // 12 AS so FROM events)
SELECT event_id % 3 AS "partition", count(*) AS n,
  min(event_id // 3) AS min_offset
FROM events, s WHERE event_id // 3 >= so
GROUP BY 1 ORDER BY "partition" NULLS FIRST""")),

    // S74: start a replay at a REAL timestamp (KIP-79 / Kafka's
    // offsetsForTimes — VERDICT r16 #8): `startingTimestamp` resolves each
    // partition's start to the earliest record whose timestamp >= T; a
    // partition with no such record starts at its end. T derives from the
    // corpus (min + 3/5 of the event-time span, integer µs→ms) so DuckDB
    // replays the cut exactly; the std log is per-partition
    // timestamp-monotonic, so "first offset at/after T onward" equals the
    // oracle's ts-filter. The kafka-wire twin of this resolution (both
    // ListOffsets dialects, vs the file client's index) is pinned by
    // ReplayTimestampSpec.
    GQuery("s74_stream_timestamp_start",
      (s, d) => {
        val mm = Tables.events(s, d)
          .agg(min(Tables.tsUs), max(Tables.tsUs)).head()
        val tMs = (mm.getLong(0) +
          (mm.getLong(1) - mm.getLong(0)) / 5L * 3L) / 1000L
        val log = ReplayLog.ensureLog(s, d)
        runToMemory(
          s.readStream.format("graft-replay").option("path", log)
            .option("startingTimestamp", tMs.toString).load(),
          "append")
          .groupBy(col("partition").cast("long").as("partition"))
          .agg(count(lit(1)).as("n"), min(col("offset")).as("min_offset"),
            min(unix_micros(col("timestamp"))).as("first_ts_us"))
          .orderBy(col("partition"))
      },
      Some("""WITH mm AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
  FROM events),
t AS (SELECT (lo + (hi - lo) // 5 * 3) // 1000 AS tms FROM mm)
SELECT event_id % 3 AS "partition", count(*) AS n,
  min(event_id // 3) AS min_offset,
  min(epoch_us(ts)) AS first_ts_us
FROM events, t WHERE epoch_us(ts) // 1000 >= tms
GROUP BY 1 ORDER BY "partition" NULLS FIRST""")),

    // S23: Kafka-shaped per-partition startingOffsets JSON — partition 0
    // starts at record 10, partition 2 at record 25, partition 1 (unlisted)
    // falls back to earliest. The envelope derivation is deterministic
    // (partition = event_id % 3, offset = event_id div 3, s01's oracle), so
    // the per-partition skip is exactly oracle-expressible.
    GQuery("s23_offsets_json",
      (s, d) => {
        val log = ReplayLog.ensureLog(s, d)
        runToMemory(
          s.readStream.format("graft-replay").option("path", log)
            .option("startingOffsets", """{"0": 10, "2": 25}""").load()
            .select(col("partition").cast("long").as("partition"), col("offset"),
              col("key").cast("string").as("key")),
          "append").orderBy(col("partition"), col("offset"))
      },
      Some("""SELECT event_id % 3 AS "partition", event_id // 3 AS "offset",
  'Key ' || event_id AS key
FROM events
WHERE (event_id % 3 = 0 AND event_id // 3 >= 10)
   OR (event_id % 3 = 1)
   OR (event_id % 3 = 2 AND event_id // 3 >= 25)
ORDER BY "partition" NULLS FIRST, "offset" NULLS FIRST""")),

    // S24: streaming CONTENT dedup over the replay source — the streaming
    // half of X01: distinct payloads survive, replays of the same bytes drop.
    // State is keyed by the md5 of the payload (bounded by distinct-content
    // count, not stream length — at 100 TB add a watermark via
    // dropDuplicatesWithinWatermark as in s18).
    GQuery("s24_stream_content_dedup",
      (s, d) => {
        val log = ReplayLog.ensureLog(s, d)
        runToMemory(
          s.readStream.format("graft-replay").option("path", log).load()
            .select(md5(col("value")).as("h"),
              length(col("value")).cast("long").as("len"))
            .dropDuplicates("h"),
          "append").orderBy(col("h"))
      },
      Some("""SELECT md5(props) AS h, strlen(props) AS len
FROM (SELECT DISTINCT props FROM events)
ORDER BY h NULLS FIRST""")),

    // S48: streaming PERCEPTUAL dedup — the multimodal twin of s24 (exact
    // content dedup) and the streaming face of x40's image near-dup: the
    // dedup key is the 64-bit average-hash of the payload, so perceptually-
    // identical payloads (not just byte-identical ones) collapse to one
    // survivor while the stream runs. State is bounded by DISTINCT aHash
    // count; at 100 TB add dropDuplicatesWithinWatermark as in s18. G-class
    // (no SQL replay of the hash); ImageHashSpec pins streaming ≡ batch.
    GQuery("s48_stream_phash_dedup",
      (s, d) => {
        val log = ReplayLog.ensureLog(s, d)
        runToMemory(
          s.readStream.format("graft-replay").option("path", log).load()
            // h64 only: two DIFFERENT payloads may share an aHash, so any
            // payload-derived column would make the survivor row racy;
            // the distinct-hash set itself is deterministic
            .select(
              graft.functions.GraftFunctions.avg_hash64(col("value")).as("h64"))
            .dropDuplicates("h64"),
          "append").orderBy(col("h64"))
      },
      None),

    // S25: stream-stream INNER join with BOTH sides on the custom replay
    // source — the stateful-join integration path for the DSv2 source (s08's
    // shape uses the file source). The two logs hold the same events in
    // different arrival orders (std vs late-replay), keys are unique per log,
    // so every envelope joins exactly its twin within the ±1h window; the
    // oracle replays both logs' offset assignment in SQL.
    GQuery("s25_replay_stream_join",
      (s, d) => {
        val std = s.readStream.format("graft-replay")
          .option("path", ReplayLog.ensureLog(s, d)).load()
          .select(col("key").cast("string").as("k1"),
            col("timestamp").as("t1"), col("offset").as("o1"))
          .withWatermark("t1", "2 hours")
        val late = s.readStream.format("graft-replay")
          .option("path", ReplayLog.ensureLog(s, d, late = true)).load()
          .select(col("key").cast("string").as("k2"),
            col("timestamp").as("t2"), col("offset").as("o2"))
          .withWatermark("t2", "2 hours")
        runToMemory(
          std.join(late,
            col("k1") === col("k2")
              && col("t2") >= col("t1") - expr("INTERVAL 1 HOUR")
              && col("t2") <= col("t1") + expr("INTERVAL 1 HOUR")),
          "append", noDataBatch = false) // inner join: terminal batch
                                         // evicts only, never emits
          .select(col("k1"), col("o1"), col("o2"))
          .orderBy(col("k1"))
      },
      Some("""SELECT 'Key ' || event_id AS k1,
  event_id // 3 AS o1,
  row_number() OVER (PARTITION BY event_id % 3
    ORDER BY epoch_us(ts) + CASE WHEN event_id % 20 = 0 THEN 7200000000 ELSE 0 END,
             event_id) - 1 AS o2
FROM events
ORDER BY k1 NULLS FIRST""")),

    // S17: stream-stream LEFT OUTER join — the outer-join streaming
    // capability on top of s08's inner shape. Matched pairs emit immediately;
    // an unmatched view emits its null row when the watermark closes its 1h
    // join window. On a bounded run-to-end replay the final watermark is
    // min over BOTH input streams of (max event time, ms floor) − delay, so
    // the emitted set is deterministic and the oracle reproduces it:
    // unmatched views with v_ts + 1h < final watermark get a null row, later
    // ones are still "open" at stop.
    GQuery("s17_stream_stream_left_join",
      (s, d) => {
        val views = eventStream(s, d).filter(col("event_type") === "view")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
        val purchases = eventStream(s, d).filter(col("event_type") === "purchase")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
        runToMemory(
          views.join(purchases,
            col("v_user") === col("p_user")
              && col("p_ts") >= col("v_ts")
              && col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
            "left_outer"),
          "append")
          .select(col("view_id"), col("purchase_id"))
          .orderBy(col("view_id"), col("purchase_id"))
      },
      Some("""WITH v AS (SELECT user_id AS vu, event_id AS vi, epoch_us(ts) AS vus
  FROM events WHERE event_type = 'view'),
p AS (SELECT user_id AS pu, event_id AS pi, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'),
mx AS (SELECT (least((SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'view'),
                     (SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'purchase'))
               - 3600000) * 1000 AS wm_us),
m AS (SELECT vi AS view_id, pi AS purchase_id FROM v JOIN p
  ON vu = pu AND pus >= vus AND pus <= vus + 3600000000),
um AS (SELECT vi AS view_id, CAST(NULL AS BIGINT) AS purchase_id FROM v, mx
  WHERE NOT EXISTS (SELECT 1 FROM p
                    WHERE pu = vu AND pus >= vus AND pus <= vus + 3600000000)
    AND vus + 3600000000 < wm_us)
SELECT view_id, purchase_id FROM m
UNION ALL SELECT view_id, purchase_id FROM um
ORDER BY view_id NULLS FIRST, purchase_id NULLS FIRST""")),

    // S21: stream-stream FULL OUTER join — both unmatched sides emit their
    // null rows as the watermark closes their windows. A view's 1h window
    // closes when v_ts + 1h passes the watermark (as in s17); a purchase can
    // match only views with v_ts ≥ p_ts − 1h, all present once the watermark
    // passes p_ts, so an unmatched purchase emits when p_ts < the final
    // watermark (= min over both inputs of max event time (ms floor) − 1h;
    // empirically pinned).
    GQuery("s21_stream_stream_full_join",
      (s, d) => {
        val views = eventStream(s, d).filter(col("event_type") === "view")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
        val purchases = eventStream(s, d).filter(col("event_type") === "purchase")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
        runToMemory(
          views.join(purchases,
            col("v_user") === col("p_user")
              && col("p_ts") >= col("v_ts")
              && col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
            "full_outer"),
          "append")
          .select(col("view_id"), col("purchase_id"))
          .orderBy(col("view_id"), col("purchase_id"))
      },
      Some("""WITH v AS (SELECT user_id AS vu, event_id AS vi, epoch_us(ts) AS vus
  FROM events WHERE event_type = 'view'),
p AS (SELECT user_id AS pu, event_id AS pi, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'),
mx AS (SELECT (least((SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'view'),
                     (SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'purchase'))
               - 3600000) * 1000 AS wm_us),
m AS (SELECT vi AS view_id, pi AS purchase_id FROM v JOIN p
  ON vu = pu AND pus >= vus AND pus <= vus + 3600000000),
uv AS (SELECT vi AS view_id, CAST(NULL AS BIGINT) AS purchase_id FROM v, mx
  WHERE NOT EXISTS (SELECT 1 FROM p
                    WHERE pu = vu AND pus >= vus AND pus <= vus + 3600000000)
    AND vus + 3600000000 < wm_us),
up AS (SELECT CAST(NULL AS BIGINT) AS view_id, pi AS purchase_id FROM p, mx
  WHERE NOT EXISTS (SELECT 1 FROM v
                    WHERE vu = pu AND pus >= vus AND pus <= vus + 3600000000)
    AND pus < wm_us)
SELECT view_id, purchase_id FROM m
UNION ALL SELECT view_id, purchase_id FROM uv
UNION ALL SELECT view_id, purchase_id FROM up
ORDER BY view_id NULLS FIRST, purchase_id NULLS FIRST""")),

    // S22: stream-stream RIGHT OUTER join — the mirror of s17: matched pairs
    // plus null rows for unmatched purchases once p_ts passes the final
    // watermark (same eviction rule as the purchase side of s21).
    GQuery("s22_stream_stream_right_join",
      (s, d) => {
        val views = eventStream(s, d).filter(col("event_type") === "view")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
        val purchases = eventStream(s, d).filter(col("event_type") === "purchase")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
        runToMemory(
          views.join(purchases,
            col("v_user") === col("p_user")
              && col("p_ts") >= col("v_ts")
              && col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
            "right_outer"),
          "append")
          .select(col("view_id"), col("purchase_id"))
          .orderBy(col("view_id"), col("purchase_id"))
      },
      Some("""WITH v AS (SELECT user_id AS vu, event_id AS vi, epoch_us(ts) AS vus
  FROM events WHERE event_type = 'view'),
p AS (SELECT user_id AS pu, event_id AS pi, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'),
mx AS (SELECT (least((SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'view'),
                     (SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'purchase'))
               - 3600000) * 1000 AS wm_us),
m AS (SELECT vi AS view_id, pi AS purchase_id FROM v JOIN p
  ON vu = pu AND pus >= vus AND pus <= vus + 3600000000),
up AS (SELECT CAST(NULL AS BIGINT) AS view_id, pi AS purchase_id FROM p, mx
  WHERE NOT EXISTS (SELECT 1 FROM v
                    WHERE vu = pu AND pus >= vus AND pus <= vus + 3600000000)
    AND pus < wm_us)
SELECT view_id, purchase_id FROM m
UNION ALL SELECT view_id, purchase_id FROM up
ORDER BY view_id NULLS FIRST, purchase_id NULLS FIRST""")),
  )
}
