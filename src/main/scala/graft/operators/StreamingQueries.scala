package graft.operators

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.{GQuery, Tables}
import graft.sources.replay.ReplayLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._

/** Spark 4 StatefulProcessor for s15: per-user running (count, cents) kept in
  * a typed ValueState — the transformWithState successor of the
  * mapGroupsWithState logic in s09. */
class SpendProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long), (Long, Long, Long)] {
  @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("spend",
      org.apache.spark.sql.Encoders.product[(Long, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { r => n += 1; cents += r._2 }
    st.update((n, cents))
    Iterator((key, n, cents))
  }
}

/** Spark 4 StatefulProcessorWithInitialState for s37: the warm-start
  * migration pattern — per-user running spend whose state is BOOTSTRAPPED
  * from a batch aggregate (the historical half of the corpus) before the
  * stream's first micro-batch, via handleInitialState. At 100 TB this is how
  * a streaming job takes over from a batch pipeline without replaying years
  * of history through the stream. */
class WarmStartSpendProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, (Long, Long), (Long, Long, Long), (Long, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("spend",
      org.apache.spark.sql.Encoders.product[(Long, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInitialState(key: Long, initialState: (Long, Long),
      timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
    st.update(initialState)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { r => n += 1; cents += r._2 }
    st.update((n, cents))
    Iterator((key, n, cents))
  }
}

/** Spark 4 StatefulProcessor for s36: session assembly with EVENT-TIME TIMERS
  * — the transformWithState capability s15 doesn't touch. One ValueState
  * holds the key's OPEN session `(startUs, lastUs, n, cents)`; rows that
  * arrive more than the 30-min gap after `lastUs` close it inline (emitted
  * from handleInputRows, exactly like batch sessionization), and the final
  * open session is closed by a timer registered at `lastUs + gap` that fires
  * when the watermark passes it — Spark's own session_window eviction
  * protocol, hand-built on the public timer API. In-order replay guarantees
  * a timer never fires while in-gap rows are still pending (gap 30 min <
  * watermark delay 1 h). State is O(1) per key; the per-batch row buffer is
  * bounded by the source's admission control. */
class SessionProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, Long), (Long, Long, Long, Long, Long)] {
  @transient private var open:
    org.apache.spark.sql.streaming.ValueState[(Long, Long, Long, Long)] = _
  private val GapUs = 1800000000L

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    open = getHandle.getValueState[(Long, Long, Long, Long)]("open",
      org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  /** Timer slot for a session whose last event is at `lastUs`: the first
    * whole millisecond at-or-after the session end (timers are ms-grain,
    * event times µs-grain). */
  private def expiryMs(lastUs: Long): Long = (lastUs + GapUs + 999L) / 1000L

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(_._2)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    var cur: Option[(Long, Long, Long, Long)] =
      if (open.exists()) Some(open.get()) else None
    cur.foreach(c => getHandle.deleteTimer(expiryMs(c._2)))
    sorted.foreach { case (_, us, cents) =>
      cur match {
        case Some((ss, last, n, cs)) if us - last > GapUs =>
          out += ((key, ss, last + GapUs, n, cs))
          cur = Some((us, us, 1L, cents))
        case Some((ss, last, n, cs)) =>
          cur = Some((ss, math.max(last, us), n + 1, cs + cents))
        case None =>
          cur = Some((us, us, 1L, cents))
      }
    }
    cur.foreach { c => open.update(c); getHandle.registerTimer(expiryMs(c._2)) }
    out.iterator
  }

  override def handleExpiredTimer(key: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[(Long, Long, Long, Long, Long)] = {
    if (open.exists()) {
      val (ss, last, n, cs) = open.get()
      // fire only for the session this timer was armed for — a stale timer
      // must not close a session that has since rolled forward
      if (expiryMs(last) <= expiredTimerInfo.getExpiryTimeInMs) {
        open.clear()
        Iterator((key, ss, last + GapUs, n, cs))
      } else Iterator.empty
    } else Iterator.empty
  }
}

/** Spark 4 StatefulProcessor for s39: per-user MAP state — event_type →
  * (count, cents). MapState is the right shape when the per-key sub-keyspace
  * is unbounded-ish: RocksDB stores each (key, mapKey) pair as its own state
  * row, so updating one event type reads/writes ONE row, not the whole map —
  * a ValueState[Map[...]] would deserialize+rewrite the entire map per row.
  * Emits only the types touched by the batch (update semantics). */
class TypeSpendProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, String, Long), (Long, String, Long, Long)] {
  @transient private var m:
    org.apache.spark.sql.streaming.MapState[String, (Long, Long)] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    m = getHandle.getMapState[String, (Long, Long)]("bytype",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.product[(Long, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, String, Long, Long)] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { case (_, t, cents) =>
      val (n0, c0) = if (m.containsKey(t)) m.getValue(t) else (0L, 0L)
      m.updateValue(t, (n0 + 1, c0 + cents))
      touched += t
    }
    touched.iterator.map { t => val (n, c) = m.getValue(t); (key, t, n, c) }
  }
}

/** Spark 4 StatefulProcessor for s40: a TRUE incremental stream-stream as-of
  * join — both sides arrive as streams, per-key state buffers them, and a
  * probe row emits only once the event-time watermark guarantees every
  * earlier reference row has arrived. This is the operator Structured
  * Streaming lacks natively (its stream-stream joins are equi/interval, not
  * "latest at-or-before"); s28 sidesteps it with per-batch stream-static
  * merges, this processor solves it with bounded state:
  *   - views (probe side) buffer until `view_ms <= watermark`, then match;
  *   - quotes (reference side) evict down to the single latest at-or-before
  *     the watermark plus everything newer — exactly what any future probe
  *     (which must be > watermark) can still reference;
  *   - an event-time timer armed at the earliest pending view fires the
  *     flush when no further input arrives for the key.
  * Emission therefore depends only on the watermark, never on trigger
  * boundaries — the batching-invariance that makes the DuckDB oracle exact.
  * State per key = O(pending-within-watermark + 1), the provable floor for
  * as-of semantics. */
class StreamAsOfProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String, Long, Long), (Long, Long, Option[Long])] {
  @transient private var views:
    org.apache.spark.sql.streaming.ListState[(Long, Long)] = _
  @transient private var quotes:
    org.apache.spark.sql.streaming.ListState[(Long, Long)] = _
  @transient private var tmr:
    org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    val enc = org.apache.spark.sql.Encoders.product[(Long, Long)]
    val ttl = org.apache.spark.sql.streaming.TTLConfig.NONE
    views = getHandle.getListState[(Long, Long)]("views", enc, ttl)
    quotes = getHandle.getListState[(Long, Long)]("quotes", enc, ttl)
    tmr = getHandle.getValueState[Long]("tmr",
      org.apache.spark.sql.Encoders.scalaLong, ttl)
  }

  /** Emit every buffered view at-or-before the watermark (ms grain, matching
    * Spark's timer clock), evict quotes the emitted views were the last
    * possible readers of, and re-arm the timer for the earliest survivor. */
  private def flush(key: Long, wMs: Long)
      : Iterator[(Long, Long, Option[Long])] = {
    val vs = views.get().toArray
    val qs = quotes.get().toArray.sorted
    val (ripe, keep) = vs.partition(v => v._1 / 1000 <= wMs)
    val out = ripe.sorted.map { case (vUs, vId) =>
      var best: Option[Long] = None
      var i = 0
      while (i < qs.length && qs(i)._1 <= vUs) { best = Some(qs(i)._2); i += 1 }
      (key, vId, best)
    }
    views.clear()
    if (keep.nonEmpty) views.put(keep)
    val (old, fresh) = qs.partition(q => q._1 / 1000 <= wMs)
    val kq = old.takeRight(1) ++ fresh
    quotes.clear()
    if (kq.nonEmpty) quotes.put(kq)
    if (tmr.exists()) { getHandle.deleteTimer(tmr.get()); tmr.clear() }
    if (keep.nonEmpty) {
      val t = keep.map(_._1).min / 1000 // fires when watermark >= earliest view
      getHandle.registerTimer(t)
      tmr.update(t)
    }
    out.iterator
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String, Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Option[Long])] = {
    rows.foreach { case (_, kind, us, id) =>
      if (kind == "view") views.appendValue((us, id))
      else quotes.appendValue((us, id))
    }
    flush(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[(Long, Long, Option[Long])] =
    flush(key, timerValues.getCurrentWatermarkInMs())
}

/** The streaming surface (SURVEY.md §2.3 S01–S10): every query is executed as
  * a REAL Structured Streaming job (micro-batch driver, checkpoint, sink) run
  * to completion with `Trigger.AvailableNow`, then the sink table is returned
  * as the result DataFrame. Where the result is batch-expressible the DuckDB
  * oracle validates it exactly (Structured Streaming's prefix-consistency
  * guarantee makes streaming ≡ batch on a bounded replay) — the
  * batch-equivalence oracle class B of SURVEY.md §5.2.
  *
  * S01/S06/S10 run through the custom graft-replay DSv2 source (the
  * reference's own operator); S02–S05/S07–S09 stream the events parquet
  * through Spark's file source. Output modes exercised: append (S01, S05,
  * S08, S10), complete (S02, S03, S04, S06, S07), update (S09).
  */
object StreamingQueries {

  private val ctr = new AtomicInteger(0)

  /** Checkpoint base: tmpfs when available. The checkpoint WAL fsyncs every
    * micro-batch (offset log + commit log + state snapshots); on a disk-backed
    * /tmp that dominates short bounded runs. A production deployment puts
    * checkpoints on durable shared storage — for the bench/verify harness the
    * checkpoint only needs to outlive the run. */
  private[graft] def tmpBase: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Run a streaming DF to completion (AvailableNow) into a memory sink,
    * return the sink contents as a DataFrame.
    *
    * State partitioning: `spark.sql.shuffle.partitions` at stream start fixes
    * the state-store partition count for the query's lifetime (it's baked
    * into the checkpoint). Stateful commit cost per micro-batch is linear in
    * that count, so bounded replays of ~10^5 rows are right-sized at 8
    * partitions — 32 (the batch default here) quadruples per-batch commit
    * overhead for no parallelism gain at this state size. At 100 TB the same
    * knob scales up with cluster size instead. */
  private def runToMemory(df: DataFrame, mode: String): DataFrame = {
    // the 8-partition state sizing lives on the per-parent CLONED session
    // (streamSession) that every query fn here runs on — never set session-
    // globally, which would leak into concurrent batch queries.
    val ckpt = Files.createTempDirectory(tmpBase, "graft-ckpt").toString
    if (mode == "append") {
      // append-mode outputs can be TABLE-sized (the s01/s23/s25 envelopes
      // are |events| rows): a memory sink would collect them all onto the
      // driver — the exact cliff the 100 TB story forbids. The file sink
      // keeps the result distributed end to end (measured s01 sf1 6.1→
      // ~2 s). complete/update aggregates stay on the memory sink: their
      // outputs are aggregate-sized by construction and the file sink
      // cannot replace emitted rows.
      val out = Files.createTempDirectory(tmpBase, "graft-sink").toString
      val q = df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      df.sparkSession.read.schema(df.schema).parquet(out)
    } else {
      val name = s"graft_mem_${ctr.incrementAndGet()}"
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      df.sparkSession.table(name)
    }
  }

  /** Dedicated streaming-harness session per parent session. The state-store
    * partition count of a streaming query is fixed at stream start from
    * `spark.sql.shuffle.partitions` (baked into the checkpoint); bounded
    * replays of ~10^5 rows are right-sized at 8 — per-batch stateful commit
    * cost is linear in the count, and 32 quadruples it for no parallelism
    * gain at this state size. Cloning isolates that knob: the parent session
    * and anything running concurrently on it keep full batch parallelism.
    * At 100 TB the same knob scales with cluster size on the job's own
    * session. `newSession` shares the SparkContext and cached data, so the
    * replay source, parquet reads and the memory sink behave identically. */
  private val harness =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()
  /** Test-visible: StreamMetricsSpec attaches its listener to the harness
    * session (listeners are per-SparkSession) to pin state-row budgets of
    * the registry's streaming queries as they actually run. */
  private[graft] def harnessSession(parent: SparkSession): SparkSession =
    streamSession(parent)
  private def streamSession(parent: SparkSession): SparkSession =
    harness.computeIfAbsent(parent, p => {
      val c = p.newSession()
      c.conf.set("spark.sql.shuffle.partitions", "8")
      c
    })

  /** Streaming envelope from the graft-replay source. */
  private def replayStream(s: SparkSession, d: String,
      maxRowsPerTrigger: Option[Long] = None, late: Boolean = false): DataFrame = {
    val log = ReplayLog.ensureLog(s, d, late)
    val r = s.readStream.format("graft-replay").option("path", log)
    maxRowsPerTrigger.foreach(n => r.option("maxRowsPerTrigger", n.toString))
    r.load()
  }

  /** Streaming events via Spark's file source, normalized like
    * Tables.events (exact ns long + µs TimestampType). The schema is
    * INFERRED from the files on disk (via a batch read), not hard-coded —
    * the driver has regenerated events.ts across encodings (ns-long vs
    * timestamp[us]) and forcing the wrong physical type silently corrupts
    * every event time by 1000× (VERDICT r7). */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(
      s.readStream.schema(Tables.eventSchema(s, d))
        .option("pathGlobFilter", "events.parquet").parquet(d))
  }

  /** Streaming documents via Spark's file source. Schema inferred from the
    * files on disk (never hard-coded — the driver regenerates fixtures
    * across rounds; see Tables.schemaCanary). */
  private def docStream(s: SparkSession, d: String): DataFrame =
    s.readStream.schema(Tables.table(s, d, "documents").schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)

  /** Per-partition admission cap sized for ~6 micro-batches at any scale
    * factor (fixed row counts degenerate into dozens of tiny batches at
    * sf0.1 — 50s of trigger overhead for s05 before this). Parquet metadata
    * count only. */
  private def adaptiveTrigger(s: SparkSession, d: String): Long = {
    val n = Tables.events(s, d).count()
    math.max(50L, n / ReplayLog.NumPartitions / 6)
  }

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
  private def dbl(c: org.apache.spark.sql.Column) = c.cast("double")

  /** Declared queries run verbatim on `streamSession(s)` — see `all`. */
  private val declared: Seq[GQuery] = Seq(

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

    // S05: watermark + late-data drop — adversarial replay (every 20th event
    // arrives 2h late) through the custom source with small micro-batches so
    // the watermark genuinely advances between batches; append-mode tumbling
    // windows. G-class (the dropped set depends on batch boundaries by
    // design); spec-tested for the drop/keep properties.
    GQuery("s05_watermark_late_drop",
      (s, d) => runToMemory(
        replayStream(s, d, maxRowsPerTrigger = Some(adaptiveTrigger(s, d)), late = true)
          .withColumn("ts", col("timestamp"))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n")),
        "append")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"))
        .orderBy(col("ws_sec")),
      None),

    // S05b: the EXACT-oracle twin of s05 (VERDICT r10 #5). Adversarial
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
          "append")
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
        "append")
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
          "append")
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

    // S09: custom stateful aggregation via mapGroupsWithState (update mode):
    // per-user running purchase spend in exact cents.
    GQuery("s09_stateful_agg",
      (s, d) => {
        import s.implicits._
        val typed = eventStream(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), (dec2(col("value")) * 100).cast("long").as("cents"))
          .as[(Long, Long)]
        val updated = typed.groupByKey(_._1)
          .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
            (uid: Long, rows: Iterator[(Long, Long)], st: GroupState[(Long, Long)]) =>
              var (n, cents) = st.getOption.getOrElse((0L, 0L))
              rows.foreach { r => n += 1; cents += r._2 }
              st.update((n, cents))
              (uid, n, cents)
          }.toDF("user_id", "n_purch", "cents")
        val mem = runToMemory(updated, "update")
        // last state emitted per user (multi-batch runs emit one row per batch)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("n_purch").desc)
        mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("n_purch"), col("cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_purch,
  CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // S19: UPDATE-mode windowed aggregation — emits changed windows per
    // batch; on the single-batch bounded run every window emits exactly its
    // final value, so the result matches the complete-mode oracle (s02's).
    GQuery("s19_update_window",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "update")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"), col("sv"))
        .orderBy(col("ws_sec")),
      Some("""SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM events GROUP BY 1 ORDER BY ws_sec NULLS FIRST""")),

    // S20: global (keyless) streaming aggregation — one running state row
    // for the whole stream.
    GQuery("s20_global_agg",
      (s, d) => runToMemory(
        eventStream(s, d)
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv"),
            min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user")),
        "complete"),
      Some("""SELECT count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv,
  min(user_id) AS min_user, max(user_id) AS max_user FROM events""")),

    // S11 (beyond the survey rows): the reference's deserialization-is-the-
    // query's-job design (/root/reference/src/lib.rs:7-12 fixed binary schema;
    // tests/basic_tests.rs:53-56 query-side cast) taken to its real form:
    // opaque envelope bytes -> utf8 -> from_json -> typed aggregation, all
    // inside the streaming query.
    GQuery("s11_envelope_json_decode",
      (s, d) => runToMemory(
        replayStream(s, d)
          .select(from_json(col("value").cast("string"),
            StructType(Seq(StructField("k", IntegerType)))).getField("k").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n")),
        "complete").orderBy(col("k")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
FROM events GROUP BY 1 ORDER BY k NULLS FIRST""")),

    // S12: flatMapGroupsWithState (append mode) — the arbitrary-stateful-
    // processing API emitting zero-or-more rows per group per batch; state is
    // the running (count, cents) per user, the last emission per user is the
    // final state (same reconciliation as S09).
    GQuery("s12_flatmap_state",
      (s, d) => {
        import s.implicits._
        val typed = eventStream(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), (dec2(col("value")) * 100).cast("long").as("cents"))
          .as[(Long, Long)]
        val out = typed.groupByKey(_._1)
          .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
            GroupStateTimeout.NoTimeout()) {
            (uid: Long, rows: Iterator[(Long, Long)], st: GroupState[(Long, Long)]) =>
              var (n, cents) = st.getOption.getOrElse((0L, 0L))
              rows.foreach { r => n += 1; cents += r._2 }
              st.update((n, cents))
              Iterator((uid, n, cents))
          }.toDF("user_id", "n_purch", "cents")
        val mem = runToMemory(out, "append")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("n_purch").desc)
        mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("n_purch"), col("cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_purch,
  CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // S15: transformWithState (Spark 4's arbitrary-stateful-processing API,
    // successor to [flat]mapGroupsWithState): typed ValueState per key,
    // RocksDB state store (required by the operator). Same running-spend
    // semantics as S09/S12 so all three stateful APIs cross-check.
    GQuery("s15_transform_with_state",
      (s, d) => {
        import s.implicits._
        val typed = eventStream(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), (dec2(col("value")) * 100).cast("long").as("cents"))
          .as[(Long, Long)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new SpendProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n_purch", "cents")
        val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val mem = try runToMemory(out, "update")
        finally prevProvider match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("n_purch").desc)
        mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("n_purch"), col("cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_purch,
  CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // S13: streaming union across HETEROGENEOUS sources — the file stream
    // unioned with the custom DSv2 replay stream (event_id reconstructed from
    // the envelope's partition/offset), so every id arrives exactly twice.
    GQuery("s13_stream_union",
      (s, d) => runToMemory(
        eventStream(s, d).select(col("event_id"))
          .unionAll(replayStream(s, d)
            .select((col("offset") * 3 + col("partition")).cast("long").as("event_id")))
          .groupBy((col("event_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n")),
        "complete").orderBy(col("bucket")),
      Some("""SELECT event_id % 10 AS bucket, 2 * count(*) AS n
FROM events GROUP BY 1 ORDER BY bucket NULLS FIRST""")),

    // S14: foreachBatch sink — per-micro-batch handler appending to a parquet
    // table (the "real output" path of SURVEY.md §2.1 sinks), then verified by
    // reading the table back.
    GQuery("s14_foreach_batch_sink",
      (s, d) => {
        val out = Files.createTempDirectory(tmpBase, "graft-fbsink").toString
        val q = eventStream(s, d)
          .select(col("event_id"), col("event_type"))
          .writeStream.outputMode("append")
          .option("checkpointLocation",
            Files.createTempDirectory(tmpBase, "graft-ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.write.mode("append").parquet(out); ()
          }
          .start()
        q.awaitTermination()
        s.read.parquet(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n, max(event_id) AS max_id
FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    // S34: exactly-once twin of S14 — the same foreachBatch parquet sink but
    // idempotent on batchId (dynamic partition overwrite on `_batch_id`), so
    // a batch replayed after a crash-between-write-and-commit overwrites
    // itself instead of duplicating. ExactlyOnceSinkSpec kill-tests the
    // restart path; here the happy path must stay oracle-exact.
    GQuery("s34_idempotent_sink",
      (s, d) => {
        val out = Files.createTempDirectory(tmpBase, "graft-eosink").toString
        val q = replayStream(s, d, maxRowsPerTrigger = Some(adaptiveTrigger(s, d)))
          .select(col("partition"), col("offset"),
            col("value").cast("string").as("props"))
          .writeStream.outputMode("append")
          .option("checkpointLocation",
            Files.createTempDirectory(tmpBase, "graft-ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch(graft.streaming.IdempotentSink.parquet(out) _)
          .start()
        q.awaitTermination()
        graft.streaming.IdempotentSink.read(s, out)
          .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
          .agg(count(lit(1)).as("n"), max(col("offset")).as("max_off"))
          .orderBy(col("k"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
  count(*) AS n, max(event_id // 3) AS max_off
FROM events GROUP BY 1 ORDER BY k NULLS FIRST""")),

    // S35: the replay stream consumed over a REAL network hop — the declared
    // twin of s01/s23 running through `client=socket` against an in-process
    // TCP broker double (length-prefixed frames, the reference's transport
    // shape). Same offsets, same admission, same checkpointing; the only
    // difference is the wire. The oracle is the same envelope arithmetic as
    // s23 (partition = event_id % 3, offset = event_id // 3).
    GQuery("s35_socket_replay",
      (s, d) => {
        val log = ReplayLog.ensureLog(s, d)
        val server = new graft.sources.replay.SocketLogServer(log)
        try {
          runToMemory(
            s.readStream.format("graft-replay")
              .option("client", "socket").option("path", server.address)
              .option("maxRowsPerTrigger", adaptiveTrigger(s, d).toString)
              .load()
              .select(col("partition").cast("long").as("partition"), col("offset"),
                col("key").cast("string").as("key"),
                length(col("value").cast("string")).cast("long").as("vlen")),
            "append").orderBy(col("partition"), col("offset"))
        } finally server.close()
      },
      Some("""SELECT event_id % 3 AS "partition", event_id // 3 AS "offset",
  'Key ' || event_id AS key, len(props) AS vlen
FROM events
ORDER BY "partition" NULLS FIRST, "offset" NULLS FIRST""")),

    // S37: warm-start state bootstrap — transformWithState with
    // initialState: the even-event_id half of purchase history is aggregated
    // BATCH-side and loaded through handleInitialState; only the odd half
    // streams. The oracle totals BOTH halves per user (restricted to users
    // the stream actually touches), so a correct result is impossible unless
    // the batch bootstrap landed in the state store before batch 0.
    GQuery("s37_warm_start_state",
      (s, d) => {
        import s.implicits._
        val cents = (dec2(col("value")) * 100).cast("long")
        val hist = Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("event_id") % 2 === 0)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(cents).as("cents"))
          .as[(Long, Long, Long)]
          .groupByKey(_._1).mapValues(r => (r._2, r._3))
        val streamed = eventStream(s, d)
          .filter(col("event_type") === "purchase" && col("event_id") % 2 === 1)
          .select(col("user_id"), cents.as("cents"))
          .as[(Long, Long)]
        val out = streamed.groupByKey(_._1)
          .transformWithState(new WarmStartSpendProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update(), hist)
          .toDF("user_id", "n_purch", "cents")
        val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val mem = try runToMemory(out, "update")
        finally prevProvider match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("n_purch").desc)
        mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("n_purch"), col("cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_purch,
  CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
FROM events WHERE event_type = 'purchase'
  AND user_id IN (SELECT user_id FROM events
                  WHERE event_type = 'purchase' AND event_id % 2 = 1)
GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // S36: event-time TIMERS on transformWithState — hand-built session
    // windows (SessionProcessor): gap-closed sessions emit inline, the
    // trailing open session emits when the watermark passes its end via a
    // registered timer (exactly session_window's append-mode eviction, so
    // the oracle is s33's with one extra clause: a user's non-final sessions
    // always emit, the final one only if end <= watermark). RocksDB state
    // store (required by the operator).
    GQuery("s36_timer_sessionize",
      (s, d) => {
        import s.implicits._
        val typed = eventStream(s, d)
          .withWatermark("ts", "1 hour")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            (dec2(col("value")) * 100).cast("long").as("cents"))
          .as[(Long, Long, Long)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new SessionProcessor,
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF("user_id", "ss_us", "se_us", "n", "cents")
        val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val mem = try runToMemory(out, "append")
        finally prevProvider match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        mem.orderBy(col("user_id"), col("ss_us"))
      },
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
l AS (SELECT user_id, us, value,
  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
       THEN 1 ELSE 0 END AS nf FROM e),
g AS (SELECT user_id, us, value, SUM(nf) OVER (PARTITION BY user_id ORDER BY us
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l),
sess AS (SELECT user_id, sid, min(us) AS ss_us, max(us) + 1800000000 AS se_us,
    count(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
  FROM g GROUP BY user_id, sid),
mx AS (SELECT user_id, max(sid) AS msid FROM sess GROUP BY user_id)
SELECT s.user_id, s.ss_us, s.se_us, s.n, s.cents
FROM sess s JOIN mx ON s.user_id = mx.user_id, wm
WHERE s.sid < mx.msid OR s.se_us <= wm_ms * 1000
ORDER BY s.user_id NULLS FIRST, s.ss_us NULLS FIRST""")),

    // S30: streaming incremental dedup — the streaming half of X18: arriving
    // documents anti-join the STATIC historical hash index (stream-static
    // left anti keeps no state), then self-dedup within the stream by
    // content hash. The ingest-side shape of nightly dedup: history probes
    // are per-batch, stream state is bounded by distinct NEW content.
    GQuery("s30_stream_incremental_dedup",
      (s, d) => {
                val hist = Tables.table(s, d, "documents")
          .filter(col("doc_id") % 10 =!= 7).select(md5(col("text")).as("h"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        hist.count()
        val fresh = docStream(s, d)
          .filter(col("doc_id") % 10 === 7)
          .select(col("doc_id"), md5(col("text")).as("h"))
        // aggregate over the hash SET (deterministic) — which doc_id
        // represents a duplicated hash depends on arrival order
        runToMemory(
          fresh.join(hist, Seq("h"), "left_anti").dropDuplicates("h"),
          "append")
          .agg(count(lit(1)).as("n_new"), min(col("h")).as("min_h"),
            max(col("h")).as("max_h"))
      },
      Some("""WITH fresh AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 7),
hist AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 10 <> 7),
surv AS (SELECT DISTINCT h FROM fresh WHERE h NOT IN (SELECT h FROM hist))
SELECT count(*) AS n_new, min(h) AS min_h, max(h) AS max_h FROM surv""")),

    // S29: streaming sketch rollup — the streaming half of X11: per-type HLL
    // sketches build incrementally in a complete-mode agg (mergeable binary
    // state — shuffle volume is sketch bytes, not row count). HLL registers
    // are a MAX over hashed values, so the estimate is ORDER- and
    // BATCHING-invariant: PipelineSpec pins streaming == batch exactly.
    // G-class by design (approx estimates are outside the DuckDB oracle).
    GQuery("s29_stream_sketch",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(col("event_type"))
          .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
            .as("est")),
        "complete").orderBy(col("event_type")),
      None),

    // S28: streaming as-of enrichment — the custom AsOfJoin merge operator
    // (graft.plans, q71's plan) running INSIDE a streaming pipeline: each
    // micro-batch of 'view' events as-of joins the static 'purchase' table
    // in foreachBatch and appends to parquet. Stream-static per batch, so
    // results are batching-invariant (the only deterministic as-of shape
    // Structured Streaming admits — state-based streaming as-of would make
    // results depend on trigger boundaries). Exercises the custom
    // LogicalPlan+Strategy+merge SparkPlan on the streaming path.
    GQuery("s28_stream_asof_enrich",
      (s, d) => {
        val quotes = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id").as("q_user"), Tables.tsUs.as("q_us"),
            col("event_id").as("q_id"))
        val out = Files.createTempDirectory(tmpBase, "graft-asof-sink").toString
        val q = eventStream(s, d).filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), Tables.tsUs.as("v_us"))
          .writeStream.outputMode("append")
          .option("checkpointLocation",
            Files.createTempDirectory(tmpBase, "graft-ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.plans.AsOfJoin(batch, quotes,
                "user_id", "v_us", "q_user", "q_us", "q_id",
                toleranceUs = 30L * 86400000000L)
              .select(col("event_id"), col("q_id"), col("q_us"))
              .write.mode("append").parquet(out)
            ()
          }
          .start()
        q.awaitTermination()
        s.read.parquet(out).orderBy(col("event_id"))
      },
      Some("""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'),
q AS (SELECT user_id AS q_user, event_id AS q_id, epoch_us(ts) AS q_us
  FROM events WHERE event_type = 'purchase'),
cand AS (SELECT event_id, q_id, q_us,
    row_number() OVER (PARTITION BY event_id ORDER BY q_us DESC, q_id DESC) AS rn
  FROM v JOIN q ON q_user = user_id
    AND q_us <= v_us AND q_us >= v_us - 2592000000000)
SELECT v.event_id, c.q_id, c.q_us
FROM v LEFT JOIN cand c ON v.event_id = c.event_id AND c.rn = 1
ORDER BY v.event_id NULLS FIRST""")),

    // S26: streaming quality routing — the streaming half of the X14
    // repetition/quality filter: documents arrive continuously, each is
    // scored with per-row expressions (no state), and a complete-mode agg
    // tracks the keep/drop token budget per language. At 100 TB the verdict
    // column routes to per-quality sinks via foreachBatch (s14's shape);
    // the scoring itself streams at scan speed.
    GQuery("s26_stream_quality_route",
      (s, d) => {
                val docs = docStream(s, d)
        val scored = docs
          .withColumn("w", split(col("text"), " "))
          .withColumn("keep", size(col("w")) >= 10 &&
            size(array_distinct(col("w"))).cast("double") / size(col("w")).cast("double") >= 0.4)
        runToMemory(
          scored.groupBy(col("lang"), col("keep"))
            .agg(count(lit(1)).as("n_docs"),
              sum(size(col("w")).cast("long")).as("n_tokens")),
          "complete").orderBy(col("lang"), col("keep"))
      },
      Some("""WITH sc AS (SELECT lang, len(string_split(text, ' ')) AS nw,
    len(string_split(text, ' ')) >= 10 AND
      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')) >= 0.4 AS keep
  FROM documents)
SELECT lang, keep, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS n_tokens
FROM sc GROUP BY lang, keep
ORDER BY lang NULLS FIRST, keep NULLS FIRST""")),

    // S27: streaming decontamination — the streaming half of X13: documents
    // stream in, their 3-gram shingles probe a STATIC broadcast eval set
    // (stream-static joins never keep state; the eval side loads once per
    // micro-batch plan), and a complete-mode agg tracks per-doc hit counts.
    // State is bounded by CONTAMINATED docs only (the inner join drops clean
    // grams before the agg) — rare by construction at 100 TB.
    GQuery("s27_stream_decontaminate",
      (s, d) => {
                // persist the static side: a stream-static join re-executes the
        // static plan EVERY micro-batch — without this the eval shingle agg
        // replays per trigger (measured 9 s → ~3 s for the bounded run)
        val evalGrams = graft.GraftOps.shingles(
            Tables.table(s, d, "documents").filter(col("doc_id") % 20 === 0),
            col("doc_id"), col("text"), k = 3)
          .select(explode(col("sh")).as("g")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        evalGrams.count()
        // the native one-pass shingle expression (codegen; ExpressionsSpec
        // pins it ≡ the split/transform/array_distinct chain) — the HOF
        // form re-evaluated split(text) inside the transform lambda, an
        // O(words²) per-row cost that dominated the batch at scale
        // (s27 sf1: 14.7 s → see SCALE.md round 9)
        val streamGrams = docStream(s, d)
          .filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id"),
            explode(graft.functions.GraftFunctions
              .word_shingles(col("text"), 3)).as("g"))
        runToMemory(
          streamGrams.join(broadcast(evalGrams), "g")
            .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits")),
          "complete").orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0)
SELECT doc_id, count(*) AS n_hits FROM tr JOIN ev USING (g)
GROUP BY doc_id ORDER BY doc_id NULLS FIRST""")),

    // S38: CHAINED stateful operators in one streaming query — streaming
    // dedup feeding a windowed aggregation, both with event-time state, in
    // append mode (Spark's multiple-stateful-operator support; watermark is
    // propagated between the operators, so each evicts independently). The
    // duplicates are injected structurally: the same file stream unioned
    // with itself, so every row arrives exactly twice and the dedup must
    // remove exactly half. Downstream windows then match the s31 oracle:
    // a window emits iff it CLOSED under the final watermark. At 100 TB this
    // is the standard ingest topology — dedup-at-the-edge into windowed
    // rollups as ONE checkpointed query instead of two jobs with a table
    // in between.
    GQuery("s38_chained_stateful",
      (s, d) => runToMemory(
        eventStream(s, d).select(col("event_id"), col("ts"), col("value"))
          .unionAll(eventStream(s, d).select(col("event_id"), col("ts"), col("value")))
          .withWatermark("ts", "1 hour")
          .dropDuplicates("event_id", "ts")
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

    // S39: transformWithState with MAP state — per-user spend broken out by
    // event type. Each (user, type) lives as its own RocksDB state row
    // (see TypeSpendProcessor), the update-mode twin of a two-column groupBy:
    // the memory sink keeps every batch's emission, so the final value per
    // (user, type) is the max-count row, exactly like s15's running totals.
    GQuery("s39_map_state_spend",
      (s, d) => {
        import s.implicits._
        val typed = eventStream(s, d)
          .select(col("user_id"), col("event_type"),
            (dec2(col("value")) * 100).cast("long").as("cents"))
          .as[(Long, String, Long)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new TypeSpendProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "event_type", "n", "cents")
        val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val mem = try runToMemory(out, "update")
        finally prevProvider match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type")).orderBy(col("n").desc)
        mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("n"), col("cents"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
FROM events GROUP BY user_id, event_type
ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""")),

    // S10: processing pacing + run-to-end — bounded micro-batches
    // (maxRowsPerTrigger ≡ batch_size, execution.rs:87) until EOF
    // (AvailableNow ≡ PartitionEOF stop, execution.rs:93-96); per-partition
    // totals prove every offset range was delivered exactly once.
    GQuery("s10_bounded_replay",
      (s, d) => runToMemory(
        replayStream(s, d, maxRowsPerTrigger = Some(adaptiveTrigger(s, d))),
        "append")
        .groupBy(col("partition").cast("long").as("partition"))
        .agg(count(lit(1)).as("n"), max(col("offset")).as("max_offset"),
          countDistinct(col("offset")).as("n_offsets"))
        .orderBy(col("partition")),
      Some("""SELECT event_id % 3 AS "partition", count(*) AS n,
  max(event_id // 3) AS max_offset, count(DISTINCT event_id // 3) AS n_offsets
FROM events GROUP BY 1 ORDER BY "partition" NULLS FIRST""")),

    // S40: TRUE incremental stream-stream AS-OF join ([[StreamAsOfProcessor]])
    // — 'view' probes match the latest at-or-before 'purchase' on the SAME
    // stream key, with both sides arriving as streams and per-key state doing
    // the buffering/eviction. Emission gates on the event-time watermark
    // (never on trigger boundaries), so the result is batching-invariant and
    // the oracle is exact: views newer than the final watermark stay pending
    // (the same cutoff rule as s36, modeled by the `wm` CTE). Quote state
    // evicts to one-latest-behind-watermark + newer — the provable floor for
    // as-of semantics — so state is bounded by the watermark delay, not the
    // stream length.
    GQuery("s40_stream_asof_join",
      (s, d) => {
        import s.implicits._
        val typed = eventStream(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .withWatermark("ts", "1 hour")
          .select(col("user_id"), col("event_type"),
            Tables.tsUs.as("us"), col("event_id"))
          .as[(Long, String, Long, Long)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new StreamAsOfProcessor,
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF("user_id", "view_id", "q_id")
        val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val mem = try runToMemory(out, "append")
        finally prevProvider match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        mem.select(col("user_id"), col("view_id"), col("q_id"))
          .orderBy(col("view_id"))
      },
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
v AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'),
q AS (SELECT user_id, event_id AS q_id, epoch_us(ts) AS q_us
  FROM events WHERE event_type = 'purchase'),
ripe AS (SELECT v.* FROM v, wm WHERE v_us // 1000 <= wm_ms),
cand AS (SELECT ripe.view_id, q.q_id,
    row_number() OVER (PARTITION BY ripe.view_id
      ORDER BY q.q_us DESC, q.q_id DESC) AS rn
  FROM ripe JOIN q ON q.user_id = ripe.user_id AND q.q_us <= ripe.v_us)
SELECT r.user_id, r.view_id, c.q_id
FROM ripe r LEFT JOIN cand c ON r.view_id = c.view_id AND c.rn = 1
ORDER BY r.view_id NULLS FIRST""")),

    // S42: DYNAMIC-GAP session windows — the gap is a per-row expression
    // (views cool off in 15 min, other events hold a session 45 min), so
    // sessions are interval UNIONS of [ts, ts+gap(row)) rather than a fixed
    // timeout chain. Spark's session_window accepts the gap as a Column;
    // the oracle replays the same union with a running MAX(us+gap) over
    // preceding rows (a fixed-gap lag() check cannot express this). The
    // production use: engagement-dependent session semantics without a
    // custom processor.
    GQuery("s42_dynamic_gap_session",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(session_window(col("ts"),
            when(col("event_type") === "view", "15 minutes")
              .otherwise("45 minutes")), col("user_id"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sv")),
        "complete")
        .select(col("user_id"), col("session_window.start").cast("long").as("ss"),
          col("session_window.end").cast("long").as("se"), col("n"), col("sv"))
        .orderBy(col("user_id"), col("ss")),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value,
    CASE WHEN event_type = 'view' THEN 900000000 ELSE 2700000000 END AS gap
  FROM events),
m AS (SELECT user_id, event_id, us, value, gap,
    MAX(us + gap) OVER (PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pend
  FROM e),
l AS (SELECT user_id, event_id, us, value, gap, pend,
    CASE WHEN pend IS NULL OR us > pend THEN 1 ELSE 0 END AS nf FROM m),
g AS (SELECT user_id, us, value, gap,
    SUM(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM l)
SELECT user_id, min(us) // 1000000 AS ss, max(us + gap) // 1000000 AS se,
  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
FROM g GROUP BY user_id, sid
ORDER BY user_id NULLS FIRST, ss NULLS FIRST""")),

    // S43: STREAMING Bloom build — the eval-set filter of x29 maintained as a
    // continuously-updated complete-mode aggregate: benchmark docs arrive as
    // a stream, their shingles fold into the mergeable BloomAgg binary, and
    // every trigger emits the current filter (md5-fingerprinted here; the
    // production sink publishes the bytes for the corpus-side probe jobs).
    // Bit-OR merge makes the result independent of batching/partitioning —
    // BloomSpec pins the streamed binary EQUAL to the batch build. The
    // nightly-decontamination shape: the filter stays current as benchmarks
    // grow, with no rebuild-the-world step.
    GQuery("s43_stream_bloom",
      (s, d) => {
                val docs = docStream(s, d)
        val bf = docs.filter(col("doc_id") % 20 === 0)
          .select(explode(graft.functions.GraftFunctions
            .word_shingles(col("text"), 3)).as("g"))
          .agg(graft.functions.GraftFunctions
            .bloom_agg(col("g"), 20000L, 0.01).as("bf"),
            count(lit(1)).as("n_shingles"))
        runToMemory(bf, "complete")
          .select(md5(col("bf")).as("bloom_md5"), col("n_shingles"))
      },
      None),

    // S41: streaming windowed TOP-K through the custom TypedImperativeAggregate
    // (q63's TopKAgg) — proves the O(k)-state binary-accumulator UDAF runs
    // unchanged on the streaming path (partial aggregation + state-store
    // merge per window). Complete mode; the top-3 cents arrays leave as
    // comma-joined strings (arrays never reach a hashed output raw). At
    // 100 TB the per-window state is k longs however many events land in the
    // window — the whole point of the bounded accumulator.
    GQuery("s41_stream_window_topk",
      (s, d) => runToMemory(
        eventStream(s, d)
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(graft.functions.GraftFunctions.topk_vals(
            (dec2(col("value")) * 100).cast("long"), 3).as("top3"),
            count(lit(1)).as("n")),
        "complete")
        .select(col("window.start").cast("long").as("ws_sec"), col("n"),
          // TopKAgg accumulates doubles; the cents are integral, so the
          // element cast back to BIGINT is exact
          concat_ws(",", expr("transform(top3, v -> CAST(v AS BIGINT))"))
            .as("top3_cents"))
        .orderBy(col("ws_sec")),
      Some("""SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, count(*) AS n,
  array_to_string((list(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
    ORDER BY CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) DESC))[1:3],
    ',') AS top3_cents
FROM events GROUP BY 1 ORDER BY ws_sec NULLS FIRST""")),

    // S44: streaming distribution-drift monitor — x35's PSI gate on the live
    // path. The stream maintains day-windowed event_type counts (complete
    // mode; bounded state: |days|×|types| rows); the PSI against the corpus
    // baseline mix is the dashboard projection over the sink — Structured
    // Streaming forbids chained aggregations, and the reduction over a
    // ~|days|×|types| table is exactly what belongs batch-side. Absent
    // (day, type) cells are restored by a generated spine with Laplace
    // smoothing ((c+0.5)/(n+T/2)) so a type that vanishes intra-day still
    // drives PSI up instead of silently dropping out; ln sums rounded
    // decimal(18,6) (the x27/x35 convention). At 100 TB: the windowed-count
    // state is tiny however large the input, and the baseline join is a
    // broadcast of |types| rows.
    GQuery("s44_stream_drift",
      (s, d) => {
        val winCounts = runToMemory(
          eventStream(s, d)
            .groupBy(window(col("ts"), "1 day"), col("event_type"))
            .agg(count(lit(1)).as("c")),
          "complete")
          .select(to_date(col("window.start")).as("day"),
            col("event_type"), col("c"))
        val base = Tables.events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("cb"))
        val nAll = base.agg(sum(col("cb")).as("nb"),
          count(lit(1)).cast("double").as("nt"))
        val baseP = base.crossJoin(broadcast(nAll))
          .select(col("event_type"),
            (col("cb").cast("double") / col("nb")).as("pb"), col("nt"))
        val spine = winCounts.select(col("day")).distinct()
          .crossJoin(broadcast(baseP))
        val filled = spine.join(winCounts, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"), col("pb"), col("nt"),
            coalesce(col("c"), lit(0L)).as("c"))
        val withP = filled
          .withColumn("n", sum(col("c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("day"))))
          .withColumn("p", (col("c") + lit(0.5d)) /
            (col("n") + lit(0.5d) * col("nt")))
        withP.groupBy(col("day"))
          .agg(sum(col("c")).as("n_events"),
            sum((col("p") - col("pb")) * log(col("p") / col("pb")))
              .cast("decimal(18,6)").cast("double").as("psi"))
          .withColumn("band",
            when(col("psi") < 0.1, "stable")
              .when(col("psi") < 0.25, "moderate").otherwise("drifted"))
          .orderBy(col("day"))
      },
      Some("""WITH wc AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
  FROM events GROUP BY 1, 2),
base AS (SELECT event_type, count(*) AS cb FROM events GROUP BY 1),
n0 AS (SELECT CAST(sum(cb) AS DOUBLE) AS nb,
    CAST(count(*) AS DOUBLE) AS nt FROM base),
bp AS (SELECT event_type, CAST(cb AS DOUBLE) / nb AS pb, nt FROM base, n0),
spine AS (SELECT d.day, b.event_type, b.pb, b.nt
  FROM (SELECT DISTINCT day FROM wc) d, bp b),
filled AS (SELECT s.day, s.event_type, s.pb, s.nt, coalesce(w.c, 0) AS c
  FROM spine s LEFT JOIN wc w USING (day, event_type)),
wp AS (SELECT day, pb, c,
    (c + 0.5) / (sum(c) OVER (PARTITION BY day) + 0.5 * nt) AS p
  FROM filled),
agg AS (SELECT day, CAST(sum(c) AS BIGINT) AS n_events,
    CAST(CAST(sum((p - pb) * ln(p / pb)) AS DECIMAL(18,6)) AS DOUBLE) AS psi
  FROM wp GROUP BY 1)
SELECT day, n_events, psi,
  CASE WHEN psi < 0.1 THEN 'stable'
       WHEN psi < 0.25 THEN 'moderate' ELSE 'drifted' END AS band
FROM agg ORDER BY day NULLS FIRST""")),

    // S44b: the append+watermark eviction twin of s44 (the s31–s33/s51b
    // pattern applied to the drift monitor): day-windowed type counts emit
    // once when the day CLOSES (end ≤ watermark) and their state evicts, so
    // a monitor that runs for years holds only the open day's |types| rows
    // instead of every day ever seen. The PSI projection runs over the
    // emitted (closed) days only — the trailing partial day is not scored,
    // which is also the statistically honest choice (its mix is a partial
    // sample). Oracle = s44's SQL restricted by the window-closure rule.
    GQuery("s44b_stream_drift_append",
      (s, d) => {
        val winCounts = runToMemory(
          eventStream(s, d)
            .withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 day"), col("event_type"))
            .agg(count(lit(1)).as("c")),
          "append")
          .select(to_date(col("window.start")).as("day"),
            col("event_type"), col("c"))
        val base = Tables.events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("cb"))
        val nAll = base.agg(sum(col("cb")).as("nb"),
          count(lit(1)).cast("double").as("nt"))
        val baseP = base.crossJoin(broadcast(nAll))
          .select(col("event_type"),
            (col("cb").cast("double") / col("nb")).as("pb"), col("nt"))
        val spine = winCounts.select(col("day")).distinct()
          .crossJoin(broadcast(baseP))
        val filled = spine.join(winCounts, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"), col("pb"), col("nt"),
            coalesce(col("c"), lit(0L)).as("c"))
        val withP = filled
          .withColumn("n", sum(col("c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("day"))))
          .withColumn("p", (col("c") + lit(0.5d)) /
            (col("n") + lit(0.5d) * col("nt")))
        withP.groupBy(col("day"))
          .agg(sum(col("c")).as("n_events"),
            sum((col("p") - col("pb")) * log(col("p") / col("pb")))
              .cast("decimal(18,6)").cast("double").as("psi"))
          .withColumn("band",
            when(col("psi") < 0.1, "stable")
              .when(col("psi") < 0.25, "moderate").otherwise("drifted"))
          .orderBy(col("day"))
      },
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
wc AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
  FROM events, wm
  GROUP BY 1, 2, wm_ms
  HAVING (epoch(CAST(day AS TIMESTAMP)) + 86400) * 1000 <= wm_ms),
base AS (SELECT event_type, count(*) AS cb FROM events GROUP BY 1),
n0 AS (SELECT CAST(sum(cb) AS DOUBLE) AS nb,
    CAST(count(*) AS DOUBLE) AS nt FROM base),
bp AS (SELECT event_type, CAST(cb AS DOUBLE) / nb AS pb, nt FROM base, n0),
spine AS (SELECT d.day, b.event_type, b.pb, b.nt
  FROM (SELECT DISTINCT day FROM wc) d, bp b),
filled AS (SELECT s.day, s.event_type, s.pb, s.nt, coalesce(w.c, 0) AS c
  FROM spine s LEFT JOIN wc w USING (day, event_type)),
wp AS (SELECT day, pb, c,
    (c + 0.5) / (sum(c) OVER (PARTITION BY day) + 0.5 * nt) AS p
  FROM filled),
agg AS (SELECT day, CAST(sum(c) AS BIGINT) AS n_events,
    CAST(CAST(sum((p - pb) * ln(p / pb)) AS DECIMAL(18,6)) AS DOUBLE) AS psi
  FROM wp GROUP BY 1)
SELECT day, n_events, psi,
  CASE WHEN psi < 0.1 THEN 'stable'
       WHEN psi < 0.25 THEN 'moderate' ELSE 'drifted' END AS band
FROM agg ORDER BY day NULLS FIRST""")),

    // S45: streaming funnel — live conversion tracking as ONE streaming
    // aggregation: per user, the earliest view/click/purchase event times
    // (conditional mins, state = 3 longs per user however long the stream
    // runs), with the stage classification and cohort rollup as the batch
    // projection over the sink. Ordered-MIN semantics (stage counts only if
    // the mins occur in funnel order) — the deliberate streaming relaxation
    // of q101's strict sequential-min walk: q101 anchors each stage on the
    // previous stage's chosen event; here stages anchor on global mins,
    // which one bounded state row per user can maintain incrementally.
    GQuery("s45_stream_funnel",
      (s, d) => {
        val perUser = runToMemory(
          eventStream(s, d)
            .withColumn("ts_us", expr("unix_micros(ts)"))
            .groupBy(col("user_id"))
            .agg(min(when(col("event_type") === "view", col("ts_us"))).as("tv"),
              min(when(col("event_type") === "click", col("ts_us"))).as("tc"),
              min(when(col("event_type") === "purchase", col("ts_us"))).as("tp")),
          "complete")
        perUser.filter(col("tv").isNotNull)
          .select(col("user_id"),
            when(col("tc") > col("tv") && col("tp") > col("tc"), 3L)
              .when(col("tc") > col("tv"), 2L).otherwise(1L).as("stage"),
            when(col("tc") > col("tv") && col("tp") > col("tc"),
              col("tp") - col("tv")).as("conv_us"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("conv_us")).as("total_conv_us"))
          .orderBy(col("stage"))
      },
      Some("""WITH pu AS (SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
  FROM events GROUP BY 1),
staged AS (SELECT user_id,
    CASE WHEN tc > tv AND tp > tc THEN 3
         WHEN tc > tv THEN 2 ELSE 1 END AS stage,
    CASE WHEN tc > tv AND tp > tc THEN tp - tv END AS conv_us
  FROM pu WHERE tv IS NOT NULL)
SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_users,
  CAST(sum(conv_us) AS BIGINT) AS total_conv_us
FROM staged GROUP BY 1 ORDER BY stage NULLS FIRST""")),

    // S46: streaming OHLC bars — q105's candlesticks maintained LIVE. The
    // batch form selects endpoints with row_number windows; a stream can't
    // sort, so open/close become min/max over an ORDERABLE STRUCT
    // (ts_us, event_id, v2): lexicographic struct comparison makes "row with
    // the earliest/latest timestamp" an associative, mergeable aggregate —
    // constant state per window (two structs + two decimals + a count), any
    // batching order. The same trick is the scale path for batch too when
    // the day partitioning isn't the table layout.
    GQuery("s46_stream_ohlc",
      (s, d) => {
        val bars = runToMemory(
          eventStream(s, d)
            .withColumn("ts_us", expr("unix_micros(ts)"))
            .withColumn("v2", dec2(col("value")))
            .groupBy(window(col("ts"), "1 day"))
            .agg(min(struct(col("ts_us"), col("event_id"), col("v2"))).as("o"),
              max(struct(col("ts_us"), col("event_id"), col("v2"))).as("c"),
              max(col("v2")).as("hi"), min(col("v2")).as("lo"),
              count(lit(1)).as("n")),
          "complete")
        bars.select(to_date(col("window.start")).as("day"),
            dbl(col("o.v2")).as("open"), dbl(col("hi")).as("high"),
            dbl(col("lo")).as("low"), dbl(col("c.v2")).as("close"), col("n"))
          .orderBy(col("day"))
      },
      Some("""WITH e AS (SELECT CAST(ts AS DATE) AS day, event_id,
    epoch_us(ts) AS ts_us, CAST(value AS DECIMAL(12,2)) AS v2 FROM events),
r AS (SELECT day, v2,
    row_number() OVER (PARTITION BY day ORDER BY ts_us, event_id) AS rn_o,
    row_number() OVER (PARTITION BY day ORDER BY ts_us DESC, event_id DESC)
      AS rn_c
  FROM e)
SELECT day, CAST(max(CASE WHEN rn_o = 1 THEN v2 END) AS DOUBLE) AS open,
  CAST(max(v2) AS DOUBLE) AS high, CAST(min(v2) AS DOUBLE) AS low,
  CAST(max(CASE WHEN rn_c = 1 THEN v2 END) AS DOUBLE) AS close,
  count(*) AS n
FROM r GROUP BY 1 ORDER BY day NULLS FIRST""")),

    // S47: LIVE table checksum — q106's order-invariant md5-XOR fold
    // maintained as a streaming complete-mode aggregate: every trigger emits
    // the current (count, checksum) of everything ingested so far, 16 bytes
    // of state regardless of volume. XOR's associativity+commutativity is
    // what makes the same number come out of any batching, any partitioning,
    // and the batch replay — so a replica ingesting the same frames can be
    // compared MID-STREAM, not just at rest. Oracle = the batch fold over
    // the full table (availableNow runs the stream to the same endpoint).
    GQuery("s47_stream_checksum",
      (s, d) => runToMemory(
        eventStream(s, d)
          .select(expr(
            """CAST(conv(substr(md5(concat_ws('|', event_id,
              |  unix_micros(ts), user_id, event_type,
              |  CAST(CAST(value AS DECIMAL(12,2)) AS STRING))), 1, 15),
              |  16, 10) AS BIGINT)""".stripMargin).as("h"))
          .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum")),
        "complete"),
      Some("""SELECT count(*) AS n_rows,
  bit_xor(CAST(concat('0x', substr(md5(concat_ws('|', event_id,
    epoch_us(ts), user_id, event_type,
    CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR))), 1, 15)) AS BIGINT))
    AS checksum
FROM events""")),

    // S49: streaming quality-ensemble scoring — x47's weak-signal scorer on
    // the LIVE document path: per-row arithmetic only (no state), APPEND
    // mode through the distributed parquet file sink, so a 100 TB/day
    // ingest scores at scan speed and never funnels through the driver
    // (s26 routes on two signals and aggregates; this emits the per-doc
    // scored stream itself — the row-level feed a downstream sampler
    // consumes). Same rational z/(1+|z|) squash as x47: correctly-rounded
    // IEEE ops only, so the streamed scores are bit-identical to the batch
    // oracle's.
    GQuery("s49_stream_quality_score",
      (s, d) => {
        val ws = split(col("text"), " ")
        val nwS = greatest(size(ws), lit(1))
        val stops = array(Seq("the", "a", "of", "and", "to", "in", "is", "for")
          .map(lit): _*)
        val punct = length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))
        val z = lit(-1.0) +
          lit(2.4) * (size(array_distinct(ws)) / nwS) +
          lit(1.2) * (least(size(ws), lit(400)) / lit(400.0)) -
          lit(3.0) * (punct / greatest(length(col("text")), lit(1))) -
          lit(0.8) * abs((length(col("text")) - (size(ws) - lit(1))) / nwS -
            lit(5.0)) / lit(5.0) +
          lit(1.5) * (size(filter(ws, w => array_contains(stops, w))) / nwS)
        val score = (lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z))))
          .cast("decimal(18,6)").cast("double")
        runToMemory(
          docStream(s, d).select(col("doc_id"), score.as("score"),
            when(score < 0.35, "drop").when(score < 0.6, "review")
              .otherwise("keep").as("verdict")),
          "append").orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id, text,
    string_split(text, ' ') AS ws,
    greatest(len(string_split(text, ' ')), 1) AS nws,
    length(text) AS lt FROM documents),
z AS (SELECT doc_id,
    -1.0 + 2.4 * (len(list_distinct(ws)) / nws)
         + 1.2 * (least(len(ws), 400) / 400.0)
         - 3.0 * ((lt - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / greatest(lt, 1))
         - 0.8 * abs(((lt - (len(ws) - 1)) / nws) - 5.0) / 5.0
         + 1.5 * (len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','for'], w))) / nws)
      AS z
  FROM f),
sc AS (SELECT doc_id,
    CAST(CAST(0.5 + 0.5 * (z / (1.0 + abs(z))) AS DECIMAL(18,6)) AS DOUBLE) AS score
  FROM z)
SELECT doc_id, score,
  CASE WHEN score < 0.35 THEN 'drop' WHEN score < 0.6 THEN 'review'
    ELSE 'keep' END AS verdict
FROM sc ORDER BY doc_id NULLS FIRST""")),

    // S50: streaming embedding QA — the embeddings table's first streaming
    // lane: vectors arrive continuously (an embedding service's output
    // topic), and each row is gated BEFORE it reaches the ANN index — L2
    // norm + component peak (x49's per-row signals; the cohort z-score
    // stays a batch job because it needs full-label statistics), zero/NaN
    // guarded. Per-row arithmetic, APPEND mode through the distributed
    // parquet file sink — scores at scan speed, nothing funnels through
    // the driver. The sequential array fold (Spark `aggregate` ≡ DuckDB
    // `list_reduce`) keeps the sums bit-identical cross-engine.
    GQuery("s50_stream_embedding_qa",
      (s, d) => {
        val sq = aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
        val peak = array_max(transform(col("embedding"),
          x => abs(x.cast("double"))))
        val vecStream = s.readStream
          .schema(Tables.table(s, d, "embeddings").schema)
          .option("pathGlobFilter", "embeddings.parquet").parquet(d)
        runToMemory(
          vecStream.select(col("vec_id"), col("label"),
            sqrt(sq).cast("decimal(18,6)").cast("double").as("norm"),
            peak.cast("decimal(18,6)").cast("double").as("peak"),
            (size(col("embedding")) === 0 ||
              sqrt(sq).cast("decimal(18,6)") === 0).as("degenerate")),
          "append").orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, label,
  CAST(CAST(sqrt(list_reduce(
      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      (a, b) -> a + b)) AS DECIMAL(18,6)) AS DOUBLE) AS norm,
  CAST(CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
    AS DECIMAL(18,6)) AS DOUBLE) AS peak,
  (len(embedding) = 0 OR CAST(sqrt(list_reduce(
      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      (a, b) -> a + b)) AS DECIMAL(18,6)) = 0) AS degenerate
FROM embeddings ORDER BY vec_id NULLS FIRST""")),

    // S51: streaming weighted reservoir sample — x55's A-ES priority made
    // stateless-per-row (ln(u)/w from a deterministic md5 uniform and a
    // value-magnitude weight), then reduced per 10-minute window by the
    // bounded TopKAgg. This IS the classic weighted reservoir algorithm:
    // because the priority needs no cross-row state, a weighted sample of an
    // unbounded stream is just a running top-K of priorities — state is K
    // packed doubles per window however many events flow through. The pack
    // (priority micro-units + 25e6) * 2^27 + (2^27-1-event_id) keeps
    // (priority DESC, event_id ASC) order in ONE exactly-representable
    // double (< 2^53; min priority = ln(1/16777217)/ln 2 ≈ -24.0006, so the
    // 25e6 offset keeps the pack strictly positive even at u24=0 — 24e6 went
    // negative there and corrupted the modulo decode; ids < 2^27 here — a
    // production variant would use a struct-payload top-k agg) so the
    // sampled ids ride through the existing double-typed aggregate and
    // decode on the way out. Complete mode like s41; one shuffle by window.
    GQuery("s51_stream_weighted_sample",
      (s, d) => {
        val u24 = expr(
          "CAST(conv(substr(md5(concat('aes51:', event_id)), 1, 6), 16, 10) AS BIGINT)")
        val w = log(lit(2.0) + abs(dec2(col("value")).cast("double")))
          .cast("decimal(18,6)").cast("double")
        val prio = (log((u24 + lit(1.0)) / lit(16777217.0)) / w)
          .cast("decimal(18,6)")
        val p6 = (prio * lit(1000000)).cast("long")
        // fail loudly the day ids outgrow the pack budget instead of
        // silently decoding garbage (the ExactSum/canary convention)
        val eid = when(col("event_id") < lit(1L << 27), col("event_id"))
          .otherwise(expr(
            "CAST(raise_error('s51: event_id exceeds the 2^27 pack budget') AS BIGINT)"))
        val pack = ((p6 + lit(25000000L)) * lit(1L << 27)
          + (lit((1L << 27) - 1) - eid)).cast("double")
        runToMemory(
          eventStream(s, d)
            .select(col("ts"), pack.as("pk"))
            .groupBy(window(col("ts"), "10 minutes"))
            .agg(graft.functions.GraftFunctions.topk_vals(col("pk"), 3)
              .as("top3"), count(lit(1)).as("n")),
          "complete")
          .select(col("window.start").cast("long").as("ws_sec"), col("n"),
            concat_ws(",", expr(
              s"transform(top3, v -> CAST(${(1L << 27) - 1} - " +
              s"(CAST(v AS BIGINT) % ${1L << 27}) AS BIGINT))"))
              .as("sample_ids"))
          .orderBy(col("ws_sec"))
      },
      Some("""WITH c AS (SELECT event_id, ts,
  CAST(ln((CAST(concat('0x', substr(md5('aes51:' || event_id), 1, 6)) AS BIGINT)
        + 1.0) / 16777217.0)
    / CAST(CAST(ln(2.0 + abs(CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE)))
        AS DECIMAL(18,6)) AS DOUBLE) AS DECIMAL(18,6)) AS prio
  FROM events)
SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, count(*) AS n,
  array_to_string((list(event_id
      ORDER BY CAST(prio * 1000000 AS BIGINT) DESC, event_id))[1:3], ',')
    AS sample_ids
FROM c GROUP BY 1 ORDER BY ws_sec NULLS FIRST""")),

    // S51b: the append+watermark twin of s51 (the s31–s33 pattern) — the
    // production deployment: complete mode re-emits every window each
    // trigger and holds ALL windows in state forever (unbounded over
    // wall-time); with a 1-hour watermark each window's K-double top-K
    // state is EVICTED when the window closes, and the sample emits
    // exactly once. State is K packed doubles × |open windows| — bounded
    // regardless of how long the stream runs. Emission set is the s31
    // HAVING rule: window end ≤ final watermark.
    GQuery("s51b_weighted_sample_append",
      (s, d) => {
        val u24 = expr(
          "CAST(conv(substr(md5(concat('aes51:', event_id)), 1, 6), 16, 10) AS BIGINT)")
        val w = log(lit(2.0) + abs(dec2(col("value")).cast("double")))
          .cast("decimal(18,6)").cast("double")
        val prio = (log((u24 + lit(1.0)) / lit(16777217.0)) / w)
          .cast("decimal(18,6)")
        val p6 = (prio * lit(1000000)).cast("long")
        val eid = when(col("event_id") < lit(1L << 27), col("event_id"))
          .otherwise(expr(
            "CAST(raise_error('s51b: event_id exceeds the 2^27 pack budget') AS BIGINT)"))
        val pack = ((p6 + lit(25000000L)) * lit(1L << 27)
          + (lit((1L << 27) - 1) - eid)).cast("double")
        runToMemory(
          eventStream(s, d)
            .withWatermark("ts", "1 hour")
            .select(col("ts"), pack.as("pk"))
            .groupBy(window(col("ts"), "10 minutes"))
            .agg(graft.functions.GraftFunctions.topk_vals(col("pk"), 3)
              .as("top3"), count(lit(1)).as("n")),
          "append")
          .select(col("window.start").cast("long").as("ws_sec"), col("n"),
            concat_ws(",", expr(
              s"transform(top3, v -> CAST(${(1L << 27) - 1} - " +
              s"(CAST(v AS BIGINT) % ${1L << 27}) AS BIGINT))"))
              .as("sample_ids"))
          .orderBy(col("ws_sec"))
      },
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
c AS (SELECT event_id, ts,
  CAST(ln((CAST(concat('0x', substr(md5('aes51:' || event_id), 1, 6)) AS BIGINT)
        + 1.0) / 16777217.0)
    / CAST(CAST(ln(2.0 + abs(CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE)))
        AS DECIMAL(18,6)) AS DOUBLE) AS DECIMAL(18,6)) AS prio
  FROM events)
SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, count(*) AS n,
  array_to_string((list(event_id
      ORDER BY CAST(prio * 1000000 AS BIGINT) DESC, event_id))[1:3], ',')
    AS sample_ids
FROM c, wm GROUP BY ws_sec, wm_ms
HAVING (ws_sec + 600) * 1000 <= wm_ms
ORDER BY ws_sec NULLS FIRST""")),

    // S53: streaming count-min frequency sketch — per-window user activity
    // estimation at BOUNDED state for an unbounded key space (the live
    // cousin of x25's batch CMS, completing the sketch-state trio with
    // s52's MinHash and x11's HLL). Per event, two portable hash rows map
    // user_id into 256 buckets each; the stream maintains per-window
    // (row, bucket) counts — state ≤ |open windows| × 512 rows no matter
    // how many distinct users flow through (per-user state like s45's is
    // unbounded over the KEY space; the sketch trades point-exactness for
    // a hard state budget). Append+watermark: closed windows emit once
    // and evict (the s31/s51b rule). The dashboard projection probes a
    // fixed user set against the emitted sketches — est = min over the
    // two rows, the standard CMS upper-bound estimate, an over-count only
    // on double collisions. Portable md5 bucket hashing makes DuckDB
    // replay the sketch bit-exactly: O-class.
    GQuery("s53_stream_cms_topusers",
      (s, d) => {
        def bkt(r: Int, c: org.apache.spark.sql.Column) = expr(
          s"CAST(conv(substr(md5(concat('cms$r:', CAST(${c.toString} AS STRING))), 1, 4), 16, 10) AS BIGINT) % 256")
        val counts = runToMemory(
          eventStream(s, d)
            .withWatermark("ts", "1 hour")
            .select(col("ts"), explode(array(
              struct(lit(0).as("r"), bkt(0, col("user_id")).as("bucket")),
              struct(lit(1).as("r"), bkt(1, col("user_id")).as("bucket"))))
              .as("rb"))
            .select(col("ts"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
            .groupBy(window(col("ts"), "10 minutes"), col("r"), col("bucket"))
            .agg(count(lit(1)).as("c")),
          "append")
          .select(col("window.start").cast("long").as("ws_sec"),
            col("r"), col("bucket"), col("c"))
        val wins = counts.select(col("ws_sec")).distinct()
        val probes = s.range(0, 20).toDF("user_id")
          .select(col("user_id"),
            bkt(0, col("user_id")).as("b0"), bkt(1, col("user_id")).as("b1"))
        wins.crossJoin(broadcast(probes))
          .join(counts.filter(col("r") === 0)
            .select(col("ws_sec"), col("bucket").as("b0"), col("c").as("c0")),
            Seq("ws_sec", "b0"), "left")
          .join(counts.filter(col("r") === 1)
            .select(col("ws_sec"), col("bucket").as("b1"), col("c").as("c1")),
            Seq("ws_sec", "b1"), "left")
          .select(col("ws_sec"), col("user_id"),
            least(coalesce(col("c0"), lit(0L)), coalesce(col("c1"), lit(0L)))
              .as("est"))
          .orderBy(col("ws_sec"), col("user_id"))
      },
      Some("""WITH wm AS (SELECT max(epoch_us(ts)) // 1000 - 3600000 AS wm_ms FROM events),
b AS (SELECT (epoch_us(ts) // 600000000) * 600 AS ws_sec, user_id FROM events),
closed AS (SELECT ws_sec, user_id FROM b, wm WHERE (ws_sec + 600) * 1000 <= wm_ms),
e0 AS (SELECT ws_sec,
    CAST(concat('0x', substr(md5('cms0:' || CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 256 AS bkt,
    count(*) AS c
  FROM closed GROUP BY 1, 2),
e1 AS (SELECT ws_sec,
    CAST(concat('0x', substr(md5('cms1:' || CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 256 AS bkt,
    count(*) AS c
  FROM closed GROUP BY 1, 2),
probes AS (SELECT u AS user_id,
    CAST(concat('0x', substr(md5('cms0:' || CAST(u AS VARCHAR)), 1, 4)) AS BIGINT) % 256 AS b0,
    CAST(concat('0x', substr(md5('cms1:' || CAST(u AS VARCHAR)), 1, 4)) AS BIGINT) % 256 AS b1
  FROM (SELECT unnest(range(0, 20)) AS u)),
wins AS (SELECT DISTINCT ws_sec FROM closed)
SELECT w.ws_sec, p.user_id,
  CAST(least(coalesce(c0.c, 0), coalesce(c1.c, 0)) AS BIGINT) AS est
FROM wins w CROSS JOIN probes p
LEFT JOIN e0 c0 ON c0.ws_sec = w.ws_sec AND c0.bkt = p.b0
LEFT JOIN e1 c1 ON c1.ws_sec = w.ws_sec AND c1.bkt = p.b1
ORDER BY w.ws_sec NULLS FIRST, user_id NULLS FIRST""")),

    // S52: streaming MinHash source signatures — the EXACT SAME operator
    // function as batch x58 ([[graft.GraftOps.minhashLaneMins]]) run over
    // the live document stream, because min is a streaming-legal mergeable
    // aggregate: state is ONE row per source (MinLanesAgg packs all lane
    // mins into that row's buffer — |sources| rows × 16 longs here) —
    // no matter how many documents flow through, and each micro-batch
    // folds in with a partial min. This is the sketch-state streaming
    // story (x11/x25's HLL/CMS cousins) applied to corpus similarity: a
    // 100 TB ingest keeps live between-source Jaccard signatures at
    // constant memory. Complete mode; batch ≡ stream by construction
    // (same function), pinned by the shared DuckDB oracle.
    GQuery("s52_stream_minhash_sigs",
      (s, d) => runToMemory(
          graft.GraftOps.minhashLaneMins(
            docStream(s, d), col("source"), col("text"), k = 3, lanes = 16),
          "complete")
        .select(col("grp").as("source"), col("lane").cast("long").as("lane"),
          col("mh"))
        .orderBy(col("source"), col("lane")),
      Some("""WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT source,
  CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' '))
  ELSE [array_to_string(w, ' ')] END AS sl
FROM toks),
sg AS (SELECT source, unnest(sl) AS g FROM sh),
hs AS (SELECT source,
    CAST(concat('0x', substr(md5(g), 1, 12)) AS BIGINT) AS b0,
    CAST(concat('0x', substr(md5(g), 13, 12)) AS BIGINT) AS b1
  FROM sg)
SELECT source, ln.l AS lane,
  min(((ln.l * 2 + 1) * b0 + b1) % 281474976710656) AS mh
FROM hs CROSS JOIN (SELECT unnest(range(0, 16)) AS l) ln
GROUP BY source, ln.l
ORDER BY source NULLS FIRST, lane NULLS FIRST""")),

    // S54: streaming release funnel — the live twin of x64's attrition
    // dashboard (VERDICT r10 #8). Fresh documents (doc_id % 10 = 7) stream
    // against the already-released corpus and flow the same gate chain:
    //   raw → exact-new (s30's incremental-dedup shape: a STATIC history
    //   hash table probed with a stream-static left-anti join — history
    //   never enters stream state — then dropDuplicates for first-arrival
    //   within the stream) → n-gram-clean (x13/x57's broadcast eval-gram
    //   probe as a per-row array_intersect against a ONE-ROW static frame,
    //   so the stage keeps append mode: no stream-side aggregation) →
    //   quality (s49's per-row rational-sigmoid score at the 'keep'
    //   boundary, ≥ 0.6; the n-gram gate at 0.15 — both chosen so every
    //   stage has attrition at the test corpora).
    // The sink receives per-doc flag rows (append, file sink — distributed
    // end to end); the funnel itself is a batch-side stack()+aggregate over
    // the sunk flags, exactly like x64. Deterministic despite arrival
    // order: duplicates share text, hence token counts, so per-stage
    // doc/token totals are order-invariant. State is |distinct new hashes|
    // in the fresh slice only (pinned in StreamMetricsSpec). At 100 TB:
    // history is a broadcast/bucketed static probe, eval grams are a
    // broadcast array, scoring is per-row — the only state is the fresh
    // window's dedup set, the same bound s30 carries.
    GQuery("s54_stream_release_funnel",
      (s, d) => {
        val ds = Tables.table(s, d, "documents")
        val isFresh = col("doc_id") % 10 === 7
        val isEval = col("doc_id") % 20 === 0 && col("doc_id") < 2000
        // static sides persisted: a stream-static join re-executes the
        // static plan every micro-batch (the s27 lesson)
        val hist = ds.filter(!isFresh).select(md5(col("text")).as("h"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        hist.count()
        val evg = ds.filter(isEval)
          .select(explode(graft.functions.GraftFunctions
            .word_shingles(col("text"), 3)).as("g"))
          .distinct().agg(collect_list(col("g")).as("evs"))
          .withColumn("jk", lit(1))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        evg.count()
        // s49's quality score, per-row on the stream
        val ws = split(col("text"), " ")
        val nwS = greatest(size(ws), lit(1))
        val stops = array(Seq("the", "a", "of", "and", "to", "in", "is", "for")
          .map(lit): _*)
        val punct = length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))
        val z = lit(-1.0) +
          lit(2.4) * (size(array_distinct(ws)) / nwS) +
          lit(1.2) * (least(size(ws), lit(400)) / lit(400.0)) -
          lit(3.0) * (punct / greatest(length(col("text")), lit(1))) -
          lit(0.8) * abs((length(col("text")) - (size(ws) - lit(1))) / nwS -
            lit(5.0)) / lit(5.0) +
          lit(1.5) * (size(filter(ws, w => array_contains(stops, w))) / nwS)
        val score = (lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z))))
          .cast("decimal(18,6)").cast("double")
        val flags = docStream(s, d).filter(isFresh)
          .select(col("text"),
            size(split(col("text"), " ")).cast("long").as("tok"),
            md5(col("text")).as("h"),
            graft.functions.GraftFunctions.word_shingles(col("text"), 3)
              .as("sh"))
          .join(hist, Seq("h"), "left_anti")
          .dropDuplicates("h")
          .withColumn("jk", lit(1))
          .join(broadcast(evg), "jk")
          // the x57/x61/x64 canary: an empty eval slice would null the
          // probe into a silent pass-everything stage — fail loudly
          .withColumn("evs",
            when(assert_true(size(col("evs")) > 0,
              lit("s54: eval gram set is empty — the n-gram stage would " +
                "silently pass every doc")).isNull, col("evs")))
          .withColumn("p2",
            size(array_intersect(col("sh"), col("evs"))).cast("double") /
              size(col("sh")).cast("double") < 0.15)
          .withColumn("p3", score >= 0.6)
          .select(col("tok"), col("p2"), col("p3"))
        val sunk = runToMemory(flags, "append")
        val raw = ds.filter(isFresh)
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
          .select(lit("0_raw").as("stage"), col("n_docs"), col("n_tokens"))
        val staged = sunk.select(col("tok"), expr("""stack(3,
            '1_exact_new', true,
            '2_ngram_clean', p2,
            '3_quality_keep', p2 AND p3) AS (stage, pass)"""))
          .filter(col("pass"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
        val total = ds.filter(isFresh).agg(count(lit(1)).as("total"))
        raw.unionByName(staged)
          .crossJoin(broadcast(total))
          .select(col("stage"), col("n_docs"), col("n_tokens"),
            (col("n_docs").cast("double") / col("total"))
              .cast("decimal(18,6)").cast("double").as("retained_frac"))
          .orderBy(col("stage"))
      },
      Some("""WITH f AS (SELECT doc_id, text, md5(text) AS h,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
  FROM documents WHERE doc_id % 10 = 7),
hist AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 7),
surv AS (SELECT h, min(doc_id) AS doc_id FROM f
  WHERE h NOT IN (SELECT h FROM hist) GROUP BY h),
sd AS (SELECT f.doc_id, f.tok FROM f JOIN surv USING (h, doc_id)),
toks AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
shd AS (SELECT doc_id,
  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s FROM toks),
evg AS (SELECT DISTINCT unnest(s) AS g FROM shd
  WHERE doc_id % 20 = 0 AND doc_id < 2000),
hits AS (SELECT t.doc_id, count(*) AS n
  FROM (SELECT sd.doc_id, unnest(shd.s) AS g FROM sd JOIN shd USING (doc_id)) t
  JOIN evg USING (g) GROUP BY t.doc_id),
p2t AS (SELECT sd.doc_id,
    (CAST(coalesce(hits.n, 0) AS DOUBLE) / len(shd.s)) < 0.15 AS p2
  FROM sd JOIN shd USING (doc_id) LEFT JOIN hits ON hits.doc_id = sd.doc_id),
zt AS (SELECT sd.doc_id,
    -1.0 + 2.4 * (len(list_distinct(w)) / greatest(len(w), 1))
         + 1.2 * (least(len(w), 400) / 400.0)
         - 3.0 * ((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / greatest(length(text), 1))
         - 0.8 * abs(((length(text) - (len(w) - 1)) / greatest(len(w), 1)) - 5.0) / 5.0
         + 1.5 * (len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','for'], x))) / greatest(len(w), 1))
      AS z
  FROM sd JOIN toks USING (doc_id)),
p3t AS (SELECT doc_id,
    CAST(CAST(0.5 + 0.5 * (z / (1.0 + abs(z))) AS DECIMAL(18,6)) AS DOUBLE) >= 0.6 AS p3
  FROM zt),
stg AS (
  SELECT '0_raw' AS stage, count(*) AS n_docs, sum(tok) AS n_tokens FROM f
  UNION ALL
  SELECT '1_exact_new', count(*), sum(tok) FROM sd
  UNION ALL
  SELECT '2_ngram_clean', count(*), sum(tok)
  FROM sd JOIN p2t USING (doc_id) WHERE p2
  UNION ALL
  SELECT '3_quality_keep', count(*), sum(tok)
  FROM sd JOIN p2t USING (doc_id) JOIN p3t USING (doc_id) WHERE p2 AND p3),
tot AS (SELECT count(*) AS total FROM f)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(CAST(CAST(n_docs AS DOUBLE) / total AS DECIMAL(18,6)) AS DOUBLE)
    AS retained_frac
FROM stg, tot ORDER BY stage NULLS FIRST""")),

    // S55: CONFLUENT-FRAMED AVRO envelope decode with schema-registry
    // dispatch — the dominant real Kafka payload encoding (magic 0x00 +
    // int32 BE schema id + avro body), over a bus caught mid-migration:
    // half the producers still write schema 1 (V1: user_id, cents), half
    // the evolved schema 2 (V2: + event_type). The query validates the
    // magic byte (raise_error on garbage — never a silent misparse),
    // reads the id from the frame, dispatches avro_decode per id (CaseWhen
    // evaluates only the matching branch — one decode per row), and folds
    // V1 rows into a 'v1_legacy' cohort: exactly how a consumer survives a
    // producer-side schema migration. Decode is the native AvroCatalyst
    // expression (avro-core, no broker/connector libs); per-row, stateless,
    // so it scales with input like any projection. The frame is
    // deterministic per event, so DuckDB oracles the aggregate straight
    // from the events table. (The reference ships DataFusion's `avro`
    // feature, Cargo.toml:7, without exercising it; this is that surface
    // made real on the streaming path — s11 is the JSON sibling.)
    GQuery("s55_avro_envelope_decode",
      (s, d) => {
        import graft.functions.GraftFunctions.avro_decode
        val log = ReplayLog.ensureAvroLog(s, d)
        val stream = s.readStream.format("graft-replay").option("path", log).load()
        val sid = expr("""CASE WHEN substring(value, 1, 1) = X'00'
          THEN CAST(conv(hex(substring(value, 2, 4)), 16, 10) AS INT)
          ELSE CAST(raise_error('confluent frame: bad magic byte') AS INT)
          END""")
        val body = expr("substring(value, 6, length(value) - 5)")
        val decoded = stream.select(sid.as("sid"), body.as("body"))
          .withColumn("r1", when(col("sid") === 1,
            avro_decode(col("body"), ReplayLog.AvroV1)))
          .withColumn("r2", when(col("sid") === 2,
            avro_decode(col("body"), ReplayLog.AvroV2)))
          .select(
            coalesce(col("r1.user_id"), col("r2.user_id")).as("user_id"),
            coalesce(col("r1.cents"), col("r2.cents")).as("cents"),
            when(col("sid") === 1, lit("v1_legacy"))
              .when(col("sid") === 2, col("r2.event_type"))
              .otherwise(raise_error(concat(lit("unknown avro schema id "),
                col("sid")))).as("etype"))
        runToMemory(
          decoded.groupBy(col("etype"))
            .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
              min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user")),
          "complete").orderBy(col("etype"))
      },
      Some("""SELECT CASE WHEN event_id % 2 = 0 THEN 'v1_legacy' ELSE event_type END AS etype,
  count(*) AS n,
  CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
  min(user_id) AS min_user, max(user_id) AS max_user
FROM events GROUP BY 1 ORDER BY etype NULLS FIRST""")),

    // S56: the replay stream consumed over the KAFKA WIRE PROTOCOL — s35's
    // kafka twin: client=kafka against an in-process wire-faithful broker
    // (Metadata/ListOffsets/Fetch v4, RecordBatch v2), putting the wire
    // client into the driver's DuckDB gate (it was spec-evidenced only).
    // Same offsets, same admission, same checkpointing; only the wire
    // differs. Envelope oracle ≡ s35 (partition = event_id % 3,
    // offset = event_id // 3).
    GQuery("s56_kafka_wire_replay",
      (s, d) => {
        val log = ReplayLog.ensureLog(s, d)
        val broker = new graft.sources.replay.KafkaLogServer(log, "events")
        try {
          runToMemory(
            s.readStream.format("graft-replay")
              .option("client", "kafka").option("path", broker.clientPath)
              .option("maxRowsPerTrigger", adaptiveTrigger(s, d).toString)
              .load()
              .select(col("partition").cast("long").as("partition"), col("offset"),
                col("key").cast("string").as("key"),
                length(col("value").cast("string")).cast("long").as("vlen")),
            "append").orderBy(col("partition"), col("offset"))
        } finally broker.close()
      },
      Some("""SELECT event_id % 3 AS "partition", event_id // 3 AS "offset",
  'Key ' || event_id AS key, len(props) AS vlen
FROM events
ORDER BY "partition" NULLS FIRST, "offset" NULLS FIRST""")),

    // S57: the PRODUCE round-trip as a declared query — the events envelope
    // written through the graft-replay SINK (Produce v3 wire batches, real
    // CRC-32C, zstd, idempotent producer) into an empty 3-partition topic,
    // then read back over the same wire and checked row-by-row against the
    // source table. Key-level identity is routing-independent (partition
    // assignment is murmur2's business, offsets the broker's), so the
    // oracle replays exactly the content contract the sink guarantees.
    GQuery("s57_kafka_produce_roundtrip",
      (s, d) => {
        val dir = Files.createTempDirectory(tmpBase, "kafka-sunk").toString
        val broker = new graft.sources.replay.KafkaLogServer(dir, "sunk",
          explicitPartitions = Some(0 until 3))
        try {
          Tables.events(s, d)
            .select(concat(lit("Key "), col("event_id")).cast("binary").as("key"),
              col("props").cast("binary").as("value"))
            .write.format("graft-replay")
            .option("client", "kafka").option("path", broker.clientPath)
            .option("producer.compression.type", "zstd")
            .option("producer.enable.idempotence", "true")
            .mode("append").save()
          // materialize BEFORE the finally kills the broker: the returned
          // frame must not re-dial a closed socket when the caller collects
          s.read.format("graft-replay")
            .option("client", "kafka").option("path", broker.clientPath)
            .load()
            .select(col("key").cast("string").as("key"),
              length(col("value").cast("string")).cast("long").as("vlen"))
            .orderBy(col("key"))
            .localCheckpoint(true)
        } finally broker.close()
      },
      Some("""SELECT 'Key ' || event_id AS key, len(props) AS vlen
FROM events ORDER BY key NULLS FIRST""")),

    // S58: Kafka TRANSACTIONS through the correctness gate — the
    // exactly-once pair the reference inherits from librdkafka
    // (transactional.id + isolation.level). Two ABORTED decoy
    // transactions sandwich the real data: decoys land first (a leading
    // aborted span + abort marker the reader must skip over), then the
    // events envelope commits through the TRANSACTIONAL sink (one Kafka
    // transaction per task, committed at task commit), then a second decoy
    // txn aborts after. The default read_committed read must surface
    // EXACTLY the committed table rows — any leaked decoy key or dropped
    // event changes the oracle hash — while walking a log whose offsets
    // now have real gaps (control markers + hidden aborted spans).
    GQuery("s58_kafka_txn_roundtrip",
      (s, d) => {
        val dir = Files.createTempDirectory(tmpBase, "kafka-txn").toString
        val broker = new graft.sources.replay.KafkaLogServer(dir, "txn",
          explicitPartitions = Some(0 until 3))
        var decoys: graft.sources.replay.KafkaLogClient = null
        try {
          decoys = new graft.sources.replay.KafkaLogClient(
            broker.clientPath,
            Map("transactional.id" -> "s58-decoy", "graft.role" -> "producer"))
          def abortedDecoys(tag: String): Unit = {
            decoys.beginTxn()
            (0 until 3).foreach { p =>
              decoys.produce(p, (0 until 250).map(i =>
                (s"Key decoy-$tag-$i".getBytes("UTF-8"),
                  s"never-visible-$i".getBytes("UTF-8"), 1723700000000L + i)))
            }
            decoys.endTxn(commit = false)
          }
          abortedDecoys("pre")
          Tables.events(s, d)
            .select(concat(lit("Key "), col("event_id")).cast("binary").as("key"),
              col("props").cast("binary").as("value"))
            .write.format("graft-replay")
            .option("client", "kafka").option("path", broker.clientPath)
            .option("producer.transactional.id", "s58-sink")
            .option("producer.compression.type", "zstd")
            .mode("append").save()
          abortedDecoys("post")
          s.read.format("graft-replay")
            .option("client", "kafka").option("path", broker.clientPath)
            .load()
            .select(col("key").cast("string").as("key"),
              length(col("value").cast("string")).cast("long").as("vlen"))
            .orderBy(col("key"))
            .localCheckpoint(true)
        } finally {
          // the decoy producer keeps persistent sockets — close them before
          // the broker, or each run of this query leaks two connections
          if (decoys != null)
            try decoys.closeProducer() catch { case _: Throwable => () }
          broker.close()
        }
      },
      Some("""SELECT 'Key ' || event_id AS key, len(props) AS vlen
FROM events ORDER BY key NULLS FIRST""")),

    // S59: the streaming DSIR gate — x69's importance scorer applied LIVE.
    // The rate table is trained batch-side (the same 512-bucket hashed
    // unigram+bigram log-ratio computation as x69, one bounded aggregate),
    // collected ONCE as 512 micro-unit longs (the BPE merge-table idiom:
    // a driver fetch of a fixed-size model, never corpus rows) and folded
    // into every arriving doc as a per-row HOF over its feature array —
    // exact integer micro-units, so the fold is order-free and the gate is
    // ZERO-STATE: no shuffle, no stateful operator, unbounded stream legal
    // in append mode at any volume. Unseen buckets take the add-1
    // smoothing default ln((C+B)/(T+B)) (never fires on this replay — the
    // stream IS the training corpus — but the gate must be total for real
    // fresh traffic). The verdict bands route docs toward the target
    // mixture the way x69's top-K resample does offline. O-class: the
    // oracle replays training + per-doc micro-unit sums in SQL.
    GQuery("s59_stream_dsir_gate",
      (s, d) => {
        val feats = expr("""concat(toks,
          CASE WHEN size(toks) < 2 THEN array()
               ELSE transform(sequence(1, size(toks) - 1),
                 i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          END)""")
        val bucket = "CAST(conv(substr(md5(concat('dsir69:', f)), 1, 6), " +
          "16, 10) AS BIGINT) % 512"
        val dc = Tables.table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("source"),
            explode(feats).as("f"))
          .select(col("doc_id"), col("source"), expr(bucket).as("b"))
          .groupBy(col("doc_id"), col("source"), col("b"))
          .agg(count(lit(1)).as("dc"))
        val bc = dc.groupBy(col("b"))
          .agg(sum(col("dc")).as("cc"),
            sum(when(col("source") === "src0", col("dc"))
              .otherwise(lit(0L))).as("tc"))
        // train with EXACTLY x69's engine formulation (hash-proven against
        // the oracle), then collect the 512 micro-unit longs driver-side
        val tot = bc.agg(sum(col("cc")).as("c"), sum(col("tc")).as("t"))
        val rates6: Map[Long, Long] = bc.crossJoin(broadcast(tot))
          .select(col("b"),
            (log(((col("tc") + lit(1.0)) / (col("t") + lit(512))) /
              ((col("cc") + lit(1.0)) / (col("c") + lit(512))))
              .cast("decimal(18,6)") * lit(1000000)).cast("long").as("lr6"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val default6 = tot.select(
          (log((col("c") + lit(512.0)) / (col("t") + lit(512.0)))
            .cast("decimal(18,6)") * lit(1000000)).cast("long"))
          .collect().head.getLong(0)
        val logw6 = expr(s"""aggregate(concat(toks,
            CASE WHEN size(toks) < 2 THEN array()
                 ELSE transform(sequence(1, size(toks) - 1),
                   i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
            END),
          CAST(0 AS BIGINT),
          (acc, f) -> acc + coalesce(element_at(rates6, $bucket),
            CAST($default6 AS BIGINT)))""")
        runToMemory(
          docStream(s, d)
            .select(col("doc_id"), split(col("text"), " ").as("toks"))
            .withColumn("rates6", typedLit(rates6))
            .select(col("doc_id"), logw6.as("logw6"))
            .select(col("doc_id"),
              (col("logw6").cast("double") / lit(1000000.0)).as("logw"),
              when(col("logw6") >= 1000000L, "strong_target")
                .when(col("logw6") > 0L, "lean_target")
                .otherwise("raw").as("verdict")),
          "append").orderBy(col("doc_id"))
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
    CAST(CAST(ln(((tc + 1.0) / (t + 512)) / ((cc + 1.0) / (c + 512)))
      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lr6
  FROM bc, tot),
lw AS (SELECT doc_id, CAST(sum(dc * lr6) AS BIGINT) AS logw6
  FROM dcnt JOIN rates USING (b) GROUP BY 1)
SELECT doc_id, CAST(logw6 AS DOUBLE) / 1000000.0 AS logw,
  CASE WHEN logw6 >= 1000000 THEN 'strong_target'
       WHEN logw6 > 0 THEN 'lean_target' ELSE 'raw' END AS verdict
FROM lw ORDER BY doc_id NULLS FIRST""")),

    // S60: streaming audio QA — x70's WAV lane live. Every arriving event's
    // payload round-trips through REAL RIFF/WAVE bytes (wav_pcm16 encode →
    // wav_stats chunk-walk parse, both codegen expressions) and emits its
    // exact-integer gate row in append mode — per-row, zero state, the
    // multimodal twin of s49/s59's scoring gates. The oracle computes the
    // same statistics from the sample definition without the WAV round
    // trip, so the stream lane inherits x70's encode→parse identity proof
    // per event. rms over exact integers through IEEE-exact steps only.
    GQuery("s60_stream_audio_qa",
      (s, d) => {
        val samples = expr("transform(sequence(0, 63), " +
          "i -> CAST((event_id * 37 + i * 997) % 65536 - 32768 AS INT))")
        runToMemory(
          eventStream(s, d)
            .select(col("event_id"), graft.functions.GraftFunctions
              .wav_stats(graft.functions.GraftFunctions
                .wav_pcm16(samples, lit(8000))).as("st"))
            .select(col("event_id"),
              col("st.n_samples").cast("long").as("n_samples"),
              col("st.peak").cast("long").as("peak"),
              col("st.clipped").cast("long").as("clipped"),
              col("st.zero_cross").cast("long").as("zero_cross"),
              col("st.sum_sq").as("sum_sq"),
              sqrt(col("st.sum_sq").cast("double") / lit(64.0)).as("rms"),
              (col("st.peak") === 32768 || col("st.clipped") > 0)
                .as("hot_flag")),
          "append").orderBy(col("event_id"))
      },
      Some("""WITH sm AS (
  SELECT event_id,
    [(event_id * 37 + i * 997) % 65536 - 32768 for i in range(0, 64)] AS s
  FROM events)
SELECT event_id,
  CAST(64 AS BIGINT) AS n_samples,
  CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
  CAST(len(list_filter(s, x -> x = 32767 OR x = -32768)) AS BIGINT)
    AS clipped,
  CAST(len([i for i in range(1, 64) if (s[i] < 0) != (s[i + 1] < 0)])
    AS BIGINT) AS zero_cross,
  CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS sum_sq,
  sqrt(CAST(CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT)
    AS DOUBLE) / 64.0) AS rms,
  (list_max(list_transform(s, x -> abs(x))) = 32768
    OR len(list_filter(s, x -> x = 32767 OR x = -32768)) > 0) AS hot_flag
FROM sm ORDER BY event_id NULLS FIRST"""))
  )

  /** Public registry: each declared query body runs against the dedicated
    * harness session, so its streaming-state conf never touches the caller's
    * session. */
  val all: Seq[GQuery] =
    declared.map(q => q.copy(fn = (s, d) => q.fn(streamSession(s), d)))
}
