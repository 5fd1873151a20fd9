package graft.streaming

/* Spark 4 stateful processors backing the streaming registry's custom-state
 * lanes (s15/s36/s37/s39/s40) and their specs. Moved from graft.operators in
 * round 12's file split; logic unchanged. */

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
