package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamMetrics

/** Pins for the StreamMetrics runtime surface over a declared-shape stream
  * (watermarked tumbling window on the replay source): processing rate,
  * state rows and watermark progress must all report sane values. */
class StreamMetricsSpec extends SparkSpec {

  test("windowed watermark stream reports rate, state rows and watermark lag") {
    val log = sources.replay.ReplayLog.ensureLog(spark, sf)
    val nEvents = Tables.events(spark, sf).count()
    val metrics = new StreamMetrics
    spark.streams.addListener(metrics)
    try {
      // bounded admission forces several micro-batches, so the watermark has
      // to ADVANCE across batches rather than jump once
      val q = spark.readStream.format("graft-replay")
        .option("path", log).option("maxRowsPerTrigger", "2000").load()
        .withWatermark("timestamp", "1 minute")
        .groupBy(window(col("timestamp"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("sm_mem").outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("sm-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      // listener delivery is async — poll until all input rows are accounted
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (metrics.summary(q.id).inputRows < nEvents && System.nanoTime() < deadline)
        Thread.sleep(100)

      val s = metrics.summary(q.id)
      assert(s.inputRows === nEvents, s"progress must cover every input row: $s")
      assert(s.nBatches >= 2, s"bounded admission should take several batches: $s")
      assert(s.maxRowsPerSec > 0.0, s"processing rate must be observable: $s")
      assert(s.maxStateRows > 0L, s"window state rows must be visible: $s")
      assert(s.lastWatermarkMs.exists(_ > 0L), s"watermark must advance: $s")
      assert(s.watermarkMonotonic, s"watermark must never regress: $s")
      // replayed historical events: the watermark trails the wall clock by
      // years — lag must be positive and finite
      assert(s.lastWatermarkLagMs.exists(_ > 0L), s"watermark lag must be positive: $s")

      // TRUE-window-count pin (VERDICT r7 #8): the r7 ts-encoding bug
      // compressed event time 1000×, collapsing ~889 ten-minute windows to
      // 5 and leaving state stores near-empty — so state behavior was never
      // proven at real window counts. Assert the batch-derived window
      // census, and that append emitted exactly the windows the final
      // watermark passed (boundary counted both ways to stay semantics-
      // agnostic at exact equality).
      val winEndSec = Tables.events(spark, sf)
        .select(window(col("ts"), "10 minutes").getField("end")
          .cast("long").as("we"))
        .distinct()
      val totalWindows = winEndSec.count()
      assert(totalWindows > 500L,
        s"window census collapsed ($totalWindows) — event-time compression?")
      val wmMs = s.lastWatermarkMs.get
      val closedStrict = winEndSec.filter(col("we") * 1000 < wmMs).count()
      val closedIncl = winEndSec.filter(col("we") * 1000 <= wmMs).count()
      val emitted = spark.table("sm_mem").count()
      assert(emitted >= closedStrict && emitted <= closedIncl,
        s"append emitted $emitted windows; watermark $wmMs ms closed " +
          s"[$closedStrict, $closedIncl] of $totalWindows")
      // peak state must hold real window counts (the compressed-time bug
      // capped it at ≤ 5)
      assert(s.maxStateRows > 50L,
        s"peak state rows ${s.maxStateRows} implausibly small for " +
          s"$totalWindows windows")
    } finally spark.streams.removeListener(metrics)
  }

  // -- state-row budgets (VERDICT r9 #4): every complete-mode dashboard's
  // state must be exactly its GROUP COUNT — asserted row counts, not hopes.
  // The listener attaches to the harness session the registry queries
  // actually run on (listeners are per-SparkSession).

  private def runWithMetrics(name: String,
      expectInput: Long): (StreamMetrics.Summary, Seq[StreamMetrics.BatchStat], Long) = {
    val hs = operators.StreamingQueries.harnessSession(spark)
    val m = new StreamMetrics
    hs.streams.addListener(m)
    try {
      val emitted = SparkEntry.queries(name)(spark, sf).collect().length.toLong
      // listener delivery is async — poll until every input row is seen
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def seen = m.queryIds.toSeq.map(id => m.summary(id).inputRows).sum
      while (seen < expectInput && System.nanoTime() < deadline)
        Thread.sleep(100)
      val ids = m.queryIds
      assert(ids.size === 1,
        s"$name: expected exactly one streaming query, saw ${ids.size}")
      (m.summary(ids.head), m.batches(ids.head), emitted)
    } finally hs.streams.removeListener(m)
  }

  test("complete-mode dashboard state equals its group count (s44/s45/s47/s51/s52)") {
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()

    // s44: day-windowed type counts — state = |days × types present|
    val dayTypes = ev.select(to_date(col("ts")), col("event_type"))
      .distinct().count()
    val s44 = runWithMetrics("s44_stream_drift", nEvents)._1
    assert(s44.maxStateRows === dayTypes,
      s"s44 state ${s44.maxStateRows} != day×type groups $dayTypes")

    // s45: per-user funnel mins — state = |users|, 3 longs each
    val users = ev.select(col("user_id")).distinct().count()
    val s45 = runWithMetrics("s45_stream_funnel", nEvents)._1
    assert(s45.maxStateRows === users,
      s"s45 state ${s45.maxStateRows} != users $users")

    // s47: global checksum — ONE state row at any volume
    val s47 = runWithMetrics("s47_stream_checksum", nEvents)._1
    assert(s47.maxStateRows === 1L, s"s47 state ${s47.maxStateRows} != 1")

    // s51: per-window top-K — state = |10-min windows|, K doubles each
    val windows = ev.select(window(col("ts"), "10 minutes")).distinct().count()
    val s51 = runWithMetrics("s51_stream_weighted_sample", nEvents)._1
    assert(s51.maxStateRows === windows,
      s"s51 state ${s51.maxStateRows} != windows $windows")

    // s52: MinLanesAgg folds all 16 lane-mins inside ONE state row per
    // source — state = |sources| rows (16 longs each) at ANY stream volume
    val docs = Tables.table(spark, sf, "documents")
    val sources = docs.select(col("source")).distinct().count()
    val s52 = runWithMetrics("s52_stream_minhash_sigs", docs.count())._1
    assert(s52.maxStateRows === sources,
      s"s52 state ${s52.maxStateRows} != sources $sources")

    // s55: avro-envelope schema cohorts — state = |event types among the
    // V2 (odd event_id) half| + 1 for the folded 'v1_legacy' cohort,
    // bounded by the type vocabulary at ANY stream volume
    val etypes = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_type")).distinct().count() + 1
    val s55 = runWithMetrics("s55_avro_envelope_decode", nEvents)._1
    assert(s55.maxStateRows === etypes,
      s"s55 state ${s55.maxStateRows} != schema cohorts $etypes")
  }

  test("s51b append twin emits each window once and EVICTS closed state") {
    val ev = Tables.events(spark, sf)
    val (s, batches, emitted) =
      runWithMetrics("s51b_weighted_sample_append", ev.count())
    val winEnd = ev
      .select(window(col("ts"), "10 minutes").getField("end")
        .cast("long").as("we")).distinct()
    val total = winEnd.count()
    val wmMs = s.lastWatermarkMs.get
    val closedStrict = winEnd.filter(col("we") * 1000 < wmMs).count()
    val closedIncl = winEnd.filter(col("we") * 1000 <= wmMs).count()
    assert(emitted >= closedStrict && emitted <= closedIncl,
      s"append emitted $emitted; watermark $wmMs closed " +
        s"[$closedStrict, $closedIncl] of $total")
    // the eviction story: state must NOT hold every window at the end —
    // exactly the unemitted (still-open) windows remain
    val lastState = batches.last.stateRows
    assert(lastState === total - emitted,
      s"final state $lastState != open windows ${total - emitted} " +
        s"(total $total, emitted $emitted) — eviction broken?")
    // complete mode would have peaked at `total`; append must stay there
    // too (windows accumulate until the watermark passes them) but END low
    assert(s.maxStateRows <= total, s"state exceeded the window census")
  }

  test("s44b drift twin evicts closed days — final state is one open day") {
    val ev = Tables.events(spark, sf)
    val (s, batches, _) = runWithMetrics("s44b_stream_drift_append", ev.count())
    val dayTypes = ev.select(to_date(col("ts")), col("event_type"))
      .distinct().count()
    // peak state spans every (day, type) group the watermark hasn't passed;
    // final state must be only the OPEN trailing day's type rows
    assert(s.maxStateRows <= dayTypes, "state exceeded the day×type census")
    val wmMs = s.lastWatermarkMs.get
    val openDayTypes = ev
      .select(to_date(col("ts")).as("day"), col("event_type")).distinct()
      .filter((col("day").cast("timestamp").cast("long") + 86400) * 1000 > wmMs)
      .count()
    assert(batches.last.stateRows === openDayTypes,
      s"final state ${batches.last.stateRows} != open-day groups " +
        s"$openDayTypes — eviction broken?")
  }

  test("s53 CMS state is bucket-bounded and evicts with the watermark") {
    val ev = Tables.events(spark, sf)
    val (s, batches, _) = runWithMetrics("s53_stream_cms_topusers", ev.count())
    val windows = ev.select(window(col("ts"), "10 minutes")).distinct().count()
    // the sketch's whole point: state ≤ windows × (2 rows × 256 buckets)
    // regardless of how many distinct users flow through
    assert(s.maxStateRows <= windows * 512,
      s"s53 state ${s.maxStateRows} exceeded the sketch budget")
    val wmMs = s.lastWatermarkMs.get
    val openWins = ev
      .select(window(col("ts"), "10 minutes").getField("end")
        .cast("long").as("we")).distinct()
      .filter(col("we") * 1000 > wmMs).count()
    assert(batches.last.stateRows <= openWins * 512,
      s"final state ${batches.last.stateRows} not evicted to the " +
        s"$openWins open windows' budget")
  }

  test("s54 release funnel: dedup state is EXACTLY the new fresh hashes") {
    // the funnel's only stateful operator is dropDuplicates("h") AFTER the
    // static-history left-anti join — so state must equal the distinct
    // fresh hashes NOT in history (never the history itself, never the raw
    // stream): the s30 incremental-dedup bound, asserted exactly
    val docs = Tables.table(spark, sf, "documents")
    val fresh = docs.filter(col("doc_id") % 10 === 7)
      .select(md5(col("text")).as("h")).distinct()
    val hist = docs.filter(col("doc_id") % 10 =!= 7)
      .select(md5(col("text")).as("h")).distinct()
    val newHashes = fresh.join(hist, Seq("h"), "left_anti").count()
    val (s, batches, emitted) =
      runWithMetrics("s54_stream_release_funnel", docs.count())
    assert(emitted === 4L, s"funnel emitted $emitted stages, expected 4")
    assert(s.maxStateRows === newHashes,
      s"s54 state ${s.maxStateRows} != new fresh hashes $newHashes — " +
        "history leaked into stream state?")
    assert(batches.last.stateRows === newHashes,
      s"s54 final state ${batches.last.stateRows} != $newHashes")
  }

  test("s59 DSIR gate is ZERO-state: a pure per-row scorer at any volume") {
    // the gate folds a collected 512-entry micro-unit rate table into each
    // row — no stateful operator may appear, so state is 0 in every batch
    // and the stream is append-legal unbounded
    val docs = Tables.table(spark, sf, "documents")
    val (s, batches, emitted) =
      runWithMetrics("s59_stream_dsir_gate", docs.count())
    assert(emitted === docs.count(), "one verdict per doc")
    assert(s.maxStateRows === 0L,
      s"s59 grew ${s.maxStateRows} state rows — the gate must be stateless")
    assert(batches.forall(_.stateRows == 0L))
  }

  test("append-mode harness keeps table-sized results off the driver") {
    // append outputs scale with the input (s01/s23/s25 are |events| rows):
    // the harness must hand back a distributed file-sink read, never a
    // driver-resident memory table — at sf1 the memory sink made s01 cost
    // 6.1 s of driver collect; the file sink runs it in ~1 s (VERDICT r8 #4)
    val df = SparkEntry.queries("s01_replay_envelope")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("parquet"),
      s"append result must come from the distributed file sink:\n$p")
    assert(!p.contains("MemoryPlan") && !p.contains("LocalTableScan"),
      s"append result must not be a driver-side memory table:\n$p")
    assert(df.count() === Tables.events(spark, sf).count(),
      "file-sink replay must still deliver every envelope row")
  }
}
