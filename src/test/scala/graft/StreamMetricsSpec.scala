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
