package graft

import java.nio.file.Files
import graft.sources.replay.ReplayLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics the DuckDB oracle can't express: watermark late-data
  * drops across real micro-batch boundaries, and batch-equivalence of the
  * streaming aggregations. */
class StreamingSemanticsSpec extends SparkSpec {

  test("stateful dedup is exactly-once across a kill + checkpoint resume") {
    val log = ReplayLog.ensureLog(spark, sf)
    val ckpt = Files.createTempDirectory("ck-resume").toString
    val out = Files.createTempDirectory("out-resume").toString
    val nEvents = Tables.events(spark, sf).count()
    def doubled() = spark.readStream.format("graft-replay").option("path", log)
      .option("maxRowsPerTrigger", "50").load()
      .unionAll(spark.readStream.format("graft-replay").option("path", log)
        .option("maxRowsPerTrigger", "50").load())
      .dropDuplicates("partition", "offset")
      .select(col("partition"), col("offset"))
    // run 1: small batches, killed mid-stream (wherever it happens to be)
    val q1 = doubled().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    q1.awaitTermination(2000); q1.stop()
    // run 2: resume from the same checkpoint, run to the end
    val q2 = doubled().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // dedup state + sink manifest must survive the restart: every record
    // exactly once no matter where run 1 died
    val got = spark.read.parquet(out)
    assert(got.count() === nEvents, "exactly-once violated across resume")
    assert(got.distinct().count() === nEvents)
  }

  test("watermark drops late events across micro-batches (s05 properties)") {
    // the FREE-RUNNING late-drop lane (registry row retired in round 13 —
    // s05b's pinned twin owns the oracle; this keeps the adaptive ~6-batch
    // behavior property-covered): every 20th event arrives 2h late through
    // the replay source, small micro-batches advance the watermark between
    // triggers, append-mode windows drop what fell behind it
    val log = ReplayLog.ensureLog(spark, sf, late = true)
    val total = Tables.events(spark, sf).count()
    val cap = math.max(50L, total / ReplayLog.NumPartitions / 6)
    def run(): Long = {
      val name = s"s05_free_spec_${System.nanoTime()}"
      val q = spark.readStream.format("graft-replay").option("path", log)
        .option("maxRowsPerTrigger", cap.toString).load()
        .withColumn("ts", col("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).agg(sum("n")).collect()(0).getLong(0)
    }
    val res = run()
    assert(res < total, s"late events must be dropped (kept $res of $total)")
    assert(res > total / 2, "most events must survive")
    // determinism: identical bounded replay -> identical result
    assert(res === run())
  }

  test("streaming tumbling agg equals the identical batch query") {
    val streamed = SparkEntry.queries("s02_tumbling_window")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy((Tables.tsUs .divide(lit(600000000L)).cast("long") * 600)
        .as("ws_sec"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stateful agg survives multiple micro-batches with state carried over") {
    import spark.implicits._
    val log = ReplayLog.ensureLog(spark, sf)
    // envelope value is the props json; count records per key-partition across
    // many small batches via mapGroupsWithState
    val name = "stateful_mb_spec"
    val typed = spark.readStream.format("graft-replay")
      .option("path", log).option("maxRowsPerTrigger", "50").load()
      .select(col("partition").cast("long")).as[Long]
    val counted = typed.groupByKey(identity)
      .mapGroupsWithState(org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (p: Long, it: Iterator[Long], st: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = st.getOption.getOrElse(0L) + it.size
          st.update(n); (p, n)
      }.toDF("partition", "n")
    val q = counted.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.lastProgress.batchId >= 2, "needs multiple batches to prove state carry-over")
    // final state per partition equals true counts
    val finalCounts = spark.table(name).groupBy("partition").agg(max("n").as("n"))
    val want = Tables.events(spark, sf)
      .groupBy((col("event_id") % 3).cast("long").as("partition"))
      .agg(count(lit(1)).as("n"))
    assert(finalCounts.exceptAll(want).count() === 0)
    assert(want.exceptAll(finalCounts).count() === 0)
  }
}
