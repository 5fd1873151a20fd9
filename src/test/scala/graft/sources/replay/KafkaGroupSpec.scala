package graft.sources.replay

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Consumer-group offset commit-back (the last reference-parity row:
  * `enable.auto.commit=true`, reference tests/utils.rs:272) — Kafka's
  * FindCoordinator v0 + OffsetCommit v2 + OffsetFetch v1 through the
  * LogClient seam. Semantics: commit-back is OBSERVABILITY for external
  * lag monitors; restart truth stays the checkpoint WAL, exactly as the
  * reference's rdkafka auto-commit never feeds back into its bounded
  * ranges. Delivery: the engine's per-batch commit(end) callback under
  * ProcessingTime, plus a close-flush in stop() (librdkafka's auto-commit
  * close behavior). The flush source is mode-aware (ADVICE r10): under
  * ProcessingTime it is the last WAL-committed end, so a kill mid-batch
  * never reports planned-but-unwritten progress; under AvailableNow —
  * whose executor never calls commit mid-run and always finishes its
  * planned batches — it is the last planned end. */
class KafkaGroupSpec extends graft.SparkSpec {

  test("auto-commit publishes each batch's end offsets under the group") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events")
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-grp").toString
    try {
      val q = spark.readStream.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath)
        .option("consumer.group.id", "graft-lag-monitor")
        .option("consumer.enable.auto.commit", "true")
        .option("maxRowsPerTrigger", "500")   // several batches → several commits
        .load()
        .select(col("partition"), col("offset"))
        .writeStream.format("memory").queryName("kafka_grp_mem")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val file = new FileLogClient(dir)
      val want = file.listPartitions().map(p => p -> file.endOffset(p)).toMap
      // broker-side view (what an external monitor reads)
      assert(broker.committed("graft-lag-monitor") === want,
        "committed offsets must be the log-end offsets after run-to-end")
      // client-side OffsetFetch round-trip
      val c = new KafkaLogClient(broker.clientPath)
      assert(c.committedOffsets("graft-lag-monitor", want.keys.toSeq) === want)
      // a group that never committed reads empty (-1 sentinel filtered)
      assert(c.committedOffsets("nobody", want.keys.toSeq) === Map.empty)
    } finally broker.close()
  }

  test("checkpoint resume over the kafka backend reads each record exactly once") {
    // mid-run interruption + restart from the same checkpoint: the WAL owns
    // restart truth (never the broker's committed group offsets), and the
    // union of the two runs must be every record exactly once
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events")
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-resume").toString
    val out = java.nio.file.Files.createTempDirectory("kafka-resume-out").toString
    try {
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-replay")
          .option("client", "kafka").option("path", broker.clientPath)
          .option("consumer.group.id", "resume-g")
          .option("consumer.enable.auto.commit", "true")
          .option("maxRowsPerTrigger", "400")
          .load()
          .select(col("partition"), col("offset"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()   // full run to end
      runOnce()   // resume over the same checkpoint: nothing new to read
      val got = spark.read.parquet(out)
        .select(col("partition"), col("offset")).collect()
      assert(got.length === got.toSet.size, "a record was read twice")
      val file = new FileLogClient(dir)
      val nAll = file.listPartitions().map(file.recordCount).sum
      assert(got.length.toLong === nAll,
        s"expected exactly $nAll records across both runs, got ${got.length}")
    } finally broker.close()
  }

  test("stop() close-flush never commits a planned-but-unfinished batch (ADVICE r10)") {
    // Unit-level pin of the mode-aware flush: drive the MicroBatchStream
    // directly, simulating the three lifecycle shapes.
    val dir = ReplayLog.ensureLog(spark, sf)
    def stream(broker: KafkaLogServer) = new ReplayMicroBatchStream(
      ReplayOptions(path = broker.clientPath, maxRowsPerTrigger = None,
        minRowsPerTrigger = None, maxTriggerDelayMs = 0L, startingUniform = 0L,
        startingPerPartition = Map.empty, failOnDataLoss = true,
        consumerConf = Map("group.id" -> "flush-g", "enable.auto.commit" -> "true"),
        clientKind = "kafka"))
    def plan(s: ReplayMicroBatchStream): ReplayOffset = {
      val start = s.initialOffset().asInstanceOf[ReplayOffset]
      val end = s.latestOffset(start,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      s.planInputPartitions(start, end)
      end.asInstanceOf[ReplayOffset]
    }
    // 1. ProcessingTime killed mid-batch: planned, never commit()ed → the
    //    close-flush must publish NOTHING (the old code published the plan)
    val b1 = new KafkaLogServer(dir, "events")
    try {
      val s = stream(b1); plan(s); s.stop()
      assert(b1.committed("flush-g") === Map.empty,
        "a batch that never reached commit() must not be close-flushed")
    } finally b1.close()
    // 2. ProcessingTime with a completed batch: commit(end) fired → the
    //    close-flush publishes exactly that end
    val b2 = new KafkaLogServer(dir, "events")
    try {
      val s = stream(b2); val end = plan(s)
      s.commit(end); s.stop()
      assert(b2.committed("flush-g") === end.offsets)
    } finally b2.close()
    // 3. AvailableNow (commit() never fires there): the planned end IS the
    //    run-to-end result — close-flush keeps publishing it
    val b3 = new KafkaLogServer(dir, "events")
    try {
      val s = stream(b3)
      s.prepareForTriggerAvailableNow()
      val end = plan(s); s.stop()
      assert(b3.committed("flush-g") === end.offsets)
    } finally b3.close()
  }

  test("no group.id or auto-commit off → nothing is committed") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events")
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-grp2").toString
    try {
      val q = spark.readStream.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath)
        .option("consumer.group.id", "silent-group") // auto.commit defaults off
        .load()
        .select(col("offset"))
        .writeStream.format("memory").queryName("kafka_grp_mem2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(broker.committed("silent-group") === Map.empty,
        "auto.commit defaults to OFF — nothing may be committed")
    } finally broker.close()
  }

  test("a partition born mid-stream is discovered through the kafka backend") {
    // the reference hardcodes its partition count (execution.rs:47-49);
    // here Metadata is re-requested every trigger, so a topic that GROWS
    // while the stream runs is picked up — through the wire protocol, not
    // just the file client
    import graft.sources.replay.{ReplayLog => RL}
    val dir = java.nio.file.Files.createTempDirectory("kgrow").toString
    RL.writePartitionFile(dir, 0, Iterator(
      org.apache.spark.sql.Row("k0".getBytes, "v0".getBytes, 1000L)))
    val broker = new KafkaLogServer(dir, "events")
    val name = "kafka_grow_mem"
    val q = spark.readStream.format("graft-replay")
      .option("client", "kafka").option("path", broker.clientPath).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kgrow-ck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table(name).count() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(spark.table(name).count() === 1)
      RL.writePartitionFile(dir, 1, Iterator(
        org.apache.spark.sql.Row("k1".getBytes, "v1".getBytes, 2000L),
        org.apache.spark.sql.Row("k2".getBytes, "v2".getBytes, 3000L)))
      while (spark.table(name).count() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally { q.stop(); broker.close() }
    val got = spark.table(name)
    assert(got.count() === 3)
    assert(got.filter(col("partition") === 1).count() === 2)
  }

  test("an unreachable coordinator does not fail the batch") {
    // file-backed client: commitOffsets is a documented no-op, and the
    // stream must run cleanly with the same options set
    val dir = ReplayLog.ensureLog(spark, sf)
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-grp3").toString
    val q = spark.readStream.format("graft-replay")
      .option("path", dir)
      .option("consumer.group.id", "g").option("consumer.enable.auto.commit", "true")
      .load().select(col("offset"))
      .writeStream.format("memory").queryName("kafka_grp_mem3")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("kafka_grp_mem3").count() > 0)
  }
}
