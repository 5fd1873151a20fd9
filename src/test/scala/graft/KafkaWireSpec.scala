package graft

import org.apache.spark.sql.functions._

import graft.sources.replay.{KafkaLogServer, KafkaLogClient, ReplayLog}

/** Contract tests for the `kafka` [[graft.sources.replay.LogClient]] backend
  * — the reference's literal core capability (an rdkafka consumer with
  * partition EOF, /root/reference/src/kafka/execution.rs:62-112) spoken as
  * the public Kafka wire protocol with zero broker libraries.
  *
  * The in-process [[KafkaLogServer]] is wire-faithful (Metadata v0 /
  * ListOffsets v1 / Fetch v4 / RecordBatch v2), so these tests prove the
  * client's framing, varint and batch decode against real encoded bytes over
  * real TCP. The final test runs the same contract against an actual broker
  * and is gated on `GRAFT_KAFKA_BOOTSTRAP` / `GRAFT_KAFKA_TOPIC`, skipping
  * cleanly (canceled, not silently passed) when no broker is reachable —
  * the sandbox has none.
  */
class KafkaWireSpec extends SparkSpec {

  test("planning contract: partitions and offsets match the file client") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events")
    try {
      val kafka = new KafkaLogClient(s"${broker.address}/events")
      val file = new graft.sources.replay.FileLogClient(dir)
      assert(kafka.listPartitions() === file.listPartitions())
      kafka.listPartitions().foreach { p =>
        assert(kafka.endOffset(p) === file.endOffset(p), s"endOffset p$p")
        assert(kafka.recordCount(p) === file.recordCount(p), s"recordCount p$p")
      }
    } finally broker.close()
  }

  test("batch read through the kafka client matches the file client") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events")
    try {
      def read(client: String, path: String) = spark.read.format("graft-replay")
        .option("client", client).option("path", path).load()
        .select(col("partition"), col("offset"), col("key").cast("string"),
          col("value").cast("string"),
          // Kafka timestamps are ms: truncate the file side's µs to compare
          (col("timestamp").cast("long") -
            col("timestamp").cast("long") % 1000).as("ts_ms"))
        .collect().toSet
      val viaKafka = read("kafka", broker.clientPath)
      val viaFile = read("file", dir)
      assert(viaKafka.nonEmpty)
      assert(viaKafka === viaFile)
    } finally broker.close()
  }

  test("multi-batch + truncated-tail record sets decode exactly") {
    val dir = ReplayLog.ensureLog(spark, sf)
    // 7-record batches force many batches per range; every record_set also
    // carries a cut partial batch after the real one (brokers cut at
    // max_bytes) — the decoder must take the whole batches and re-fetch
    val broker = new KafkaLogServer(dir, "events", batchRecords = 7,
      truncateTail = true)
    try {
      val n = spark.read.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath).load()
        .count()
      val nFile = spark.read.format("graft-replay").option("path", dir).load().count()
      assert(n === nFile)
    } finally broker.close()
  }

  test("micro-batch stream with admission control over the kafka client") {
    import spark.implicits._
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events")
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-ckpt").toString
    try {
      val q = spark.readStream.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath)
        .option("maxRowsPerTrigger", "300").load()
        .select(col("partition").cast("long"), col("offset"))
        .writeStream.format("memory").queryName("kafka_mem")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("kafka_mem").as[(Long, Long)].collect().toSet
      val want = spark.read.format("graft-replay").option("path", dir).load()
        .select(col("partition").cast("long"), col("offset"))
        .as[(Long, Long)].collect().toSet
      assert(got === want)
    } finally broker.close()
  }

  test("kafka contract against a real broker (gated on GRAFT_KAFKA_BOOTSTRAP)") {
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    val topic = sys.env.get("GRAFT_KAFKA_TOPIC")
    assume(bootstrap.isDefined && topic.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port and GRAFT_KAFKA_TOPIC to run " +
        "the live-broker contract (skipped: no broker in this environment)")
    val c = new KafkaLogClient(s"${bootstrap.get}/${topic.get}")
    val parts = c.listPartitions()
    assert(parts.nonEmpty, "topic must have partitions")
    parts.foreach { p =>
      val end = c.endOffset(p)
      val n = c.recordCount(p)
      assert(end >= 0L && n >= 0L && end >= n - 1,
        s"offsets sane for p$p: end=$end count=$n")
    }
    // tail-read up to 10 records of the first non-empty partition
    parts.find(p => c.recordCount(p) > 0).foreach { p =>
      val end = c.endOffset(p)
      val start = math.max(end - 10, end - c.recordCount(p))
      val fr = c.openFrames(p, start, needKey = true, needValue = true)
      try {
        (start until end).foreach { _ =>
          fr.readFrame()
          assert(fr.tsUs >= 0L)
        }
      } finally fr.close()
    }
  }
}
