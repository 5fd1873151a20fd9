package graft.sources.replay

import java.io.{BufferedInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The produce half of the wire dialect (Produce v3 + RecordBatch v2
  * ENCODE with real CRC-32C) and the graft-replay SINK built on it — the
  * engine-side equivalent of the reference's populate_topic test producer
  * (tests/utils.rs:156-212). All over real sockets against the broker
  * double, which — like a real broker and unlike its tolerant consume
  * side — VERIFIES the produce-path checksum. */
class KafkaProduceSpec extends graft.SparkSpec {
  import KafkaWire._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** empty 3-partition topic: nothing file-backed, produce-only. */
  private def emptyBroker(topic: String): FakeKafkaBroker = {
    val dir = java.nio.file.Files.createTempDirectory("kafka-prod").toString
    new FakeKafkaBroker(dir, topic, explicitPartitions = Some(Seq(0, 1, 2)))
  }

  test("produce appends after the base log and round-trips bit-identically") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new FakeKafkaBroker(dir, "events")
    try {
      val c = new KafkaLogClient(broker.clientPath)
      val before = c.endOffset(0)
      val recs = Seq(
        (bytes("k1"), bytes("v1"), 1723700000123L),
        (null, bytes("v2"), 1723700000456L),
        (bytes("k3"), null, 1723700000789L)) // null value = tombstone
      val base = c.produce(0, recs)
      assert(base === before, "assigned base offset must be the old log end")
      assert(c.endOffset(0) === before + 3)

      val frames = c.openFrames(0, before, needKey = true, needValue = true)
      try recs.foreach { case (k, v, tsMs) =>
        frames.readFrame()
        assert(java.util.Arrays.equals(frames.key, k))
        assert(java.util.Arrays.equals(frames.value, v))
        assert(frames.tsUs === tsMs * 1000L, "broker time is milliseconds")
      } finally frames.close()
    } finally broker.close()
  }

  test("compressed produce round-trips through all four codecs") {
    (1 to 4).foreach { codec =>
      val broker = emptyBroker(s"codec$codec")
      try {
        val c = new KafkaLogClient(broker.clientPath)
        val recs = (0 until 100).map(i =>
          (bytes(s"key-$i"), bytes(s"value-$i" * 5), 1723700000000L + i))
        assert(c.produce(1, recs, codec) === 0L)
        val frames = c.openFrames(1, 0L, needKey = true, needValue = true)
        try recs.foreach { case (k, v, tsMs) =>
          frames.readFrame()
          assert(java.util.Arrays.equals(frames.key, k), s"codec $codec key")
          assert(java.util.Arrays.equals(frames.value, v), s"codec $codec value")
          assert(frames.tsUs === tsMs * 1000L)
        } finally frames.close()
      } finally broker.close()
    }
  }

  test("the broker verifies produce CRC-32C and answers CORRUPT_MESSAGE") {
    val good = encodeRecordBatchV2(Seq((null, bytes("x"), 1000L)), 0)
    assert(crcValid(good))
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    assert(!crcValid(bad))

    val broker = emptyBroker("crc")
    try {
      val sock = new Socket("127.0.0.1", broker.boundPort)
      try {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(sock.getOutputStream)
        def produceRaw(rs: Array[Byte]): Short = {
          val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
          o.writeShort(-1); o.writeShort(-1); o.writeInt(30000)
          o.writeInt(1); writeString(o, "crc")
          o.writeInt(1); o.writeInt(0)
          o.writeInt(rs.length); o.write(rs)
          val r = request(in, out, ApiProduce, 3, body.toByteArray)
          r.readInt(); readString(r); r.readInt() // topics=1, name, parts=1
          r.readInt()                             // partition
          r.readShort()                           // error code
        }
        assert(produceRaw(bad) === 2, "CORRUPT_MESSAGE for a flipped byte")
        assert(produceRaw(good) === 0, "the untouched batch lands")
      } finally sock.close()
    } finally broker.close()
  }

  test("produce to an unknown partition fails with a named error at both layers") {
    val broker = emptyBroker("route")
    try {
      // client layer: the metadata-resolved route check refuses before the wire
      val c = new KafkaLogClient(broker.clientPath)
      val e = intercept[java.io.IOException](
        c.produce(7, Seq((null, bytes("x"), 1L))))
      assert(e.getMessage.contains("partition route/7 unknown"), e.getMessage)

      // broker layer: a raw Produce for a partition it does not host answers
      // UNKNOWN_TOPIC_OR_PARTITION (3), like a real broker
      val sock = new Socket("127.0.0.1", broker.boundPort)
      try {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(sock.getOutputStream)
        val rs = encodeRecordBatchV2(Seq((null, bytes("x"), 1L)), 0)
        val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
        o.writeShort(-1); o.writeShort(-1); o.writeInt(30000)
        o.writeInt(1); writeString(o, "route")
        o.writeInt(1); o.writeInt(7)
        o.writeInt(rs.length); o.write(rs)
        val r = request(in, out, ApiProduce, 3, body.toByteArray)
        r.readInt(); readString(r); r.readInt(); r.readInt()
        assert(r.readShort() === 3, "UNKNOWN_TOPIC_OR_PARTITION")
      } finally sock.close()
    } finally broker.close()
  }

  test("batch DataFrame write routes by Kafka's default partitioner and reads back") {
    val broker = emptyBroker("dfwrite")
    try {
      import spark.implicits._
      val rows = (0 until 300).map(i => (bytes(s"user-${i % 17}"), bytes(s"payload-$i")))
      rows.toDF("key", "value")
        .write.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath)
        .option("producer.batch.records", "64") // several flushes per task
        .mode("append").save()

      val back = spark.read.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath)
        .load()
        .select(col("key").cast("string"), col("value").cast("string"),
          col("partition"))
        .as[(String, String, Int)].collect()
      assert(back.length === rows.length)
      assert(back.map(r => (r._1, r._2)).toSet ===
        rows.map(r => (new String(r._1), new String(r._2))).toSet)
      // every row sits where Kafka's murmur2 default partitioner routes it
      back.foreach { case (k, _, p) =>
        assert(p === (ReplayWrite.murmur2(bytes(k)) & 0x7fffffff) % 3,
          s"key $k landed on $p")
      }
    } finally broker.close()
  }

  test("explicit partition column overrides the partitioner; bad columns are loud") {
    val broker = emptyBroker("explicit")
    try {
      import spark.implicits._
      (0 until 30).map(i => (bytes(s"v$i"), i % 2))
        .toDF("value", "partition")
        .write.format("graft-replay")
        .option("client", "kafka").option("path", broker.clientPath)
        .mode("append").save()
      assert(broker.producedCount(0) === 15)
      assert(broker.producedCount(1) === 15)
      assert(broker.producedCount(2) === 0)

      val noValue = intercept[Exception](
        Seq(1, 2).toDF("partition").write.format("graft-replay")
          .option("client", "kafka").option("path", broker.clientPath)
          .mode("append").save())
      assert(noValue.getMessage.contains("value"), noValue.getMessage)
      val unknown = intercept[Exception](
        Seq(("a", "b")).toDF("value", "wat").write.format("graft-replay")
          .option("client", "kafka").option("path", broker.clientPath)
          .mode("append").save())
      assert(unknown.getMessage.contains("wat"), unknown.getMessage)
    } finally broker.close()
  }

  test("streaming sink pipes a replay stream back into a topic end-to-end") {
    // source broker serves the file-backed events log; the query projects
    // key/value/timestamp and PRODUCES into an empty topic on a second
    // broker — then a batch read of the sink topic must hold every record
    val dir = ReplayLog.ensureLog(spark, sf)
    val src = new FakeKafkaBroker(dir, "events")
    val dst = emptyBroker("mirrored")
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-sink").toString
    try {
      val q = spark.readStream.format("graft-replay")
        .option("client", "kafka").option("path", src.clientPath)
        .option("maxRowsPerTrigger", "500") // several epochs → several produces
        .load()
        .select(col("key"), col("value"), col("timestamp"))
        .writeStream.format("graft-replay")
        .option("client", "kafka").option("path", dst.clientPath)
        .option("producer.compression.type", "zstd")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val srcDf = spark.read.format("graft-replay")
        .option("client", "kafka").option("path", src.clientPath).load()
        .select(col("value").cast("string"), col("timestamp"))
      val dstDf = spark.read.format("graft-replay")
        .option("client", "kafka").option("path", dst.clientPath).load()
        .select(col("value").cast("string"), col("timestamp"))
      import spark.implicits._
      val want = srcDf.as[(String, java.sql.Timestamp)].collect()
        .map { case (v, ts) => (v, ts.getTime) }.sorted.toSeq
      val got = dstDf.as[(String, java.sql.Timestamp)].collect()
        .map { case (v, ts) => (v, ts.getTime) }.sorted.toSeq
      assert(got === want, "the mirrored topic must hold every record " +
        "(values bit-identical, timestamps at broker ms precision)")
    } finally { src.close(); dst.close() }
  }
}
