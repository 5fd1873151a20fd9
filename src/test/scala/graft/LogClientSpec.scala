package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.replay.{FrameReader, LogClient, ReplayOptions}

/** The broker-client seam: a synthetic in-memory LogClient slots in behind
  * the graft-replay source via the `client` option, with every offset /
  * planning / admission path unchanged — proving a real Kafka consumer could
  * do the same (the reference's actual transport,
  * /root/reference/src/kafka/execution.rs:74-88). Also pins the two
  * interpreted consumer.* keys. */
object LogClientSpec {
  /** Deterministic fake log: `path` is "mem://<partitions>x<records>";
    * record (p, o) has key "k-p-o", value "v-p-o", ts = o seconds. */
  final class FakeLogClient(path: String) extends LogClient {
    private val Array(nParts, nRecs) =
      path.stripPrefix("mem://").split("x").map(_.toInt)
    override def listPartitions(): Seq[Int] = 0 until nParts
    override def endOffset(p: Int): Long = nRecs.toLong
    override def recordCount(p: Int): Long = nRecs.toLong
    override def sizeInBytes(p: Int): Long = nRecs.toLong * 16
    override def openFrames(p: Int, start: Long, needKey: Boolean,
        needValue: Boolean): FrameReader = new FrameReader {
      private var off = start - 1
      var key: Array[Byte] = _
      var value: Array[Byte] = _
      var tsUs: Long = _
      override def readFrame(): Unit = {
        off += 1
        key = if (needKey) s"k-$p-$off".getBytes("UTF-8") else null
        value = if (needValue) s"v-$p-$off".getBytes("UTF-8") else null
        tsUs = off * 1000000L
      }
      override def close(): Unit = ()
    }
  }

  // registered once at class-load — the pattern a broker client would use on
  // a real cluster (static initializer reachable from executors)
  LogClient.register("fake", (p, _) => new FakeLogClient(p))
}

class LogClientSpec extends SparkSpec {
  LogClientSpec // force the registration

  test("batch read runs against an alternate client") {
    val df = spark.read.format("graft-replay")
      .option("client", "fake").option("path", "mem://2x5").load()
    assert(df.count() === 10)
    val r = df.select(col("key").cast("string"), col("value").cast("string"),
        col("partition"), col("offset"))
      .where(col("partition") === 1 && col("offset") === 3).head()
    assert(r.getString(0) === "k-1-3")
    assert(r.getString(1) === "v-1-3")
  }

  test("micro-batch stream with admission control against the fake client") {
    import spark.implicits._
    val out = spark.readStream.format("graft-replay")
      .option("client", "fake").option("path", "mem://3x7")
      .option("maxRowsPerTrigger", "2")
      .load()
      .select(col("partition"), col("offset"))
    val name = "logclient_fake_stream"
    val ckpt = java.nio.file.Files.createTempDirectory("logclient-ckpt").toString
    val q = out.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name).as[(Int, Long)].collect().toSet
    assert(rows === (for (p <- 0 until 3; o <- 0 until 7) yield (p, o.toLong)).toSet)
  }

  test("consumer.auto.offset.reset=latest is the start fallback") {
    // no explicit startingOffset(s): reset=latest means "only new records"
    val viaReset = ReplayOptions.parse(new CaseInsensitiveStringMap(
      java.util.Map.of("path", "mem://1x4", "consumer.auto.offset.reset", "latest")))
    assert(viaReset.startingLatest)
    assert(viaReset.startFor(0, end = 4L) === 4L)
    // an explicit startingOffsets option overrides the consumer fallback
    val explicitWins = ReplayOptions.parse(new CaseInsensitiveStringMap(
      java.util.Map.of("path", "mem://1x4", "startingOffsets", "earliest",
        "consumer.auto.offset.reset", "latest")))
    assert(!explicitWins.startingLatest)
    // and the batch scan honors it: latest start = empty read
    val df = spark.read.format("graft-replay")
      .option("client", "fake").option("path", "mem://2x5")
      .option("consumer.auto.offset.reset", "latest").load()
    assert(df.count() === 0)
  }

  test("batch read over a real TCP hop matches the file client bit-for-bit") {
    val dir = graft.sources.replay.ReplayLog.ensureLog(spark, sf)
    val server = new graft.sources.replay.SocketLogServer(dir)
    try {
      def read(client: String, path: String) = spark.read.format("graft-replay")
        .option("client", client).option("path", path).load()
        .select(col("partition"), col("offset"), col("key").cast("string"),
          col("value").cast("string"), col("timestamp"))
        .collect().toSet
      val viaSocket = read("socket", server.address)
      val viaFile = read("file", dir)
      assert(viaSocket.nonEmpty)
      assert(viaSocket === viaFile)
    } finally server.close()
  }

  test("socket fetch prunes payload bytes for a payload-free projection") {
    val dir = graft.sources.replay.ReplayLog.ensureLog(spark, sf)
    val server = new graft.sources.replay.SocketLogServer(dir)
    try {
      // counts only — key/value are pruned, so the server ships NULL blobs;
      // the count must still see every record.
      val n = spark.read.format("graft-replay")
        .option("client", "socket").option("path", server.address).load()
        .select(col("offset")).count()
      val nFile = spark.read.format("graft-replay")
        .option("path", dir).load().count()
      assert(n === nFile)
    } finally server.close()
  }

  test("micro-batch stream over TCP: admission, checkpointed offsets, clean resume") {
    import spark.implicits._
    val dir = graft.sources.replay.ReplayLog.ensureLog(spark, sf)
    val server = new graft.sources.replay.SocketLogServer(dir)
    val ckpt = java.nio.file.Files.createTempDirectory("socket-ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("socket-sink").toString
    try {
      val total = spark.read.format("graft-replay").option("path", dir).load().count()
      // parquet sink (memory cannot recover a checkpoint): run twice against
      // the SAME checkpoint + output dir
      def run(): Unit = {
        val q = spark.readStream.format("graft-replay")
          .option("client", "socket").option("path", server.address)
          .option("maxRowsPerTrigger", (total / 4).max(1).toString)
          .load()
          .select(col("partition"), col("offset"))
          .writeStream.format("parquet")
          .option("path", sink)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // first run drains the log in several admitted batches over the network
      run()
      val first = spark.read.parquet(sink).as[(Int, Long)].collect()
      assert(first.length.toLong === total)
      assert(first.distinct.length === first.length, "duplicate (partition, offset)")
      // a restart from the same checkpoint resumes AT the committed end:
      // nothing new to read, nothing re-read
      run()
      assert(spark.read.parquet(sink).count() === total)
    } finally server.close()
  }

  /** Producer half for the live-tail test: append complete frames to a
    * partition's log + idx (log bytes first, index entries last — a reader
    * that races the append sees either the old count or complete new frames;
    * `ReplayLog.safeRecordCount` additionally tolerates a torn tail). */
  private def appendFrames(dir: String, p: Int,
      frames: Seq[(String, String, Long)]): Unit = {
    import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
    val logF = graft.sources.replay.ReplayLog.logFile(dir, p)
    val idxF = graft.sources.replay.ReplayLog.idxFile(dir, p)
    var pos = logF.length()
    val idxBuf = new java.io.ByteArrayOutputStream()
    val idx = new DataOutputStream(idxBuf)
    val log = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(logF, true)))
    frames.foreach { case (k, v, ts) =>
      idx.writeLong(pos)
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      log.writeInt(kb.length); log.write(kb); pos += 4L + kb.length
      log.writeInt(vb.length); log.write(vb); pos += 4L + vb.length
      log.writeLong(ts); pos += 8L
    }
    log.close()
    val io = new FileOutputStream(idxF, true)
    io.write(idxBuf.toByteArray); io.close()
  }

  test("live tail over TCP: frames produced AFTER stream start are delivered") {
    // the broker reality the reference consumes from: the log GROWS while
    // the consumer runs. The source re-polls endOffset every trigger, so a
    // continuously-triggered query picks up newly-produced frames with no
    // restart. Sequence: drain the initial log, produce more, drain again.
    val dir = java.nio.file.Files.createTempDirectory("live-tail").toString
    for (p <- 0 until 2)
      appendFrames(dir, p, (0 until 5).map(i => (s"K$p-$i", s"V$i", i * 1000000L)))
    val server = new graft.sources.replay.SocketLogServer(dir)
    val name = "live_tail_sink"
    try {
      val q = spark.readStream.format("graft-replay")
        .option("client", "socket").option("path", server.address).load()
        .select(col("partition"), col("offset"),
          col("value").cast("string").as("v"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("live-tail-ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table(name).count() === 10L)
        // the producer appends while the query keeps running
        for (p <- 0 until 2)
          appendFrames(dir, p,
            (5 until 8).map(i => (s"K$p-$i", s"V$i", i * 1000000L)))
        q.processAllAvailable()
        val rows = spark.table(name)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
        assert(rows.length === 16)
        assert(rows.distinct.length === 16, "duplicate delivery on live tail")
        assert(rows.count(_._2 >= 5) === 6, "appended frames not all delivered")
        assert(rows.filter(r => r._1 === 0 && r._2 === 7L).map(_._3).toSeq === Seq("V7"))
      } finally q.stop()
    } finally server.close()
  }

  test("unknown consumer.* keys stay opaque; group.id is interpreted") {
    val o = ReplayOptions.parse(new CaseInsensitiveStringMap(
      java.util.Map.of("path", "mem://1x1",
        "consumer.group.id", "graft-test",
        "consumer.bootstrap.servers", "broker:9092")))
    assert(o.consumerConf("group.id") === "graft-test")
    assert(o.consumerConf("bootstrap.servers") === "broker:9092")
  }
}
