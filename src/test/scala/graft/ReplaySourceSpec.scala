package graft

import java.nio.file.Files
import graft.sources.replay.ReplayLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The custom DSv2 replay source: offset bookkeeping, bounded batches,
  * exactly-once delivery, null parity with the reference
  * (/root/reference/src/kafka/execution.rs:135-142), checkpoint resume. */
class ReplaySourceSpec extends SparkSpec {

  private lazy val log = ReplayLog.ensureLog(spark, sf)
  private lazy val nEvents = Tables.events(spark, sf).count()

  test("batch read returns the full envelope with correct partitioning") {
    val df = spark.read.format("graft-replay").option("path", log).load()
    assert(df.count() === nEvents)
    assert(df.select("partition").distinct().count() === 3)
    // key/offset arithmetic matches the deterministic envelope derivation
    val r = df.filter(col("partition") === 1 && col("offset") === 0)
      .selectExpr("cast(key as string)").collect()
    assert(r.length === 1 && r(0).getString(0) === "Key 1")
  }

  test("micro-batch replay is exactly-once and bounded by maxRowsPerTrigger") {
    val name = "replay_spec_mb"
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("maxRowsPerTrigger", "100").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.lastProgress.batchId >= 2, "expected multiple micro-batches")
    val got = spark.table(name)
    assert(got.count() === nEvents)
    assert(got.select("partition", "offset").distinct().count() === nEvents)
  }

  test("startingOffset skips records in every partition (stream and batch)") {
    val name = "replay_spec_so"
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("startingOffset", "50").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name)
    val perPart = ReplayLog.listPartitions(log)
      .map(p => math.max(ReplayLog.recordCount(log, p) - 50, 0)).sum
    assert(got.count() === perPart)
    assert(got.agg(org.apache.spark.sql.functions.min("offset")).head.getLong(0) === 50L)
    // batch read honors it too
    val b = spark.read.format("graft-replay")
      .option("path", log).option("startingOffset", "50").load()
    assert(b.count() === perPart)
  }

  test("column pruning pushes into the scan; payload bytes are never read") {
    val b = spark.read.format("graft-replay").option("path", log).load()
      .select("partition", "offset")
    val planStr = b.queryExecution.executedPlan.toString
    assert(planStr.contains("columns=[partition,offset]"),
      s"scan did not prune to the projection:\n$planStr")
    assert(b.count() === nEvents)
    // values survive pruning (offsets still dense per partition)
    val maxOff = b.groupBy("partition")
      .agg(org.apache.spark.sql.functions.max("offset").as("m"),
        org.apache.spark.sql.functions.count("*").as("n"))
    assert(maxOff.filter(org.apache.spark.sql.functions
      .col("m") =!= org.apache.spark.sql.functions.col("n") - 1).count() === 0)
  }

  test("partition/offset filters narrow the batch scan via the index") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("graft-replay").option("path", log).load()
      .filter(col("partition") === 1 && col("offset") >= 10 && col("offset") < 20)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("parts=[1], offsets=[10,20)"),
      s"filters did not narrow the scan:\n$planStr")
    assert(df.count() === 10)
    // narrowing never changes results: same rows as the unpushed equivalent
    val full = spark.read.format("graft-replay").option("path", log).load()
      .collect().count(r => r.getInt(3) == 1 && r.getLong(4) >= 10 && r.getLong(4) < 20)
    assert(full === 10)
  }

  test("scan reports honest statistics (reference panics here)") {
    val scan = new graft.sources.replay.ReplayScan(log, None)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong === nEvents)
    assert(st.sizeInBytes().getAsLong > 0)
  }

  test("checkpoint resume: a second run over the same checkpoint reads nothing") {
    val ckpt = Files.createTempDirectory("ck").toString
    val out = Files.createTempDirectory("ckout").toString
    def run(): Long = {
      val q = spark.readStream.format("graft-replay").option("path", log).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(run() === nEvents)
    assert(run() === nEvents, "offsets must come from the checkpoint WAL (no re-read)")
  }

  test("null key/value round-trip; strict-parity view coerces null -> empty bytes") {
    val dir = Files.createTempDirectory("nulllog").toString
    ReplayLog.writePartitionFile(dir, 0, Iterator(
      Row("k0".getBytes, "v0".getBytes, 1000L),
      Row(null, null, 2000L)))
    val df = spark.read.format("graft-replay").option("path", dir).load()
    assert(df.count() === 2)
    assert(df.filter(col("key").isNull).count() === 1)
    // strict reference parity: null -> empty bytes under coalesce
    // (execution.rs:137-140 unwrap_or(&[]))
    val strict = df.select(
      coalesce(col("key"), lit(Array.emptyByteArray)).as("key"),
      coalesce(col("value"), lit(Array.emptyByteArray)).as("value"))
    assert(strict.filter(col("key").isNull || col("value").isNull).count() === 0)
    assert(strict.filter(length(col("key")) === 0).count() === 1)
  }

  test("typed Dataset[StreamEnvelope] view decodes rows with full metadata") {
    val ds = GraftOps.typedEnvelope(
      spark.read.format("graft-replay").option("path", log).load())
    val r = ds.filter(_.offset == 0L).collect().sortBy(_.partition)
    assert(r.length === 3)
    assert(new String(r(2).key, "UTF-8") === "Key 2")
    assert(r.forall(_.topic === "events"))
  }

  test("ProcessingTime pacing delivers bounded batches until stopped (200ms ref operating point)") {
    // reference operating point: 200ms time_window + batch_size 5
    // (/root/reference/tests/basic_tests.rs:33,42) — here: 200ms trigger +
    // maxRowsPerTrigger, stopped after a few cycles
    val name = "replay_pt"
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("maxRowsPerTrigger", "40").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table(name).count() < 240 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    // assert on the source's own progress records (no wall-clock race): every
    // data batch was admission-capped at 40x3 rows, and pacing ran >= 2 batches
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length >= 2, "expected >= 2 paced micro-batches")
    assert(dataBatches.forall(_.numInputRows <= 120),
      s"batch exceeded admission cap: ${dataBatches.map(_.numInputRows).mkString(",")}")
  }

  test("startingOffsets JSON starts partitions at different offsets") {
    val name = "replay_spec_sojson"
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("startingOffsets", """{"0": 7, "2": 13}""").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val mins = spark.table(name).groupBy("partition")
      .agg(org.apache.spark.sql.functions.min("offset").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(mins === Map(0 -> 7L, 1 -> 0L, 2 -> 13L))
  }

  test("malformed startingOffsets JSON is rejected at load time") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-replay")
        .option("path", log).option("startingOffsets", """{"0": nope""").load()
        .count()
    }
    assert(e.getMessage.contains("malformed startingOffsets"))
    // negative offsets are malformed too
    intercept[IllegalArgumentException] {
      spark.read.format("graft-replay")
        .option("path", log).option("startingOffsets", """{"0": -5}""").load()
        .count()
    }
  }

  test("failOnDataLoss: offset past the end throws by default, clamps when false") {
    val past = s"""{"0": ${Long.MaxValue / 2}}"""
    val thrown = intercept[Exception] {
      spark.read.format("graft-replay")
        .option("path", log).option("startingOffsets", past).load().count()
    }
    assert(thrown.getMessage.contains("past the end")
      || Option(thrown.getCause).exists(_.getMessage.contains("past the end")))
    val clamped = spark.read.format("graft-replay")
      .option("path", log).option("startingOffsets", past)
      .option("failOnDataLoss", "false").load()
    // partition 0 clamps to its end (contributes nothing); 1 and 2 are full
    val perPart = ReplayLog.listPartitions(log).drop(1)
      .map(p => ReplayLog.recordCount(log, p)).sum
    assert(clamped.count() === perPart)
  }

  test("consumer.* options pass through opaquely to the table properties") {
    val props = new java.util.HashMap[String, String]()
    props.put("path", log)
    props.put("consumer.group.id", "graft-dev")
    props.put("consumer.fetch.min.bytes", "1048576")
    val table = new graft.sources.replay.ReplayDataSource()
      .getTable(graft.sources.replay.ReplayDataSource.Schema, Array.empty, props)
    val got = table.properties()
    assert(got.get("consumer.group.id") === "graft-dev")
    assert(got.get("consumer.fetch.min.bytes") === "1048576")
    // and the source still reads normally with the opaque conf present
    val n = spark.read.format("graft-replay").option("path", log)
      .option("consumer.group.id", "graft-dev").load().count()
    assert(n === nEvents)
  }

  test("minRowsPerTrigger holds a batch until the time bound, then emits what's available") {
    import graft.sources.replay.{ReplayMicroBatchStream, ReplayOffset, ReplayOptions}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    // admission-control unit contract (deterministic, no wall-clock races):
    // fewer rows than minRows are available, so the trigger holds until
    // maxTriggerDelayMs elapses, then closes the batch with what's there —
    // the reference's time-OR-rows loop bound (execution.rs:87)
    val opts = ReplayOptions(log, None, Some(Long.MaxValue / 4), 600L, 0L,
      Map.empty, None, failOnDataLoss = true, Map.empty)
    val stream = new ReplayMicroBatchStream(opts)
    val start = stream.initialOffset()
    val limit = stream.getDefaultReadLimit
    val held = stream.latestOffset(start, limit)
    assert(held.asInstanceOf[ReplayOffset].offsets ===
      start.asInstanceOf[ReplayOffset].offsets,
      "trigger must hold while rows < minRows and the delay clock runs")
    Thread.sleep(700)
    val fired = stream.latestOffset(start, limit)
    val ends = ReplayLog.listPartitions(log)
      .map(p => p -> ReplayLog.recordCount(log, p)).toMap
    assert(fired.asInstanceOf[ReplayOffset].offsets === ends,
      "at the time bound the batch closes with fewer than minRows rows")
    // end-to-end: the wired option produces exactly one data batch holding
    // everything, released by the time bound
    val name = "replay_spec_minrows"
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("minRowsPerTrigger", (nEvents * 100).toString)
      .option("maxTriggerDelayMs", "800")
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table(name).count() < nEvents && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    assert(spark.table(name).count() === nEvents)
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length === 1,
      s"expected one held-then-released batch, got ${dataBatches.length}")
  }

  test("AvailableNow overrides the minRows hold (run-to-end never ends empty)") {
    // regression: with minRows unreachable, the hold gate starved the
    // AvailableNow pass and the query terminated having delivered NOTHING
    val name = "replay_spec_an_minrows"
    val q = spark.readStream.format("graft-replay")
      .option("path", log)
      .option("minRowsPerTrigger", Long.MaxValue./(4).toString)
      .option("maxTriggerDelayMs", "600000")
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow run did not terminate")
    assert(spark.table(name).count() === nEvents,
      "run-to-end must drain the log even when minRows is unreachable")
  }

  test("earliest/latest sentinels parse case-insensitively; latest reads only new records") {
    // EARLIEST in any case = full read
    val n = spark.read.format("graft-replay").option("path", log)
      .option("startingOffsets", "Earliest").load().count()
    assert(n === nEvents)
    // latest on a static stream run-to-end: nothing to read
    val name = "replay_spec_latest"
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("startingOffsets", "LATEST").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).count() === 0,
      "latest must start at the end of every partition")
  }

  test("safeRecordCount excludes frames whose log bytes are not fully flushed") {
    val dir = Files.createTempDirectory("trunclog").toString
    ReplayLog.writePartitionFile(dir, 0, Iterator(
      Row("k0".getBytes, "v0".getBytes, 1L),
      Row("k1".getBytes, "v1".getBytes, 2L),
      Row("k2".getBytes, "v2".getBytes, 3L)))
    assert(ReplayLog.safeRecordCount(dir, 0) === 3L)
    // simulate an index flushed ahead of the log: chop the log's tail
    val logF = ReplayLog.logFile(dir, 0)
    val raf = new java.io.RandomAccessFile(logF, "rw")
    try raf.setLength(logF.length() - 5) finally raf.close()
    assert(ReplayLog.recordCount(dir, 0) === 3L, "raw count still sees 3")
    assert(ReplayLog.safeRecordCount(dir, 0) === 2L,
      "safe count must stop before the incomplete frame")
    // a batch read plans only the safe range — no EOF mid-task
    val got = spark.read.format("graft-replay").option("path", dir).load().count()
    assert(got === 2L)
  }

  test("a partition appended mid-stream is discovered and read") {
    val dir = Files.createTempDirectory("growlog").toString
    ReplayLog.writePartitionFile(dir, 0, Iterator(
      Row("k0".getBytes, "v0".getBytes, 1000L)))
    ReplayLog.writePartitionFile(dir, 1, Iterator(
      Row("k1".getBytes, "v1".getBytes, 2000L)))
    val name = "replay_spec_grow"
    val q = spark.readStream.format("graft-replay").option("path", dir).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table(name).count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(spark.table(name).count() === 2)
      // the reference hardcodes its partition count (execution.rs:47-49);
      // here a partition born after stream start must be picked up
      ReplayLog.writePartitionFile(dir, 2, Iterator(
        Row("k2".getBytes, "v2".getBytes, 3000L),
        Row("k3".getBytes, "v3".getBytes, 4000L)))
      while (spark.table(name).count() < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally q.stop()
    val got = spark.table(name)
    assert(got.count() === 4)
    assert(got.filter(col("partition") === 2).count() === 2)
    assert(got.filter(col("partition") === 2)
      .agg(org.apache.spark.sql.functions.min("offset")).head.getLong(0) === 0L)
  }

  test("columnar and row readers return identical envelopes (incl. nulls)") {
    val dir = Files.createTempDirectory("collog").toString
    ReplayLog.writePartitionFile(dir, 0, Iterator(
      Row("k0".getBytes, "v0".getBytes, 1000L),
      Row(null, null, 2000L),
      Row("k2".getBytes, Array.emptyByteArray, 3000L)))
    def read(mode: String) = spark.read.format("graft-replay")
      .option("path", dir).option("columnarBatchSize", mode).load()
      .selectExpr("cast(key as string) k", "cast(value as string) v",
        "partition", "offset", "cast(timestamp as string) ts")
    val row = read("0").collect().map(_.toString).sorted
    val col = read("2").collect().map(_.toString).sorted // batch smaller than data
    assert(row.toSeq === col.toSeq)
    assert(row.length === 3)
    assert(row.count(_.contains("null")) === 1)
    // default mode (columnar) matches too, on the real log
    val a = spark.read.format("graft-replay").option("path", log).load()
      .selectExpr("sum(length(value))", "sum(offset)", "count(*)").head
    val b = read("0").sparkSession.read.format("graft-replay").option("path", log)
      .option("columnarBatchSize", "0").load()
      .selectExpr("sum(length(value))", "sum(offset)", "count(*)").head
    assert(a === b)
  }

  test("streaming result equals batch result (prefix consistency)") {
    val batch = spark.read.format("graft-replay").option("path", log).load()
      .selectExpr("cast(key as string) k", "cast(value as string) v")
    val name = "replay_spec_eq"
    val q = spark.readStream.format("graft-replay").option("path", log)
      .option("maxRowsPerTrigger", "73").load()
      .selectExpr("cast(key as string) k", "cast(value as string) v")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).exceptAll(batch).count() === 0)
    assert(batch.exceptAll(spark.table(name)).count() === 0)
  }

  test("minPartitions splits offset ranges without changing the row set") {
    val log = graft.sources.replay.ReplayLog.ensureLog(spark, sf)
    val plain = spark.read.format("graft-replay").option("path", log).load()
    val split = spark.read.format("graft-replay").option("path", log)
      .option("minPartitions", "16").load()
    assert(plain.rdd.getNumPartitions === 3, "log has 3 partitions")
    assert(split.rdd.getNumPartitions >= 16,
      s"expected >=16 splits, got ${split.rdd.getNumPartitions}")
    val a = plain.selectExpr("partition", "offset", "cast(value as string) v")
    val b = split.selectExpr("partition", "offset", "cast(value as string) v")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "row set must be identical under range splitting")
    // streaming: same envelope totals per partition with splits active
    val name = "replay_minparts"
    val q = spark.readStream.format("graft-replay").option("path", log)
      .option("minPartitions", "16").load()
      .groupBy(col("partition")).count()
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val per = spark.table(name).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = plain.groupBy(col("partition")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(per === want, s"streaming per-partition counts drifted: $per vs $want")
  }

  test("aggregate pushdown: index-only counts match the scan; filters refuse the push") {
    val df = spark.read.format("graft-replay").option("path", log).load()
    // index-only global count == a count forced through the record scan
    val viaScan = df.select(col("key")).collect().length.toLong
    assert(df.count() === viaScan)
    val gp = df.groupBy(col("partition")).count()
    assert(gp.queryExecution.executedPlan.toString.contains("INDEX-ONLY"),
      "grouped count should answer from the offset index")
    // a filtered aggregate must NOT push (the index can't see filters this
    // builder never consumes) and must still count correctly
    val filtered = df.filter(col("offset") >= 5).agg(count(lit(1)))
    val fp = filtered.queryExecution.executedPlan.toString
    assert(!fp.contains("INDEX-ONLY"),
      s"filtered aggregate wrongly pushed into the index:\n$fp")
    val expected = df.collect().count(_.getLong(4) >= 5).toLong
    assert(filtered.collect().head.getLong(0) === expected)
    // min/max offset over an EMPTY topic partition stay null-safe
    assert(df.filter(col("partition") === 99).count() === 0L)
  }

  test("storage-partitioned aggregation on `partition` runs exchange-free") {
    // the scan reports KeyGroupedPartitioning(partition) with one split per
    // log partition, so under v2 bucketing a groupBy(partition) aggregate
    // needs NO shuffle — on a 1000-partition topic that is the difference
    // between a metadata-local pass and a full-cluster exchange
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.read.format("graft-replay").option("path", log).load()
        // sum(length(value)) cannot push to the index, so this exercises the
        // record scan's reported partitioning, not the agg-pushdown path
        .groupBy(col("partition")).agg(sum(length(col("value"))).as("bytes"))
      val rows = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"groupBy(partition) should not shuffle a key-grouped scan:\n$p")
      // same numbers as the shuffled plan
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val want = spark.read.format("graft-replay").option("path", log).load()
        .groupBy(col("partition")).agg(sum(length(col("value"))))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows === want)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("limit pushdown caps the planned offset span to n records") {
    val df = spark.read.format("graft-replay").option("path", log).load()
    val limited = df.limit(7)
    assert(limited.collect().length === 7)
    val p = limited.queryExecution.executedPlan.toString
    assert(p.contains("PushedLimit [7]"), s"limit did not reach the scan:\n$p")
    // the scan plans at most 7 records' worth of offset ranges
    val batch = new sources.replay.ReplayBatch(
      sources.replay.ReplayOptions(path = log, maxRowsPerTrigger = None,
        minRowsPerTrigger = None, maxTriggerDelayMs = 0L, startingUniform = 0L,
        startingPerPartition = Map.empty, failOnDataLoss = true,
        consumerConf = Map.empty), limit = 7)
    val span = batch.planInputPartitions().map { ip =>
      val r = ip.asInstanceOf[sources.replay.ReplayInputPartition]
      r.end - r.start
    }.sum
    assert(span === 7L, s"planned $span records for a limit of 7")
    // limit larger than the log: everything, once
    assert(df.limit(1000000).count() === df.count())
    // a filter above the scan keeps the limit OUT of the scan (this source
    // never consumes filters, so a pushed limit would under-count)
    val fp = df.filter(col("offset") >= 5).limit(3)
    assert(fp.collect().length === 3)
    assert(!fp.queryExecution.executedPlan.toString.contains("PushedLimit"),
      "limit must not push below an unconsumed filter")
  }
}
