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
}
