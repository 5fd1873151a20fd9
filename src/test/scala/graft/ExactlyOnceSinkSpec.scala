package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.streaming.IdempotentSink

/** Kill-tests the exactly-once foreachBatch sink: a crash BETWEEN the batch
  * write landing and the micro-batch commit being logged makes Spark replay
  * that batch on restart (foreachBatch is at-least-once). The idempotent
  * sink must absorb the replay (overwrite its own `_batch_id` partition);
  * the naive append sink must demonstrably duplicate — proving the test
  * injects the failure where it claims to. */
class ExactlyOnceSinkSpec extends SparkSpec {

  private def replayLog: String = graft.sources.replay.ReplayLog.ensureLog(spark, sf)

  /** Run the replay stream through `handler`, injecting one post-write
    * failure at batch 2, then restart from the same checkpoint and run to
    * the end. Returns the number of (partition, offset) rows written. */
  private def runWithCrash(out: String)(
      handler: (DataFrame, Long) => Unit): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory("eo-ckpt").toString
    val injected = new AtomicBoolean(false)
    def start() = spark.readStream.format("graft-replay")
      .option("path", replayLog)
      .option("maxRowsPerTrigger", "100") // ~4 admitted batches at sf0.001
      .load()
      .select(col("partition"), col("offset"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        handler(df, batchId)
        // the write has fully landed; dying HERE leaves the batch
        // uncommitted in the WAL, so the restart must replay it
        if (batchId == 2 && injected.compareAndSet(false, true))
          throw new RuntimeException("injected crash after write, before commit")
      }
      .start()

    val failed = intercept[StreamingQueryException] { start().awaitTermination() }
    assert(failed.getMessage.contains("injected crash") ||
      failed.getCause.getMessage.contains("injected crash"))
    start().awaitTermination() // resume from the checkpoint, drain to EOF
  }

  test("idempotent sink survives a crash between write and commit with zero duplicates") {
    val out = java.nio.file.Files.createTempDirectory("eo-sink").toString
    runWithCrash(out)(IdempotentSink.parquet(out))
    val total = spark.read.format("graft-replay").option("path", replayLog)
      .load().count()
    val written = IdempotentSink.read(spark, out)
      .select(col("partition"), col("offset")).collect()
    assert(written.length.toLong === total, "row count after crash+resume")
    assert(written.distinct.length === written.length,
      "replayed batch duplicated rows despite the idempotent sink")
  }

  test("counter-factual: a naive append sink duplicates the replayed batch") {
    val out = java.nio.file.Files.createTempDirectory("eo-naive").toString
    runWithCrash(out) { (df, _) => df.write.mode("append").parquet(out); () }
    val total = spark.read.format("graft-replay").option("path", replayLog)
      .load().count()
    val written = spark.read.parquet(out).count()
    assert(written > total,
      "expected the naive sink to duplicate the uncommitted batch — the " +
        "failure injection is not exercising the replay path")
  }
}
