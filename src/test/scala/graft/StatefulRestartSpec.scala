package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.streaming.IdempotentSink

/** State-store recovery under a mid-stream crash: an event-time windowed
  * aggregation holds OPEN windows in the state store across micro-batches
  * (append mode only emits a window once the watermark passes it). Killing
  * the query between a batch's sink write and its commit forces a restart
  * that must (a) replay the uncommitted batch exactly once and (b) restore
  * every open window's partial aggregate from the checkpointed state store.
  * The invariant: a crashed-and-resumed run produces EXACTLY the rows of an
  * uninterrupted run of the same query. */
class StatefulRestartSpec extends SparkSpec {

  private def replayLog: String = graft.sources.replay.ReplayLog.ensureLog(spark, sf)

  /** Windowed count+sum over the replay envelope in append mode, admitted in
    * ~12 micro-batches so windows stay open across several commits. */
  private def windowed(): DataFrame =
    spark.readStream.format("graft-replay")
      .option("path", replayLog)
      .option("maxRowsPerTrigger", "100")
      .load()
      .withWatermark("timestamp", "30 minutes")
      .groupBy(window(col("timestamp"), "10 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(get_json_object(col("value").cast("string"), "$.k").cast("long")).as("sk"))
      .select(col("window.start").cast("long").as("ws_sec"), col("n"), col("sk"))

  /** Run to EOF through the idempotent sink; when `crashAtBatch` is set, die
    * once after that batch's write lands, then resume from the checkpoint. */
  private def run(crashAtBatch: Option[Long]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("swr-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("swr-sink").toString
    val injected = new AtomicBoolean(false)
    def start() = windowed()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        IdempotentSink.parquet(out)(df, batchId)
        if (crashAtBatch.contains(batchId) && injected.compareAndSet(false, true))
          throw new RuntimeException("injected crash after write, before commit")
      }
      .start()
    crashAtBatch match {
      case Some(_) =>
        intercept[StreamingQueryException] { start().awaitTermination() }
        start().awaitTermination()
      case None => start().awaitTermination()
    }
    IdempotentSink.read(spark, out).as[(Long, Long, Long)].collect().toSet
  }

  test("open windows survive a crash between sink write and commit") {
    val clean = run(crashAtBatch = None)
    assert(clean.nonEmpty, "append-mode run emitted no closed windows")
    val crashed = run(crashAtBatch = Some(2L))
    assert(crashed === clean,
      "crash+resume diverged from the uninterrupted run — state store " +
        "recovery or batch replay is broken")
  }
}
