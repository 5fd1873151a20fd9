package graft

import java.nio.file.Files
import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** The monitoring surface: named observed metrics on batch plans
  * (`Dataset.observe`) and per-micro-batch progress through
  * `StreamingQueryListener` — what a production deployment watches instead of
  * re-running counts. */
class ObservabilitySpec extends SparkSpec {

  test("Dataset.observe exposes named metrics on the executed plan") {
    val df = Tables.table(spark, sf, "lineitem")
      .observe("li_metrics", count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
      .filter(col("l_quantity") > 0)
    val qe = df.queryExecution
    // collect() executes THIS QueryExecution; count() would plan a new one
    // and the observed metrics would land there instead
    val n = df.collect().length
    val m = qe.observedMetrics("li_metrics")
    assert(m.getAs[Long]("n") === Tables.table(spark, sf, "lineitem").count())
    assert(m.getAs[Double]("qty") > 0)
    assert(n > 0)
  }

  test("StreamingQueryListener sees every micro-batch; input rows sum to the log") {
    val log = sources.replay.ReplayLog.ensureLog(spark, sf)
    val nEvents = Tables.events(spark, sf).count()
    val batches = mutable.Buffer.empty[Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized { batches += e.progress.numInputRows }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.format("graft-replay")
        .option("path", log).option("maxRowsPerTrigger", "100").load()
        .writeStream.format("memory").queryName("obs_mem")
        .option("checkpointLocation", Files.createTempDirectory("obs-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // listener events are delivered asynchronously after termination
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (batches.synchronized(batches.sum) < nEvents && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(batches.synchronized(batches.sum) === nEvents,
        s"progress events cover every input row (got ${batches.sum})")
      assert(batches.synchronized(batches.count(_ > 0)) >= 2,
        "bounded admission should produce multiple non-empty micro-batches")
    } finally spark.streams.removeListener(listener)
  }

  test("replay source reports recordsBehindLatest in source metrics (Kafka parity)") {
    val log = sources.replay.ReplayLog.ensureLog(spark, sf)
    val q = spark.readStream.format("graft-replay")
      .option("path", log).load()
      .writeStream.format("memory").queryName("obs_metrics")
      .option("checkpointLocation", Files.createTempDirectory("obs-ck2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val progresses = q.recentProgress
    assert(progresses.nonEmpty, "expected at least one progress")
    val metrics = progresses.last.sources.head.metrics
    assert(metrics.get("numPartitions") === "3", s"metrics: $metrics")
    // the run consumed to the end, so the final progress reports zero behind
    assert(metrics.get("recordsBehindLatest") === "0", s"metrics: $metrics")
  }
}
