package graft.streaming

import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Runtime-metrics surface for streaming queries — the library-side
  * counterpart of `Dataset.observe` for the streaming lane. Attach one
  * instance via `spark.streams.addListener`, and every micro-batch's
  * progress (input rows, processing rate, state-store rows, event-time
  * watermark and its lag behind the batch clock) accumulates per query,
  * queryable while the stream runs or after it stops.
  *
  * This is what a production deployment watches instead of re-running
  * counts: throughput collapses, state growth (a leaking stateful operator)
  * and a stuck watermark (late-data starvation) are all visible here
  * before they page anyone. Listener callbacks are asynchronous and
  * off the hot path — zero cost to the query itself. */
final class StreamMetrics extends StreamingQueryListener {
  import StreamMetrics._

  private val byQuery =
    new java.util.concurrent.ConcurrentHashMap[UUID, mutable.Buffer[BatchStat]]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val wm = Option(p.eventTime.get("watermark")).flatMap(parseMs)
    val lag = for (w <- wm; t <- parseMs(p.timestamp)) yield t - w
    val stat = BatchStat(p.batchId, p.numInputRows,
      p.processedRowsPerSecond, p.stateOperators.map(_.numRowsTotal).sum,
      wm, lag)
    val buf = byQuery.computeIfAbsent(p.id, _ => mutable.Buffer.empty)
    buf.synchronized { buf += stat }
  }

  /** Every query id this listener has seen progress for. */
  def queryIds: Set[UUID] = {
    import scala.jdk.CollectionConverters._
    byQuery.keySet().asScala.toSet
  }

  /** Raw per-batch stats for a query, in delivery order. */
  def batches(id: UUID): Seq[BatchStat] =
    Option(byQuery.get(id)).map(b => b.synchronized(b.toSeq)).getOrElse(Seq.empty)

  /** Aggregated view of a query's run so far. */
  def summary(id: UUID): Summary = {
    val bs = batches(id)
    val wms = bs.flatMap(_.watermarkMs)
    val rates = bs.map(_.rowsPerSec).filterNot(_.isNaN)
    Summary(
      nBatches = bs.size,
      inputRows = bs.map(_.inputRows).sum,
      maxRowsPerSec = if (rates.isEmpty) 0.0 else rates.max,
      maxStateRows = if (bs.isEmpty) 0L else bs.map(_.stateRows).max,
      lastWatermarkMs = wms.lastOption,
      watermarkMonotonic = wms.lazyZip(wms.drop(1)).forall(_ <= _),
      lastWatermarkLagMs = bs.flatMap(_.watermarkLagMs).lastOption)
  }

  private def parseMs(iso: String): Option[Long] =
    scala.util.Try(java.time.Instant.parse(iso).toEpochMilli).toOption
}

object StreamMetrics {
  /** One micro-batch's vital signs. */
  final case class BatchStat(batchId: Long, inputRows: Long, rowsPerSec: Double,
      stateRows: Long, watermarkMs: Option[Long], watermarkLagMs: Option[Long])

  /** Whole-run aggregate. */
  final case class Summary(nBatches: Int, inputRows: Long, maxRowsPerSec: Double,
      maxStateRows: Long, lastWatermarkMs: Option[Long],
      watermarkMonotonic: Boolean, lastWatermarkLagMs: Option[Long])
}
