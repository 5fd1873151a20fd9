package graft.sources.replay

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import java.util.OptionalLong
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch source over a [[ReplayLog]] — the Spark-native
  * re-expression of the reference's entire novel contribution, the
  * partition-parallel bounded-batch Kafka scan
  * (/root/reference/src/kafka/execution.rs:30-143):
  *
  *   - one `InputPartition` per log partition ≡ one `split_partition_queue`
  *     consumer per plan partition (execution.rs:75), but discovered
  *     dynamically from the log layout instead of the hardcoded
  *     `UnknownPartitioning(3)` (execution.rs:47-49);
  *   - `maxRowsPerTrigger` admission control ≡ the `batch_size` bound of the
  *     reference's accumulation loop (execution.rs:87);
  *   - `Trigger.AvailableNow` ≡ the `PartitionEOF` run-to-end stop
  *     (execution.rs:93-96); `Trigger.ProcessingTime` ≡ its `time_window`
  *     pacing (tests/basic_tests.rs:42);
  *   - real offset bookkeeping via the checkpoint WAL replaces the
  *     stateless full replay of `StreamingProvider::recv()` +
  *     `Offset::Beginning` (execution.rs:78,129-131) — the single biggest
  *     semantic upgrade over the reference;
  *   - the envelope schema is the reference's `(key, value)` binary pair
  *     (/root/reference/src/lib.rs:7-12) plus the metadata the reference
  *     drops (topic/partition/offset/timestamp, execution.rs:135-142),
  *     matching Spark's own Kafka-source schema contract.
  *
  * Options: `path` (log dir, required), `maxRowsPerTrigger` (per-partition
  * admission cap per micro-batch, optional), `startingOffset` (record index
  * every partition starts from, default 0 — the reference can only replay
  * from the beginning, /root/reference/src/kafka/execution.rs:77-79; this is
  * the explicit-offset half of the Kafka startingOffsets contract).
  */
class ReplayDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ReplayTable(opts.get("path"),
      Option(opts.get("maxRowsPerTrigger")).map(_.toLong),
      Option(opts.get("startingOffset")).map(_.toLong).getOrElse(0L))
  }
}

object ReplayDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))
}

class ReplayTable(path: String, maxRowsPerTrigger: Option[Long],
    startingOffset: Long = 0L) extends Table with SupportsRead {
  require(path != null, "option 'path' is required for the graft-replay source")
  override def name(): String = s"graft-replay($path)"
  override def schema(): StructType = ReplayDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      // column pruning reaches the scan (the reference always materializes
      // both binary columns, execution.rs:81-102; at scale, queries touching
      // only offsets/metadata must not deserialize payload bytes)
      private var pruned: StructType = ReplayDataSource.Schema
      private var scanRange: ScanRange = ScanRange.Full
      override def pruneColumns(requiredSchema: StructType): Unit =
        pruned = StructType(ReplayDataSource.Schema.fields
          .filter(f => requiredSchema.fieldNames.contains(f.name)))
      // partition/offset predicates narrow the scan: an offset range becomes
      // an O(1) index seek instead of a full log read, a partition filter
      // skips whole log files. Conservative contract: every filter is ALSO
      // returned for Spark-side re-evaluation (pushedFilters stays empty), so
      // the narrowing can never change semantics — only skip guaranteed-
      // non-matching bytes.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        filters.foreach { f => scanRange = scanRange.tighten(f) }
        filters
      }
      override def pushedFilters(): Array[Filter] = Array.empty
      override def build(): Scan =
        new ReplayScan(path, maxRowsPerTrigger, startingOffset, pruned, scanRange)
    }
}

/** Scan-narrowing ranges derived from pushed partition/offset predicates. */
case class ScanRange(parts: Option[Set[Int]], offLo: Long, offHi: Long) {
  private def num(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue()); case _ => None
  }
  def tighten(f: Filter): ScanRange = f match {
    case EqualTo("partition", v) =>
      num(v).map(n => copy(parts = Some(Set(n.toInt)))).getOrElse(this)
    case In("partition", vs) =>
      val ns = vs.toSeq.flatMap(num).map(_.toInt).toSet
      if (ns.size == vs.length) copy(parts = Some(ns)) else this
    case EqualTo("offset", v) => num(v).map(n =>
      copy(offLo = math.max(offLo, n), offHi = math.min(offHi, n + 1))).getOrElse(this)
    case GreaterThanOrEqual("offset", v) =>
      num(v).map(n => copy(offLo = math.max(offLo, n))).getOrElse(this)
    case GreaterThan("offset", v) =>
      num(v).map(n => copy(offLo = math.max(offLo, n + 1))).getOrElse(this)
    case LessThan("offset", v) =>
      num(v).map(n => copy(offHi = math.min(offHi, n))).getOrElse(this)
    case LessThanOrEqual("offset", v) =>
      num(v).map(n => copy(offHi = math.min(offHi, n + 1))).getOrElse(this)
    case _ => this
  }
  def describe: String = {
    val p = parts.map(_.toSeq.sorted.mkString("parts=[", ",", "]")).getOrElse("parts=all")
    val hi = if (offHi == Long.MaxValue) "end" else offHi.toString
    s"$p, offsets=[$offLo,$hi)"
  }
}
object ScanRange { val Full: ScanRange = ScanRange(None, 0L, Long.MaxValue) }

class ReplayScan(path: String, maxRowsPerTrigger: Option[Long],
    startingOffset: Long = 0L,
    prunedSchema: StructType = ReplayDataSource.Schema,
    range: ScanRange = ScanRange.Full)
    extends Scan with SupportsReportStatistics {
  private def fieldIdx: Array[Int] =
    prunedSchema.fieldNames.map(ReplayDataSource.Schema.fieldIndex)
  override def readSchema(): StructType = prunedSchema
  override def description(): String =
    s"ReplayScan($path, columns=[${prunedSchema.fieldNames.mkString(",")}], ${range.describe})"
  override def toBatch: Batch = new ReplayBatch(path, startingOffset, fieldIdx, range)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ReplayMicroBatchStream(path, maxRowsPerTrigger, startingOffset, fieldIdx)
  // honest stats where the reference panics (execution.rs:114-116 todo!()):
  // exact row count from the O(1) index lengths, bytes from the log files
  override def estimateStatistics(): Statistics = new Statistics {
    private val parts = ReplayLog.listPartitions(path)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(parts.map(p => ReplayLog.logFile(path, p).length()).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(parts.map(p => ReplayLog.recordCount(path, p)).sum)
  }
}

/** Offsets: one record index per log partition, JSON `{"0":n,"1":m,...}`. */
case class ReplayOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object ReplayOffset {
  def fromJson(s: String): ReplayOffset = ReplayOffset(
    s.trim.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
}

class ReplayMicroBatchStream(path: String, maxRowsPerTrigger: Option[Long],
    startingOffset: Long = 0L,
    fields: Array[Int] = Array.range(0, 6))
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val partitions: Seq[Int] = ReplayLog.listPartitions(path)
  private val ends: Map[Int, Long] =
    partitions.map(p => p -> ReplayLog.recordCount(path, p)).toMap
  // end frozen at prepareForTriggerAvailableNow time (run-to-current-end stop)
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(ends)

  override def initialOffset(): Offset =
    ReplayOffset(partitions.map(p => p -> math.min(startingOffset, ends(p))).toMap)

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].offsets
    val target = availableNowEnd.getOrElse(ends)
    val next = limit match {
      case m: ReadMaxRows =>
        target.map { case (p, end) =>
          p -> math.min(end, s.getOrElse(p, 0L) + m.maxRows()) }
      case _: ReadAllAvailable => target
      case _ => target
    }
    ReplayOffset(next)
  }

  override def reportLatestOffset(): Offset = ReplayOffset(ends)

  override def deserializeOffset(json: String): Offset = ReplayOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].offsets
    val e = end.asInstanceOf[ReplayOffset].offsets
    partitions.flatMap { p =>
      val (so, eo) = (s.getOrElse(p, 0L), e.getOrElse(p, 0L))
      if (eo > so) Some(ReplayInputPartition(path, p, so, eo, fields)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ReplayReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class ReplayBatch(path: String, startingOffset: Long = 0L,
    fields: Array[Int] = Array.range(0, 6),
    range: ScanRange = ScanRange.Full) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    ReplayLog.listPartitions(path)
      .filter(p => range.parts.forall(_.contains(p)))
      .flatMap { p =>
        val end = math.min(ReplayLog.recordCount(path, p), range.offHi)
        val start = math.max(math.min(startingOffset, end), range.offLo)
        if (end > start) Some(ReplayInputPartition(path, p, start, end, fields))
        else None
      }.toArray
  override def createReaderFactory(): PartitionReaderFactory = ReplayReaderFactory
}

case class ReplayInputPartition(path: String, partition: Int,
    start: Long, end: Long, fields: Array[Int] = Array.range(0, 6))
    extends InputPartition

object ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ReplayPartitionReader(partition.asInstanceOf[ReplayInputPartition])
}

/** Sequential record reader for one `[start, end)` offset range: seeks via
  * the byte index, then streams records — the per-partition analogue of the
  * reference's consumer loop (execution.rs:80-104), minus the event-loop
  * poll hack (execution.rs:85-86) that Spark's pull model doesn't need. */
class ReplayPartitionReader(ip: ReplayInputPartition)
    extends PartitionReader[InternalRow] {

  private val topic = UTF8String.fromString("events")
  private var in: DataInputStream = _
  private var offset = ip.start
  private var row: InternalRow = _

  private def open(): Unit = {
    val pos = ReplayLog.bytePosition(ip.path, ip.partition, ip.start)
    val fis = new FileInputStream(ReplayLog.logFile(ip.path, ip.partition))
    var toSkip = pos
    while (toSkip > 0) toSkip -= fis.skip(toSkip)
    in = new DataInputStream(new BufferedInputStream(fis, 1 << 16))
  }

  private val needKey = ip.fields.contains(0)
  private val needValue = ip.fields.contains(1)

  override def next(): Boolean = {
    if (in == null) open()
    if (offset >= ip.end) return false
    // pruned blobs are SKIPPED, not allocated — a payload-free projection
    // (counts, offset audits) never copies message bytes
    def blob(need: Boolean): Array[Byte] = {
      val len = in.readInt()
      if (len < 0) null
      else if (need) { val b = new Array[Byte](len); in.readFully(b); b }
      else { var left = len; while (left > 0) left -= in.skipBytes(left); null }
    }
    val key = blob(needKey); val value = blob(needValue)
    val tsUs = in.readLong()
    row = new GenericInternalRow(ip.fields.map[Any] {
      case 0 => key; case 1 => value; case 2 => topic
      case 3 => ip.partition; case 4 => offset; case 5 => tsUs
    })
    offset += 1
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (in != null) in.close()
}
