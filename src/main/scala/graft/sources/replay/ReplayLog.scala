package graft.sources.replay

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream, RandomAccessFile}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A Kafka-shaped replay log on disk: one append-only record file per
  * partition plus a fixed-width byte-position index, so a reader can seek to
  * any record offset in O(1) — the property the micro-batch source needs to
  * serve `[start, end)` offset ranges without rescanning from zero (the
  * reference instead replays from `Offset::Beginning` on every execute,
  * /root/reference/src/kafka/execution.rs:77-79; the index is our fix).
  *
  * Record layout: `[keyLen:int][key][valLen:int][val][tsUs:long]`, len == -1
  * encodes NULL (the reference coerces null→empty, execution.rs:137-140; we
  * keep nulls representable and the strict-parity view coalesces).
  * `partition-N.idx` holds one big-endian long byte-position per record.
  */
object ReplayLog {
  val NumPartitions = 3 // mirrors the reference broker default (docker-compose.yaml:13)

  def logFile(dir: String, p: Int): File = new File(dir, s"partition-$p.log")
  def idxFile(dir: String, p: Int): File = new File(dir, s"partition-$p.idx")

  def listPartitions(dir: String): Seq[Int] =
    (0 until 1024).takeWhile(p => logFile(dir, p).exists())

  def recordCount(dir: String, p: Int): Long = idxFile(dir, p).length() / 8L

  /** Record count bounded to frames FULLY present in the log file. The idx
    * and log are separate buffered streams, so a concurrent writer can flush
    * index entries ahead of their record bytes; planning a read past the
    * flushed log tail would kill the stream with an EOF mid-batch. Walks back
    * from the raw count until the last frame validates — the walk is bounded
    * by the writer's buffered tail, and on a quiescent log the first probe
    * succeeds. */
  def safeRecordCount(dir: String, p: Int): Long = {
    var c = recordCount(dir, p)
    if (c == 0) return 0L
    val logLen = logFile(dir, p).length()
    while (c > 0 && !frameComplete(dir, p, c - 1, logLen)) c -= 1
    c
  }

  private def frameComplete(dir: String, p: Int, i: Long, logLen: Long): Boolean = {
    val pos = bytePosition(dir, p, i)
    if (pos + 4 > logLen) return false
    val raf = new RandomAccessFile(logFile(dir, p), "r")
    try {
      raf.seek(pos)
      val kBytes = math.max(raf.readInt(), 0)
      if (pos + 4 + kBytes + 4 > logLen) return false
      raf.seek(pos + 4 + kBytes)
      val vBytes = math.max(raf.readInt(), 0)
      pos + 4 + kBytes + 4 + vBytes + 8 <= logLen
    } finally raf.close()
  }

  def bytePosition(dir: String, p: Int, offset: Long): Long = {
    if (offset == 0) return 0L
    val raf = new RandomAccessFile(idxFile(dir, p), "r")
    try { raf.seek(offset * 8L); raf.readLong() } finally raf.close()
  }

  /** Executor-side writer for one partition's (key, value, ts_us) rows. */
  def writePartitionFile(dir: String, p: Int, rows: Iterator[Row]): Unit = {
    new File(dir).mkdirs()
    val log = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(logFile(dir, p))))
    val idx = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(idxFile(dir, p))))
    var pos = 0L
    try {
      rows.foreach { r =>
        idx.writeLong(pos)
        val key = if (r.isNullAt(0)) null else r.getAs[Array[Byte]](0)
        val value = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val ts = r.getLong(2)
        def writeBlob(b: Array[Byte]): Long = {
          if (b == null) { log.writeInt(-1); 4L }
          else { log.writeInt(b.length); log.write(b); 4L + b.length }
        }
        pos += writeBlob(key)
        pos += writeBlob(value)
        log.writeLong(ts); pos += 8L
      }
    } finally { log.close(); idx.close() }
  }

  /** Build (once) the deterministic kafka-style envelope log for an events
    * table: partition = event_id % 3, key = "Key {id}", value = props bytes —
    * the shape of the reference's test corpus
    * (/root/reference/tests/utils.rs:214-220, 15 msgs x 3 partitions).
    * `late = true` produces an adversarial arrival order where every 20th
    * event arrives 2 simulated hours late (for watermark tests).
    * Writes run executor-side (foreachPartition), one job per partition. */
  def ensureLog(spark: SparkSession, sfDir: String, late: Boolean = false): String =
    ensureLogVariant(spark, sfDir,
      if (late) Some(7200000000L) else None, if (late) "late" else "std")

  /** EXTREMELY-late variant for the pinned watermark-drop oracle (s05b):
    * every 20th event arrives (span * 4/5) late, where span is the corpus'
    * full event-time extent. The 2-hour `late` variant never actually loses
    * a row under a coarse pinned batch split — lateness must exceed the
    * span of two whole micro-batches before the previous-batch filter
    * watermark can pass a window (Spark filters late rows with the
    * PREVIOUS batch's watermark and evicts with the current one). 4/5 of
    * the span guarantees early-corpus events resurface in the LAST batch
    * at any scale factor, so the drop path is genuinely exercised. The
    * shift is integer-derived from the data ((max-min) div 5 * 4) so the
    * DuckDB oracle reproduces it exactly. */
  def ensureXlateLog(spark: SparkSession, sfDir: String): String = {
    val mm = graft.Tables.events(spark, sfDir)
      .agg(min(graft.Tables.tsUs), max(graft.Tables.tsUs)).head()
    val shift = (mm.getLong(1) - mm.getLong(0)) / 5L * 4L
    ensureLogVariant(spark, sfDir, Some(shift), "xlate")
  }

  /** Avro schema-registry envelope pair for [[ensureAvroLog]] / s55: a bus
    * mid-migration — half the producers still write V1, half the evolved V2
    * (event_type added). Flat primitive records (the AvroCatalyst subset). */
  val AvroV1: String =
    """{"type":"record","name":"EventV1","fields":[
      |{"name":"user_id","type":"long"},{"name":"cents","type":"long"}]}"""
      .stripMargin
  val AvroV2: String =
    """{"type":"record","name":"EventV2","fields":[
      |{"name":"user_id","type":"long"},{"name":"cents","type":"long"},
      |{"name":"event_type","type":"string"}]}""".stripMargin

  /** Log variant whose values are CONFLUENT-FRAMED AVRO — the dominant real
    * Kafka payload encoding (magic 0x00 + int32 big-endian schema-registry
    * id + avro binary body). Even event_ids carry schema id 1 (V1), odd
    * carry id 2 (V2): a schema-evolution migration caught mid-flight, which
    * the s55 decode query dispatches on. Deterministic per event, so the
    * DuckDB oracle recomputes the same aggregates straight from `events`. */
  def ensureAvroLog(spark: SparkSession, sfDir: String): String = {
    import graft.functions.GraftFunctions.avro_encode
    val cents = expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
    val frame = when(col("event_id") % 2 === 0,
        concat(lit(Array[Byte](0, 0, 0, 0, 1)),
          avro_encode(struct(col("user_id"), cents.as("cents")), AvroV1)))
      .otherwise(
        concat(lit(Array[Byte](0, 0, 0, 0, 2)),
          avro_encode(struct(col("user_id"), cents.as("cents"),
            col("event_type")), AvroV2)))
    ensureLogVariant(spark, sfDir, None, "avro", frame)
  }

  private def ensureLogVariant(spark: SparkSession, sfDir: String,
      lateShiftUs: Option[Long], variant: String,
      valueCol: org.apache.spark.sql.Column =
        col("props").cast("binary")): String = synchronized {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    // tmpfs when available: the log is re-read every replay run and a real
    // deployment's broker log would be served from page cache anyway
    val tmpRoot =
      if (new File("/dev/shm").canWrite) "/dev/shm" else sys.props("java.io.tmpdir")
    val base = new File(tmpRoot, s"graft-replay/$safe/$variant")
    val marker = new File(base, "_SUCCESS")
    if (marker.exists()) return base.getAbsolutePath
    // cross-process guard: build into a pid-unique dir, atomically rename into
    // place; a concurrent builder that loses the race just uses the winner's
    val dir = new File(base.getParentFile,
      s"${base.getName}.build-${ProcessHandle.current().pid()}")

    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("partition", (col("event_id") % NumPartitions).cast("int"))
      .withColumn("arrival",
        lateShiftUs.map(s => graft.Tables.tsUs +
          when(col("event_id") % 20 === 0, lit(s)).otherwise(lit(0L)))
          .getOrElse(col("event_id")))
    val w = Window.partitionBy(col("partition"))
      .orderBy(col("arrival"), col("event_id"))
    val env = ev
      .withColumn("ord", row_number().over(w).cast("long") - 1)
      .select(col("partition"), col("ord"),
        concat(lit("Key "), col("event_id")).cast("binary").as("key"),
        valueCol.as("value"),
        graft.Tables.tsUs.as("ts_us"))

    val path = dir.getAbsolutePath
    (0 until NumPartitions).foreach { p =>
      env.filter(col("partition") === p)
        .orderBy(col("ord"))
        .select(col("key"), col("value"), col("ts_us"))
        .coalesce(1)
        .foreachPartition { (rows: Iterator[Row]) => writePartitionFile(path, p, rows) }
    }
    new File(dir, "_SUCCESS").createNewFile()
    if (!dir.renameTo(base)) {
      // lost the race (or stale target): prefer an existing complete build
      if (!marker.exists())
        throw new IllegalStateException(s"replay log build failed for $base")
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    base.getAbsolutePath
  }
}
