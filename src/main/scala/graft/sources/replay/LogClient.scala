package graft.sources.replay

/** Executor-side sequential frame cursor over one partition, starting at a
  * record offset: call [[readFrame]] then read `key`/`value`/`tsUs`. The
  * file-backed implementation is [[FrameStream]]; a broker-backed client
  * returns a cursor over its consumer poll loop. */
trait FrameReader extends AutoCloseable {
  def readFrame(): Unit
  def key: Array[Byte]
  def value: Array[Byte]
  def tsUs: Long

  /** Bounded advance for logs whose offsets may have GAPS (Kafka logs:
    * transaction control markers occupy offsets, aborted spans are hidden
    * from read_committed readers, compacted segments drop records): read
    * the next DATA frame whose offset is < `end`, returning false when the
    * cursor reached `end` without one. Dense logs (file/socket) keep the
    * default one-frame-per-offset behavior — the caller already bounds the
    * number of calls by `end - start`. */
  def readFrameBefore(end: Long): Boolean = { readFrame(); true }

  /** Log offset of the frame just read, for readers over gap-ful logs;
    * -1 = dense (the caller's running position IS the offset). */
  def frameOffset: Long = -1L
  override def close(): Unit
}

/** The broker-client seam of the replay source — the surface a real Kafka
  * consumer implements to slot in behind [[ReplayDataSource]] without
  * touching any offset/admission/planning logic. It is exactly the contract
  * the reference holds against rdkafka
  * (/root/reference/src/kafka/execution.rs:74-88): list partitions, read the
  * high watermark, and consume a record range sequentially.
  *
  * Planning-side methods ([[listPartitions]], [[endOffset]]) run on the
  * driver every trigger; [[openFrames]] runs on executors — implementations
  * are constructed per-use from [[LogClient.create]] (a registered factory by
  * kind), so they need no serialization, only classpath presence on
  * executors.
  */
trait LogClient {
  /** Current partition ids — re-listed every trigger for mid-stream
    * partition discovery. */
  def listPartitions(): Seq[Int]
  /** Exclusive end offset (high watermark) of complete, readable records. */
  def endOffset(p: Int): Long
  /** Raw record count for statistics (may include in-flight tail records). */
  def recordCount(p: Int): Long
  /** On-wire byte size for statistics; best-effort. */
  def sizeInBytes(p: Int): Long
  /** Sequential frames of partition `p` from record `start`. `needKey` /
    * `needValue` let the implementation skip payload decode for pruned
    * columns. */
  def openFrames(p: Int, start: Long, needKey: Boolean,
      needValue: Boolean): FrameReader

  /** Earliest offset whose record TIMESTAMP (milliseconds) is >= `tsMs` —
    * Kafka's ListOffsets-by-timestamp contract (offsetsForTimes); None
    * when no such record exists. The default implementation scans frames
    * from the log head (correct for any dense client; the file client's
    * O(1) byte index makes the scan one sequential read) — the kafka-wire
    * client overrides with the broker's ListOffsets answer, and the spec
    * pins the two against each other. */
  def offsetForTimestamp(p: Int, tsMs: Long): Option[Long] = {
    require(tsMs >= 0, s"offsetForTimestamp needs a real timestamp, got $tsMs")
    val end = endOffset(p)
    if (end <= 0) return None
    val fr = openFrames(p, 0L, needKey = false, needValue = false)
    try {
      var off = 0L
      while (off < end) {
        if (!fr.readFrameBefore(end)) return None
        val o = if (fr.frameOffset >= 0) fr.frameOffset else off
        if (fr.tsUs / 1000L >= tsMs) return Some(o)
        off += 1
      }
      None
    } finally fr.close()
  }

  /** Commit consumed offsets back under a consumer group — OBSERVABILITY,
    * not progress truth (the checkpoint WAL owns restart semantics, exactly
    * as the reference's rdkafka auto-commit never feeds back into its
    * bounded ranges): an external lag monitor watching the group sees the
    * stream's progress. Default: no-op (file/socket logs have no group
    * coordinator). */
  def commitOffsets(group: String, offsets: Map[Int, Long]): Unit = ()

  /** Read a group's committed offsets (−1 = none committed); the inverse
    * of [[commitOffsets]], used by monitors and tests. Default: empty. */
  def committedOffsets(group: String, parts: Seq[Int]): Map[Int, Long] =
    Map.empty
}

object LogClient {
  /** (path, consumer conf) => client. The conf is the source's `consumer.*`
    * option pass-through with the prefix stripped (≡ the reference's opaque
    * `conf: HashMap` handed to rdkafka) — the seam broker security options
    * (security.protocol / sasl.* / ssl.*) travel through. */
  type Factory = (String, Map[String, String]) => LogClient

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Factory]()
  registry.put("file", (path, _) => new FileLogClient(path))
  registry.put("socket", (path, _) => new SocketLogClient(path))
  registry.put("kafka", (path, conf) => new KafkaLogClient(path, conf))

  /** Register an alternate client kind (e.g. a broker consumer, or the fake
    * in LogClientSpec). On a multi-JVM cluster the registration must happen
    * in a static initializer reachable from executors; the `file` default
    * needs none. */
  def register(kind: String, f: Factory): Unit = registry.put(kind, f)

  def create(kind: String, path: String,
      conf: Map[String, String] = Map.empty): LogClient = {
    val f = registry.get(kind)
    require(f != null,
      s"no LogClient registered for client kind '$kind' (option `client`)")
    f(path, conf)
  }
}

/** Default client: the local file-backed [[ReplayLog]] (length-prefixed
  * frames + fixed-width byte index). */
final class FileLogClient(path: String) extends LogClient {
  override def listPartitions(): Seq[Int] = ReplayLog.listPartitions(path)
  override def endOffset(p: Int): Long = ReplayLog.safeRecordCount(path, p)
  override def recordCount(p: Int): Long = ReplayLog.recordCount(path, p)
  override def sizeInBytes(p: Int): Long = ReplayLog.logFile(path, p).length()
  override def openFrames(p: Int, start: Long, needKey: Boolean,
      needValue: Boolean): FrameReader =
    new FrameStream(path, p, start, needKey, needValue)
}
