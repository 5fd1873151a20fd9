package graft.sources.replay

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket}

/** Network transport for the [[LogClient]] seam: a minimal binary protocol
  * over TCP, mirroring the transport shape of the reference's broker path
  * (a consumer speaking length-prefixed frames to a socket,
  * /root/reference/src/kafka/execution.rs:74-88) without depending on any
  * broker library. One request per connection; big-endian framing throughout
  * (java.io.Data{Input,Output}Stream).
  *
  * Request: `[op:byte][partition:int][start:long][needKey:byte][needValue:byte]`
  * (unused operands zero). Responses:
  *   - LIST (0):   `[n:int][partitionId:int]*n`
  *   - END (1), COUNT (2), SIZE (3): `[long]`
  *   - FETCH (4):  a frame stream `[keyLen:int][key][valLen:int][val][tsUs:long]`
  *     from `start` to the partition's safe end; `len == -1` encodes NULL (and
  *     pruned blobs — the server never ships bytes the reader declared it
  *     will not decode). The client reads exactly the records its planned
  *     `[start, end)` range covers, then closes the connection.
  *
  * `path` is `host:port`. Registered as client kind `socket` — on a real
  * cluster the registration is reachable from executors via the static
  * initializer in [[LogClient]], exactly like the `file` default.
  */
final class SocketLogClient(path: String) extends LogClient {
  private val (host, port) = {
    val i = path.lastIndexOf(':')
    require(i > 0, s"socket client path must be host:port, got '$path'")
    (path.substring(0, i), path.substring(i + 1).toInt)
  }

  private def connect(): Socket = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), 10000)
    s.setTcpNoDelay(true)
    s
  }

  /** One-shot request returning a single long (END/COUNT/SIZE). */
  private def longCall(op: Byte, p: Int): Long = {
    val s = connect()
    try {
      val out = new DataOutputStream(s.getOutputStream)
      SocketLogProtocol.writeRequest(out, op, p, 0L, needKey = false, needValue = false)
      new DataInputStream(s.getInputStream).readLong()
    } finally s.close()
  }

  override def listPartitions(): Seq[Int] = {
    val s = connect()
    try {
      val out = new DataOutputStream(s.getOutputStream)
      SocketLogProtocol.writeRequest(out, SocketLogProtocol.OpList, 0, 0L,
        needKey = false, needValue = false)
      val in = new DataInputStream(s.getInputStream)
      Seq.fill(in.readInt())(in.readInt())
    } finally s.close()
  }

  override def endOffset(p: Int): Long = longCall(SocketLogProtocol.OpEnd, p)
  override def recordCount(p: Int): Long = longCall(SocketLogProtocol.OpCount, p)
  override def sizeInBytes(p: Int): Long = longCall(SocketLogProtocol.OpSize, p)

  override def openFrames(p: Int, start: Long, needKey: Boolean,
      needValue: Boolean): FrameReader = new FrameReader {
    private var in: DataInputStream = _
    private var sock: Socket = _
    var key: Array[Byte] = _
    var value: Array[Byte] = _
    var tsUs: Long = _

    private def open(): Unit = {
      sock = connect()
      val out = new DataOutputStream(sock.getOutputStream)
      SocketLogProtocol.writeRequest(out, SocketLogProtocol.OpFetch, p, start,
        needKey, needValue)
      in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    }

    override def readFrame(): Unit = {
      if (in == null) open()
      def blob(): Array[Byte] = {
        val len = in.readInt()
        if (len < 0) null
        else { val b = new Array[Byte](len); in.readFully(b); b }
      }
      key = blob()
      value = blob()
      tsUs = in.readLong()
    }

    override def close(): Unit = if (sock != null) sock.close()
  }
}

private[replay] object SocketLogProtocol {
  val OpList: Byte = 0
  val OpEnd: Byte = 1
  val OpCount: Byte = 2
  val OpSize: Byte = 3
  val OpFetch: Byte = 4

  def writeRequest(out: DataOutputStream, op: Byte, p: Int, start: Long,
      needKey: Boolean, needValue: Boolean): Unit = {
    out.writeByte(op)
    out.writeInt(p)
    out.writeLong(start)
    out.writeBoolean(needKey)
    out.writeBoolean(needValue)
    out.flush()
  }
}

/** Broker test double: serves a file-backed [[ReplayLog]] directory over the
  * [[SocketLogClient]] protocol. Thread-per-connection — the goal is a real
  * network hop for the transport seam (LogClientSpec drives full batch and
  * micro-batch streaming queries through it), not broker throughput. */
final class SocketLogServer(dir: String, port: Int = 0) extends AutoCloseable {
  private val server = new ServerSocket(port)
  @volatile private var closed = false

  /** The bound (possibly ephemeral) port. */
  def boundPort: Int = server.getLocalPort
  def address: String = s"127.0.0.1:$boundPort"

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "socket-log-handler")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: IOException if closed => // server closed: exit the loop
        case _: IOException => // a single bad accept should not kill the broker
      }
    }
  }, "socket-log-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(new BufferedOutputStream(
        sock.getOutputStream, 1 << 16))
      val op = in.readByte()
      val p = in.readInt()
      val start = in.readLong()
      val needKey = in.readBoolean()
      val needValue = in.readBoolean()
      op match {
        case SocketLogProtocol.OpList =>
          val parts = ReplayLog.listPartitions(dir)
          out.writeInt(parts.size)
          parts.foreach(out.writeInt)
        case SocketLogProtocol.OpEnd => out.writeLong(ReplayLog.safeRecordCount(dir, p))
        case SocketLogProtocol.OpCount => out.writeLong(ReplayLog.recordCount(dir, p))
        case SocketLogProtocol.OpSize => out.writeLong(ReplayLog.logFile(dir, p).length())
        case SocketLogProtocol.OpFetch =>
          // Stream [start, safe-end) re-framed onto the wire; pruned blobs go
          // out as NULL (-1) so payload bytes the reader will not decode never
          // cross the network — the same skip contract FrameStream honors on
          // the file path.
          val end = ReplayLog.safeRecordCount(dir, p)
          val frames = new FrameStream(dir, p, start, needKey, needValue)
          try {
            var off = start
            while (off < end) {
              frames.readFrame()
              def blob(b: Array[Byte], need: Boolean): Unit =
                if (!need || b == null) out.writeInt(-1)
                else { out.writeInt(b.length); out.write(b) }
              blob(frames.key, needKey)
              blob(frames.value, needValue)
              out.writeLong(frames.tsUs)
              off += 1
            }
          } finally frames.close()
        case other => throw new IOException(s"unknown op $other")
      }
      out.flush()
    } catch {
      case _: EOFException => // client hung up mid-request
      case _: IOException => // client closed after reading its planned range
    } finally sock.close()
  }

  override def close(): Unit = {
    closed = true
    server.close()
  }
}
