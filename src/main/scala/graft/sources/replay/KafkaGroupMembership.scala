package graft.sources.replay

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}

import KafkaWire._

/** Client half of the classic consumer-group membership protocol —
  * JoinGroup (api 11) / SyncGroup (api 14) / Heartbeat (api 12) /
  * LeaveGroup (api 13), all pinned at v0 like the rest of the dialect.
  * This is librdkafka's `subscribe()` seam (the reference inherits it but
  * uses manual `assign`, `src/kafka/execution.rs:79`): members of a group
  * get DISJOINT partition assignments computed by an elected leader, and a
  * failed heartbeat is the rejoin signal.
  *
  * The embedded consumer protocol is the public one the official clients
  * speak: subscription metadata = (version INT16, topics ARRAY[STRING],
  * user_data BYTES); assignment = (version INT16, ARRAY[(topic,
  * ARRAY[INT32] partitions)], user_data BYTES). The leader runs RANGE
  * assignment (contiguous partition spans per member, members in joined
  * order), matching the default `partition.assignment.strategy`.
  *
  * Spark's DSv2 source self-assigns partitions by design — planned offset
  * ranges, not group rebalance — so this surface exists for parity with
  * the reference's client library, ecosystem tooling, and non-Spark
  * consumers of the same broker; commit-back can now carry the REAL
  * (generation, memberId) and is fenced by the coordinator.
  */
final class KafkaGroupMembership(client: KafkaLogClient, group: String,
    topic: String, sessionTimeoutMs: Int = 10000) {

  @volatile private var memberIdV: String = ""
  @volatile private var generationV: Int = -1
  @volatile private var leaderV: Boolean = false

  def memberId: String = memberIdV
  def generation: Int = generationV
  def isLeader: Boolean = leaderV

  private def subscriptionMetadata: Array[Byte] = {
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    o.writeShort(0)             // consumer protocol version
    o.writeInt(1); writeString(o, topic)
    o.writeInt(0)               // user_data: empty
    bo.toByteArray
  }

  private def call(api: Short, body: Array[Byte], version: Short = 0)
      : DataInputStream =
    client.oneShot(client.coordinator(group), api, version, body)

  /** One full join+sync dance; returns this member's assigned partitions.
    * Retries the named transient outcomes (REBALANCE_IN_PROGRESS while the
    * window re-opens, UNKNOWN_MEMBER_ID after an eviction) and fails loud
    * on anything else. */
  def join(): Seq[Int] = {
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 10)
        throw new IOException(s"kafka group '$group': join did not settle " +
          s"after $attempts attempts")
      val jb = new ByteArrayOutputStream(); val jo = new DataOutputStream(jb)
      writeString(jo, group)
      jo.writeInt(sessionTimeoutMs)
      writeString(jo, memberIdV)
      writeString(jo, "consumer")
      jo.writeInt(1); writeString(jo, "range")
      val md = subscriptionMetadata
      jo.writeInt(md.length); jo.write(md)
      val jr = call(ApiJoinGroup, jb.toByteArray)
      val jerr = jr.readShort()
      if (jerr == 25) { memberIdV = "" } // evicted: rejoin blank
      else if (jerr == 27) { Thread.sleep(50) }
      else if (jerr != 0)
        throw new IOException(s"kafka JoinGroup error $jerr for group '$group'")
      else {
        val gen = jr.readInt()
        readString(jr)          // protocol ("range")
        val leaderId = readString(jr)
        val myId = readString(jr)
        val nMembers = jr.readInt()
        val memberMeta = (1 to nMembers).map { _ =>
          val m = readString(jr)
          val len = jr.readInt()
          val b = new Array[Byte](math.max(len, 0)); jr.readFully(b)
          (m, b)
        }
        memberIdV = myId; generationV = gen; leaderV = leaderId == myId
        // leader computes RANGE assignment over the topic's partitions
        val assignments: Seq[(String, Seq[Int])] =
          if (!leaderV) Nil
          else {
            val parts = client.listPartitions()
            val n = memberMeta.size
            val per = parts.size / n
            val extra = parts.size % n
            var idx = 0
            memberMeta.zipWithIndex.map { case ((m, _), i) =>
              val take = per + (if (i < extra) 1 else 0)
              val mine = parts.slice(idx, idx + take)
              idx += take
              (m, mine)
            }
          }
        val sb = new ByteArrayOutputStream(); val so = new DataOutputStream(sb)
        writeString(so, group)
        so.writeInt(gen)
        writeString(so, myId)
        so.writeInt(assignments.size)
        assignments.foreach { case (m, ps) =>
          writeString(so, m)
          val ab = new ByteArrayOutputStream(); val ao = new DataOutputStream(ab)
          ao.writeShort(0)      // assignment version
          ao.writeInt(1); writeString(ao, topic)
          ao.writeInt(ps.size); ps.foreach(ao.writeInt)
          ao.writeInt(0)        // user_data: empty
          so.writeInt(ab.size()); so.write(ab.toByteArray)
        }
        val sr = call(ApiSyncGroup, sb.toByteArray)
        val serr = sr.readShort()
        if (serr == 27 || serr == 22) { Thread.sleep(50) } // window re-opened
        else if (serr == 25) { memberIdV = "" }
        else if (serr != 0)
          throw new IOException(s"kafka SyncGroup error $serr for group '$group'")
        else {
          val alen = sr.readInt()
          if (alen <= 0) return Seq.empty // a member subscribed past capacity
          sr.readShort()        // assignment version
          val nTopics = sr.readInt()
          var mine = Seq.empty[Int]
          (1 to nTopics).foreach { _ =>
            val t = readString(sr)
            val nP = sr.readInt()
            val ps = (1 to nP).map(_ => sr.readInt())
            if (t == topic) mine = ps
          }
          return mine.sorted
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Heartbeat: true while the assignment is still valid; false when the
    * coordinator signals a rebalance (the caller must re-`join()`). Ghost
    * outcomes (evicted member, stale generation) also answer false after
    * resetting state so the rejoin starts blank. */
  def heartbeat(): Boolean = {
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    writeString(o, group)
    o.writeInt(generationV)
    writeString(o, memberIdV)
    val r = call(ApiHeartbeat, bo.toByteArray)
    r.readShort() match {
      case 0 => true
      case 27 => false
      case 22 => false
      case 25 => memberIdV = ""; false
      case e => throw new IOException(
        s"kafka Heartbeat error $e for group '$group'")
    }
  }

  /** Clean exit: the coordinator rebalances the remainder immediately. */
  def leave(): Unit = {
    if (memberIdV.isEmpty) return
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    writeString(o, group)
    writeString(o, memberIdV)
    val r = call(ApiLeaveGroup, bo.toByteArray)
    val e = r.readShort()
    if (e != 0 && e != 25)
      throw new IOException(s"kafka LeaveGroup error $e for group '$group'")
    memberIdV = ""; generationV = -1; leaderV = false
  }

  /** Commit offsets AS THIS MEMBER (generation-fenced, unlike the simple
    * consumer's commit-back): a coordinator that has moved on answers
    * ILLEGAL_GENERATION and the commit must not land. */
  def commitOffsets(offsets: Map[Int, Long]): Unit = {
    if (offsets.isEmpty) return
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    writeString(o, group)
    o.writeInt(generationV)
    writeString(o, memberIdV)
    o.writeLong(-1L)
    o.writeInt(1); writeString(o, topic)
    o.writeInt(offsets.size)
    offsets.toSeq.sortBy(_._1).foreach { case (p, off) =>
      o.writeInt(p); o.writeLong(off); writeString(o, "")
    }
    val in = call(ApiOffsetCommit, bo.toByteArray, version = 2)
    val nTopics = in.readInt()
    (1 to nTopics).foreach { _ =>
      val name = readString(in)
      val nParts = in.readInt()
      (1 to nParts).foreach { _ =>
        val pid = in.readInt(); val err = in.readShort()
        if (err != 0)
          throw new IOException(s"kafka OffsetCommit error $err for " +
            s"$name/$pid group '$group' (member $memberIdV gen $generationV)")
      }
    }
  }
}
