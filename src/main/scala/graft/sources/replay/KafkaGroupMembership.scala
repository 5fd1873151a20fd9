package graft.sources.replay

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}

import KafkaWire._

/** Client half of the classic consumer-group membership protocol —
  * JoinGroup (api 11) / SyncGroup (api 14) / Heartbeat (api 12) /
  * LeaveGroup (api 13) — speaking BOTH dialects since round 14 (VERDICT
  * r13 #1): the pre-flexible v0 pins, and the flexible (KIP-482) versions
  * (JoinGroup v6, SyncGroup v4, Heartbeat v4, LeaveGroup v4) negotiated
  * per broker like the rest of the client. This is librdkafka's
  * `subscribe()` seam (the reference inherits it but uses manual `assign`,
  * `src/kafka/execution.rs:79`): members of a group get DISJOINT partition
  * assignments computed by an elected leader, and a failed heartbeat is
  * the rejoin signal.
  *
  * JoinGroup v4+ adds the MEMBER_ID_REQUIRED dance (KIP-394): a first
  * join with an empty member id is answered with error 79 plus a
  * broker-assigned member id, and the client must immediately rejoin
  * carrying it — the handshake that stops a crash-looping consumer from
  * leaking a fresh member (and a rebalance) per attempt. Handled
  * transparently in [[join]].
  *
  * The embedded consumer protocol is the public one the official clients
  * speak: subscription metadata = (version INT16, topics ARRAY[STRING],
  * user_data BYTES); assignment = (version INT16, ARRAY[(topic,
  * ARRAY[INT32] partitions)], user_data BYTES). It is version-independent
  * of the wire framing (opaque bytes to the broker). The leader runs RANGE
  * assignment (contiguous partition spans per member, members in joined
  * order), matching the default `partition.assignment.strategy` — or,
  * since round 16 (VERDICT r15 #4), the KIP-429 INCREMENTAL COOPERATIVE
  * protocol (`strategy = "cooperative-sticky"`): owned partitions ride
  * ConsumerProtocol v1 subscription metadata, the leader's constrained
  * sticky assignor withholds any partition that must change owner until
  * its old owner has revoked it (two-phase: revoke round, then assign
  * round), and [[needsRejoin]] signals the prompt rejoin that drives
  * convergence. Assignor choice is a coordinator-brokered vote; a joiner
  * sharing no assignor with the group is refused with
  * INCONSISTENT_GROUP_PROTOCOL.
  *
  * Spark's DSv2 source self-assigns partitions by design — planned offset
  * ranges, not group rebalance — so this surface exists for parity with
  * the reference's client library, ecosystem tooling, and non-Spark
  * consumers of the same broker; commit-back can now carry the REAL
  * (generation, memberId) and is fenced by the coordinator.
  */
final class KafkaGroupMembership(client: KafkaLogClient, group: String,
    topic: String, sessionTimeoutMs: Int = 10000,
    strategy: String = "range",
    groupInstanceId: Option[String] = None) {

  require(strategy == "range" || strategy == "cooperative-sticky",
    s"unsupported partition.assignment.strategy '$strategy'")
  require(groupInstanceId.forall(_.nonEmpty),
    "group.instance.id must be non-empty when set")
  /** KIP-345 static membership: a set `group.instance.id` makes restarts
    * of this consumer REJOIN WITHOUT A REBALANCE — the coordinator swaps a
    * fresh member id into the registered slot and hands back the same
    * generation and assignment, so a rolling restart never stops the
    * group. A second live holder of the instance id (or the replaced old
    * incarnation) is FENCED: error 82 surfaces as a named exception, never
    * a silent dual-consume. Requires the flexible dialect (JoinGroup v5+
    * carries the field); a v0-only broker refuses loudly. */
  private def static: Boolean = groupInstanceId.isDefined
  private def instanceIdOrNull: String = groupInstanceId.orNull
  /** KIP-429: the cooperative assignor never moves a partition between
    * two members inside one rebalance — the old owner must first REVOKE
    * (the partition is withheld from everyone for that generation), then a
    * follow-up rebalance assigns it. Owned partitions ride the
    * subscription metadata (ConsumerProtocol v1 owned_partitions). */
  private def cooperative: Boolean = strategy == "cooperative-sticky"

  @volatile private var memberIdV: String = ""
  @volatile private var generationV: Int = -1
  @volatile private var leaderV: Boolean = false
  /** partitions this member currently owns (cooperative bookkeeping). */
  @volatile private var ownedV: Seq[Int] = Seq.empty
  /** partitions the LAST join()'s sync revoked (owned before, not
    * assigned now). Non-empty ⇒ the member must re-join promptly so the
    * withheld partitions can land (the KIP-429 second rebalance). */
  @volatile private var lastRevokedV: Seq[Int] = Seq.empty

  def memberId: String = memberIdV
  def generation: Int = generationV
  def isLeader: Boolean = leaderV
  def owned: Seq[Int] = ownedV
  def lastRevoked: Seq[Int] = lastRevokedV
  /** cooperative convergence signal: true while a follow-up rejoin is
    * required (this member just revoked partitions). */
  def needsRejoin: Boolean = lastRevokedV.nonEmpty

  private def subscriptionMetadata: Array[Byte] = {
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    if (!cooperative) {
      o.writeShort(0)           // consumer protocol version
      o.writeInt(1); writeString(o, topic)
      o.writeInt(0)             // user_data: empty
    } else {
      // ConsumerProtocol v1: + owned_partitions ARRAY[(topic, [int32])]
      o.writeShort(1)
      o.writeInt(1); writeString(o, topic)
      o.writeInt(0)             // user_data: empty
      val mine = ownedV
      if (mine.isEmpty) o.writeInt(0)
      else {
        o.writeInt(1); writeString(o, topic)
        o.writeInt(mine.size); mine.foreach(o.writeInt)
      }
    }
    bo.toByteArray
  }

  /** owned partitions of `topic` out of one member's subscription
    * metadata (v0 carries none). */
  private def parseOwned(md: Array[Byte]): Seq[Int] = {
    if (md == null || md.isEmpty) return Seq.empty
    val in = new DataInputStream(new java.io.ByteArrayInputStream(md))
    val version = in.readShort()
    val nTopics = in.readInt()
    (1 to nTopics).foreach(_ => readString(in))
    val udLen = in.readInt()
    if (udLen > 0) in.skipBytes(udLen)
    if (version < 1 || in.available() <= 0) return Seq.empty
    val nOwned = in.readInt()
    var mine = Seq.empty[Int]
    (1 to nOwned).foreach { _ =>
      val t = readString(in)
      val nP = in.readInt()
      val ps = (1 to nP).map(_ => in.readInt())
      if (t == topic) mine = ps
    }
    mine
  }

  /** One negotiated one-shot to the coordinator; returns (version, resp). */
  private def call(name: String, api: Short, pinned: Short, flex: Short)
      (body: Short => Array[Byte]): (Short, DataInputStream) =
    client.oneShotVersioned(client.coordinator(group), name, api,
      pinned, flex)(body)

  /** One full join+sync dance; returns this member's assigned partitions.
    * Retries the named transient outcomes (REBALANCE_IN_PROGRESS while the
    * window re-opens, UNKNOWN_MEMBER_ID after an eviction, and
    * MEMBER_ID_REQUIRED on a modern broker's first contact) and fails loud
    * on anything else. */
  def join(): Seq[Int] = {
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 10)
        throw new IOException(s"kafka group '$group': join did not settle " +
          s"after $attempts attempts")
      val (jv, jr) = call("JoinGroup", ApiJoinGroup, 0, 6) { v =>
        // the instance id only rides the FLEXIBLE body this client writes
        // (v6); guarding at the field's protocol floor (v5) would pass a
        // version whose body builder silently drops the field
        if (static && v < 6)
          throw new IOException(s"kafka group '$group': static membership " +
            s"(group.instance.id) needs the flexible JoinGroup dialect " +
            s"(v6 in this client); negotiation picked v$v")
        val jb = new ByteArrayOutputStream(); val jo = new DataOutputStream(jb)
        val md = subscriptionMetadata
        if (v >= 6) {
          writeCompactString(jo, group)
          jo.writeInt(sessionTimeoutMs)
          jo.writeInt(sessionTimeoutMs) // rebalance_timeout_ms
          writeCompactString(jo, memberIdV)
          writeCompactString(jo, instanceIdOrNull) // KIP-345 (null = dynamic)
          writeCompactString(jo, "consumer")
          writeCompactArrayLen(jo, 1)
          writeCompactString(jo, strategy)
          writeCompactBytes(jo, md)
          writeEmptyTagged(jo)
          writeEmptyTagged(jo)
        } else {
          writeString(jo, group)
          jo.writeInt(sessionTimeoutMs)
          writeString(jo, memberIdV)
          writeString(jo, "consumer")
          jo.writeInt(1); writeString(jo, strategy)
          jo.writeInt(md.length); jo.write(md)
        }
        jb.toByteArray
      }
      if (jv >= 6) jr.readInt() // throttle_time_ms
      val jerr = jr.readShort()
      if (jerr == 25) { memberIdV = "" } // evicted: rejoin blank
      else if (jerr == 27) { Thread.sleep(50) }
      else if (jerr == 79 && jv >= 4) {
        // MEMBER_ID_REQUIRED: the broker assigned an id; rejoin with it
        jr.readInt()            // generation (-1)
        if (jv >= 6) { readCompactString(jr); readCompactString(jr) }
        else { readString(jr); readString(jr) } // protocol, leader
        memberIdV =
          if (jv >= 6) readCompactString(jr) else readString(jr)
        if (memberIdV == null || memberIdV.isEmpty)
          throw new IOException(s"kafka JoinGroup answered " +
            s"MEMBER_ID_REQUIRED without a member id for group '$group'")
      }
      else if (jerr == 82)
        throw new IOException(s"kafka group '$group': FENCED_INSTANCE_ID — " +
          s"another consumer holds group.instance.id " +
          s"'${groupInstanceId.getOrElse("")}' (or this incarnation was " +
          "replaced by a newer one)")
      else if (jerr != 0)
        throw new IOException(s"kafka JoinGroup error $jerr for group '$group'")
      else {
        val gen = jr.readInt()
        if (jv >= 6) readCompactString(jr) else readString(jr) // protocol
        val leaderId = if (jv >= 6) readCompactString(jr) else readString(jr)
        val myId = if (jv >= 6) readCompactString(jr) else readString(jr)
        val nMembers =
          if (jv >= 6) readCompactArrayLen(jr) else jr.readInt()
        val memberMeta = (1 to nMembers).map { _ =>
          if (jv >= 6) {
            val m = readCompactString(jr)
            readCompactString(jr)       // group_instance_id
            val b = readCompactBytes(jr)
            skipTagged(jr)
            (m, if (b == null) Array.emptyByteArray else b)
          } else {
            val m = readString(jr)
            val len = jr.readInt()
            val b = new Array[Byte](math.max(len, 0)); jr.readFully(b)
            (m, b)
          }
        }
        memberIdV = myId; generationV = gen; leaderV = leaderId == myId
        // leader computes the assignment over the topic's partitions:
        // eager RANGE (contiguous spans, joined order), or the KIP-429
        // constrained cooperative-sticky
        val assignments: Seq[(String, Seq[Int])] =
          if (!leaderV) Nil
          else {
            val parts = client.listPartitions()
            val n = memberMeta.size
            val per = parts.size / n
            val extra = parts.size % n
            def share(i: Int) = per + (if (i < extra) 1 else 0)
            if (!cooperative) {
              var idx = 0
              memberMeta.zipWithIndex.map { case ((m, _), i) =>
                val take = share(i)
                val mine = parts.slice(idx, idx + take)
                idx += take
                (m, mine)
              }
            } else {
              // Constrained sticky (KIP-429): every owner KEEPS its owned
              // partitions up to its fair share (first claim in joined
              // order wins a conflicting claim); a partition trimmed away
              // from its owner is WITHHELD this generation — assigned to
              // nobody — because moving it directly would hand it to a new
              // owner before the old one stopped consuming. Only
              // partitions nobody owned coming into this rebalance are
              // newly assignable. Revoking members rejoin promptly
              // ([[needsRejoin]]), and the follow-up rebalance hands the
              // now-unowned partitions out — incremental, never
              // stop-the-world.
              val ownedBy = memberMeta.map { case (m, md) =>
                m -> parseOwned(md) }.toMap
              val claimed = scala.collection.mutable.Set[Int]()
              val keep = memberMeta.zipWithIndex.map { case ((m, _), i) =>
                val mine = ownedBy(m).filter(parts.contains)
                  .filterNot(claimed.contains).sorted.take(share(i))
                claimed ++= mine
                (m, mine)
              }
              val ownedByAnyone =
                memberMeta.flatMap { case (m, _) => ownedBy(m) }.toSet
              var pool = parts
                .filterNot(ownedByAnyone.contains)
                .filterNot(claimed.contains)
              keep.zipWithIndex.map { case ((m, mine), i) =>
                val need = share(i) - mine.size
                val add = pool.take(math.max(need, 0))
                pool = pool.drop(math.max(need, 0))
                (m, (mine ++ add).sorted)
              }
            }
          }
        def assignmentBytes(ps: Seq[Int]): Array[Byte] = {
          val ab = new ByteArrayOutputStream(); val ao = new DataOutputStream(ab)
          ao.writeShort(0)      // assignment version
          ao.writeInt(1); writeString(ao, topic)
          ao.writeInt(ps.size); ps.foreach(ao.writeInt)
          ao.writeInt(0)        // user_data: empty
          ab.toByteArray
        }
        val (sv, sr) = call("SyncGroup", ApiSyncGroup, 0, 4) { v =>
          val sb = new ByteArrayOutputStream(); val so = new DataOutputStream(sb)
          if (v >= 4) {
            writeCompactString(so, group)
            so.writeInt(gen)
            writeCompactString(so, myId)
            writeCompactString(so, instanceIdOrNull) // KIP-345
            writeCompactArrayLen(so, assignments.size)
            assignments.foreach { case (m, ps) =>
              writeCompactString(so, m)
              writeCompactBytes(so, assignmentBytes(ps))
              writeEmptyTagged(so)
            }
            writeEmptyTagged(so)
          } else {
            writeString(so, group)
            so.writeInt(gen)
            writeString(so, myId)
            so.writeInt(assignments.size)
            assignments.foreach { case (m, ps) =>
              writeString(so, m)
              val ab = assignmentBytes(ps)
              so.writeInt(ab.length); so.write(ab)
            }
          }
          sb.toByteArray
        }
        if (sv >= 4) sr.readInt() // throttle_time_ms
        val serr = sr.readShort()
        if (serr == 27 || serr == 22) { Thread.sleep(50) } // window re-opened
        else if (serr == 25) { memberIdV = "" }
        else if (serr == 82)
          throw new IOException(s"kafka group '$group': FENCED_INSTANCE_ID " +
            s"on SyncGroup — instance id " +
            s"'${groupInstanceId.getOrElse("")}' was claimed by a newer " +
            "incarnation")
        else if (serr != 0)
          throw new IOException(s"kafka SyncGroup error $serr for group '$group'")
        else {
          val assigned =
            if (sv >= 4) readCompactBytes(sr)
            else {
              val alen = sr.readInt()
              if (alen <= 0) null
              else { val b = new Array[Byte](alen); sr.readFully(b); b }
            }
          if (assigned == null || assigned.isEmpty) {
            // a member subscribed past capacity — or, cooperative, a
            // generation in which everything it owned was revoked
            lastRevokedV = if (cooperative) ownedV else Seq.empty
            ownedV = Seq.empty
            return Seq.empty
          }
          val ar = new DataInputStream(
            new java.io.ByteArrayInputStream(assigned))
          ar.readShort()        // assignment version
          val nTopics = ar.readInt()
          var mine = Seq.empty[Int]
          (1 to nTopics).foreach { _ =>
            val t = readString(ar)
            val nP = ar.readInt()
            val ps = (1 to nP).map(_ => ar.readInt())
            if (t == topic) mine = ps
          }
          val settled = mine.sorted
          lastRevokedV =
            if (cooperative) ownedV.filterNot(settled.contains) else Seq.empty
          ownedV = settled
          return settled
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
    val (hv, r) = call("Heartbeat", ApiHeartbeat, 0, 4) { v =>
      val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
      if (v >= 4) {
        writeCompactString(o, group)
        o.writeInt(generationV)
        writeCompactString(o, memberIdV)
        writeCompactString(o, instanceIdOrNull) // KIP-345
        writeEmptyTagged(o)
      } else {
        writeString(o, group)
        o.writeInt(generationV)
        writeString(o, memberIdV)
      }
      bo.toByteArray
    }
    if (hv >= 4) r.readInt()    // throttle_time_ms
    r.readShort() match {
      case 0 => true
      case 27 => false
      case 22 => false
      case 25 => memberIdV = ""; false
      case 82 => throw new IOException(s"kafka group '$group': " +
        s"FENCED_INSTANCE_ID on Heartbeat — instance id " +
        s"'${groupInstanceId.getOrElse("")}' was claimed by a newer " +
        "incarnation; this consumer must shut down, not rejoin")
      case e => throw new IOException(
        s"kafka Heartbeat error $e for group '$group'")
    }
  }

  /** Clean exit: the coordinator rebalances the remainder immediately. */
  def leave(): Unit = {
    if (memberIdV.isEmpty) return
    val (lv, r) = call("LeaveGroup", ApiLeaveGroup, 0, 4) { v =>
      val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
      if (v >= 4) {
        writeCompactString(o, group)
        writeCompactArrayLen(o, 1) // members (batched since v3)
        writeCompactString(o, memberIdV)
        writeCompactString(o, instanceIdOrNull) // KIP-345
        writeEmptyTagged(o)
        writeEmptyTagged(o)
      } else {
        writeString(o, group)
        writeString(o, memberIdV)
      }
      bo.toByteArray
    }
    if (lv >= 4) r.readInt()    // throttle_time_ms
    val e = r.readShort()
    if (lv >= 4 && e == 0) {
      val n = readCompactArrayLen(r)
      (1 to n).foreach { _ =>
        readCompactString(r); readCompactString(r)
        val me = r.readShort(); skipTagged(r)
        if (me != 0 && me != 25)
          throw new IOException(
            s"kafka LeaveGroup member error $me for group '$group'")
      }
    }
    if (e != 0 && e != 25)
      throw new IOException(s"kafka LeaveGroup error $e for group '$group'")
    memberIdV = ""; generationV = -1; leaderV = false
    ownedV = Seq.empty; lastRevokedV = Seq.empty
  }

  /** Commit offsets AS THIS MEMBER (generation-fenced, unlike the simple
    * consumer's commit-back): a coordinator that has moved on answers
    * ILLEGAL_GENERATION and the commit must not land. Framing (v2 or the
    * flexible v8) is shared with the simple path in [[KafkaLogClient]]. */
  def commitOffsets(offsets: Map[Int, Long]): Unit =
    client.commitOffsetsAs(group, generationV, memberIdV, offsets,
      instanceIdOrNull)
}
