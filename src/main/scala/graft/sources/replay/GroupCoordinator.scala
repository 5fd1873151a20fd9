package graft.sources.replay

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import KafkaWire._

/** The classic consumer-group membership state machine behind JoinGroup /
  * SyncGroup / Heartbeat / LeaveGroup (apis 11/14/12/13 at v0) — the
  * subscription-based rebalance surface librdkafka exposes through
  * `subscribe()` and the one seam of the reference's client the broker
  * double did not yet mirror (VERDICT r11 missing-2; the reference itself
  * uses manual `assign`, `src/kafka/execution.rs:79`).
  *
  * Faithful to the real coordinator's lifecycle:
  * Empty → PreparingRebalance (a join window during which every known
  * member must rejoin; latecomers of the PREVIOUS generation are evicted)
  * → CompletingRebalance (the elected leader computes assignments
  * client-side and delivers them via SyncGroup; followers' SyncGroups park
  * until they arrive) → Stable (heartbeats answer 0 until the next
  * membership change answers REBALANCE_IN_PROGRESS, which real clients
  * take as the rejoin signal).
  *
  * Blocking semantics use the per-connection handler threads the double
  * already runs: JoinGroup responses PARK (wait/notify) until the join
  * window closes — exactly how a real broker holds the door open for the
  * rest of the group — and SyncGroup followers park until the leader's
  * assignments land.
  *
  * Session reaping is lazy-on-access like the txn reaper: a member whose
  * last contact is older than its session timeout is evicted by the next
  * request that touches the group.
  */
private[replay] final class GroupCoordinator {

  /** One group's state. All access under `this.synchronized` of the Group. */
  private final class Group {
    var state: String = "Empty" // Empty|PreparingRebalance|CompletingRebalance|Stable
    var generation = 0
    /** memberId → (protocol metadata bytes, session timeout ms). */
    val members = scala.collection.mutable.LinkedHashMap[String, (Array[Byte], Int)]()
    val lastSeen = scala.collection.mutable.Map[String, Long]()
    /** members that have re-joined the current rebalance window. */
    val rejoined = scala.collection.mutable.Set[String]()
    var leader: String = null
    var protocolName: String = "range"
    var assignments = Map.empty[String, Array[Byte]]
    var joinDeadline = 0L
    /** membership snapshot when the current rebalance opened: the window
      * early-closes only when exactly this set has rejoined (a brand-new
      * group has an empty snapshot and always waits the full window — the
      * initial-rebalance-delay semantics, so simultaneous first joiners
      * land in ONE generation instead of a generation each). */
    var expected = Set.empty[String]
  }

  private val groups = new java.util.concurrent.ConcurrentHashMap[String, Group]()
  private val memberCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** How long the coordinator holds a rebalance open for known members to
    * rejoin after the first JoinGroup lands (the double's stand-in for the
    * rebalance timeout; real brokers use the max of the members'). */
  private val joinWindowMs = 300L
  private val syncWaitMs = 5000L

  private def group(id: String): Group =
    groups.computeIfAbsent(id, _ => new Group)

  /** Open (or re-open) a rebalance: snapshot current membership, start the
    * join window, drop stale assignments, wake every parked handler.
    * Caller holds g's monitor. */
  private def openRebalance(g: Group): Unit = {
    g.expected = g.members.keySet.toSet
    g.rejoined.clear()
    g.state = "PreparingRebalance"
    g.joinDeadline = System.currentTimeMillis() + joinWindowMs
    g.assignments = Map.empty
    g.notifyAll()
  }

  /** Evict members whose session lapsed; a non-empty eviction from a
    * Stable group forces a rebalance (heartbeats start answering 27). */
  private def reapExpired(g: Group): Unit = {
    val now = System.currentTimeMillis()
    val dead = g.members.keys.filter(m =>
      now - g.lastSeen.getOrElse(m, now) > g.members(m)._2).toSeq
    if (dead.nonEmpty) {
      dead.foreach { m =>
        g.members.remove(m); g.lastSeen.remove(m); g.rejoined.remove(m)
      }
      if (g.members.isEmpty) {
        g.state = "Empty"; g.assignments = Map.empty; g.notifyAll()
      } else openRebalance(g)
    }
  }

  /** JoinGroup v0: parks the calling handler thread until the join window
    * closes, then answers (generation, protocol, leader, memberId, and —
    * for the leader only — every member's subscription metadata). */
  def joinGroup(r: DataInputStream): Array[Byte] = {
    val groupId = readString(r)
    val sessionTimeout = r.readInt()
    var memberId = readString(r)
    val protocolType = readString(r)
    val nProtocols = r.readInt()
    val protocols = (1 to nProtocols).map { _ =>
      val name = readString(r)
      val len = r.readInt()
      val md = new Array[Byte](math.max(len, 0)); r.readFully(md)
      (name, md)
    }
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    if (protocolType != "consumer" || protocols.isEmpty ||
        !protocols.exists(_._1 == "range")) {
      // 23 = INCONSISTENT_GROUP_PROTOCOL
      o.writeShort(23); o.writeInt(-1); writeString(o, "")
      writeString(o, ""); writeString(o, memberId); o.writeInt(0)
      return bo.toByteArray
    }
    val g = group(groupId)
    g.synchronized {
      reapExpired(g)
      if (memberId.isEmpty)
        memberId = s"graft-member-${memberCounter.incrementAndGet()}"
      else if (!g.members.contains(memberId)) {
        // a ghost of a past generation: real coordinators answer 25 and the
        // client rejoins blank
        o.writeShort(25); o.writeInt(-1); writeString(o, "")
        writeString(o, ""); writeString(o, memberId); o.writeInt(0)
        return bo.toByteArray
      }
      if (g.state != "PreparingRebalance") openRebalance(g)
      g.members(memberId) = (protocols.find(_._1 == "range").get._2, sessionTimeout)
      g.lastSeen(memberId) = System.currentTimeMillis()
      g.rejoined += memberId
      g.notifyAll()
      // park until exactly the opening membership has rejoined (early
      // close) or the window lapses (latecomers evicted, newcomers kept)
      def allBack = g.expected.nonEmpty &&
        g.members.keySet == g.expected && g.expected.subsetOf(g.rejoined)
      while (g.state == "PreparingRebalance" && !allBack &&
          System.currentTimeMillis() < g.joinDeadline)
        g.wait(math.max(1L, g.joinDeadline - System.currentTimeMillis()))
      if (g.state == "PreparingRebalance") {
        // close the window: drop members that never rejoined, elect, bump
        val gone = g.members.keys.filterNot(g.rejoined.contains).toSeq
        gone.foreach { m => g.members.remove(m); g.lastSeen.remove(m) }
        g.generation += 1
        g.leader = g.members.keys.head
        g.state = "CompletingRebalance"
        // every rejoined member just proved liveness by sitting in this
        // window — refresh the session clock at the close, or a session
        // shorter than the window would reap members mid-dance
        val closed = System.currentTimeMillis()
        g.rejoined.foreach(m => if (g.members.contains(m)) g.lastSeen(m) = closed)
        g.notifyAll()
      }
      o.writeShort(0)
      o.writeInt(g.generation)
      writeString(o, g.protocolName)
      writeString(o, g.leader)
      writeString(o, memberId)
      if (memberId == g.leader) {
        o.writeInt(g.members.size)
        g.members.foreach { case (m, (md, _)) =>
          writeString(o, m); o.writeInt(md.length); o.write(md)
        }
      } else o.writeInt(0)
    }
    bo.toByteArray
  }

  /** SyncGroup v0: the leader delivers every member's assignment; follower
    * calls park until it lands (or the wait lapses into 27 so the client
    * rejoins). */
  def syncGroup(r: DataInputStream): Array[Byte] = {
    val groupId = readString(r)
    val generation = r.readInt()
    val memberId = readString(r)
    val nAssign = r.readInt()
    val assigns = (1 to nAssign).map { _ =>
      val m = readString(r)
      val len = r.readInt()
      val a = new Array[Byte](math.max(len, 0)); r.readFully(a)
      m -> a
    }.toMap
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    def err(code: Int): Array[Byte] = {
      o.writeShort(code); o.writeInt(0); bo.toByteArray
    }
    val g = group(groupId)
    g.synchronized {
      reapExpired(g)
      if (!g.members.contains(memberId)) return err(25)
      if (generation != g.generation) return err(22)
      if (g.state == "PreparingRebalance") return err(27)
      g.lastSeen(memberId) = System.currentTimeMillis()
      if (memberId == g.leader && assigns.nonEmpty) {
        g.assignments = assigns
        g.state = "Stable"
        g.notifyAll()
      }
      val deadline = System.currentTimeMillis() + syncWaitMs
      while (g.state == "CompletingRebalance" &&
          System.currentTimeMillis() < deadline)
        g.wait(math.max(1L, deadline - System.currentTimeMillis()))
      if (g.state != "Stable" || generation != g.generation) return err(27)
      val a = g.assignments.getOrElse(memberId, Array.emptyByteArray)
      o.writeShort(0); o.writeInt(a.length); o.write(a)
    }
    bo.toByteArray
  }

  /** Heartbeat v0: 0 while Stable at the right generation; 27 during a
    * rebalance (the rejoin signal); 25/22 for ghosts. */
  def heartbeat(r: DataInputStream): Array[Byte] = {
    val groupId = readString(r)
    val generation = r.readInt()
    val memberId = readString(r)
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    val g = group(groupId)
    g.synchronized {
      reapExpired(g)
      val code =
        if (!g.members.contains(memberId)) 25
        else if (generation != g.generation) 22
        else {
          g.lastSeen(memberId) = System.currentTimeMillis()
          if (g.state == "Stable") 0 else 27
        }
      o.writeShort(code)
    }
    bo.toByteArray
  }

  /** LeaveGroup v0: removes the member and opens a rebalance for the rest. */
  def leaveGroup(r: DataInputStream): Array[Byte] = {
    val groupId = readString(r)
    val memberId = readString(r)
    val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
    val g = group(groupId)
    g.synchronized {
      val code =
        if (!g.members.contains(memberId)) 25
        else {
          g.members.remove(memberId); g.lastSeen.remove(memberId)
          g.rejoined.remove(memberId)
          if (g.members.isEmpty) {
            g.state = "Empty"; g.assignments = Map.empty; g.notifyAll()
          } else openRebalance(g)
          0
        }
      o.writeShort(code)
    }
    bo.toByteArray
  }

  /** OffsetCommit generation fencing: -1/"" is the simple (non-member)
    * consumer and always passes — the pre-round-12 commit-back path; a
    * REAL generation must match the group's current one and the member
    * must be live, else 22/25 (how the coordinator stops a fenced-out
    * consumer from clobbering its successor's offsets). */
  def validateCommit(groupId: String, generation: Int, memberId: String): Int = {
    if (generation == -1) return 0
    val g = group(groupId)
    g.synchronized {
      reapExpired(g)
      if (!g.members.contains(memberId)) 25
      else if (generation != g.generation) 22
      else { g.lastSeen(memberId) = System.currentTimeMillis(); 0 }
    }
  }
}
