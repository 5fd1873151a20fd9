package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Static consumer-group membership on the replay source (the reference's
  * split_partition_queue axis, /root/reference/src/kafka/execution.rs:66-96,
  * extended to N cooperating readers): two SIMULTANEOUS streams of the same
  * log must consume disjoint partition sets whose union equals a
  * single-reader run bit-for-bit. */
class ConcurrentReadersSpec extends SparkSpec {

  private def member(log: String, instances: Int, id: Int, name: String) =
    spark.readStream.format("graft-replay")
      .option("path", log)
      .option("consumer.group.instances", instances.toString)
      .option("consumer.group.instance.id", id.toString)
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"crs-$name").toString)
      .trigger(Trigger.AvailableNow()).start()

  private def parts(df: DataFrame): Set[Int] =
    df.select("partition").distinct().collect().map(_.getInt(0)).toSet

  test("two simultaneous group members split the log disjointly and cover it") {
    val log = sources.replay.ReplayLog.ensureLog(spark, sf)
    // both streams run CONCURRENTLY against the same log
    val q0 = member(log, 2, 0, "crs_m0")
    val q1 = member(log, 2, 1, "crs_m1")
    q0.awaitTermination(); q1.awaitTermination()
    val m0 = spark.table("crs_m0"); val m1 = spark.table("crs_m1")

    // disjoint partition ownership, both non-empty (3-partition log)
    val p0 = parts(m0); val p1 = parts(m1)
    assert(p0.nonEmpty && p1.nonEmpty, s"both members must own partitions: $p0 / $p1")
    assert((p0 & p1).isEmpty, s"partition ownership overlaps: $p0 ∩ $p1")

    // union ≡ a single-reader run, bit for bit (keys, payloads, offsets,
    // timestamps — the full envelope)
    val single = spark.readStream.format("graft-replay").option("path", log)
      .load()
      .writeStream.format("memory").queryName("crs_single")
      .option("checkpointLocation", Files.createTempDirectory("crs-s").toString)
      .trigger(Trigger.AvailableNow()).start()
    single.awaitTermination()
    val union = m0.unionAll(m1)
    val ref = spark.table("crs_single")
    assert(union.exceptAll(ref).isEmpty && ref.exceptAll(union).isEmpty,
      "union of group members must equal the single-reader run bit-for-bit")
    assert(ref.count() > 0)
  }

  test("three-way split covers a 3-partition log with one partition each") {
    val log = sources.replay.ReplayLog.ensureLog(spark, sf)
    val qs = (0 until 3).map(i => member(log, 3, i, s"crs3_m$i"))
    qs.foreach(_.awaitTermination())
    val owned = (0 until 3).map(i => parts(spark.table(s"crs3_m$i")))
    assert(owned.forall(_.size == 1), s"each member owns exactly one partition: $owned")
    assert(owned.reduce(_ ++ _) === Set(0, 1, 2), s"coverage broken: $owned")
  }

  test("invalid membership is rejected at load time") {
    val log = sources.replay.ReplayLog.ensureLog(spark, sf)
    val e = intercept[Exception] {
      spark.readStream.format("graft-replay")
        .option("path", log)
        .option("consumer.group.instances", "2")
        .option("consumer.group.instance.id", "2")
        .load()
    }
    assert(e.getMessage.contains("group.instance.id"))
  }
}
