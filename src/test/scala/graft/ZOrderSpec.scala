package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.zvalue16

/** Measures x26's data-skipping claim: after z-order clustering, the
  * per-file (user_id) min/max envelopes let a user-slice predicate prune
  * files that a time-sorted ingest layout must read — same rows, same
  * file count, different clustering. */
class ZOrderSpec extends SparkSpec {

  private def filesOverlapping(df: DataFrame, lo: Long, hi: Long): Long =
    df.groupBy(col("_metadata.file_path"))
      .agg(min(col("user_id")).as("u_min"), max(col("user_id")).as("u_max"))
      .filter(col("u_min") <= hi && col("u_max") >= lo)
      .count()

  test("x26 z-order prunes a user slice that time-sorted layout cannot") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_spec"
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_ns"))

    // time-sorted ingest: the layout an append-only pipeline produces
    ev.repartitionByRange(8, col("ts_ns")).sortWithinPartitions(col("ts_ns"))
      .write.mode("overwrite").parquet(s"$base/bytime")

    // z-order rewrite (same normalization as the declared query)
    val mm = ev.agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
      min(col("ts_ns")).as("t0"), max(col("ts_ns")).as("t1"))
    val un = least((col("user_id") - col("u0")) * 65535L /
      greatest(col("u1") - col("u0"), lit(1L)), lit(65535L))
    val tn = least((col("ts_ns") - col("t0")) /
      greatest((col("t1") - col("t0")) / lit(65535L), lit(1L)), lit(65535L))
    ev.crossJoin(broadcast(mm))
      .withColumn("zn", zvalue16(un, tn))
      .repartitionByRange(8, col("zn")).sortWithinPartitions(col("zn"))
      .select(col("event_id"), col("user_id"), col("ts_ns"))
      .write.mode("overwrite").parquet(s"$base/byz")

    val byTime = spark.read.parquet(s"$base/bytime")
    val byZ = spark.read.parquet(s"$base/byz")

    // same data in both layouts
    assert(byTime.count() == byZ.count())

    // a narrow user slice (sf0.001 has users 0..14): every time-sorted file
    // spans ~all users, so its envelope overlaps; z-ordered files cluster
    // users and most fall out
    val (tFiles, zFiles) =
      (filesOverlapping(byTime, 3, 5), filesOverlapping(byZ, 3, 5))
    assert(zFiles < tFiles,
      s"z-order layout should prune the user slice: z=$zFiles time=$tFiles")
  }

  test("zvalue16 is monotone on each axis within a fixed other axis") {
    // sanity on the bit interleave itself: fixing one dimension, the curve
    // order must follow the other dimension's order (this is what makes
    // min/max envelopes tight along both axes)
    val df = spark.range(0, 100).toDF("a")
      .select(col("a"), zvalue16(col("a"), lit(7L)).as("z"))
      .orderBy(col("a")).collect().map(_.getLong(1))
    assert(df.sliding(2).forall(p => p(0) < p(1)))
  }
}
