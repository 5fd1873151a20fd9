package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-count and plan-shape pins for GraftOps.compact (x22 pins content).
  * Compaction must (a) actually reduce the file count to the size-derived
  * target, (b) stay a NARROW coalesce — no shuffle exchange — and (c) lose
  * nothing.
  */
class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

  test("compact merges 48 fragments to the size-derived count without a shuffle") {
    val base = Files.createTempDirectory("graft-compact-spec").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.repartition(48).write.mode("overwrite").parquet(s"$base/frag")
    assert(parquetFiles(s"$base/frag") === 48)

    val frag = spark.read.parquet(s"$base/frag")
    val fragBytes = frag.inputFiles.map(f => new java.io.File(
      f.stripPrefix("file:")).length()).sum

    // target sized to land mid-range. The scan itself already packs the 48
    // tiny files into few input splits (openCost packing — Spark's read-side
    // half of compaction), and a narrow coalesce can only REDUCE, so the
    // exact output count is min(size-derived target, scan partitions).
    val target = math.max(1L, fragBytes / 3)
    val compacted = GraftOps.compact(frag, target)
    val expected = math.min(((fragBytes + target - 1) / target).toInt,
      frag.rdd.getNumPartitions)

    // narrow plan: a Coalesce/union of scans, never an exchange
    val plan = compacted.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"compaction must not shuffle:\n$plan")

    compacted.write.mode("overwrite").parquet(s"$base/out")
    assert(parquetFiles(s"$base/out") === expected,
      s"expected $expected output files from $fragBytes bytes at target $target")
    assert(parquetFiles(s"$base/out") < 48, "compaction must reduce file count")

    // lossless: bag equality in both directions
    val back = spark.read.parquet(s"$base/out")
    assert(back.exceptAll(ev).count() === 0)
    assert(ev.exceptAll(back).count() === 0)
  }

  test("an already-compact table is a no-op pass-through (single file)") {
    val base = Files.createTempDirectory("graft-compact-noop").toString
    Tables.events(spark, sf).select(col("event_id"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/one")
    val one = spark.read.parquet(s"$base/one")
    GraftOps.compact(one, 128L << 20).write
      .mode("overwrite").parquet(s"$base/out")
    assert(parquetFiles(s"$base/out") === 1)
  }
}
