package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-schema canary (VERDICT r7 #4). The driver regenerates
  * /root/testdata between rounds and has already flipped events.ts from
  * TIMESTAMP(NANOS) to timestamp[us] once, silently breaking 68 queries.
  * These tests make the next flip a one-line diagnosis. */
class SchemaCanarySpec extends SparkSpec {

  test("fixture schemas match what the engine's plumbing expects") {
    val problems = Tables.schemaCanary(spark, sf)
    assert(problems.isEmpty, problems.mkString("; "))
  }

  test("normalizeEventTs adapts to both physical ts encodings identically") {
    // µs path: whatever is on disk right now, normalized.
    val disk = Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ns"), col("ts")).orderBy("event_id")
    // legacy path: simulate the ns-as-long read by rebuilding the raw frame
    // with ts as a BIGINT of ns, then normalizing it the same way. Derive
    // the ns long from the ALREADY-normalized ts_ns so this simulation is
    // itself encoding-agnostic (a direct cast of a legacy LongType ts would
    // interpret the long as seconds and produce garbage).
    val legacyRaw = Tables.events(spark, sf)
      .drop("ts").withColumnRenamed("ts_ns", "ts")
    assert(legacyRaw.schema("ts").dataType === LongType)
    val legacy = Tables.normalizeEventTs(legacyRaw)
      .select(col("event_id"), col("ts_ns"), col("ts")).orderBy("event_id")
    assert(disk.exceptAll(legacy).isEmpty && legacy.exceptAll(disk).isEmpty,
      "ns-long and timestamp[us] encodings normalize to different ts_ns/ts")
  }

  test("normalized event columns have the contracted types and values") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_ns").dataType === LongType)
    assert(ev.schema("ts").dataType === TimestampType)
    // ts_ns is exact µs*1000 (no sub-µs component in the current encoding)
    // and ts round-trips: timestamp_micros(ts_ns div 1000) == ts.
    val bad = ev.filter(
      (col("ts_ns") % 1000 =!= 0) ||
      expr("timestamp_micros(ts_ns div 1000)") =!= col("ts")).count()
    assert(bad === 0L)
    // sanity: event times live in a plausible epoch range (year 2000-2100),
    // which a 1000× compression/expansion would blow immediately.
    val r = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val lo = r.getTimestamp(0).toInstant.toString
    val hi = r.getTimestamp(1).toInstant.toString
    assert(lo >= "2000-01-01" && hi < "2100-01-01", s"event ts range [$lo, $hi]")
  }

  test("unsupported ts encoding fails loudly with the canary message") {
    val weird = Tables.table(spark, sf, "events").withColumn("ts", lit("oops"))
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(weird))
    assert(e.getMessage.contains("testdata schema changed"))
  }
}
