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

  // ---- chaos drill (VERDICT r8 #8): synthetically re-encoded events
  // PARQUET FILES on disk — ns long, µs timestamp, and a deliberately
  // unknown third encoding — prove the adaptive path and the loud-failure
  // path from actual reads, not just in-memory column swaps. The r7
  // failure mode (a driver regeneration flipping the physical encoding)
  // must never need a round to diagnose again.

  /** Write a 100-row events fixture whose ts column is produced by `enc`
    * from a µs epoch long, into its own temp dir. */
  private def chaosDir(tag: String, enc: org.apache.spark.sql.Column)
      : String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory(s"canary-chaos-$tag").toString
    spark.range(100)
      .select(col("id").as("event_id"),
        enc.as("ts"),
        (col("id") % 7).as("user_id"),
        concat(lit("t"), col("id") % 3).as("event_type"),
        (col("id") * 1.5).as("value"),
        concat(lit("{\"k\":"), col("id"), lit("}")).as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }
  // base event time in both chaos fixtures: 2024-01-01 + id minutes (µs)
  test("chaos: ns-long and timestamp[us] parquet normalize identically") {
    val nsDir = chaosDir("ns", expr("(1704067200000000L + id * 60000000L) * 1000L"))
    val usDir = chaosDir("us", expr("timestamp_micros(1704067200000000L + id * 60000000L)"))
    // confirm the dirs really carry the two distinct physical encodings
    assert(Tables.eventTsEncoding(spark, nsDir).contains("ns INT64"),
      Tables.eventTsEncoding(spark, nsDir))
    assert(Tables.eventTsEncoding(spark, usDir).contains("timestamp[us]"),
      Tables.eventTsEncoding(spark, usDir))
    val a = Tables.events(spark, nsDir)
      .select("event_id", "ts_ns", "ts").orderBy("event_id").collect()
    val b = Tables.events(spark, usDir)
      .select("event_id", "ts_ns", "ts").orderBy("event_id").collect()
    assert(a.sameElements(b),
      "identical event times must normalize identically from both encodings")
    // and the values are the planted µs epochs, exactly
    assert(a(1).getLong(1) === (1704067200000000L + 60000000L) * 1000L)
  }

  test("chaos: an unknown third encoding refuses loudly, canary stays whole") {
    val badDir = chaosDir("bad", expr("CAST(1704067200 + id * 60 AS DOUBLE)"))
    assert(Tables.eventTsEncoding(spark, badDir).contains("UNSUPPORTED"),
      Tables.eventTsEncoding(spark, badDir))
    val e = intercept[IllegalStateException](Tables.events(spark, badDir))
    assert(e.getMessage.contains("testdata schema changed") &&
      e.getMessage.contains("DoubleType"), e.getMessage)
    // the canary against the same dir reports events.ts as the problem AND
    // still emits per-table lines for the absent fixtures (one bad table
    // must never blank the whole report — ADVICE r8)
    val problems = Tables.schemaCanary(spark, badDir)
    assert(problems.exists(p => p.contains("events.ts") && p.contains("Double")),
      problems.mkString("; "))
    assert(problems.exists(p => p.contains("unreadable: lineitem")),
      problems.mkString("; "))
  }
}
