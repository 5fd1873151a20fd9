package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the driver-generated testdata (TESTDATA.md / FIXTURES.md).
  *
  * `events.ts` is nanosecond-precision parquet. Spark 4 refuses
  * `TIMESTAMP(NANOS)` unless `spark.sql.legacy.parquet.nanosAsLong=true`, which
  * instead surfaces the column as a BIGINT of nanoseconds since the epoch. We
  * lean into that: all oracle-compared event-time arithmetic runs on the exact
  * ns long (`ts_ns`), which DuckDB reproduces bit-for-bit via `epoch_ns(ts)`.
  * A µs-truncated `TimestampType` view (`ts`) is kept for window/stream
  * operators that need a real timestamp.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Plan-level DataFrame reuse (NOT a data cache): repeated table() calls in
  // a registry run would otherwise re-list files and re-read footers per
  // query — measurable fixed overhead across 69 queries.
  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    dfCache.getOrElseUpdate((System.identityHashCode(spark), dir, name), {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    })

  /** events schema as read under nanosAsLong (ts is a BIGINT of ns). */
  val eventSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** ts normalization shared by batch and streaming reads: exact ns epoch
    * (`ts_ns`) plus µs-truncated TimestampType `ts` (session TZ is pinned
    * UTC, so renderings match DuckDB's naive ns ts). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))

  /** Register temp views (events gets the ts_ns/ts treatment) for SQL-surface
    * queries (subqueries, grouping sets) that go through `spark.sql`. */
  def registerViews(spark: SparkSession, dir: String, tables: Seq[String] = names): Unit =
    tables.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
