package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full declared registry (SURVEY.md §2.3 + §2.4). */
  def registry: Seq[GQuery] =
    operators.RelationalQueries.all ++ operators.RelationalQueries2.all ++
      operators.RelationalQueries3.all ++
      operators.PipelineQueries.all ++ operators.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reproduces the reference's one proven end-to-end query
    * (/root/reference/tests/basic_tests.rs:53-61): binary envelope →
    * cast to utf8 + alias + length, here over a kafka-style envelope derived
    * from the events table. */
  def entry(spark: SparkSession): DataFrame = {
    val env = Tables.events(spark, "/root/testdata/sf0.001")
      .select(concat(lit("Key "), col("event_id")).cast("binary").as("key"),
        col("props").cast("binary").as("value"))
    env.select(col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      length(col("value").cast("string")).as("len"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
