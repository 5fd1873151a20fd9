package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: the Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over the
  * same parquet tables (SURVEY.md §2.3 oracle classes: O = oracle SQL present,
  * B/G = None → driver records a rows-only check; B/G validation lives in the
  * ScalaTest suites instead).
  *
  * Determinism contract for every O query (SURVEY.md §2.3):
  *   - total ORDER BY on a unique key set; ASC keys get `NULLS FIRST` on the
  *     DuckDB side (its default is NULLS LAST; Spark's ASC default is first);
  *   - monetary/double aggregates go through DECIMAL casts *before* SUM/AVG
  *     (exact arithmetic both engines), final output cast to DOUBLE (identical
  *     nearest-double conversion both engines);
  *   - event-time arithmetic on exact ns longs (`ts_ns` ≡ `epoch_ns(ts)`);
  *   - timestamps rendered as VARCHAR on both engines;
  *   - identical output column names on both engines (driver sorts columns by
  *     name before hashing).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
