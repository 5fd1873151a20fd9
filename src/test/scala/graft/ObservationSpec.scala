package graft

import org.apache.spark.sql.functions._

/** The `observe()` / `Observation` API — free-rider runtime metrics
  * (CollectMetrics) attached to a query: the engine accumulates the declared
  * aggregates WHILE the action runs, no second scan. What a production
  * pipeline uses for row-count/invariant assertions on every batch without
  * paying for a monitoring query.
  */
class ObservationSpec extends SparkSpec {

  test("observed metrics equal a direct aggregate, computed in the same pass") {
    val li = Tables.table(spark, sf, "lineitem")
    val obs = new org.apache.spark.sql.Observation("li_metrics")
    val gated = li.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"),
        max(col("l_shipdate")).as("max_ship"))
      .filter(col("l_quantity") > 25)
    val kept = gated.count()

    val direct = li.agg(count(lit(1)), sum(col("l_quantity").cast("decimal(12,2)")),
      max(col("l_shipdate"))).head

    val m = obs.get
    // observe sees EVERY scanned row — the downstream filter must not bend it
    assert(m("n_rows") === direct.getLong(0))
    assert(m("sum_qty") === direct.getDecimal(1))
    assert(m("max_ship") === direct.get(2))
    assert(kept > 0 && kept < direct.getLong(0))
  }

  test("observation gates a write: bad-row invariant checked without a second scan") {
    val ev = Tables.events(spark, sf)
    val obs = new org.apache.spark.sql.Observation("quality_gate")
    val out = ev.observe(obs,
        count(when(col("value") < 0, 1)).as("n_negative"),
        count(lit(1)).as("n_total"))
      .select(col("event_id"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("obs-gate").toString
    out.write.mode("overwrite").parquet(dir)
    val m = obs.get
    assert(m("n_negative") === 0L, "synthetic events must have no negative values")
    assert(m("n_total").asInstanceOf[Long] ===
      spark.read.parquet(dir).count())
  }
}
