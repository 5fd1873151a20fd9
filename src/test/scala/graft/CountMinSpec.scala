package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cms_estimate

/** G-class evidence for x25: the Count-Min guarantee and the mergeability
  * that makes the sketch a valid distributed aggregate. */
class CountMinSpec extends SparkSpec {

  test("x25 estimates obey the CMS bound: exact <= est <= exact + eps*N") {
    val rows = SparkEntry.queries("x25_cms_freq")(spark, sf)
      .join(graft.Tables.events(spark, sf).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows")),
        "event_type")
      .select(col("exact"), col("est"), col("n_rows")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated: est=$est exact=$exact")
      val slack = math.ceil(0.001 * n).toLong
      assert(est <= exact + slack,
        s"CMS overshot its eps*N bound: est=$est exact=$exact N=$n")
    }
  }

  test("x25 sketch estimates are partition-invariant (merge = exact addition)") {
    // counters add exactly under merge, so the built sketch — and every
    // estimate read from it — cannot depend on how rows were partitioned
    def ests(parts: Int): Map[(String, Long), Long] =
      graft.Tables.events(spark, sf).repartition(parts)
        .groupBy(col("event_type"))
        .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42))
          .as("sk"))
        .select(col("event_type"), lit(3L).as("uid"),
          cms_estimate(col("sk"), lit(3L)).as("est"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ests(3) == ests(11))
  }

  test("cms_estimate is SQL-registered and agrees with the Column API") {
    Graft.registerFunctions(spark)
    graft.Tables.registerViews(spark, sf, Seq("events"))
    val viaSql = spark.sql(
      """SELECT cms_estimate(
           count_min_sketch(user_id, 0.001d, 0.99d, 42), 3L) AS est
         FROM events""").collect()(0).getLong(0)
    val exact = graft.Tables.events(spark, sf)
      .filter(col("user_id") === 3L).count()
    assert(viaSql >= exact && viaSql <= exact + 10,
      s"SQL-path estimate $viaSql vs exact $exact")
  }
}
