package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The custom as-of-join operator (logical node + strategy + merge exec) must
  * agree exactly with the compositional join+window formulation, and its
  * physical plan must be the co-partitioned merge (exchanges+sorts injected
  * by EnsureRequirements, no fanout join). */
class AsOfJoinSpec extends SparkSpec {

  private def probes = Tables.table(spark, sf, "customer")
    .select(col("c_custkey"),
      (lit("2024-01-20 00:00:00").cast("timestamp").cast("long") * 1000000L
        - (col("c_custkey") % 10) * 86400000000L).as("cut_us"))

  private def events = Tables.events(spark, sf)
    .select(col("user_id"), col("event_id"), Tables.tsUs.as("us"))

  private val tol = 7L * 86400000000L

  test("merge as-of join equals the join+window formulation exactly") {
    val got = plans.AsOfJoin(probes, events,
      "c_custkey", "cut_us", "user_id", "us", "event_id", tol)
      .select(col("c_custkey"), col("event_id"), col("us"))
      .orderBy(col("c_custkey")).collect()

    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("us").desc, col("event_id").desc)
    val want = probes.join(events,
        col("user_id") === col("c_custkey")
          && col("us") <= col("cut_us") && col("us") >= col("cut_us") - tol,
        "left_outer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_custkey"), col("event_id"), col("us"))
      .orderBy(col("c_custkey")).collect()

    assert(got.length === want.length)
    got.zip(want).foreach { case (g, e) => assert(g === e) }
  }

  test("left-only filters push through the as-of join to the probe scan") {
    val df = plans.AsOfJoin(probes, events,
      "c_custkey", "cut_us", "user_id", "us", "event_id", tol)
      .filter(col("c_custkey") < 100 && col("event_id").isNotNull)
    val p = df.queryExecution.executedPlan.toString
    // the custom rule must carry the probe-side conjunct all the way into
    // the customer parquet scan; the right-side conjunct stays above
    assert(p.contains("PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,100)]"),
      s"left-only filter did not reach the probe scan:\n$p")
    // and results agree with filtering after the join
    val want = plans.AsOfJoin(probes, events,
      "c_custkey", "cut_us", "user_id", "us", "event_id", tol)
      .collect().count(r => r.getLong(0) < 100 && !r.isNullAt(2))
    assert(df.count() === want)
  }

  test("randomized equivalence: merge join matches the window formulation on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // duplicate (key, time) pairs and empty keys on both sides by design
    val leftRows = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong * 1000L, i.toLong))
    val rightRows = (1 to 600).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong * 1000L, i.toLong))
    val tolR = 200000L
    Seq(1, 3, 16).foreach { parts =>
      val l = leftRows.toDF("k", "t", "lid").repartition(parts)
      val r = rightRows.toDF("rk", "rt", "rid").repartition(parts)
      val got = plans.AsOfJoin(l, r, "k", "t", "rk", "rt", "rid", tolR)
        .select(col("lid"), col("rid"))
        .orderBy(col("lid")).collect().map(x =>
          (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      val w = Window.partitionBy(col("lid"))
        .orderBy(col("rt").desc, col("rid").desc)
      val want = l.join(r, col("rk") === col("k")
          && col("rt") <= col("t") && col("rt") >= col("t") - tolR, "left_outer")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("lid"), col("rid"))
        .orderBy(col("lid")).collect().map(x =>
          (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      assert(got.toSeq == want.toSeq, s"parts=$parts")
    }
  }

  test("physical plan is the merge exec with injected exchanges and sorts") {
    val df = plans.AsOfJoin(probes, events,
      "c_custkey", "cut_us", "user_id", "us", "event_id", tol)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"strategy did not plan the operator:\n$p")
    assert(p.contains("Exchange hashpartitioning"), s"no co-partitioning exchange:\n$p")
    assert(p.contains("Sort ["), s"no in-partition sort:\n$p")
  }
}
