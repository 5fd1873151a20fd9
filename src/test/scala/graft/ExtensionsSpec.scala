package graft

import org.apache.spark.sql.classic.SparkSession

/** The cluster deployment path: `graft.GraftExtensions` injected at SESSION
  * BUILD TIME — no runtime `registerFunctions` call. On a cold cluster the
  * same class arrives via the static conf `spark.sql.extensions=
  * graft.GraftExtensions` (Spark applies static-conf extensions only at
  * SparkContext startup, so a test sharing a live context must inject
  * through `Builder.withExtensions` — the identical
  * `SparkSessionExtensions => Unit` entry point).
  */
class ExtensionsSpec extends SparkSpec {

  test("build-time extension injection: functions and the as-of strategy") {
    spark.catalog.listDatabases().count() // force the suite session first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val injected = try {
      SparkSession.builder()
        .master("local[4]") // reuses the suite's live SparkContext
        .withExtensions(new GraftExtensions())
        .getOrCreate()
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
    try {
      assert(injected ne spark, "must be a fresh session, not the suite's")
      // scalar kernels reachable from pure SQL, no runtime registration
      val r = injected.sql(
        """SELECT l2_dist(array(0D, 3D), array(4D, 0D)) AS d,
          |  cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
          |             array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c,
          |  deflate_len('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS z
          |""".stripMargin).head
      assert(r.getDouble(0) === 5.0)
      assert(r.getDouble(1) === 1.0)
      assert(r.getLong(2) > 0 && r.getLong(2) < 32)
      // the planner strategy and optimizer rule arrive via injection, with
      // no runtime install() call on this session
      assert(injected.sessionState.planner.strategies
        .exists(_ eq graft.plans.AsOfJoinStrategy),
        "AsOfJoinStrategy missing from the injected session's planner")
      assert(injected.sessionState.optimizer.extendedOperatorOptimizationRules
        .exists(_ eq graft.plans.PushFilterThroughAsOfJoin),
        "PushFilterThroughAsOfJoin missing from the injected optimizer")
    } finally {
      // the shared SparkContext must survive; only drop the extra session
      SparkSession.clearActiveSession()
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
