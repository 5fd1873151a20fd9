package graft

import org.apache.spark.sql.functions._

/** Pins for GraftOps.pageRank (x39 pins content vs the DuckDB replay):
  * the broadcast-rank and co-partitioned-rank variants must be bit-identical
  * (decimal message partials make the sum merge-order-proof), and the top-k
  * consumer shape must be a TakeOrderedAndProject, not a global window. */
class PageRankSpec extends SparkSpec {

  private def edges = {
    val li = Tables.table(spark, sf, "lineitem")
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    li.union(li.select(col("b").as("a"), col("a").as("b")))
  }

  test("copartitioned rank join matches the broadcast variant bit-for-bit") {
    val bc = GraftOps.pageRank(edges, iters = 2)
    val cp = GraftOps.pageRank(edges, iters = 2, copartition = true)
    assert(bc.exceptAll(cp).isEmpty && cp.exceptAll(bc).isEmpty,
      "copartition=true must not change a single rank value")
    assert(bc.count() > 0)

    // plan pins on the static plans: default broadcasts the rank table into
    // the stationary edges; copartition plans a shuffle join with no
    // broadcast on the rank side (AQE may still upgrade it at runtime when
    // ranks happen to be small — the pin is about what the plan REQUESTS)
    val bcPlan = bc.queryExecution.sparkPlan.toString
    assert(bcPlan.contains("BroadcastHashJoin"),
      s"default mode must broadcast ranks:\n$bcPlan")
    val cpPlan = cp.queryExecution.sparkPlan.toString
    assert(!cpPlan.contains("BroadcastHashJoin"),
      s"copartition mode must not require a rank broadcast:\n$cpPlan")
  }

  test("top-k consumer plans as TakeOrderedAndProject, not a global window") {
    val top = GraftOps.pageRank(edges, iters = 1)
      .orderBy(col("r").desc, col("node")).limit(20)
    val plan = top.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(top.count() === 20)
  }
}
