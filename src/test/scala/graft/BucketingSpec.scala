package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The 100 TB fact-fact join path claimed in SCALE.md: bucketing both sides
  * on the join key turns the shuffle join into a co-located (exchange-free)
  * sort-merge join. Asserted on the physical plan, not just the result. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is a
    // static conf and can't be repointed on the shared session; clear stale
    // table dirs a previously-aborted run may have left behind
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Seq("li_b", "ord_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t"))
    }
    Tables.table(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.table(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // force a non-broadcast join so bucketing (not broadcast) does the work
    val noBc = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
    // pre-AQE physical plan: exchanges are statically visible there
    val plan = noBc.queryExecution.sparkPlan.toString

    // the join inputs must be bucket-scanned, not shuffled: no Exchange
    // between the scans and the SortMergeJoin
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // and the result matches the unbucketed computation
    val want = Tables.table(spark, sf, "lineitem")
      .join(Tables.table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
    assert(noBc.exceptAll(want).count() === 0 && want.exceptAll(noBc).count() === 0)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
