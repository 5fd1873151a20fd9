package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Cost-based-optimizer pin (SURVEY §4.2's remaining Catalyst lever): with
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` on the testdata
  * and `spark.sql.cbo.enabled` + `joinReorder.enabled` on, the q85
  * market-share join tree must be ordered by the statistics, not by the
  * syntactic FROM order — and reordering must not move a single output bit
  * (the decimal-sum contract makes the aggregate join-order-proof).
  *
  * At 100 TB this is the difference between a plan that joins two facts
  * first because the SQL author typed them first, and one that pushes the
  * selective dimension filters into the build sides. */
class CboSpec extends SparkSpec {

  private val tabs =
    Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")

  // q85's join tree spelled in a deliberately BAD syntactic order: the
  // selective part predicate (p_type) sits in the LAST join, after both
  // fact-side joins — exactly what a cost-based reorder must undo
  private val pessimalSql =
    """SELECT o_year, CAST(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_9'
      |      THEN volume ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE) AS DECIMAL(12,6)) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2))
      |      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM cbo_lineitem
      |    JOIN cbo_orders ON l_orderkey = o_orderkey
      |    JOIN cbo_customer ON o_custkey = c_custkey
      |    JOIN cbo_nation n1 ON c_nationkey = n1.n_nationkey
      |    JOIN cbo_region ON n1.n_regionkey = r_regionkey
      |    JOIN cbo_supplier ON s_suppkey = l_suppkey
      |    JOIN cbo_nation n2 ON s_nationkey = n2.n_nationkey
      |    JOIN cbo_part ON p_partkey = l_partkey
      |  WHERE r_name = 'ASIA' AND o_orderdate >= '1995-01-01'
      |    AND o_orderdate < '1997-01-01' AND p_type = 'STANDARD'
      |) all_nations
      |GROUP BY o_year ORDER BY o_year NULLS FIRST""".stripMargin

  private def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.identifier.table).getOrElse("?")
    }

  test("q85 join tree orders by ANALYZE statistics, not FROM-clause syntax") {
    val base = Scratch.dir("cbo", sf)
    tabs.foreach { tn =>
      spark.sql(s"DROP TABLE IF EXISTS cbo_$tn")
      // Spark 4.1's FilterEstimation.evaluateBinary has no TimestampNTZType
      // case (scala.MatchError during optimization), so the stats tables
      // carry the semantically-equivalent DATE instead of the parquet NTZ
      val src = Tables.table(spark, sf, tn)
      val dated = src.select(src.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
          org.apache.spark.sql.functions.col(f.name).cast("date").as(f.name)
        else org.apache.spark.sql.functions.col(f.name)
      }.toSeq: _*)
      dated.write.mode("overwrite")
        .option("path", s"$base/$tn").saveAsTable(s"cbo_$tn")
      spark.sql(s"ANALYZE TABLE cbo_$tn COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.cbo.enabled", "false")
      val off = spark.sql(pessimalSql)
      val offOrder = leafOrder(off)

      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val on = spark.sql(pessimalSql)
      val onOrder = leafOrder(on)

      assert(offOrder.nonEmpty && onOrder.nonEmpty, "failed to read join leaves")
      assert(offOrder !== onOrder,
        s"CBO left the pessimal syntactic order intact:\n  off=$offOrder\n  on=$onOrder")

      // reordering must not change a bit of output, and must agree with the
      // declared q85 (whose oracle the driver checks)
      val offRows = off.collect().toSeq
      val onRows = on.collect().toSeq
      assert(offRows === onRows, "join reorder changed the aggregate output")
      val q85 = SparkEntry.queries("q85_market_share")(spark, sf).collect().toSeq
      assert(onRows === q85, "CBO run disagrees with the declared q85")
    } finally {
      saved.foreach { case (k, v) =>
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
      }
      tabs.foreach(tn => spark.sql(s"DROP TABLE IF EXISTS cbo_$tn"))
    }
  }
}
