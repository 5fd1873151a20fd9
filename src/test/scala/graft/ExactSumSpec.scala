package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactSum

/** ExactSum fixed-point sum helpers: bit-parity with the decimal-sum
  * formulation the DuckDB oracles replay, and the overflow guard contract
  * (VERDICT r7 #3: long partials wrap silently — the guarded variants must
  * fail LOUDLY on an over-bound group instead). */
class ExactSumSpec extends SparkSpec {

  private def li = Tables.table(spark, sf, "lineitem")

  test("dblSum2/dblSum/dblSumSplit are bit-identical to the decimal formulation") {
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
    val cp = ExactSum.cents(col("l_extendedprice"))
    val cq = ExactSum.cents(col("l_quantity"))
    val got = li.agg(
      ExactSum.dblSum2(cp).as("s2"),
      ExactSum.dblSum(cq * cq, 4).as("s4"),
      ExactSum.dblSumSplit(cp * cp, 4).as("s4s")).head()
    val want = li.agg(
      sum(dec2(col("l_extendedprice"))).cast("double").as("s2"),
      sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).cast("double").as("s4"),
      sum(dec2(col("l_extendedprice")) * dec2(col("l_extendedprice")))
        .cast("double").as("s4s")).head()
    (0 until 3).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(got.getDouble(i)) ===
        java.lang.Double.doubleToLongBits(want.getDouble(i)),
        s"column $i not bit-identical")
    }
  }

  test("guarded variants equal the unguarded result inside the bounds") {
    val cp = ExactSum.cents(col("l_extendedprice"))
    val r = li.groupBy(col("l_returnflag")).agg(
      ExactSum.dblSum2(cp).as("a"),
      ExactSum.dblSum2Guarded(cp).as("ag"),
      ExactSum.dblSumSplit(cp * cp, 4).as("b"),
      ExactSum.dblSumSplitGuarded(cp * cp, 4).as("bg"))
      .filter(col("a") =!= col("ag") || col("b") =!= col("bg"))
    assert(r.count() === 0L)
  }

  test("the overflow guard trips on a group exceeding the row bound") {
    // synthetic over-bound group: 100 rows against a 10-row guard ceiling —
    // the real bounds (~10^10 rows) are untestable, so the guard takes the
    // per-row magnitude and we shrink it until maxRows = Long.Max/bound < 100
    val big = Long.MaxValue / 50 // maxRows = 50 < 100 rows
    val df = spark.range(100).agg(
      ExactSum.dblSumGuarded(lit(1L), 2, big).as("s"))
    val e = intercept[Exception](df.head())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("ExactSum overflow guard")),
      s"expected the guard message, got: ${e.getMessage}")
  }

  test("the overflow guard trips on a row exceeding the magnitude bound") {
    val df = spark.range(10)
      .agg(ExactSum.dblSumGuarded(lit(1000L), 2, 100L).as("s"))
    val e = intercept[Exception](df.head())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("ExactSum overflow guard")))
  }
}
