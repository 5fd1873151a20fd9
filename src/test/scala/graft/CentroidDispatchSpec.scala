package graft

import org.apache.spark.sql.functions._

/** Contracts for GraftOps.withCentroidDist — the s67 label dispatch with
  * the automatic scale fallback (VERDICT r16 #7): at or below `maxCase`
  * labels the centroids fold into a zero-join CASE chain; past the bound
  * the SAME centroids dispatch through a broadcast join instead of
  * throwing, and the two paths are byte-identical. */
class CentroidDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def mkCents(n: Long) =
    (0L until n).map(l => (l, Seq.tabulate(4)(i => (l * 7 + i).toDouble / 3)))
      .toDF("label", "c")

  // labels run PAST the centroid range so the no-centroid → NULL-dist arm
  // is exercised on both paths
  private def mkVecs(n: Long, labelSpace: Long) =
    (0L until n).map(i => (i, i % labelSpace,
      Seq.tabulate(4)(j => (i + j).toDouble / 11))).toDF("id", "label", "v")

  test("CASE-chain and broadcast-join paths are byte-identical " +
      "(incl. NULL dist for label-less rows)") {
    val cents = mkCents(100)
    val vecs = mkVecs(500, 120)
    val caseP = GraftOps.withCentroidDist(vecs, cents, col("v"), col("label"),
      maxCase = 4096)
    val joinP = GraftOps.withCentroidDist(vecs, cents, col("v"), col("label"),
      maxCase = 50) // force the join path on the same data
    val a = caseP.select("id", "label", "dist").orderBy("id").collect()
    val b = joinP.select("id", "label", "dist").orderBy("id").collect()
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq,
      "the two dispatch paths must produce byte-identical rows")
    // rows with label >= 100 have no centroid: NULL dist on both paths
    assert(a.filter(_.getLong(1) >= 100).forall(_.isNullAt(2)))
    assert(a.filter(_.getLong(1) < 100).forall(!_.isNullAt(2)))
  }

  test("past the 4096-label bound the dispatch DEGRADES to the join path " +
      "instead of throwing") {
    val cents = mkCents(5000)
    val vecs = mkVecs(200, 5000)
    // the old behavior was a named throw; the fix is the scale-safe plan
    val out = GraftOps.withCentroidDist(vecs, cents, col("v"), col("label"))
      .select("id", "label", "dist").orderBy("id").collect()
    assert(out.length === 200)
    assert(out.forall(!_.isNullAt(2)), "every label has a centroid here")
    // spot-check one distance against the closed form:
    // v = [i/11, (i+1)/11, ...], c(l) = [(7l)/3, (7l+1)/3, ...], l = i
    val r = out.find(_.getLong(0) === 3L).get
    val v = Seq.tabulate(4)(j => (3 + j).toDouble / 11)
    val c = Seq.tabulate(4)(i => (3 * 7 + i).toDouble / 3)
    val want = math.sqrt(v.zip(c).map { case (x, y) =>
      (x - y) * (x - y) }.sum)
    assert(math.abs(r.getDouble(2) - want) < 1e-9)
    // and the join plan really is the broadcast shape (no 5000-arm CASE)
    val plan = GraftOps.withCentroidDist(vecs, cents, col("v"), col("label"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }
}
