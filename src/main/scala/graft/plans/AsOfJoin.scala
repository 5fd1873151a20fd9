package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.shims

/** AS-OF JOIN as a first-class operator (SURVEY.md §2 preference (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`): for each left row, the
  * single latest right row with the same key whose time is at/before the left
  * row's time and within `toleranceUs` — LEFT OUTER (null-extended when no
  * such row).
  *
  * Why a whole operator instead of the join+window composition (q55): the
  * compositional plan materializes EVERY in-tolerance candidate pair before
  * ranking — join fanout × tolerance width — then shuffles it into the window.
  * This operator is a co-partitioned streaming merge: both sides arrive
  * hash-clustered by key and sorted by (key, time[, tie]); one forward pass
  * per partition keeps a single candidate row, so the cost is O(n + m) per
  * partition with O(1) state regardless of tolerance width. At 100 TB the
  * tolerance knob stops being a blowup factor entirely.
  *
  * Catalyst integration: `EnsureRequirements` supplies the hash exchanges and
  * in-partition sorts from the declared distribution/ordering requirements —
  * the operator itself never shuffles. Keys/times must be integral (bigint);
  * `rightTie` pins the winner among equal (key, time) right rows.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, toleranceUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }

  /** Runtime installation (the config-time path is GraftExtensions). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
  }
}

/** Catalyst treats a foreign logical node as a pushdown barrier: a Filter
  * above [[AsOfJoinPlan]] would otherwise stay above it and the probe scan
  * would read everything. Every left row passes through the as-of join
  * unchanged (left outer, left columns untouched), so conjuncts that
  * reference only left-side columns commute with the join exactly — this
  * rule pushes them into the left child, from where the stock rules carry
  * them down to the scan (`PushedFilters`). The `injectOptimizerRule`
  * counterpart to the strategy above. */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, toleranceUs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides by key; EnsureRequirements adds the exchanges
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKey :: Nil), ClusteredDistribution(rightKey :: Nil))

  // and the in-partition sorts that make the single-pass merge valid
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val nRight = right.output.size
    val tol = toleranceUs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      new Iterator[InternalRow] {
        // downstream consumers (collect, shuffle writers) expect UnsafeRow
        private val resultProj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(outAttrs, outAttrs)
        private val rBuf = rit.buffered
        // the single retained candidate: latest right row seen for candKey
        private var candKey = 0L
        private var candTime = 0L
        private var cand: InternalRow = _
        private val joiner = new JoinedRow
        private val nullRight = new GenericInternalRow(nRight)

        override def hasNext: Boolean = lit.hasNext

        override def next(): InternalRow = {
          val l = lit.next()
          val lkv = lk.eval(l).asInstanceOf[Long]
          val ltv = lt.eval(l).asInstanceOf[Long]
          // consume right up to (key, time) — left is sorted the same way,
          // so the pointer only ever moves forward
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rkv = rk.eval(r).asInstanceOf[Long]
            if (rkv < lkv) { rBuf.next() }
            else if (rkv == lkv) {
              val rtv = rt.eval(r).asInstanceOf[Long]
              if (rtv <= ltv) {
                cand = rBuf.next().copy(); candKey = rkv; candTime = rtv
              } else advance = false
            } else advance = false
          }
          if (cand != null && candKey == lkv
              && candTime <= ltv && candTime >= ltv - tol)
            resultProj(joiner(l, cand))
          else resultProj(joiner(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** As-of join two DataFrames on integral key/time columns (left outer,
    * backward-looking, bounded by `toleranceUs`). Right columns must not
    * collide with left column names. */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
      leftKeyCol: String, leftTimeCol: String,
      rightKeyCol: String, rightTimeCol: String, rightTieCol: String,
      toleranceUs: Long): DataFrame = {
    val spark = leftDf.sparkSession
    AsOfJoinStrategy.install(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    shims.dfFromPlan(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      attr(rPlan, rightTieCol), toleranceUs))
  }
}
