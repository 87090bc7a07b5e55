package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** NATIVE as-of join — the whole-operator Catalyst extension ((c) on the
  * preference ladder: custom LogicalPlan + SparkStrategy + SparkPlan),
  * built because no composition of built-in operators expresses "latest
  * right row at time ≤ left time per key" without materializing extra
  * state: the composed formulation (q_join_asof — union both sides, one
  * window, running last(ignoreNulls)) is the best DECLARATIVE shape, but
  * it still (1) funnels BOTH streams through one exchange keyed only on
  * the join key, (2) runs a window over the union carrying every column
  * of both sides (nulls padded on each), and (3) filters half the rows
  * back out after the window. This exec is the SortMergeJoin shape
  * instead: each side shuffles independently on its own keys, each side
  * sorts map-side (spillable UnsafeExternalSorter, not a window buffer),
  * and one streaming merge pass emits exactly one output row per left
  * row, holding ONE candidate right row — O(1) state, no union, no
  * post-filter, no null-padded width amplification.
  *
  * Semantics (pinned by the same DuckDB oracle as q_join_asof): for each
  * left row, the right row with the LARGEST (rightTime, rightTies...) such
  * that rightKey = leftKey and rightTime ≤ leftTime (and, with
  * `toleranceUs`, leftTime − rightTime ≤ tolerance); unmatched left rows
  * emit null-padded right columns (left-outer). Right rows with null time
  * are never eligible; left rows with null time never match. Null KEYS
  * group (null = null), the grouping semantics of the composed window
  * formulation — callers wanting SQL join-null semantics filter keys
  * upstream, exactly as they would for a window partition.
  *
  * 100 TB shape: the merge is one forward pass per co-partition with a
  * single held candidate row — right-side history never accumulates (vs
  * a window frame), skew lands on the same keys it would for any keyed
  * join (salt upstream as usual), and requiredChildDistribution lets
  * EnsureRequirements reuse existing hash partitioning when an upstream
  * stage already clustered either side (zero-exchange when bucketed, the
  * q_join_bucketed property).
  */
case class AsOfJoinNode(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTies: Seq[Expression], toleranceUs: Option[Long],
    left: LogicalPlan, right: LogicalPlan) extends LogicalBinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]] — injected per-session via
  * `experimental.extraStrategies` (scoped the same way as the
  * OrderedFirstLastRewrite rule: a child session owns it). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lt, rt, ties, tol, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, ties, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** The merge exec: requires both children clustered on their keys and
  * sorted by (keys, time[, ties]) — EnsureRequirements inserts the
  * exchanges/sorts (or elides them when an upstream layout already
  * satisfies the distribution). One forward pass per co-partition. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTies: Seq[Expression], toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTies.map(SortOrder(_, Ascending))))

  // left rows pass through 1:1 in input order — partitioning and ordering
  // survive, so a downstream agg/join on the same keys plans no exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val lTimeB = BindReferences.bindReference(leftTime, left.output)
      val rTimeB = BindReferences.bindReference(rightTime, right.output)
      val nullRight = new GenericInternalRow(right.output.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      // lookahead right row; copies because the child iterator reuses its row
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTime: Long = 0L
      var rTimeNull = false
      def advance(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next().copy()
          rRow = r
          rKey = rKeyProj(r).copy()
          val t = rTimeB.eval(r)
          rTimeNull = t == null
          rTime = if (rTimeNull) 0L else t.asInstanceOf[Number].longValue()
        } else { rRow = null; rKey = null }
      advance()

      // the one held candidate: latest eligible right row for the current key
      var cand: InternalRow = null
      var candKey: UnsafeRow = null
      var candTime = 0L

      lIter.map { l =>
        val lKey = lKeyProj(l)
        if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
          cand = null; candKey = null // left moved to a new key group
        }
        val tEval = lTimeB.eval(l)
        numOut += 1
        if (tEval == null) resultProj(joined(l, nullRight))
        else {
          val lTime = tEval.asInstanceOf[Number].longValue()
          while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advance()
          var scanning = true
          while (scanning && rRow != null && keyOrd.compare(rKey, lKey) == 0) {
            if (rTimeNull) advance() // null times sort first, never eligible
            else if (rTime <= lTime) {
              cand = rRow; candKey = rKey; candTime = rTime; advance()
            } else scanning = false
          }
          val ok = cand != null && tol.forall(lTime - candTime <= _)
          if (ok) { numMatched += 1; resultProj(joined(l, cand)) }
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. Key/time/tie columns are referenced by
  * name against each side's analyzed output; the two outputs must be
  * attribute-disjoint (rename one side — e.g. a `c_` prefix — when both
  * derive from the same scan), which keeps every attribute id in the
  * joined output unambiguous without relying on analyzer-side relation
  * deduplication that custom nodes don't receive. */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame,
           leftOn: Seq[String], rightOn: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           rightTies: Seq[String] = Nil,
           toleranceUs: Option[Long] = None): DataFrame = {
    val s = left.sparkSession
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides share attributes — alias one side's columns first")
    def res(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found among ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinNode(
      leftOn.map(res(lp, _)), rightOn.map(res(rp, _)),
      res(lp, leftTimeCol), res(rp, rightTimeCol),
      rightTies.map(res(rp, _)), toleranceUs, lp, rp)
    org.apache.spark.sql.graft.PlanDataset.ofRows(s, node)
  }
}
