package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.expr.HllDistinct

/** OPT-IN approximate rewrite — the semantics trade every approximate
  * query engine sells, expressed as a Catalyst rule: with
  * `spark.graft.rewrite.approxDistinct=true`, an exact
  * `count(DISTINCT x)` becomes the deterministic 64-register
  * [[graft.expr.HllDistinct]] estimate (rounded back to the BIGINT the
  * original produced). Exact distinct is the scale hazard the rewrite
  * removes: Spark plans it as a per-group key-set EXPAND + second
  * aggregate whose state grows with the distinct count, while the
  * sketch carries O(64) state per group through ObjectHashAggregate
  * map-side partials.
  *
  * DELIBERATELY semantics-changing, so never on by default — the flag is
  * the user's explicit ±13%-at-m=64 consent (the estimate itself stays
  * deterministic and cross-engine replayable, unlike the builtin
  * approx_count_distinct's HLL++). Guards: only a bare
  * single-child Count with DISTINCT, no FILTER clause, child integral or
  * string (the decimal-digit VARCHAR cast the oracle replays).
  * Registration is session-local via `experimental.extraOptimizations`
  * (the OrderedFirstLastRewrite pattern). */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewrite.approxDistinct"

  private def eligible(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(c)), _, true, None, _)
              if eligible(c.dataType) =>
            val est: Expression =
              ae.copy(aggregateFunction = HllDistinct(c), isDistinct = false)
            Cast(Round(est, Literal(0)), LongType)
        }
    }
}
