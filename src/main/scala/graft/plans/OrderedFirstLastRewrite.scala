package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.expr.{FirstByOrderedDecl, LastByOrderedDecl}

/** Optimizer rule closing the stock-API gap the README documents: users
  * write the natural `min_by(v, struct(ts, v))` / `max_by(v, struct(ts, v))`
  * (the reference's OHLC open/close semantics, `main.py:150-160` re-expressed
  * through builtins), but Spark plans `MaxMinBy` as SortAggregate — its
  * struct-typed agg buffer is not hash-mutable, so every group SORTS at
  * every partial and final stage. This rule swaps in the equivalent
  * [[graft.expr.FirstByOrderedDecl]] / [[graft.expr.LastByOrderedDecl]]
  * DeclarativeAggregate (primitive 17-byte buffer, partial-aggregating
  * HashAggregate, whole-stage codegen) whenever the shapes are provably
  * equivalent.
  *
  * Equivalence conditions (ALL required, else the expression is untouched):
  *   - the ordering is a 2-field struct whose SECOND field is semantically
  *     the value expression itself — so the lexicographic (ts, v) minimum /
  *     maximum determines v uniquely and the builtin's tie behavior cannot
  *     be observed;
  *   - ts is integral or TIMESTAMP and v is DOUBLE (the custom aggregate's
  *     domain; TIMESTAMP widens µs-safely inside the aggregate);
  *   - both ts and v are NON-NULL — either by type nullability or
  *     guaranteed by the child plan's constraints (an upstream
  *     `IsNotNull` filter). This is the load-bearing guard: on a null ts
  *     field the builtin still orders the struct (null-first) while the
  *     custom aggregate skips the row — different answers. Constraint
  *     propagation proves the filter discipline instead of trusting it;
  *   - no DISTINCT, no FILTER clause on the aggregate call.
  *
  * Registration: `spark.experimental.extraOptimizations` (session-local,
  * the conf-isolated-child pattern) or cluster-wide via
  * `--conf spark.sql.extensions=graft.expr.GraftExtensions`, which injects
  * this rule alongside the function registry. CatalogSpec's generic
  * no-SortAggregate guard is the regression net: `q_ohlc_rewrite` would
  * plan SortAggregate the moment this rule stops firing.
  */
object OrderedFirstLastRewrite extends Rule[LogicalPlan] {

  private def orderedTs(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType => true
    case _ => false
  }

  /** Non-null by type, or proven by the child's constraint set. */
  private def guaranteed(child: LogicalPlan, e: Expression): Boolean =
    !e.nullable || child.constraints.exists {
      case IsNotNull(c) => c.semanticEquals(e)
      case _            => false
    }

  /** If `ord` is struct(ts, v') with v' ≡ v and types in-domain, the ts. */
  private def tsKey(ord: Expression, v: Expression): Option[Expression] =
    ord match {
      case s: CreateNamedStruct
          if s.valExprs.length == 2 && s.valExprs(1).semanticEquals(v) &&
            orderedTs(s.valExprs.head) && v.dataType == DoubleType =>
        Some(s.valExprs.head)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(MinBy(v, ord), _, false, None, _) =>
          tsKey(ord, v)
            .filter(ts => guaranteed(agg.child, ts) && guaranteed(agg.child, v))
            .map(ts => ae.copy(aggregateFunction = FirstByOrderedDecl(ts, v)))
            .getOrElse(ae)
        case ae @ AggregateExpression(MaxBy(v, ord), _, false, None, _) =>
          tsKey(ord, v)
            .filter(ts => guaranteed(agg.child, ts) && guaranteed(agg.child, v))
            .map(ts => ae.copy(aggregateFunction = LastByOrderedDecl(ts, v)))
            .getOrElse(ae)
      }
  }
}
