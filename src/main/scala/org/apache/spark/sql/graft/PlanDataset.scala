package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one necessary bridge into Spark's `private[sql]` surface: turning a
  * hand-built [[LogicalPlan]] (graft's custom operators, e.g.
  * [[graft.plans.AsOfJoinNode]]) into a user-facing DataFrame.
  *
  * Spark deliberately exposes no public constructor for this — every
  * sanctioned extension point (`SparkSessionExtensions.injectPlannerStrategy`
  * / `injectOptimizerRule`) assumes the plan ENTERED through SQL or the
  * DataFrame API. A whole-operator extension whose semantics no built-in
  * logical node expresses (the as-of join) needs to hand the analyzer its
  * own node, which is exactly what `classic.Dataset.ofRows` does for every
  * internal API (`SparkSession.sql`, `DataFrameReader.load`, ...). This
  * file lives under `org.apache.spark.sql` solely to satisfy the
  * `private[sql]` qualifier; it contains no copied code and no behavior —
  * one delegation, nothing else. */
object PlanDataset {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
