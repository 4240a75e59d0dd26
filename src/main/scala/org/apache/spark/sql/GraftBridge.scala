package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into `private[sql]` surface needed to ship custom Catalyst
  * expressions from an external library — the standard shim pattern used
  * by Spark-extension libraries (a single object placed in the
  * org.apache.spark.sql package; everything else in this repo lives under
  * `graft.*`). Kept to the minimum: Column↔Expression conversion and
  * per-session function registration (deployments should prefer
  * `spark.sql.extensions=graft.plans.GraftExtensions`, which is fully
  * public API).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name),
        new ExpressionInfo("graft.plans", name), builder)

  /** Fresh DataFrame over an existing logical plan — a new QueryExecution
    * with zero-valued SQLMetrics (metrics accumulate per physical plan
    * instance; profilers need a plan that has never executed). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
