package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, AggregateFunction, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.LongType

/** Materialized-aggregate (roll-up) rewrite — the warehouse accelerator,
  * engine-native: register a pre-aggregated copy of a fact table once
  * ([[MaterializedAgg.register]]), and every subsequent aggregate over
  * the BASE table whose shape the cube covers is transparently rewritten
  * by a `Rule[LogicalPlan]` to re-aggregate the tiny materialized store
  * instead of scanning the fact table. The query author keeps writing
  * against the base table; the plan stops reading it.
  *
  * Why this matters at 100 TB: dashboard/report aggregates hit the same
  * few grouping columns over and over. Each run over the base is a full
  * fact-table scan + shuffle; over the MV it is a scan of
  * |distinct group keys| pre-combined rows — typically 4-6 orders of
  * magnitude less IO — and every roll-up to a SUBSET of the MV's
  * grouping columns is served by the same store (count re-sums `__cnt`,
  * sums re-sum partial sums, min/max re-fold — all decomposable).
  *
  * Soundness envelope (the rule REFUSES anything outside it — a
  * non-matching query silently keeps its base-table plan):
  *  - the aggregate's child must be the registered base scan, optionally
  *    under attribute-only Projects and Filters that reference ONLY the
  *    MV's grouping columns (a filter on a measure would need base rows);
  *  - grouping expressions must be bare attributes ⊆ the MV's grouping
  *    columns (subset = roll-up, the whole point);
  *  - every aggregate must be decomposable and registered:
  *    `count(lit)` → sum(`__cnt`); `sum(c)` / `sum(cast(c as long))`
  *    → sum of the stored partial sums; `min(c)`/`max(c)` → re-fold.
  *    No DISTINCT, no agg filters, and the rewritten function must
  *    preserve the original result TYPE exactly (e.g. a decimal sum
  *    re-widens and is rejected) — downstream operators hold on to the
  *    output attributes, so the rewrite keeps every output exprId via
  *    aliasing.
  *
  * Staleness is the registrar's contract, as in every MV system: the
  * store answers as of its build; rebuild (re-`register`) when the base
  * changes. MvSpec proves rewritten == unrewritten row-for-row, the
  * plan-level proof that the base path disappears from the scan set, and
  * the refusal cases. */
object MaterializedAgg {

  /** One registered MV: the decomposition-legend of what the store can
    * answer, plus its (analyzed) scan plan. `sumLongCols` are measures
    * stored as `sum(cast(c as long))` — the engine's decimal-exact
    * integer-sum idiom ([[graft.queries.Parity]]). */
  private final case class Meta(
      groupCols: Set[String],
      sumCols: Set[String],
      sumLongCols: Set[String],
      minCols: Set[String],
      maxCols: Set[String],
      mvRel: LogicalRelation)

  // keyed by the base relation's root-path set — JVM-global so every
  // session sharing the warehouse sees the store (rule injection itself
  // stays per-session)
  private val registry = TrieMap.empty[Set[String], Meta]

  private def rootPaths(lr: LogicalRelation): Option[Set[String]] =
    lr.relation match {
      case fs: HadoopFsRelation => Some(fs.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }

  /** Build the MV parquet at `mvPath` from `base` (which must be a plain
    * file-relation scan — the fact table read), register it for the
    * rewrite, and arm the rule on `base`'s session. Re-registering the
    * same base replaces the entry (the rebuild path). */
  def register(base: DataFrame, groupCols: Seq[String], mvPath: String,
               sumCols: Seq[String] = Nil, sumLongCols: Seq[String] = Nil,
               minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil): Unit = {
    val spark = base.sparkSession
    val aggs = Seq(count(lit(1)).as("__cnt")) ++
      sumCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
      sumLongCols.map(c => sum(col(c).cast("long")).as(s"__suml_$c")) ++
      minCols.map(c => min(col(c)).as(s"__min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"__max_$c"))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    val basePaths = base.queryExecution.analyzed.collect {
      case lr: LogicalRelation => rootPaths(lr).getOrElse(Set.empty)
    }.flatten.toSet
    require(basePaths.nonEmpty,
      "MaterializedAgg.register: base is not a file-relation scan")
    val mvRel = spark.read.parquet(mvPath).queryExecution.analyzed match {
      case lr: LogicalRelation => lr
      case other => throw new IllegalStateException(s"unexpected MV plan: $other")
    }
    registry.put(basePaths,
      Meta(groupCols.toSet, sumCols.toSet, sumLongCols.toSet,
        minCols.toSet, maxCols.toSet, mvRel))
    GraftBridge.addOptimization(spark, RewriteToMaterializedAgg)
  }

  /** Drop a registration (tests; a production drop-MV). */
  def unregister(base: DataFrame): Unit = {
    val basePaths = base.queryExecution.analyzed.collect {
      case lr: LogicalRelation => rootPaths(lr).getOrElse(Set.empty)
    }.flatten.toSet
    registry.remove(basePaths)
    ()
  }

  private def lookup(paths: Set[String]): Option[Meta] = registry.get(paths)

  /** The rewrite rule. Runs in the late per-session experimental batch
    * ([[GraftBridge.addOptimization]]) — after standard optimization, so
    * the matched shape is the canonical Aggregate-over-(Project/Filter)-
    * over-relation; after a rewrite the new child scans the MV path,
    * which is never registered, so the fixed-point converges. */
  object RewriteToMaterializedAgg extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

    /** Unwrap attribute-only Projects and Filters down to the relation,
      * accumulating filter conditions. */
    private def unwrap(p: LogicalPlan, conds: Seq[Expression])
        : Option[(Seq[Expression], LogicalRelation)] = p match {
      case lr: LogicalRelation => Some((conds, lr))
      case Filter(c, ch) => unwrap(ch, conds :+ c)
      case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(ch, conds)
      case _ => None
    }

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val (conds, baseRel) = unwrap(agg.child, Nil).getOrElse(return None)
      val meta = rootPaths(baseRel).flatMap(lookup).getOrElse(return None)
      // fresh exprIds per use — two rewrites in one plan must not collide
      val mv = meta.mvRel.newInstance()
      // registered names are derived from the same meta that built the
      // store, so a miss means the MV file was replaced externally —
      // fail loudly rather than silently compute from a wrong column
      def mvAttr(n: String): Attribute =
        mv.output.find(_.name == n).getOrElse(throw new IllegalStateException(
          s"materialized view lost column $n — rebuild via register()"))
      val grpAttrs = agg.groupingExpressions.map {
        case a: AttributeReference if meta.groupCols.contains(a.name) => a
        case _ => return None
      }
      if (!conds.forall(_.references.forall(r => meta.groupCols.contains(r.name))))
        return None
      def rewriteAgg(ae: AggregateExpression): Option[AggregateFunction] = {
        if (ae.isDistinct || ae.filter.nonEmpty) return None
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => Some(Sum(mvAttr("__cnt")))
          case s: Sum => s.child match {
            case a: AttributeReference if meta.sumCols.contains(a.name) =>
              Some(Sum(mvAttr(s"__sum_${a.name}")))
            case c: Cast if c.dataType == LongType &&
                c.child.isInstanceOf[AttributeReference] &&
                meta.sumLongCols.contains(
                  c.child.asInstanceOf[AttributeReference].name) =>
              Some(Sum(mvAttr(
                s"__suml_${c.child.asInstanceOf[AttributeReference].name}")))
            case _ => None
          }
          case Min(a: AttributeReference) if meta.minCols.contains(a.name) =>
            Some(Min(mvAttr(s"__min_${a.name}")))
          case Max(a: AttributeReference) if meta.maxCols.contains(a.name) =>
            Some(Max(mvAttr(s"__max_${a.name}")))
          case _ => None
        }
      }
      val newRes = agg.aggregateExpressions.map {
        case a: AttributeReference if meta.groupCols.contains(a.name) =>
          Alias(mvAttr(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
        case al @ Alias(a: AttributeReference, name)
            if meta.groupCols.contains(a.name) =>
          Alias(mvAttr(a.name), name)(exprId = al.exprId, qualifier = al.qualifier)
        case al @ Alias(ae: AggregateExpression, name) =>
          val fn = rewriteAgg(ae).getOrElse(return None)
          // exact type preservation or downstream consumers of this
          // exprId see a different schema (decimal sums re-widen here)
          if (fn.dataType != ae.dataType) return None
          Alias(ae.copy(aggregateFunction = fn), name)(
            exprId = al.exprId, qualifier = al.qualifier)
        case _ => return None
      }
      val newGrp: Seq[Expression] = grpAttrs.map(a => mvAttr(a.name))
      val newChild = if (conds.isEmpty) mv
        else Filter(
          conds.reduceLeft(And).transform {
            case a: AttributeReference => mvAttr(a.name)
          }, mv)
      Some(Aggregate(newGrp, newRes, newChild))
    }
  }
}
