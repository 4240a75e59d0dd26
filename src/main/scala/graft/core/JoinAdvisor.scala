package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Cast, EqualTo, Expression, In, IsNull, Literal,
  Not, Or}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Sketch-informed join planning: the consultation step that turns the
  * engine's one-pass summaries (exact count + Count-Min sketch +
  * SpaceSaving heavy hitters, all mergeable aggregates) into the join
  * strategy decision a 100 TB pipeline has to make BEFORE paying for the
  * wrong shuffle:
  *
  *  - dim side small              → broadcast hash join (no fact shuffle);
  *  - certainly-hot probe keys    → hybrid join: the hot slice (few keys,
  *    dim rows for them broadcast-trivial) joins via broadcast with NO
  *    shuffle of the hot mass — exactly the rows that would have made
  *    one reducer eat 10% of the table — while the cold remainder takes
  *    the normal co-partitioned path; union of the two IS the plain join
  *    (the hot/cold split partitions the probe side; JoinAdvisorSpec
  *    proves exact equality);
  *  - otherwise                   → plain shuffle join, with the exchange
  *    pre-sized from the sketch-estimated output cardinality instead of
  *    a config default.
  *
  * Catalyst's own answers cover parts of this (auto-broadcast below a
  * byte threshold, AQE skew-split at runtime), but both act late or on
  * size-in-bytes guesses: AQE only re-splits after the skewed shuffle is
  * already written, and the broadcast threshold sees post-scan size
  * estimates, not key distribution. The advisor runs ONE narrow
  * aggregate job per side (a few KB of summaries to the driver — the
  * same eager-analyze contract as [[graft.plans.BloomJoin.buildFilter]],
  * documented there) and decides before any join shuffle exists.
  *
  * The Count-Min inner product ([[graft.plans.CountMinAgg.joinSizeEstimate]],
  * never an underestimate) prices the join's output; SpaceSaving lower
  * bounds ([[Skew.hotKeys]]'s certainty rule: est − err ≥ share·n, no
  * false positives) nominate the hot keys. Both summaries are fixed-size
  * regardless of input scale.
  */
object JoinAdvisor {

  sealed trait Strategy
  /** Dim rows under the row threshold: broadcast the whole dim. */
  case object BroadcastDim extends Strategy
  /** Certainly-hot probe keys exist: broadcast the dim slice for those
    * keys, shuffle-join only the cold remainder, union. */
  case object HybridSalted extends Strategy
  /** Plain co-partitioned join. */
  case object ShuffleJoin extends Strategy

  /** The decision and its inputs. `estJoinRows` is the CMS inner-product
    * upper-side estimate; `suggestedPartitions` sizes the join exchange
    * for `rowsPerPartition`-row partitions at that estimate. */
  case class Advice(strategy: Strategy, leftRows: Long, rightRows: Long,
                    estJoinRows: Long, suggestedPartitions: Int,
                    hotKeys: Seq[String])

  private val Depth = 4

  /** One job per side: (row count, CMS counters, heavy-hitter summary)
    * in a single aggregate pass. */
  private def profile(df: DataFrame, key: String, width: Int, m: Int)
      : (Long, Array[Long], Seq[(String, Long)]) = {
    val row = df.agg(
      count(lit(1)).as("n"),
      graft.plans.CountMinAgg.countMin(col(key).cast("string"), Depth, width).as("cms"),
      graft.plans.HeavyHittersAgg.heavyHitters(col(key).cast("string"), m).as("hh")).head
    val hh = row.getSeq[org.apache.spark.sql.Row](2)
      .map(h => (h.getString(0), h.getLong(1) - h.getLong(2))) // est − err
    (row.getLong(0), row.getSeq[Long](1).toArray, hh)
  }

  /** Analyze both sides and decide. EAGER: runs one Spark job per side
    * now (sketch summaries must exist before the join can be planned —
    * the [[graft.plans.BloomJoin]] contract). */
  def advise(left: DataFrame, right: DataFrame, key: String,
             broadcastRows: Long = 1L << 20, minShare: Double = 0.05,
             rowsPerPartition: Long = 4L << 20, width: Int = 1024,
             m: Int = 64): Advice = {
    require(m >= math.ceil(2.0 / minShare), s"m=$m too small to guarantee share $minShare")
    val (nl, cmsL, hhL) = profile(left, key, width, m)
    val (nr, cmsR, _) = profile(right, key, width, m)
    val est = graft.plans.CountMinAgg.joinSizeEstimate(cmsL, cmsR, Depth, width)
    val parts = math.max(1L, (est + rowsPerPartition - 1) / rowsPerPartition)
      .min(Int.MaxValue).toInt
    val hot = hhL.filter { case (_, lower) => lower.toDouble >= minShare * nl }
      .map(_._1)
    val strategy =
      if (nr <= broadcastRows) BroadcastDim
      else if (hot.nonEmpty) HybridSalted
      else ShuffleJoin
    Advice(strategy, nl, nr, est, parts, hot)
  }

  /** Build the INNER equi-join `left ⋈ right ON key` the way `advice`
    * says. Every strategy returns the identical row multiset — the
    * advice moves bytes, never answers. Hot-key caveat: the broadcast
    * dim slice is |hotKeys| ≤ m keys of dim rows; if the DIM side is
    * also hot on those keys the join output itself is quadratic there,
    * which no strategy fixes — that is a query-shape problem (pre-
    * aggregate the dim), not a planning one. */
  def build(left: DataFrame, right: DataFrame, key: String,
            advice: Advice): DataFrame = advice.strategy match {
    case BroadcastDim => left.join(broadcast(right), Seq(key))
    case ShuffleJoin => left.join(right, Seq(key))
    case HybridSalted =>
      val hot = advice.hotKeys
      val isHot = col(key).cast("string").isin(hot: _*)
      val hotJoin = left.filter(isHot).join(broadcast(right.filter(isHot)), Seq(key))
      // inner join drops null keys on its own; the cold slice keeps them
      // harmlessly. The cold dim is pre-pruned of hot keys so the
      // shuffled dim side shrinks too.
      val coldJoin = left.filter(!isHot || col(key).isNull)
        .join(right.filter(!isHot || col(key).isNull), Seq(key))
      hotJoin.unionByName(coldJoin)
  }

  /** advise + build in one call; returns the joined frame and the advice
    * that shaped it. */
  def autoJoin(left: DataFrame, right: DataFrame, key: String,
               broadcastRows: Long = 1L << 20, minShare: Double = 0.05)
      : (DataFrame, Advice) = {
    val a = advise(left, right, key, broadcastRows = broadcastRows,
      minShare = minShare)
    (build(left, right, key, a), a)
  }

  // ------------------------------------------------------------------
  // Planner integration: arm() once, then PLAIN a.join(b, key) calls get
  // the advised treatment transparently — the MaterializedAgg contract
  // (profile registered ahead of time, a late optimizer rule consults it,
  // non-matching joins silently keep their plan). The profile jobs run in
  // arm(), NEVER at optimize time: an optimizer rule that launched Spark
  // jobs would turn every explain() into cluster work.
  // ------------------------------------------------------------------

  /** Armed profiles keyed by (probe-side root paths, dim-side root paths,
    * join-key column name) — JVM-global like the MV registry, so every
    * session sharing the warehouse sees the profile; rule injection stays
    * per-session. */
  private val armed = TrieMap.empty[(Set[String], Set[String], String), Advice]

  private def pathsOf(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.toSet

  /** Profile both sides now (eager — one narrow aggregate job per side,
    * the [[advise]] contract), register the advice for the rewrite rule,
    * and arm the rule on `left`'s session. Both sides must be
    * file-relation scans (the rule recognizes a join by the scanned root
    * paths + key name). Re-arming the same shape re-profiles — the
    * refresh path when the data changed. Returns the advice so callers
    * can inspect the decision. */
  def arm(left: DataFrame, right: DataFrame, key: String,
          broadcastRows: Long = 1L << 20, minShare: Double = 0.05): Advice = {
    val lp = pathsOf(left)
    val rp = pathsOf(right)
    require(lp.nonEmpty && rp.nonEmpty,
      "JoinAdvisor.arm: both sides must be file-relation scans")
    val a = advise(left, right, key, broadcastRows = broadcastRows,
      minShare = minShare)
    armed.put((lp, rp, key), a)
    GraftBridge.addOptimization(left.sparkSession, AdvisedJoinRewrite)
    a
  }

  /** Drop an armed profile (tests; a production un-arm). */
  def disarm(left: DataFrame, right: DataFrame, key: String): Unit = {
    armed.remove((pathsOf(left), pathsOf(right), key)); ()
  }

  /** The rewrite rule. Runs in the late per-session experimental batch
    * ([[GraftBridge.addOptimization]]): matches an INNER equi-join whose
    * two subtrees scan exactly an armed profile's root paths on the
    * profiled key, and applies the armed strategy —
    *
    *  - [[BroadcastDim]]: pin a broadcast hint on the dim side (the
    *    profile knows the true row count; Catalyst's byte-estimate
    *    threshold may not);
    *  - [[HybridSalted]]: split the probe side on the certainly-hot keys
    *    — hot slice joins a broadcast dim slice (the hot mass never
    *    shuffles), cold remainder keeps the co-partitioned path, Union
    *    of the two IS the plain join (the split partitions probe rows
    *    exactly: `In` for hot, `Not(In) OR IsNull` for the rest, and
    *    inner join semantics drop the nulls both ways — the
    *    [[build]] /JoinAdvisorSpec equality, now at plan level);
    *  - [[ShuffleJoin]]: leave the join untouched (the refusal branch).
    *
    * Correctness never depends on profile freshness: the hot/cold split
    * is an exact row partition whatever the current distribution, and a
    * stale broadcast hint moves bytes, not answers. Rewritten joins are
    * tagged so the fixed-point batch converges (the union's two child
    * joins scan the same armed paths and must not re-match). The hot
    * `In` filters sit directly over the scans, so FileSourceStrategy
    * (which plans AFTER this batch) still pushes them into the parquet
    * readers — each branch scans row-group-pruned input, not the full
    * table. */
  object AdvisedJoinRewrite extends Rule[LogicalPlan] {
    private val rewrittenTag = TreeNodeTag[Boolean]("graft.advisedJoin")

    private def relPaths(p: LogicalPlan): Set[String] = p.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.toSet

    private def asString(e: Expression): Expression =
      if (e.dataType == StringType) e else Cast(e, StringType)

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case j @ Join(l, r, Inner,
          Some(EqualTo(x: AttributeReference, y: AttributeReference)), hint)
          if j.getTagValue(rewrittenTag).isEmpty && hint == JoinHint.NONE =>
        orient(l, r, x, y).flatMap { case (kl, kr) =>
          armed.get((relPaths(l), relPaths(r), kl.name))
            .filter(_ => kl.name == kr.name)
            .map(a => rewrite(j, kl, kr, a))
        }.getOrElse(j)
    }

    /** Which side does each equi-key belong to? */
    private def orient(l: LogicalPlan, r: LogicalPlan,
                       x: Attribute, y: Attribute)
        : Option[(Attribute, Attribute)] =
      if (l.outputSet.contains(x) && r.outputSet.contains(y)) Some((x, y))
      else if (l.outputSet.contains(y) && r.outputSet.contains(x)) Some((y, x))
      else None

    /** Tag exactly the join nodes THIS rewrite created — never a
      * traversal: pre-existing joins nested in the subtrees may be armed
      * shapes of their own and must stay eligible. */
    private def tag(j: Join): Join = { j.setTagValue(rewrittenTag, true); j }

    private def rewrite(j: Join, kl: Attribute, kr: Attribute,
                        advice: Advice): LogicalPlan = advice.strategy match {
      case ShuffleJoin => j
      case BroadcastDim =>
        tag(j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST))))))
      case HybridSalted =>
        val lits = advice.hotKeys.map(Literal(_))
        def hot(k: Attribute) = In(asString(k), lits)
        def cold(k: Attribute) = Or(Not(In(asString(k), lits)), IsNull(k))
        val hotJoin = tag(Join(
          Filter(hot(kl), j.left), Filter(hot(kr), j.right), Inner,
          j.condition, JoinHint(None, Some(HintInfo(Some(BROADCAST))))))
        val coldJoin = tag(Join(
          Filter(cold(kl), j.left), Filter(cold(kr), j.right), Inner,
          j.condition, JoinHint.NONE))
        Union(Seq(hotJoin, coldJoin))
    }
  }
}
