package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
