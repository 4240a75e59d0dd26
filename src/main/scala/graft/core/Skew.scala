package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the failure mode that takes down
  * 1000-executor aggregations when one key owns 10% of 100 TB.
  *
  * Two tools, used in preference order:
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *     on by default with AQE) — handles join-side skew with no code
  *     changes; the engine's sessions keep AQE on.
  *  2. Salted two-phase aggregation (here) — for groupBy skew, where AQE
  *     does not re-split a hot reduce key: spread each key over `salts`
  *     sub-keys, partially aggregate, then collapse. Works for any
  *     algebraic aggregate (sum/count/min/max — anything with a merge).
  *
  * The salt derives from a per-row hash, so the spread is even and needs
  * no stored state; it collapses exactly in phase 2, so results are
  * identical to the direct aggregation (SkewSpec proves it).
  */
object Skew {

  /** Per-row salt in [0, salts): deterministic function of the whole row's
    * spread source — cheap, stateless, uniform. */
  private def salt(salts: Int, spreadCols: Seq[Column]): Column =
    pmod(hash(spreadCols: _*), lit(salts))

  /** Salted sum+count per key (the building block of mean/ratio metrics).
    * Phase 1 shuffles (key, salt) — `salts`× more, far smaller groups;
    * phase 2 shuffles only `keys × salts` partial rows. */
  def saltedSumCount(df: DataFrame, key: String, value: String,
                     salts: Int, spread: Seq[String]): DataFrame = {
    val s = salt(salts, spread.map(col))
    df.withColumn("_salt", s)
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$value"), sum(col("_pcnt")).as("n"))
  }

  /** Salted distinct-count per key: phase 1 dedups (key, salt, value) —
    * the classic count-distinct skew killer (each hot key's value set is
    * partitioned by value hash, so no executor holds the whole set). */
  def saltedCountDistinct(df: DataFrame, key: String, value: String,
                          salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(value)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(value)).as("_pd"))
      .groupBy(col(key))
      .agg(sum(col("_pd")).as(s"nd_$value"))

  /** The DETECTION step the mitigations above need: which keys are hot
    * enough to salt, WITHOUT an exact per-key count (which is itself the
    * skewed shuffle we are trying to avoid). One bounded-memory pass via
    * the SpaceSaving aggregate ([[graft.plans.HeavyHittersAgg]]): any
    * key holding more than n/m of the rows is guaranteed to survive the
    * m-counter summary, and est ≥ true ≥ est − err brackets each
    * survivor. A key is reported when its LOWER bound clears the share
    * threshold, so every report is certainly hot (true ≥ minShare·n —
    * no false positives); with `m` ≥ 2/minShare the error term is at
    * most minShare·n/2, so any key at ≥ 1.5× the threshold share is
    * certainly reported — only keys hovering at the margin can be
    * missed, and salting one key too few/too many is a cost nudge, not
    * a correctness event. Returns (key, lowerBound) for the model-sized
    * hot set; SkewSpec pins detection on planted skew and silence on
    * uniform data. */
  def hotKeys(df: DataFrame, key: String, minShare: Double = 0.05,
              m: Int = 64): Seq[(String, Long)] = {
    require(m >= math.ceil(2.0 / minShare), s"m=$m too small to guarantee share $minShare")
    val row = df.agg(
      graft.plans.HeavyHittersAgg.heavyHitters(col(key).cast("string"), m).as("hh"),
      count(lit(1)).as("n")).head
    val n = row.getLong(1)
    row.getSeq[org.apache.spark.sql.Row](0)
      .map(h => (h.getString(0), h.getLong(1) - h.getLong(2))) // est − err: certain mass
      .filter { case (_, lower) => lower.toDouble >= minShare * n }
  }
}
