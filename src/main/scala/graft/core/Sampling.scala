package graft.core

import org.apache.spark.sql.DataFrame

/** Seeded sampling for training-data curation: stratified (per-class
  * fractions), uniform, and split. All seeded → reproducible runs, which
  * is the non-negotiable property for dataset releases. Sampling is
  * executor-local (Bernoulli per row) — no shuffle, scales linearly. */
object Sampling {

  /** Per-stratum Bernoulli sampling, e.g. downsample dominant languages. */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Uniform sample without replacement. */
  def uniform(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Deterministic train/validation split. */
  def split(df: DataFrame, trainWeight: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(a, b) = df.randomSplit(Array(trainWeight, 1.0 - trainWeight), seed)
    (a, b)
  }
}
