package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES, hash-derandomized): per group, keep the `k` rows
    * with the largest key ln(u_i)/w_i, where u_i is the salted
    * md5-uniform of the row's id ([[graft.functions.TextOps.md5UniformCol]])
    * and w_i its weight. ln(u)/w is the monotone log transform of A-ES's
    * u^(1/w) rank (taken for cross-engine float parity: ln and IEEE
    * division replay bit-identically, pow need not), so the selection
    * follows the exact A-ES inclusion law — the probability a row enters
    * the sample rises with its weight, and the scheme degrades to
    * uniform sampling at equal weights. Zero RNG: the "randomness" is
    * the digest, so any engine with md5 replays the sample cell-exact —
    * what graduates weighted sampling to the DuckDB oracle while the
    * engine-RNG samplers (`q_doc_sample`, `q_reservoir`) stay
    * rows-only. Rows with NULL or non-positive weight are outside the
    * A-ES domain and are excluded.
    *
    * Scale: one narrow map (digest + ln per row) and one per-group
    * window pass — the same shape as the stratified quota sampler, with
    * the same caveat: each group funnels through one reducer, right for
    * the many-bounded-groups layout (languages, sources). The shuffle
    * carries (group, key, id) only; payloads never move. Output adds
    * `aes_rank` (1-based, best key first). */
  def weightedTopK(df: DataFrame, idCol: String, groupCol: String,
                   weightCol: String, k: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"sample size must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("aes_key").desc, col(idCol).asc)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("aes_key",
        log(graft.functions.TextOps.md5UniformCol(col(idCol), salt)) /
          col(weightCol).cast("double"))
      .withColumn("aes_rank", row_number().over(w))
      .filter(col("aes_rank") <= k)
      .drop("aes_key")
  }
}
