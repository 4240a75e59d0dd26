package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dense-vector operations over `array<float>` embedding columns — pure
  * higher-order column expressions (no UDF, no linear-algebra library):
  * each is a narrow per-row map that scales embarrassingly.
  *
  * Numeric parity design: a float×float product is exact in double (24+24
  * mantissa bits < 53), and each product is cast to DECIMAL(26,12) before
  * summing — decimal addition is associative, so Spark's sequential
  * `aggregate` and any other engine's summation order produce identical
  * results, and the double→decimal cast is tie-free for binary inputs
  * (a decimal rounding tie would need a factor of 5 in the denominator).
  */
object VectorOps {
  private val ProdDec = DecimalType(26, 12)
  // (37,12) + (26,12) yields exactly (38,12) under Spark's precision rules —
  // no scale reduction, so every partial sum keeps all 12 decimal digits and
  // summation stays order-independent; the cast back to (37,12) is lossless
  // for any realistic magnitude.
  private val AccDec = DecimalType(37, 12)

  private def decZero: Column = lit(java.math.BigDecimal.ZERO).cast(AccDec)

  /** Order-independent dot product of two float vectors, as double. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(ProdDec)),
      decZero,
      (acc, v) => (acc + v).cast(AccDec))
      .cast("double")

  /** L2 norm. */
  def normDec(a: Column): Column = sqrt(dotDec(a, a))

  /** Cosine similarity (exact, order-independent). Null on a zero-norm
    * input — under ANSI mode (Spark 4 default) an unguarded division
    * would THROW at runtime, not return NaN. */
  def cosine(a: Column, b: Column): Column = {
    val na = normDec(a); val nb = normDec(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dotDec(a, b) / (na * nb))
  }

  /** Random-hyperplane LSH signature of `bits` sign bits, as a '0'/'1'
    * string bucket key. Hyperplane component r(i,j,t) is a deterministic
    * pseudo-random value in [-1,1] derived from xxhash64 — no stored
    * model, reproducible across runs and executors. Vectors with small
    * angle agree on most sign bits (probability 1 - θ/π per bit). */
  def lshBucket(emb: Column, bits: Int, table: Column): Column =
    concat_ws("",
      transform(sequence(lit(0), lit(bits - 1)), j =>
        when(
          aggregate(
            zip_with(emb, sequence(lit(0), size(emb) - 1),
              (x, i) => x.cast("double") *
                (xxhash64(i, j, table).cast("double") / lit(9.223372036854776e18))),
            lit(0.0),
            (acc, v) => acc + v) > 0,
          lit("1")).otherwise(lit("0"))))

  /** L independent LSH tables as an array of (t, bucket) structs — the
    * standard recall lever: a neighbor is a candidate if ANY table puts it
    * in the same (possibly multiprobed) bucket. Index-build cost is
    * tables×bits×dim hash evaluations per vector, paid once. */
  def lshTables(emb: Column, tables: Int, bits: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      struct(t.as("t"), lshBucket(emb, bits, t).as("bucket")))

  /** LSH geometry for a corpus of `n` vectors. `maxBucket` is the
    * fail-loud occupancy ceiling enforced in-plan by
    * [[graft.queries.VectorCatalog.bucketize]]. */
  final case class LshGeometry(tables: Int, bits: Int, maxBucket: Long)

  /** Derive the geometry from corpus size: `bits` ≈ log2(n /
    * targetBucket), so expected bucket occupancy tracks `targetBucket` as
    * the corpus grows instead of going quadratic within buckets — a
    * fixed bit width that works at 10^6 vectors floods its buckets at
    * 10^9. Clamped to [minBits, maxBits]: tiny corpora degrade gracefully
    * toward exhaustive comparison (which is also the correct answer
    * there), and the string bucket key caps the useful width. At
    * deployment scale `corpusSize` comes from table statistics, not a
    * count job. */
  def lshGeometry(corpusSize: Long, tables: Int = 4, targetBucket: Long = 32,
                  minBits: Int = 2, maxBits: Int = 32,
                  maxBucketFactor: Long = 64): LshGeometry = {
    require(corpusSize > 0, s"corpusSize must be positive, got $corpusSize")
    require(targetBucket > 0, s"targetBucket must be positive, got $targetBucket")
    val raw = math.round(
      math.log(corpusSize.toDouble / targetBucket) / math.log(2.0)).toInt
    val bits = math.min(maxBits, math.max(minBits, raw))
    LshGeometry(tables, bits, targetBucket * maxBucketFactor)
  }

  /** Multiprobe keys: the bucket itself plus every single-bit flip —
    * recovers neighbors that land one sign bit away at the cost of
    * (bits+1) probes instead of 2^bits exhaustion. */
  def multiprobe(bucket: Column, bits: Int): Column =
    array_distinct(
      transform(sequence(lit(0), lit(bits)), j =>
        when(j === 0, bucket).otherwise(
          concat(
            bucket.substr(lit(1), j - 1),
            when(bucket.substr(j, lit(1)) === "1", lit("0")).otherwise(lit("1")),
            bucket.substr(j + 1, lit(bits))))))
}
