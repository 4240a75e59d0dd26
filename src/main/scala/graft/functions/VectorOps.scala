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

  /** [[cosine]]'s JVM twin — bit-identical values, none of the
    * interpreted-lambda overhead of the column HOFs (the decimal chain
    * inside `aggregate`/`zip_with` lambdas runs interpreted and
    * allocation-heavy; the brute-force kNN scan measured ~3 s at sf0.1
    * on it). Mirrors the column semantics EXACTLY: a float×float
    * product is exact in double; Spark's `cast(DECIMAL(26,12))` is
    * `Decimal.fromDouble` = `BigDecimal.valueOf(d)` (shortest-string
    * double rep) + `changePrecision` = `setScale(12, HALF_UP)`; decimal
    * addition at a common scale is exact; the final `cast("double")` is
    * `BigDecimal.doubleValue`. VectorSpec asserts JVM == column output
    * pairwise over the fixture corpus. */
  def cosineDecJvm(a: Array[Float], b: Array[Float]): Option[Double] = {
    val na = math.sqrt(dotDecJvm(a, a))
    val nb = math.sqrt(dotDecJvm(b, b))
    if (na == 0.0 || nb == 0.0) None else Some(dotDecJvm(a, b) / (na * nb))
  }

  /** The decimal-exact dot [[cosineDecJvm]] is built from, exposed so
    * callers scoring one vector against many can hoist the norms instead
    * of recomputing both inside every cosine. */
  def dotDecJvm(x: Array[Float], y: Array[Float]): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < x.length) {
      val p = x(i).toDouble * y(i).toDouble
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue
  }

  /** Exact-decimal squared-L2 distance from a float vector to a double
    * centroid — the JVM twin of the k-means assignment expression, same
    * cast/round discipline as [[cosineDecJvm]]: the double subtraction
    * and square are IEEE-identical cross-engine, `BigDecimal.valueOf` +
    * `setScale(12, HALF_UP)` is exactly Spark's `cast(DECIMAL(_,12))`,
    * and same-scale decimal addition is exact, so the returned decimal
    * equals the column/DuckDB value as a rational. */
  def l2DecJvm(x: Array[Float], cent: Array[Double]): java.math.BigDecimal = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < x.length) {
      val d = x(i).toDouble - cent(i)
      acc = acc.add(java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc
  }

  /** Deterministic random-hyperplane component r(t,j,i) ∈ [-1,1]: the
    * signed md5-u64 of "t|j|i" scaled by 2^63. md5-derived (not xxhash)
    * so DuckDB reproduces it bit-for-bit —
    * `CAST(<signed md5_number_upper(t||'|'||j||'|'||i)> AS DOUBLE) /
    * 9.223372036854776e18` — which is what graduated both ANN queries to
    * full oracles in round 5. No stored model: reproducible across runs,
    * executors, and engines. */
  def hyperplane(t: Int, j: Int, i: Int): Double =
    graft.functions.TextOps.md5Upper64(s"$t|$j|$i").toDouble / 9.223372036854776e18

  /** The full projection matrix for `tables` LSH tables of `bits`
    * hyperplanes over `dim`-dimensional vectors. */
  def hyperplanes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bits, dim)(hyperplane)

  /** JIT'd per-row LSH bucketizer: for each of the L tables, a '0'/'1'
    * string of `bits` sign bits (bit j = sign of emb·r(t,j,·)). Vectors
    * with small angle agree on most sign bits (probability 1 - θ/π per
    * bit); L independent tables are the standard recall lever.
    *
    * Why a JVM loop, not column HOFs: tables×bits×dim multiply-adds per
    * vector ran interpreted inside nested lambdas (the same trap as
    * MinHash — re-evaluated per element); the loop is the per-row
    * imperative carve-out. Cross-engine parity: the dot product
    * accumulates in DOUBLE over ASCENDING index — exactly DuckDB's
    * `list_reduce` over the ordered product list — so the sign bit (all
    * that's kept) is bit-identical. The projection matrix is built once
    * per (executor, dim) and shared across rows. */
  final class Bucketizer(tables: Int, bits: Int) extends Serializable {
    private def planes(dim: Int): Array[Array[Array[Double]]] =
      Bucketizer.planes(tables, bits, dim)
    def buckets(emb: Array[Float]): Array[String] = {
      val r = planes(emb.length)
      Array.tabulate(tables) { t =>
        val sb = new java.lang.StringBuilder(bits)
        var j = 0
        while (j < bits) {
          val rj = r(t)(j)
          var acc = 0.0
          var i = 0
          while (i < emb.length) { acc += emb(i).toDouble * rj(i); i += 1 }
          sb.append(if (acc > 0) '1' else '0')
          j += 1
        }
        sb.toString
      }
    }
  }

  /** JVM-wide (per-executor) projection-matrix cache keyed by the full
    * geometry (tables, bits, dim) — NOT per Bucketizer instance. Each
    * query builds its own deserialized Bucketizer per task, so an
    * instance-held cache rebuilt tables×bits×dim md5 derivations for
    * every query over the same geometry; keying the companion makes the
    * matrix a build-once executor artifact shared by the ANN query, the
    * near-dup query, and every session on the JVM. Values are immutable
    * after construction, so sharing is safe. */
  object Bucketizer {
    private val cache = new java.util.concurrent.ConcurrentHashMap[
      (Int, Int, Int), Array[Array[Array[Double]]]]
    private def planes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] =
      cache.computeIfAbsent((tables, bits, dim),
        { case (t, b, d) => hyperplanes(t, b, d) })
  }

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

  /** IVF geometry for a corpus of `n` vectors: `nlist ≈ sqrt(n)` coarse
    * cells (the classic IVF-Flat sizing — build cost O(N·sqrt(N)), search
    * cost O(nprobe·N/nlist) ≈ O(sqrt(N)) per query), centroids picked by
    * the deterministic stride `vec_id % stride == 0`, and
    * `nprobe = max(4, nlist/8)` probed cells per query. All three derive
    * from the corpus count alone, so a DuckDB oracle recomputes the
    * identical geometry from `COUNT(*)`. */
  final case class IvfGeometry(nlist: Int, stride: Long, nprobe: Int)

  def ivfGeometry(corpusSize: Long): IvfGeometry = {
    require(corpusSize > 0, s"corpusSize must be positive, got $corpusSize")
    val nlist = math.max(1L, math.round(math.sqrt(corpusSize.toDouble))).toInt
    val stride = math.max(1L, corpusSize / nlist)
    val nprobe = math.max(4, nlist / 8)
    IvfGeometry(nlist, stride, nprobe)
  }

  /** The IVF coarse quantizer: assign a vector to its highest-cosine
    * centroid; probe the top-`nprobe` centroids at query time. A
    * per-row JVM loop over the broadcast centroid array (the same
    * carve-out as [[Bucketizer]] — nlist×dim multiply-adds per vector
    * would run interpreted inside nested column HOFs).
    *
    * Cross-engine parity (what lets the oracle replay the assignment):
    * every dot and norm accumulates in DOUBLE over ASCENDING index —
    * bit-identical to DuckDB's `list_reduce` over the ordered product
    * list — `sqrt` is IEEE correctly-rounded in both engines, and ties
    * break on the lower centroid id, matching
    * `ROW_NUMBER() OVER (ORDER BY cos DESC, cid ASC)`. A zero-norm
    * input scores -inf against every centroid (DuckDB: the same CASE),
    * so it deterministically lands in the lowest-id cell instead of
    * dividing by zero.
    *
    * `centroids` must be sorted ascending by id. Centroid vectors and
    * norms are precomputed once per deserialized instance and shared
    * across the task's rows. */
  final class IvfAssigner(centroids: Array[(Long, Array[Float])]) extends Serializable {
    require(centroids.nonEmpty, "IVF needs at least one centroid")
    private val ids: Array[Long] = centroids.map(_._1)
    private val vecs: Array[Array[Float]] = centroids.map(_._2)
    @transient private lazy val norms: Array[Double] = vecs.map(normAsc)

    private def normAsc(v: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; acc += x * x; i += 1 }
      math.sqrt(acc)
    }
    private def dotAsc(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    private def cosTo(emb: Array[Float], nEmb: Double, k: Int): Double =
      if (nEmb == 0.0 || norms(k) == 0.0) Double.NegativeInfinity
      else dotAsc(emb, vecs(k)) / (nEmb * norms(k))

    /** The centroid id of the cell `emb` belongs to (strict `>` keeps
      * the FIRST max — the lowest id, since `ids` is ascending). */
    def assign(emb: Array[Float]): Long = {
      val nEmb = normAsc(emb)
      var best = 0; var bestCos = cosTo(emb, nEmb, 0)
      var k = 1
      while (k < ids.length) {
        val c = cosTo(emb, nEmb, k)
        if (c > bestCos) { best = k; bestCos = c }
        k += 1
      }
      ids(best)
    }

    /** The top-`nprobe` centroid ids for a query (cos desc, id asc) —
      * capped at the centroid count for tiny corpora. */
    def probe(emb: Array[Float], nprobe: Int): Array[Long] = {
      val nEmb = normAsc(emb)
      val cos = Array.tabulate(ids.length)(cosTo(emb, nEmb, _))
      ids.indices.toArray
        .sortBy(k => (-cos(k), ids(k)))
        .take(math.min(nprobe, ids.length))
        .map(ids)
    }
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
