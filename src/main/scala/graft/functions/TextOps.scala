package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks for large-scale training-data curation:
  * shingling, MinHash signatures, LSH banding, SimHash, language-ID and
  * quality heuristics. All pure column expressions (higher-order functions
  * on arrays — no UDFs, no driver-side loops), so every operator scales as
  * a narrow per-row map; the only shuffles are the groupBy/join stages the
  * catalog queries add on top.
  */
object TextOps {

  /** Whitespace tokens (the reference corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles; docs shorter than n fall back to the whole
    * text as a single shingle so they still participate in dedup. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + lit(1), lit(n))))))
      .otherwise(array(text))
  }

  /** [[shingles]]' JVM twin — element-for-element identical output
    * (Spark `split(text, " ")` = Java `split(" ", -1)`; `transform` then
    * `array_distinct` keeps first occurrences in index order =
    * LinkedHashSet insertion order; `concat_ws` = `mkString`), none of
    * the interpreted-lambda overhead: the column form constructs every
    * shingle string inside a `transform` lambda, which runs interpreted
    * per ELEMENT — converting the shingle-heavy queries to typed maps
    * over this measured 2-4× (fingerprint, decontam, prefix-join).
    * TextSpec asserts JVM == column on fixtures and corpus samples. */
  def shingleSet(text: String, n: Int): Array[String] = {
    val w = text.split(" ", -1)
    if (w.length >= n) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= w.length) {
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(w(j)); j += 1
        }
        seen.add(sb.toString); i += 1
      }
      seen.toArray(Array.empty[String])
    } else Array(text)
  }

  /** FNV-1a 64-bit — the internal shingle-key hash for the prefix-
    * filtered similarity join. INTERNAL ONLY: the hash provides candidate
    * pruning and intersection keys, and correctness is hash-agnostic
    * modulo 64-bit collisions (~1e-8 over the corpus — the same accepted
    * risk class as the previous xxhash64 keys; the DuckDB oracle
    * intersects the shingle STRINGS, so any total order works). */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** MinHash + banding over pre-hashed shingles, as a tight JIT'd loop.
    *
    * Why not column HOFs: k×|shingles| hash evaluations per document run
    * interpreted inside nested `transform` lambdas — measured 60× slower
    * than this loop at sf0.1. The per-document sketch is exactly the
    * "genuine per-row imperative logic" carve-out; everything around it
    * (shingling, shuffles, joins) stays declarative.
    *
    * Cross-engine deterministic (what graduated minhash from rows-only to
    * a full DuckDB oracle in round 5): shingle hash = [[md5Upper64]]
    * (= DuckDB `md5_number_upper`), permutation i = XOR with a fixed
    * seed — a bijection of the already-uniform md5 space, reproducible
    * bit-for-bit by DuckDB's `xor()` on signed BIGINT — and band key =
    * md5 hex of the '|'-joined signature slice (= `md5(string_agg(...))`).
    * Seed generation stays splitmix64 (Steele/Lea/Flajolet, public
    * domain); the seeds are interpolated into the oracle SQL from this
    * one definition.
    */
  object MinHasher extends Serializable {
    final def splitmix64(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }

    /** Fixed per-position XOR seeds — the single source of truth for both
      * the JIT'd loop and the DuckDB oracle's VALUES list. */
    val XorSeeds: Array[Long] = Array.tabulate(64)(i => splitmix64(i.toLong))

    /** k-wide signature over shingle hashes: sig(i) = min over shingles
      * of (h XOR seed_i), min under SIGNED 64-bit order (both engines
      * compare BIGINT signed). */
    def signature(shingleHashes: Seq[Long], k: Int): Array[Long] = {
      val sig = Array.fill(k)(Long.MaxValue)
      shingleHashes.foreach { h =>
        var i = 0
        while (i < k) {
          val m = h ^ XorSeeds(i)
          if (m < sig(i)) sig(i) = m
          i += 1
        }
      }
      sig
    }

    /** Band keys: md5 hex of the '|'-joined `rows`-wide signature slice.
      * Docs sharing any band key are candidate near-duplicates; with b
      * bands of r rows the detection threshold is ~(1/b)^(1/r). */
    def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[String] =
      Array.tabulate(bands) { b =>
        md5Hex(sig.slice(b * rows, math.min(sig.length, (b + 1) * rows)).mkString("|"))
      }
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Salted md5-u64(key) mod `mod`, as a pure column expression — the
    * ONE spelling of the cross-engine hash-bucket contract (DuckDB:
    * `md5_number_upper(key || salt) % mod`): md5 hex chars → bytes 0..7
    * reversed (little-endian u64) → decimal mod. Shared by the split
    * family (TextCatalog), the Count-Min probe path, and any future
    * bucketizer — one place to fix if the byte-order contract ever
    * changes. JVM twin: [[md5Upper64]] + `Long.remainderUnsigned`. */
  def md5ModCol(key: Column, salt: String, mod: Int): Column = {
    val h = md5(concat(key.cast("string"), lit(salt)))
    val le = concat((7 to 0 by -1).map(b => substring(h, 2 * b + 1, 2)): _*)
    (conv(le, 16, 10).cast(org.apache.spark.sql.types.DecimalType(20, 0)) % mod).cast("int")
  }

  /** Salted md5-derived uniform in (0,1], as a pure column expression —
    * the cross-engine RNG for derandomized sampling: 53 bits of the
    * md5-u64 (the largest width a double holds exactly), shifted into
    * (0,1] as (u64 mod 2^53 + 1) / 2^53. The mod, the +1, and the
    * power-of-two scale are all exact in both engines, so the doubles
    * are bit-identical. DuckDB twin:
    * `CAST(md5_number_upper(key || salt) % 9007199254740992 + 1 AS DOUBLE)
    *  / 9007199254740992.0`; JVM twin: [[md5Uniform]]. */
  def md5UniformCol(key: Column, salt: String): Column = {
    val h = md5(concat(key.cast("string"), lit(salt)))
    val le = concat((7 to 0 by -1).map(b => substring(h, 2 * b + 1, 2)): _*)
    val u64 = conv(le, 16, 10).cast(org.apache.spark.sql.types.DecimalType(20, 0))
    ((u64 % lit(9007199254740992L)).cast("double") + lit(1.0)) / lit(9007199254740992.0)
  }

  /** JVM twin of [[md5UniformCol]] (same salt-concat contract). */
  def md5Uniform(t: String): Double =
    (java.lang.Long.remainderUnsigned(md5Upper64(t), 9007199254740992L) + 1L)
      .toDouble / 9007199254740992.0

  /** 64-bit SimHash over the token multiset: bit b is set when more token
    * hashes have bit b set than clear. Near-duplicate docs differ in few
    * bits (compare with hamming()). Expressed as a SQL expression because
    * shiftleft-by-column isn't reachable from the Scala function API. */
  def simhash64(textCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 63), 0L, (acc, b) -> acc + shiftleft(
         |  CASE WHEN aggregate(split($textCol, ' '), 0L,
         |    (a2, t) -> a2 + CASE WHEN (shiftright(xxhash64(t), b) & 1) = 1
         |                    THEN 1L ELSE -1L END) > 0
         |  THEN 1L ELSE 0L END, b))""".stripMargin)

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian u64 of md5-digest bytes 0..7 — numerically identical
    * to DuckDB's `md5_number_upper()`, which is what lets the simhash
    * queries graduate from rows-only to full hash-checked oracles. */
  def md5Upper64(t: String): Long = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var out = 0L
    var i = 7
    while (i >= 0) { out = (out << 8) | (bytes(i) & 0xffL); i -= 1 }
    out
  }

  /** Lowercase md5 hex — identical to Spark's `md5()` and DuckDB's
    * `md5()`, for JVM-loop code that must agree with both. */
  def md5Hex(t: String): String = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** SimHash as a JIT'd per-row function (for the typed fast path — same
    * rationale as [[MinHasher]]; the column form above documents the
    * declarative alternative). Token hash = [[md5Upper64]], and the
    * split keeps trailing empty tokens, both chosen to agree exactly
    * with DuckDB (`string_split` + `md5_number_upper`) so the sketch is
    * cross-engine deterministic. */
  def simhash64Fast(text: String): Long = {
    val votes = new Array[Int](64)
    text.split(" ", -1).foreach { t =>
      val h = md5Upper64(t)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une"),
    "es" -> Seq("el", "los", "que", "de", "y", "un", "una"),
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language-ID heuristic: argmax of per-language stopword hits, ties
    * resolved by profile order, zero hits → "und" (undetermined). A real
    * deployment would swap in char-trigram profiles; the Spark plumbing
    * (per-row HOF scoring, no shuffle) is identical. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = LangProfiles.map { case (lang, ws) => (lang, stopwordHits(toks, ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }
}
