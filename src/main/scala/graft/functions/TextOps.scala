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

  /** MinHash signature: k independent hash views of the shingle set.
    * h_i(s) = xxhash64(s, i); signature_i = min over shingles. Two docs'
    * signatures agree at position i with probability = their Jaccard
    * similarity — the basis for LSH banding. */
  def minhash(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(s, i))))

  /** LSH band keys: hash each `rows`-wide slice of the signature. Docs
    * sharing any band key are candidate near-duplicates; with b bands of r
    * rows the detection threshold is ~(1/b)^(1/r). */
  def bandKeys(signature: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        transform(slice(signature, b * lit(rows) + lit(1), lit(rows)),
          x => x.cast("string")))))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

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
