package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Hashed-linear classifier scoring ([[graft.queries.TextCatalog.mlQuality]]):
  * the column pipeline must agree with a pure-JVM replay of the hashing
  * trick + integer logit, handle the degenerate docs, and be genuinely
  * model-pluggable (the literal weight array is the only model-specific
  * part). */
class MlQualitySpec extends SparkSpec {

  private val D = 4096

  private def jvmWeight(bucket: Int): Long =
    java.lang.Long.remainderUnsigned(TextOps.md5Upper64(s"$bucket|wt"), 2001L) - 1000L

  private def jvmBucket(gram: String): Int =
    java.lang.Long.remainderUnsigned(TextOps.md5Upper64(s"$gram|qf"), D.toLong).toInt

  private def jvmLogit(text: String): (Int, Long) = {
    val ws = text.split(" ", -1)
    val grams = ws.toSeq ++ (if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    (grams.size, grams.map(g => jvmWeight(jvmBucket(g))).sum)
  }

  test("column scoring == JVM replay, including empty and single-token docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "single"),
      (3L, ""),
      (4L, "a a a a a"),                 // repeated grams accumulate
      (5L, "trailing space "),            // split keeps the empty token
      (6L, "punct!? 123 ###")
    )
    // run the real catalog pipeline on a scratch documents table
    val dir = java.nio.file.Files.createTempDirectory("graft_mlq").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextCatalog.mlQuality(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.length == docs.length)
    got.foreach { case (id, nf, logit, keep) =>
      val (enf, elm) = jvmLogit(docs.find(_._1 == id).get._2)
      assert(nf == enf.toLong, s"doc $id: n_feats $nf != $enf")
      assert(logit == elm.toDouble / 1000.0, s"doc $id: logit $logit != ${elm / 1000.0}")
      assert(keep == (elm > 0), s"doc $id: keep flag")
    }
  }

  test("md5ModCol bucket == JVM twin (the hashing-trick contract)") {
    import spark.implicits._
    val grams = Seq("the", "quick brown", "", "a a", "##")
    val got = grams.toDF("g")
      .select(col("g"), TextOps.md5ModCol(col("g"), "|qf", D).as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    grams.foreach(g => assert(got(g) == jvmBucket(g), s"bucket mismatch for '$g'"))
  }

  test("weight array is the only model: swapping it swaps the scores") {
    import spark.implicits._
    // one-hot model: weight 1000 at the bucket of "the", 0 elsewhere —
    // the logit must count occurrences of that unigram (and any gram
    // colliding into its bucket, none among these)
    val hot = jvmBucket("the")
    val oneHot = Array.tabulate(D)(j => if (j == hot) 1000 else 0)
    val wLit = lit(oneHot)
    val score = (t: org.apache.spark.sql.Column) =>
      element_at(wLit, TextOps.md5ModCol(t, "|qf", D) + 1).cast("long")
    val got = Seq((1L, "the cat saw the dog"), (2L, "no match here"))
      .toDF("id", "text")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("lm", aggregate(transform(col("ws"), score), lit(0L), (a, x) => a + x))
      .select(col("id"), col("lm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 2000L) // "the" twice × weight 1000
    assert(got(2L) == 0L)
  }

  test("native HashedLinearLogit == declarative derivation (one-hot + bigrams)") {
    import spark.implicits._
    // one-hot on a BIGRAM bucket proves the expression's byte-concat
    // "prev ++ ' ' ++ cur" spelling hashes identically to the string join
    val hot = jvmBucket("quick brown")
    val oneHot = Array.tabulate(D)(j => if (j == hot) 7 else 0)
    val got = Seq((1L, "the quick brown fox"), (2L, "quick, brown"), (3L, "único tokén ütf"))
      .toDF("id", "text")
      .withColumn("ws", split(col("text"), " "))
      .select(col("id"),
        graft.plans.HashedLinearLogit.hashedLinearLogit(col("ws"), "|qf", oneHot).as("lm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 7L)  // exactly the "quick brown" bigram fires
    assert(got(2L) == 0L)  // punctuation breaks the gram
    // multi-byte UTF-8 tokens: replay the full model through the JVM twin
    val full = Array.tabulate(D)(j => jvmWeight(j).toInt)
    val utf = Seq((1L, "único tokén ütf")).toDF("id", "text")
      .withColumn("ws", split(col("text"), " "))
      .select(graft.plans.HashedLinearLogit.hashedLinearLogit(col("ws"), "|qf", full))
      .as[Long].head()
    assert(utf == jvmLogit("único tokén ütf")._2)
    // a null TOKEN nulls the score (the declarative twin's propagation),
    // never crashes — the array type admits containsNull arrays
    val withNull = Seq((1L, "a b c")).toDF("id", "text")
      .withColumn("ws", expr("transform(split(text, ' '), x -> nullif(x, 'b'))"))
      .select(graft.plans.HashedLinearLogit.hashedLinearLogit(col("ws"), "|qf", full).as("lm"))
      .head()
    assert(withNull.isNullAt(0), "null token must null the score")
  }
}
