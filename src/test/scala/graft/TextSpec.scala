package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps._
import graft.queries.TextCatalog

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: count, distinctness, short-doc fallback") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(shingles(col("text"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1) == Seq("a b")) // shorter than n → whole text
  }

  test("jaccard exact values") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(jaccard(split(col("x"), " "), split(col("y"), " ")).as("j"))
    assert(df.head.getDouble(0) == 0.5) // {b,c} / {a,b,c,d}
  }

  test("simhash: identical docs collide, unrelated docs differ") {
    val df = Seq("spark scales out very well", "spark scales out very well",
      "completely different words entirely here").toDF("text")
      .select(simhash64("text").as("h"))
    val h = df.collect().map(_.getLong(0))
    assert(h(0) == h(1))
    assert(h(0) != h(2))
  }

  test("simhash: near-dup pairs land at small hamming distance") {
    val pairs = TextCatalog.ngramSimilarity(spark, sf0001)
      .filter(col("jac") >= 0.8).select("d1", "d2")
    val sketch = TextCatalog.simhashSketch(spark, sf0001)
    val joined = pairs
      .join(sketch.withColumnRenamed("doc_id", "d1").withColumnRenamed("simhash", "h1"), "d1")
      .join(sketch.withColumnRenamed("doc_id", "d2").withColumnRenamed("simhash", "h2"), "d2")
      .select(hamming(col("h1"), col("h2")).as("d"))
      .collect().map(_.getInt(0))
    assert(joined.forall(_ <= 12), s"hamming distances: ${joined.mkString(",")}")
  }

  test("chunker: stride, 20-token overlap, and short tail on a long doc") {
    // the fixture docs all fit one chunk — drive the multi-chunk branch
    // with a constructed 250-token doc: chunks [1,100], [81,180], [161,250]
    val text = (1 to 250).map(i => s"w$i").mkString(" ")
    val out = TextCatalog.docChunksOf(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[Int]("chunk_id")).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getAs[Int]("n_toks")).toSeq == Seq(100, 100, 90))
    def m(lo: Int, hi: Int): String = java.security.MessageDigest.getInstance("MD5")
      .digest((lo to hi).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.map(_.getAs[String]("chunk_md5")).toSeq ==
      Seq(m(1, 100), m(81, 180), m(161, 250)))
    // an exactly-capacity doc yields one chunk, not an empty second one
    val one = TextCatalog.docChunksOf(
      Seq((2L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")).collect()
    assert(one.length == 1 && one(0).getAs[Int]("n_toks") == 100)
  }

  test("prefix-filter bound is lossless: no Jaccard >= t pair lacks a shared prefix") {
    // adversarial pure-set check of the PPJoin bound the prefix plan
    // relies on: for sets in one global order with prefix length
    // |X| - ceil(t*|X|) + 1, every pair with jac >= t must intersect
    // within the prefixes. Deterministic LCG sampling (scalacheck-style
    // generators are not on the offline classpath).
    val t = 0.5
    var state = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      java.lang.Math.floorMod(state >>> 33, bound.toLong).toInt
    }
    def prefix(s: Vector[Int]): Set[Int] = {
      val sorted = s.sorted
      sorted.take(sorted.size - math.ceil(t * sorted.size).toInt + 1).toSet
    }
    var checked = 0
    for (_ <- 1 to 2000) {
      // overlapping draws from a small universe → many pairs near the
      // threshold, the regime where an off-by-one in the bound shows
      val a = Vector.fill(2 + next(12))(next(24)).distinct
      val b0 = Vector.fill(2 + next(12))(next(24)).distinct
      // force some high-jaccard pairs by splicing a's elements into b
      val b = (b0 ++ a.take(next(a.size + 1))).distinct
      val jac = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
      if (jac >= t) {
        checked += 1
        assert((prefix(a) & prefix(b)).nonEmpty,
          s"pair with jac=$jac filtered out: a=$a b=$b")
      }
    }
    assert(checked >= 100, s"only $checked above-threshold pairs — fixture too weak")
  }

  test("prefix-filtered ngram similarity equals the count-based plan") {
    val base = TextCatalog.ngramSimilarityCount(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val pref = TextCatalog.ngramSimilarityPrefix(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(base.nonEmpty, "no >=0.5 pairs in fixture — comparison is vacuous")
    assert(pref == base, s"prefix plan diverged: missing ${base -- pref}, extra ${pref -- base}")
  }

  test("LSH recovers every >=0.8 near-dup pair the exact pairwise scan finds") {
    // ground truth: unblocked exact pairwise (feasible at sf0.001 only)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
    val truth = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextCatalog.minhashLsh(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no near-dups — test is vacuous")
    assert(lsh == truth, s"LSH missed ${truth -- lsh}, extra ${lsh -- truth}")
  }

  test("simhash near-dup pairs cover the strongest jaccard near-dups") {
    val jacPairs = TextCatalog.ngramSimilarity(spark, sf0001)
      .filter(col("jac") >= 0.95).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shPairs = TextCatalog.simhashNearDup(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // very-high-jaccard pairs have near-identical token multisets → tiny
    // hamming distance → banding finds them
    assert(jacPairs.subsetOf(shPairs),
      s"simhash missed ${jacPairs -- shPairs}")
  }

  test("language-ID heuristic on constructed fixtures") {
    val df = Seq(
      "the cat sat on the mat and the dog is here",
      "le chat et la souris sont dans les jardins de paris",
      "el gato y los perros de madrid que corren",
      "der hund und die katze das haus",
      "xyzzy qwerty plugh").toDF("text")
      .select(langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "fr", "es", "de", "und"))
  }

  test("shingleSet is element-for-element identical to the shingles column") {
    val fixtures = Seq("a b c d e", "a b", "", "x x x x x", "a  b c",
      "one two three one two three one")
    val corpusSamples = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").limit(50).collect().map(_.getString(0))
    for (n <- Seq(3, 5, 8)) {
      val texts = fixtures ++ corpusSamples
      val colForm = texts.toDF("text")
        .select(shingles(col("text"), n).as("sh"))
        .collect().map(_.getSeq[String](0).toSeq)
      texts.zip(colForm).foreach { case (t, expected) =>
        assert(shingleSet(t, n).toSeq == expected, s"n=$n text='$t'")
      }
    }
  }

  test("trainSplit: bucket column equals JVM md5Upper64, fractions near 90/5/5") {
    val rows = TextCatalog.trainSplit(spark, sf001).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val expected = java.lang.Long.remainderUnsigned(md5Upper64(s"$id|split"), 100L).toInt
      assert(r.getInt(1) == expected, s"doc_id=$id declarative bucket != md5Upper64")
    }
    val n = rows.length.toDouble
    val frac = rows.groupBy(_.getString(2)).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.90) < 0.05, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0 && frac.getOrElse("test", 0.0) > 0)
  }

  test("clusterSplit: clusters atomic, singletons match plain split, guard non-vacuous") {
    val safe = TextCatalog.clusterSplit(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    val plain = TextCatalog.trainSplit(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    val pairs = TextCatalog.minhashLsh(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // atomicity: near-duplicates can never straddle — same rep, same split
    pairs.foreach { case (d1, d2) =>
      assert(safe(d1) == safe(d2), s"pair ($d1,$d2) straddles the safe split")
    }
    // singletons (not in any near-dup pair) keep the plain assignment
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val singletons = safe.keySet -- clustered
    assert(singletons.nonEmpty)
    singletons.foreach { id =>
      assert(safe(id)._1 == id, s"singleton $id has foreign rep ${safe(id)._1}")
      assert((safe(id)._2, safe(id)._3) == plain(id), s"singleton $id diverges from plain split")
    }
    // non-vacuity: the plain split DOES leak on this corpus (some pair
    // straddles train/val/test under doc_id hashing), so the guard is
    // doing real work, not passing trivially
    assert(pairs.exists { case (d1, d2) => plain(d1)._2 != plain(d2)._2 },
      "no near-dup pair straddles the plain split — guard untested")
  }

  test("mixture: deterministic, shares near targets, both resample branches fire") {
    val targets = Map("en" -> 0.30, "zh" -> 0.20, "es" -> 0.20, "de" -> 0.15, "fr" -> 0.15)
    val out = TextCatalog.mixture(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // hash-not-RNG: a second run is row-identical
    val again = TextCatalog.mixture(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == again.toSeq)
    // realized token share per lang lands near its target weight
    val toks = out.groupBy(_._3).view.mapValues(_.map(_._4.toLong).sum).toMap
    val total = toks.values.sum.toDouble
    targets.foreach { case (lang, w) =>
      val realized = toks.getOrElse(lang, 0L) / total
      assert(math.abs(realized - w) < 0.05, s"$lang share $realized vs target $w")
    }
    // downsampling is real: overrepresented en emits fewer docs than it has
    val enCorpus = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("lang") === "en" && col("text").isNotNull).count()
    val enEmitted = out.filter(_._3 == "en").map(_._1).distinct.length
    assert(enEmitted < enCorpus, s"en not downsampled ($enEmitted of $enCorpus)")
    // upsampling is real: some doc is emitted more than once
    assert(out.exists(_._2 >= 2), "no doc upsampled — integer-copy branch untested")
  }

  test("sourceCap: kept set is the minimal budget-crossing prefix per source") {
    val kept = TextCatalog.sourceCap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("n_toks"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._2)
    assert(kept.keySet == corpus.keySet, "some source lost entirely")
    corpus.foreach { case (src, docs) =>
      val ordered = docs.sortBy(d => (-d._3, d._1)) // n_chars DESC, doc_id ASC
      val target = 0.6 * docs.map(_._4.toLong).sum
      val ks = kept(src)
      // prefix property: kept docs are exactly the first k in quality order
      assert(ks.map(_._3).toSeq == ordered.take(ks.length).map(_._1).toSeq,
        s"$src kept set is not a prefix of the quality order")
      // minimal crossing: kept total reaches the budget, dropping the
      // last kept doc would not
      val keptToks = ks.map(_._4.toLong).sum
      assert(keptToks >= target || ks.length == docs.length, s"$src budget unfilled")
      assert(keptToks - ks.last._4 < target, s"$src kept more than the crossing doc")
      // and something was actually dropped somewhere (cap non-vacuous)
    }
    assert(kept.values.map(_.length).sum < corpus.values.map(_.size).sum,
      "cap dropped nothing — vacuous")
  }

  test("pipelineE2e: consistent with standalone curation, mixture semantics hold") {
    val pipe = TextCatalog.pipelineE2e(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val cur = TextCatalog.curationPipeline(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pipe.keySet.map(_._2) == Set("train", "val", "test"))
    // val/test pass through the mixture untouched: one copy per doc
    pipe.foreach { case ((l, s), (d, c, _)) =>
      if (s != "train") assert(c == d, s"($l,$s) resampled outside train")
    }
    // doc conservation per lang: the pipeline's docs across splits can't
    // exceed the standalone curation's kept count (train may lose docs
    // to mixture downsampling, never gain)
    pipe.keySet.map(_._1).foreach { lang =>
      val docs = pipe.collect { case ((`lang`, _), (d, _, _)) => d }.sum
      assert(docs <= cur(lang), s"$lang: pipeline $docs > curated ${cur(lang)}")
      assert(docs >= cur(lang) / 2, s"$lang: implausible attrition $docs of ${cur(lang)}")
    }
    // the train-side mixture really fires inside the composition:
    // somewhere a doc was duplicated (copies > docs)
    assert(pipe.exists { case ((_, s), (d, c, _)) => s == "train" && c > d },
      "no train upsampling anywhere — mixture stage vacuous in the pipeline")
  }

  test("lmScore: every split scored, scores finite-negative, backoff not vacuous") {
    val out = TextCatalog.lmScore(spark, sf001).collect()
    assert(out.map(_.getString(1)).toSet == Set("train", "val", "test"))
    out.foreach { r =>
      val avg = r.getDouble(4)
      assert(avg < 0 && !avg.isInfinity && !avg.isNaN, s"doc ${r.getLong(0)}: $avg")
      assert(r.getLong(2) > 0)
    }
    // the unseen-bigram backoff must actually fire for some held-out doc,
    // or the oracle never tests that branch: at least one val/test bigram
    // must be absent from the train bigram set
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    def trainDoc(id: Long) = java.lang.Long.remainderUnsigned(md5Upper64(s"$id|split"), 100L) < 90
    val trainBigrams = docs.filter(d => trainDoc(d._1))
      .flatMap { case (_, ws) => ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }.toSet
    val heldOutUnseen = docs.filter(d => !trainDoc(d._1))
      .flatMap { case (_, ws) => ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
      .exists(!trainBigrams.contains(_))
    assert(heldOutUnseen, "no held-out bigram is unseen — the backoff branch is untested")
  }

  test("incremental dedup against a persisted band index: no history shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    TextCatalog.buildBandIndex(corpus, s"$dir/idx")
    // new batch: exact copies of 10 historical docs under fresh ids, plus
    // 3 genuinely new docs that must match nothing
    val copies = corpus.filter(col("doc_id") < 10)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val fresh = Seq(
      (200001L, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh"),
      (200002L, "zz xx cc vv bb nn mm ll kk jj qq2 ww2 ee2 rr2 tt2 yy2"),
      (200003L, "one1 two2 three3 four4 five5 six6 seven7 eight8 nine9 ten10 e1 e2")
    ).toDF("doc_id", "text")
    val res = TextCatalog.dedupAgainstIndex(copies.union(fresh), s"$dir/idx")
    // the history side must not shuffle: both probes broadcast the new side
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "new side not broadcast")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every copy maps to exactly its original at jac 1.0 (plus any organic
    // near-dup of that original); the fresh docs match nothing
    (0L until 10L).foreach { id =>
      assert(got.contains((id, id + 100000L, 1.0)), s"copy of $id not found")
    }
    assert(!got.exists(_._2 >= 200000L), s"fresh docs matched: $got")
  }

  test("repetition signals match a from-scratch re-derivation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val got = TextCatalog.repetitionSignals(spark, sf0001).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val words = docs(r.getLong(0)).split(" ", -1).toSeq
      val n = words.length
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - (1.0 - words.distinct.size.toDouble / n)) < 1e-12)
      val top = words.groupBy(identity).valuesIterator.map(_.size).max
      assert(math.abs(r.getDouble(3) - top.toDouble / n) < 1e-12)
      val grams = words.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val expected = if (n >= 2) 1.0 - grams.distinct.size.toDouble / grams.size else 0.0
      assert(math.abs(r.getDouble(4) - expected) < 1e-12, s"doc ${r.getLong(0)}")
    }
  }

  test("PII redaction scrubs planted contacts and leaves clean docs byte-identical") {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val got = TextCatalog.redactPii(spark, sf0001).collect()
    var planted = 0
    got.foreach { r =>
      val id = r.getLong(0)
      val isPlanted = id % 7 == 0
      assert(r.getInt(1) == (if (isPlanted) 1 else 0), s"n_emails for $id")
      assert(r.getInt(2) == (if (isPlanted) 1 else 0), s"n_phones for $id")
      val source =
        if (isPlanted) { planted += 1
          docs(id) + s" contact user$id@example.com or call 555-${"%04d".format(id)}" }
        else docs(id)
      val expected = source.replaceAll(emailRe, "<EMAIL>").replaceAll(phoneRe, "<PHONE>")
      assert(r.getInt(3) == expected.length, s"n_chars_redacted for $id")
      assert(r.getString(4) == md5hex(expected), s"redacted_md5 for $id")
    }
    assert(planted > 0, "fixture no longer plants any PII")
  }

  test("hashSample: deterministic, partition-independent, disjoint from the split stream") {
    val a = TextCatalog.hashSample(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val b = TextCatalog.hashSample(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sample not deterministic")
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // 20% threshold over a uniform hash: loose 3-sigma band
    assert(math.abs(a.size - 0.2 * n) < 3 * math.sqrt(n * 0.2 * 0.8),
      s"sample rate off: ${a.size}/$n")
    // the '|sample' salt must give a stream independent of '|split':
    // if they collapsed, the sample would be exactly the bucket<20 split slice
    val split = TextCatalog.trainSplit(spark, sf0001)
      .filter(col("bucket") < 20).collect().map(_.getLong(0)).toSet
    assert(a.toSet != split, "sample stream collapsed onto the split stream")
  }

  test("stratifiedSample: exact ceil(20%) quota per stratum, hash-ranked prefix") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val perSource = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextCatalog.stratifiedSample(spark, sf0001).collect()
      .groupBy(_.getString(1))
    perSource.foreach { case (src, cnt) =>
      val quota = (cnt + 4) / 5
      assert(got(src).length == quota, s"$src: ${got(src).length} != $quota")
      assert(got(src).map(_.getLong(2)).sorted.toSeq == (1L to quota),
        s"$src ranks not a dense 1..quota prefix")
    }
    assert(got.keySet == perSource.keySet, "a stratum lost all rows")
  }

  test("chunkDedup: drops exactly the duplicate segments, keeps first occurrences") {
    import TextCatalog.SegWords
    val rows = TextCatalog.chunkDedup(spark, sf0001).collect()
    // independent truth: segment the corpus in the JVM and count first
    // occurrences per doc in (doc_id, position) order
    val segs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
      .flatMap { case (id, t) =>
        t.split(" ").grouped(SegWords).zipWithIndex
          .map { case (seg, i) => (id, i, seg.mkString(" ")) } }
    val seen = scala.collection.mutable.Set[String]()
    val expKept = segs.map { case (id, _, s) => (id, seen.add(s)) }
      .groupBy(_._1).map { case (id, xs) => id -> xs.count(_._2) }
    rows.foreach { r =>
      assert(r.getLong(2) == expKept(r.getLong(0)),
        s"doc ${r.getLong(0)}: kept ${r.getLong(2)} != ${expKept(r.getLong(0))}")
    }
    val dropped = rows.map(r => r.getLong(1) - r.getLong(2)).sum
    assert(dropped > 0, "fixture has no cross-doc duplicate segments — test is vacuous")
    // a fully-kept doc's fingerprint differs from a partially-dropped one's
    assert(rows.map(_.getString(3)).distinct.length > 1)
  }

  test("dedupKeepBest: picks the max-stop-ratio member of every cluster") {
    val best = TextCatalog.dedupKeepBest(spark, sf0001).collect()
    assert(best.nonEmpty, "no near-dup clusters in fixture")
    val pairs = TextCatalog.minhashPairs(spark, sf0001)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect()
    val members = graft.functions.Graph
      .dedupClusters(pairs.toSeq.toDF("d1", "d2"), "d1", "d2")
      .select(col("id"), col("comp")).as[(Long, Long)].collect()
      .groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    val quality = TextCatalog.qualityScore(spark, sf0001)
      .select(col("doc_id"), col("stop_ratio")).as[(Long, Double)].collect().toMap
    best.foreach { r =>
      val (comp, size, doc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val m = members(comp)
      assert(m.size == size, s"cluster $comp size")
      val top = m.map(quality).max
      assert(quality(doc) == top, s"cluster $comp: kept $doc is not argmax quality")
      // tie-break: smallest id among the argmax set
      assert(doc == m.filter(d => quality(d) == top).min, s"cluster $comp tie-break")
    }
  }

  test("url dedup: every planted variant family collapses to one canonical url") {
    import org.apache.spark.sql.functions._
    val res = graft.queries.TextCatalog.urlDedup(spark, sf0001).collect()
    assert(res.nonEmpty)
    // canonical form: https, lowercase host, no www/port/utm/fragment/
    // trailing slash — none of the planted noise survives normalization
    res.map(_.getString(0)).foreach { u =>
      assert(u.startsWith("https://example-"), u)
      assert(!u.contains("www.") && !u.contains(":80") && !u.contains("utm_") &&
        !u.contains("#") && !u.endsWith("/"), s"noise survived: $u")
    }
    // the dedup is REAL: the fixture plants 4 url variants per family,
    // so distinct normalized urls << documents, and every family keeps
    // its min doc_id as canonical
    val docs = graft.core.Tables.documents(spark, sf0001).count()
    assert(res.length < docs / 2, s"${res.length} groups for $docs docs — nothing collapsed")
    assert(res.map(_.getLong(2)).sum == docs, "group sizes must partition the corpus")
  }

  test("bloom decontam: cell-identical to the broadcast path, and the filter actually prunes") {
    val exact = TextCatalog.decontam(spark, sf0001).collect()
    val bloom = TextCatalog.decontamBloom(spark, sf0001).collect()
    assert(bloom.length == exact.length)
    bloom.zip(exact).foreach { case (b, e) =>
      assert(b.getLong(0) == e.getLong(0) && b.getLong(1) == e.getLong(1),
        s"bloom row $b vs exact row $e")
    }
    // the scale claim: might_contain must drop most of the training gram
    // stream before the shuffle join (the fixture's eval/train gram
    // overlap is small, so a working filter passes only leaks + ~3% FPs)
    import graft.plans.BloomJoin
    val g = TextCatalog.decontamGramFrame(spark, sf0001)
    val ev = g.filter(col("doc_id") % 10 === 0).select(col("gram")).distinct()
    val tr = g.filter(col("doc_id") % 10 =!= 0)
    val bf = BloomJoin.buildFilter(ev, col("gram"), 1000000L).get
    val total = tr.count()
    val kept = tr.filter(BloomJoin.mightContain(bf, col("gram"))).count()
    assert(kept < total / 2, s"filter kept $kept of $total grams — no pruning")
  }

  test("invertedIndex: cell-exact vs a JVM rebuild, posting heads bounded+ascending") {
    val got = TextCatalog.invertedIndex(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty, "df>=20 floor left no tokens at sf0.01 — fixture drifted?")
    // JVM rebuild from the raw fixture (500 docs — test-sized)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) => (r.getLong(0), r.getString(1)) }
    val postings = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[Long, Long]]
    docs.foreach { case (id, text) =>
      text.split(" ", -1).foreach { tok =>
        val m = postings.getOrElseUpdate(tok, scala.collection.mutable.Map.empty)
        m(id) = m.getOrElse(id, 0L) + 1L
      }
    }
    val want = postings.iterator
      .filter(_._2.size >= 20)
      .map { case (tok, m) =>
        (tok, m.size.toLong, m.values.sum,
          m.keys.toSeq.sorted.take(5).mkString(","))
      }
      .toSeq.sortBy(_._1)
    // re-sort both sides under Scala's String ordering: Spark's orderBy is
    // UTF8-binary, which can disagree with compareTo on non-ASCII tokens
    assert(got.toSeq.sortBy(_._1) == want,
      s"inverted index drifted: got ${got.length} rows, want ${want.length}")
    got.foreach { case (tok, df, tf, head) =>
      val ids = head.split(",").map(_.toLong)
      assert(ids.length <= 5 && (ids sameElements ids.sorted), s"posting head of '$tok' unbounded/unsorted")
      assert(tf >= df, s"'$tok': tf $tf < df $df")
    }
  }

  test("persisted inverted index: bucket-pruned probe, epoch merge, JVM parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv").toString
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // two epochs so the probe genuinely merges across manifest entries
    TextCatalog.buildInvertedIndexStore(corpus.filter(col("doc_id") % 2 === 0), dir)
    TextCatalog.appendInvertedIndex(corpus.filter(col("doc_id") % 2 === 1), dir, epoch = 1L)
    val terms = Seq("vector", "stream", "join")
    val res = TextCatalog.searchInvertedIndexStore(spark, dir, terms, k = 5)
    // pruning proof on the pinned DSv2 scan (r12: the probe reads through
    // the epochstore connector): the bucket In-filter must land as a
    // fully-handled partition filter, and across BOTH epochs the scan
    // keeps no more bucket dirs than the probe terms hash to
    val buckets = terms.map(t => java.lang.Long.remainderUnsigned(
      graft.functions.TextOps.md5Upper64(s"$t|inv"),
      TextCatalog.InvBuckets.toLong).toInt).distinct.toSet
    val scans = res.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.collect { case s: graft.sources.EpochStoreScan => s }
    assert(scans.size == 1, s"expected the postings connector scan, got ${scans.size}")
    scans.foreach { s =>
      assert(s.partFilters.nonEmpty, "scan has no partition filters")
      assert(s.entries.size == 2, s"scan must pin both epochs: ${s.entries}")
      val (sel, tot) = s.selectedPartitionDirs
      assert(sel <= buckets.size * s.entries.size && sel < tot,
        s"scan reads $sel/$tot bucket dirs, probed ${buckets.size} buckets " +
          s"over ${s.entries.size} epochs")
    }
    // JVM parity: per-term top-5 docs by (tf desc, doc_id asc) over the
    // full corpus — the two epochs must merge to exactly this
    val docs = corpus.collect()
      .collect { case r if !r.isNullAt(1) => (r.getLong(0), r.getString(1)) }
    val got = res.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    terms.foreach { t =>
      val want = docs.flatMap { case (id, txt) =>
        val c = txt.split(" ", -1).count(_ == t).toLong
        if (c > 0) Some((id, c)) else None
      }.sortBy { case (id, tf) => (-tf, id) }.take(5).toSeq
      val rows = got.filter(_._1 == t).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(rows == want, s"term '$t': got $rows want $want")
    }
  }

  test("inverted store: a probe pinned before compaction reads through the swap unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_snap").toString
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    TextCatalog.buildInvertedIndexStore(corpus.filter(col("doc_id") % 3 === 0), dir)
    TextCatalog.appendInvertedIndex(corpus.filter(col("doc_id") % 3 === 1), dir, 1L)
    TextCatalog.appendInvertedIndex(corpus.filter(col("doc_id") % 3 === 2), dir, 2L)
    val terms = Seq("vector", "join")
    def probe() = TextCatalog.searchInvertedIndexStore(spark, dir, terms, k = 8)
    val pre = probe().collect().map(_.toSeq).toSeq
    // pin a DataFrame (manifest snapshot + file listing resolved NOW),
    // then compact underneath it — the reader-isolation property a
    // long-running serving index needs
    val pinned = probe()
    import graft.core.EpochManifest
    val par = spark.conf.get("spark.sql.shuffle.partitions", "4").toInt
    EpochManifest.compact(spark, TextCatalog.doclensRoot(dir),
      TextCatalog.doclensSchema, coalesceTo = par)
    EpochManifest.compact(spark, TextCatalog.postingsRoot(dir),
      TextCatalog.postingsSchema, partitionBy = Seq("bucket"), coalesceTo = par)
    assert(EpochManifest.entries(spark, TextCatalog.postingsRoot(dir)).size == 1,
      "compaction did not fold the postings store")
    assert(pinned.collect().map(_.toSeq).toSeq == pre,
      "pinned probe diverged under concurrent compaction")
    assert(probe().collect().map(_.toSeq).toSeq == pre,
      "post-compaction probe changed results")
  }

  test("persisted-index BM25 is bit-identical to the declarative query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_bm25").toString
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // two epochs: the probe must merge tf and dl across manifest entries
    // before scoring, or the norms drift
    TextCatalog.buildInvertedIndexStore(corpus.filter(col("doc_id") % 3 === 0), dir)
    TextCatalog.appendInvertedIndex(corpus.filter(col("doc_id") % 3 =!= 0), dir, epoch = 1L)
    val viaIndex = TextCatalog.searchInvertedIndexBm25(
        spark, dir, Seq("vector", "stream", "join"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val declarative = TextCatalog.bm25(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // == on doubles — the shared component expression + decimal fold
    // must make the serving path exact, not approximately equal
    assert(viaIndex == declarative,
      s"index BM25 drifted from declarative:\n $viaIndex\n vs $declarative")
  }

  test("bm25: top-20 matches an exact JVM replay (decimal-fold parity)") {
    val terms = Set("vector", "stream", "join")
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) => (r.getLong(0), r.getString(1).split(" ", -1)) }
    val nd = docs.length.toLong
    val tdl = docs.map(_._2.length.toLong).sum
    val tf = docs.flatMap { case (id, ws) =>
      ws.filter(terms).groupBy(identity).map { case (t, g) => (id, ws.length.toLong, t, g.length.toLong) }
    }
    val dfreq = tf.groupBy(_._3).map { case (t, g) => (t, g.length.toLong) }
    def comp(t: String, tfv: Long, dl: Long): BigDecimal = {
      val df = dfreq(t).toDouble
      val raw = math.log((nd.toDouble - df + 0.5) / (df + 0.5) + 1.0) *
        (tfv.toDouble * 2.2) /
        (tfv.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / (tdl.toDouble / nd.toDouble)))
      BigDecimal(raw).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = tf.groupBy(_._1).map { case (id, g) =>
      (id, g.length.toLong, g.map(x => comp(x._3, x._4, x._2)).sum.toDouble)
    }.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(20)
    val got = TextCatalog.bm25(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"bm25 drifted:\n got=$got\nwant=$want")
  }
}
