package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.Listings

/** Property-based invariants (SURVEY.md §5.4), driven by scalacheck
  * generators with fixed seeds (the scalatest-scalacheck bridge artifact
  * isn't on the offline classpath, so sampling is explicit). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("dedup is idempotent and bounded by distinct key count") {
    samples(Gen.nonEmptyListOf(Gen.choose(0L, 20L)), 10).foreach { ids =>
      val df = ids.toDF("id")
      val once = Listings.dedup(df)
      assert(once.count() == ids.distinct.size)
      assert(Listings.dedup(once).count() == once.count())
    }
  }

  test("union count is additive, limit is bounded") {
    val gen = for {
      a <- Gen.listOf(Gen.choose(0, 100))
      b <- Gen.listOf(Gen.choose(0, 100))
      n <- Gen.choose(0, 50)
    } yield (a, b, n)
    samples(gen, 10).foreach { case (a, b, n) =>
      val da = a.toDF("x"); val db = b.toDF("x")
      assert(da.union(db).count() == a.size + b.size)
      assert(da.limit(n).count() == math.min(n, a.size))
    }
  }

  test("ppm2 guard: null exactly when price null/zero or area non-positive") {
    val gen = for {
      p <- Gen.option(Gen.choose(-5L, 5L))
      a <- Gen.option(Gen.choose(-3, 3))
    } yield (p, a)
    samples(gen, 25).foreach { case (p, a) =>
      val df = Seq((p, a)).toDF("price", "area")
        .select(Listings.guardedPpm2(col("price"), col("area")).as("ppm2"))
      val got = Option(df.head.get(0))
      val expectNull = p.isEmpty || p.contains(0L) || a.isEmpty || a.exists(_ <= 0)
      assert(got.isEmpty == expectNull, s"p=$p a=$a got=$got")
      if (got.isDefined) assert(got.get == p.get.toDouble / a.get)
    }
  }

  test("mixture copies re-derive exactly under random weight maps") {
    import graft.functions.TextOps.md5Upper64
    val langs = Seq("en", "zh", "es", "de", "fr")
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).as("n_toks"))
    val base = raw.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val wGen = Gen.listOfN(5, Gen.choose(0.0, 3.0))
    // one draw with a language OMITTED from the map entirely: its docs
    // must be sampled out via the zero-weight default branch
    val draws = samples(wGen, 6).map(langs.zip(_)) :+
      langs.filterNot(_ == "fr").map(_ -> 0.5)
    draws.foreach { weights =>
      val out = graft.queries.TextCatalog.mixtureCopies(raw, weights).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      // JVM re-derivation with the IDENTICAL expression shape: rate =
      // (w * total) / langToks in doubles, threshold integerized
      val total = base.map(_._3.toLong).sum
      val langToks = base.groupBy(_._2).view.mapValues(_.map(_._3.toLong).sum).toMap
      val wMap = weights.toMap
      val expected = base.flatMap { case (id, lang, toks) =>
        val rate = (wMap.getOrElse(lang, 0.0) * total.toDouble) / langToks(lang).toDouble
        val thr = math.floor((rate - math.floor(rate)) * 1000000.0).toLong
        val extra =
          if (java.lang.Long.remainderUnsigned(md5Upper64(s"$id|mix"), 1000000L) < thr) 1 else 0
        val copies = math.floor(rate).toInt + extra
        if (copies >= 1) Some((id, lang, toks, copies)) else None
      }
      assert(out.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq,
        s"mixture disagrees with re-derivation for weights $weights")
      val mapped = weights.map(_._1).toSet
      langs.filterNot(mapped).foreach { missing =>
        assert(!out.exists(_._2 == missing),
          s"unmapped lang $missing survived the zero-weight default")
      }
    }
  }

  test("sourceCap keeps the minimal crossing prefix at random budget fractions") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("n_toks"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._2)
    samples(Gen.choose(0.05, 0.95), 6).foreach { frac =>
      val kept = graft.queries.TextCatalog.sourceCapAt(spark, sf0001, frac).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      corpus.foreach { case (src, docs) =>
        val ordered = docs.sortBy(d => (-d._3, d._1))
        val target = frac * docs.map(_._4.toLong).sum
        val ks = kept.getOrElse(src, Seq.empty)
        assert(ks.nonEmpty, s"$src lost entirely at frac $frac")
        assert(ks == ordered.take(ks.length).map(_._1).toSeq,
          s"$src kept set not a prefix at frac $frac")
        val keptToks = ordered.take(ks.length).map(_._4.toLong).sum
        val lastToks = ordered(ks.length - 1)._4.toLong
        assert(keptToks >= target || ks.length == docs.length,
          s"$src budget unfilled at frac $frac")
        assert(keptToks - lastToks < target,
          s"$src kept beyond the crossing doc at frac $frac")
      }
    }
  }

  test("url normalization is idempotent over randomized messy urls") {
    import spark.implicits._
    // generated cross-product of noise dimensions: scheme case, www,
    // default port, utm params, fragments, trailing slash — every
    // canonical output must be a fixed point of the normalizer
    val rnd = new scala.util.Random(23L)
    val urls = (0 until 200).map { i =>
      val scheme = Seq("https", "HTTP", "HtTpS")(rnd.nextInt(3))
      val www = if (rnd.nextBoolean()) "WWW." else ""
      val host = s"Site-${i % 17}.Example.com"
      val port = Seq("", ":80", ":443")(rnd.nextInt(3))
      val slash = if (rnd.nextBoolean()) "/" else ""
      val utm = Seq("", "&utm_source=a", "&utm_x=b")(rnd.nextInt(3))
      val frag = if (rnd.nextBoolean()) "#sec" else ""
      s"$scheme://$www$host$port/p/${i % 13}$slash?id=${i % 13}$utm$frag"
    }
    val once = urls.toDF("url")
      .select(graft.queries.TextCatalog.normalizeUrl(col("url")).as("n"))
    val twice = once
      .select(col("n"), graft.queries.TextCatalog.normalizeUrl(col("n")).as("n2"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"not a fixed point: ${r.getString(0)} -> ${r.getString(1)}")
      assert(r.getString(0).startsWith("https://site-"), r.getString(0))
    }
    // noise variants of the same (host, path, id) collapse to ONE form
    val distinct = twice.map(_.getString(0)).distinct.length
    assert(distinct <= 17 * 13, s"$distinct canonical forms — noise survived")
  }

  test("approx_count_distinct within 10% of exact on lineitem") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val exact = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("HashedLinearLogit == pure-JVM replay on random docs and random models") {
    import graft.functions.TextOps
    val D = 256
    val tokenGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("", " ", "ütf", "多字节", "a-b", "##", "a'b"))
    val docGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    val caseGen = for {
      doc <- docGen
      seed <- Gen.choose(0, 1000)
    } yield (doc, seed)
    samples(caseGen, 30).foreach { case (doc, seed) =>
      val weights = Array.tabulate(D)(j =>
        (java.lang.Long.remainderUnsigned(
          TextOps.md5Upper64(s"$j|$seed"), 2001L) - 1000L).toInt)
      def jvm(text: String): Long = {
        val ws = text.split(" ", -1)
        val grams = ws.toSeq ++
          (if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Nil)
        grams.map(g => weights(java.lang.Long.remainderUnsigned(
          TextOps.md5Upper64(s"$g|qf"), D.toLong).toInt).toLong).sum
      }
      val got = Seq(Tuple1(doc)).toDF("text")
        .withColumn("ws", split(col("text"), " "))
        .select(graft.plans.HashedLinearLogit
          .hashedLinearLogit(col("ws"), "|qf", weights))
        .as[Long].head()
      assert(got == jvm(doc), s"doc='$doc' seed=$seed: $got != ${jvm(doc)}")
    }
  }
}
