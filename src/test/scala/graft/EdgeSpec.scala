package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, Udfs, VectorOps}
import graft.plans.CosineSimilarity

/** Edge-case pinning: behaviors at the boundaries that the catalog queries
  * don't reach with the fixture data. */
class EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("price parser edges: no-space, uppercase diacritics, unit-first, bare number") {
    val cases = Seq(
      "3.65tỷ"        -> Some(3650000000L), // no space before unit
      "GIÁ 2,1 TỶ"    -> Some(2100000000L), // uppercase with diacritic
      "tỷ 5"          -> None,              // unit before number → no match
      "chỉ 500"       -> None,              // bare number, no unit
      "0.5 tỷ"        -> Some(500000000L),
      ""              -> None)
    cases.foreach { case (s, expect) =>
      assert(Option(Udfs.parsePriceVnd(s)).map(_.toLong) == expect, s"scala: [$s]")
    }
    // the Catalyst twin agrees on every edge
    val df = cases.map(_._1).toDF("t")
      .select(Udfs.priceVndNative(col("t")).as("n"), Udfs.priceVndUdf(col("t")).as("u"))
    df.collect().zip(cases).foreach { case (r, (s, expect)) =>
      assert(Option(r.get(0)).map(_.asInstanceOf[Long]) == expect, s"native: [$s]")
      assert(r.get(0) == r.get(1), s"native != udf for [$s]")
    }
  }

  test("cosine of a zero vector: HOF form is null, codegen form is 0.0 (pinned)") {
    // ANSI mode (Spark 4 default) throws on unguarded division by zero —
    // this test originally CAUGHT that in the HOF form; both forms now
    // degrade instead of crashing
    val df = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    val hof = df.select(VectorOps.cosine(col("a"), col("b"))).head
    val gen = df.select(CosineSimilarity.cosineSim(col("a"), col("b"))).head.getDouble(0)
    assert(hof.isNullAt(0)) // guarded: no similarity defined for a zero vector
    assert(gen == 0.0)      // the ANN form maps it to "matches nothing"
  }

  test("shingles of a doc shorter than n fall back to the full text") {
    val out = Seq("hello", "a b").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("sh")).collect()
    assert(out(0).getSeq[String](0) == Seq("hello"))
    assert(out(1).getSeq[String](0) == Seq("a b"))
  }

  test("salted aggregation ignores null values like the direct form") {
    val df = Seq(("k", Some(1.0)), ("k", None), ("k", Some(3.0)))
      .toDF("g", "v")
    val direct = df.groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("n")).head
    val salted = graft.core.Skew.saltedSumCount(df, "g", "v", 4, Seq("v")).head
    assert(direct.getDouble(1) == salted.getDouble(1)) // sum skips nulls in both
    assert(direct.getLong(2) == salted.getLong(2))     // count counts all rows
  }

  test("language ID prefers the first profile on exact ties") {
    // 'de' appears in both the French ("de") and Spanish ("de") profiles;
    // a text with only "de" ties fr/es — fr wins (profile order)
    val out = Seq("de de de").toDF("text")
      .select(TextOps.langId(col("text"))).head.getString(0)
    assert(out == "fr")
  }

  test("multimodal resize leaves non-images and small images untouched") {
    val m = graft.multimodal.Multimodal.syntheticMedia(spark, 50)
    val before = m.collect().map(x => x.media_id -> x).toMap
    graft.multimodal.Multimodal.resizeImages(m, 10000).collect().foreach { x =>
      val b = before(x.media_id)
      assert(x.width == b.width && x.height == b.height &&
        x.content.length == b.content.length)
    }
  }
}
