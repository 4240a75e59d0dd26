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

  test("approx_count_distinct within 10% of exact on lineitem") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val exact = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
