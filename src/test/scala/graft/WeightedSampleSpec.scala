package graft

import org.apache.spark.sql.functions._
import graft.core.Sampling
import graft.functions.TextOps

/** Hash-derandomized A-ES weighted sampling
  * ([[graft.core.Sampling.weightedTopK]]): the column expression must
  * agree with the JVM twin exactly, respect the domain rules (positive
  * weights only), and actually implement the A-ES inclusion law
  * (heavier rows sampled more often — checked over many salts with the
  * JVM twin, which IS the sampling function, not a statistical model
  * of it). */
class WeightedSampleSpec extends SparkSpec {

  /** JVM replay of the exact sampler: top-k ids per group by
    * ln(md5Uniform(id|salt))/w, ties broken by ascending id. */
  private def jvmSample(rows: Seq[(Long, String, Long)], k: Int,
                        salt: String): Map[String, Seq[Long]] =
    rows.filter(_._3 > 0)
      .groupBy(_._2)
      .map { case (g, rs) =>
        g -> rs.map { case (id, _, w) =>
            (id, math.log(TextOps.md5Uniform(s"$id$salt")) / w.toDouble) }
          .sortBy { case (id, key) => (-key, id) }
          .take(k).map(_._1)
      }

  test("column sampler == JVM twin on a planted corpus, ranks in key order") {
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      (i.toLong, s"g${i % 4}", (i % 7 + 1).toLong))
    val got = Sampling.weightedTopK(
        rows.toDF("id", "g", "w"), "id", "g", "w", 10, "|spec")
      .select(col("g"), col("aes_rank"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val expected = jvmSample(rows, 10, "|spec")
    assert(got.groupBy(_._1).forall { case (g, rs) =>
      rs.sortBy(_._2).map(_._3).toSeq == expected(g) },
      s"mismatch vs JVM replay")
    assert(got.length == 40) // 4 groups × k=10
  }

  test("null and non-positive weights are excluded; short groups keep all rows") {
    import spark.implicits._
    val df = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 5L), (2L, "a", 0L), (3L, "a", -2L), (4L, "a", null),
      (5L, "b", 1L), (6L, "b", 2L)
    ).toDF("id", "g", "w")
    val got = Sampling.weightedTopK(df, "id", "g", "w", 10, "|x")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L, 6L)) // only positive-weight rows survive
  }

  test("A-ES inclusion law: inclusion frequency is monotone in weight (JVM, 400 salts)") {
    // 30 rows, weights 1 / 5 / 25 by thirds; k=10 of 30 sampled per salt.
    // The count of times each weight class is sampled must be strictly
    // ordered — this runs the REAL sampler 400 times, so it is a law of
    // the construction, not a flaky statistical bound (Bin(4000, p)
    // classes separated by >2x in p cannot cross at these counts).
    val rows = (0 until 30).map(i => (i.toLong, "g", Seq(1L, 5L, 25L)(i / 10)))
    val counts = Array(0, 0, 0)
    (0 until 400).foreach { s =>
      jvmSample(rows, 10, s"|mono$s")("g")
        .foreach(id => counts((id / 10).toInt) += 1)
    }
    assert(counts(0) < counts(1) && counts(1) < counts(2),
      s"inclusion not monotone in weight: ${counts.toSeq}")
  }

  test("determinism: two plans, identical sample") {
    val a = graft.queries.TextCatalog.weightedSample(spark, sf0001).collect().toSeq
    val b = graft.queries.TextCatalog.weightedSample(spark, sf0001).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
