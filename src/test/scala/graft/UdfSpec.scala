package graft

import org.apache.spark.sql.functions._
import graft.core.Listings
import graft.functions.Udfs

class UdfSpec extends SparkSpec {

  test("price parser unit cases") {
    assert(Udfs.parsePriceVnd("chỉ 3.65 tỷ VHOCP") == 3650000000L)
    assert(Udfs.parsePriceVnd("giá 2,1 tỷ") == 2100000000L)
    assert(Udfs.parsePriceVnd("cho thuê 4.5 triệu/tháng") == 4500000L)
    assert(Udfs.parsePriceVnd("Bán gấp 900 triệu") == 900000000L)
    assert(Udfs.parsePriceVnd("60m2 không giá") == null)
    assert(Udfs.parsePriceVnd(null) == null)
    // first match wins
    assert(Udfs.parsePriceVnd("1.2 tỷ hoặc 900 triệu") == 1200000000L)
  }

  test("UDF and Catalyst-native twin agree on every reference title") {
    val t = Listings.readJson(spark, Listings.ReferenceRun).select("id", "title")
    val diff = t.select(
        Udfs.priceVndUdf(col("title")).as("u"),
        Udfs.priceVndNative(col("title")).as("n"))
      .filter(col("u") =!= col("n") || (col("u").isNull !== col("n").isNull))
      .count()
    assert(diff == 0)
    // and the parse actually fires on a meaningful share of titles
    val hits = t.select(Udfs.priceVndNative(col("title")).as("p"))
      .filter(col("p").isNotNull).count()
    assert(hits > 50, s"only $hits/317 titles parsed") // 81 titles carry a price string
  }

  test("weighted mean matches direct decimal computation and ignores order") {
    import spark.implicits._
    val df = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 6.0)).toDF("x", "w")
    val got = df.agg(Udfs.weightedMean(col("x"), col("w"))).head.getDouble(0)
    assert(math.abs(got - 25.0) < 1e-12)
    val shuffled = df.repartition(4).agg(Udfs.weightedMean(col("x"), col("w"))).head.getDouble(0)
    assert(got == shuffled)
  }
}
