package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.core.Listings
import java.nio.file.Files

/** Listing-pipeline unit + golden tests (SURVEY.md §5.2-5.3). */
class CoreSpec extends SparkSpec {

  private def mkRaw(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_))), Listings.rawSchema)

  private def ad(price: java.lang.Long, area: java.lang.Integer,
                 images: Seq[String] = null): Row =
    Row(1L, "t", "d", price, area, "r", "dist", "w", "s",
      1.0, 2.0, null, 1010, 1765500000000L, images)

  test("P2 truthiness guard: ppm2 null iff price null/zero or area not positive") {
    val cases = Seq(
      (ad(100L, 4), Some(25.0)),       // normal
      (ad(null, 4), None),             // null price
      (ad(0L, 4), None),               // zero price — Python truthiness, not SQL division
      (ad(100L, null), None),          // null area
      (ad(100L, 0), None),             // zero area
      (ad(100L, -5), None),            // negative area fails area > 0
      (ad(-100L, 4), Some(-25.0)))     // negative price is truthy → computed
    val out = Listings.fromRaw(mkRaw(cases.map(_._1)))
      .select("price_per_m2").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == cases.map(_._2.map(_.asInstanceOf[Any])))
  }

  test("F2 images default: missing array counts as 0, not null") {
    val out = Listings.fromRaw(mkRaw(Seq(ad(1L, 1, null), ad(1L, 1, Seq("a", "b")))))
      .select("images").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 2))
  }

  test("P3 validity filter drops null ad payloads") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null), Row(ad(1L, 1)))), Listings.rawSchema)
    assert(Listings.fromRaw(raw).count() == 1)
  }

  test("golden: reference run has 317 unique listings with exact ppm2 identity") {
    val df = Listings.readJson(spark, Listings.ReferenceRun).cache()
    assert(df.count() == 317)
    assert(df.select("id").distinct().count() == 317)
    // stored price_per_m2 recomputes exactly from price/area_m2 (0 mismatches)
    val mismatches = df.filter(
      Listings.guardedPpm2(col("price"), col("area_m2")) =!= col("price_per_m2") ||
        (Listings.guardedPpm2(col("price"), col("area_m2")).isNull !== col("price_per_m2").isNull))
      .count()
    assert(mismatches == 0)
    // area_m2 is functionally determined by district (SURVEY.md §1.2 quirk)
    val fd = df.groupBy("district").agg(countDistinct("area_m2").as("n"))
      .filter(col("n") > 1).count()
    assert(fd == 0)
    df.unpersist()
  }

  test("P5 bad-record handling: PERMISSIVE captures corrupt rows, DROPMALFORMED drops") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val dir = Files.createTempDirectory("graft_bad").toString
    Files.write(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      ("""{"id": 1, "title": "ok", "price": 100}""" + "\n" +
       """this is not json""" + "\n" +
       """{"id": 2, "title": "also ok", "price": 200}""" + "\n").getBytes("UTF-8"))
    val s = StructType(Listings.schema.fields :+ StructField("_corrupt_record", StringType))
    val permissive = spark.read.schema(s)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/in.jsonl").cache()
    assert(permissive.count() == 3)
    val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getAs[Any]("id") == null)
    permissive.unpersist()
    val dropped = spark.read.schema(Listings.schema)
      .option("mode", "DROPMALFORMED")
      .json(s"$dir/in.jsonl")
    assert(dropped.count() == 2)
  }

  test("CSV sink/source round-trip preserves multiline unicode descriptions") {
    val df = Listings.readJson(spark, Listings.ReferenceRun)
    val dir = Files.createTempDirectory("graft_csv").toString
    Listings.writeCsv(df, s"$dir/out")
    val back = Listings.readCsv(spark, s"$dir/out")
    assert(back.count() == 317)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("JSON sink partitions by ingest_date") {
    val df = Listings.readJson(spark, Listings.ReferenceRun).limit(10)
    val dir = Files.createTempDirectory("graft_json").toString
    Listings.writeJson(df, s"$dir/out", "2025-12-12")
    assert(new java.io.File(s"$dir/out/ingest_date=2025-12-12").isDirectory)
    val back = spark.read.schema(Listings.schema).json(s"$dir/out/ingest_date=2025-12-12")
    assert(back.count() == 10)
  }
}
