package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Listings
import Parity._

/** Reference-parity queries over the reference's own crawl run
  * (`/root/reference/data_input/house/2025-12-12`, 317 records) — the
  * implemented half of the reference's capability surface (SURVEY.md §2
  * IMPL rows). These ignore `sfDir`: the fixture is the reference data
  * itself. DuckDB oracles read the same files via `read_json`.
  *
  * `price` semantics vary by category (monthly rent for 1050, sale price
  * otherwise — SURVEY.md §1.2), so aggregates always group or filter by
  * `category`.
  */
object ListingCatalog {

  /** Integer-typed columns come back BIGINT from DuckDB's read_json, so the
    * query projection casts them up; the library schema stays Int. All
    * three queries share the once-per-session landed columnar frame. */
  private def listings(spark: SparkSession): DataFrame =
    Listings.normalized(spark)

  /** The full normalization pipeline (S1→P1-P3→A1 read-side): read the
    * per-record JSON run, dedup by id, re-derive the guarded ppm2. */
  def normalize(spark: SparkSession, sfDir: String): DataFrame =
    listings(spark)
      .withColumn("price_per_m2", Listings.guardedPpm2(col("price"), col("area_m2")))
      .select(
        col("id"), col("title"), col("description"), col("price"),
        col("area_m2").cast("long").as("area_m2"),
        col("price_per_m2"), col("region"), col("district"), col("ward"),
        col("street"), col("lat"), col("lng"), col("property_type"),
        col("category").cast("long").as("category"),
        col("post_time"),
        col("images").cast("long").as("images"))
      .orderBy("id")

  private val refJson = s"read_json('${Listings.ReferenceRun}/house_*.json')"

  // deterministic per-id representative — must spell the exact ordering
  // Listings.dedup uses or a fixture with differing duplicate payloads
  // would hash-flake (see dedupEvents for the same rule on events)
  private val dedupQualify = Listings.dedupQualifySql

  val normalizeSql: String =
    s"""SELECT id, title, description, price, area_m2,
       |  CASE WHEN price IS NOT NULL AND price <> 0 AND area_m2 > 0
       |       THEN CAST(price AS DOUBLE) / area_m2 END AS price_per_m2,
       |  region, district, ward, street, lat, lng,
       |  CAST(property_type AS VARCHAR) AS property_type,
       |  category, post_time, images
       |FROM $refJson
       |$dedupQualify
       |ORDER BY id""".stripMargin

  /** A3 (the declared dashboard aggregates): per-district/category listing
    * stats. Grouping by category keeps the mixed price units honest. */
  def districtAgg(spark: SparkSession, sfDir: String): DataFrame =
    listings(spark)
      .groupBy(col("district"), col("category").cast("long").as("category"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("price")).as("total_price"),
        (sum(col("price")).cast("double") / count(lit(1))).as("avg_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
      .orderBy("district", "category")

  val districtAggSql: String =
    s"""SELECT district, category, COUNT(*) AS n,
       |  CAST(SUM(price) AS BIGINT) AS total_price,
       |  CAST(CAST(SUM(price) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_price,
       |  MIN(price) AS min_price, MAX(price) AS max_price
       |FROM (SELECT * FROM $refJson $dedupQualify)
       |GROUP BY district, category
       |ORDER BY district, category""".stripMargin

  /** §2.5 over the listing table: top-3 most expensive sale listings per
    * district (rent category 1050 excluded — different unit). */
  def topPerDistrict(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("district"))
      .orderBy(col("price").desc, col("id").asc)
    listings(spark)
      .filter(col("category").isin(1010, 1020, 1040))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("district"), col("rn"), col("id"), col("price"))
      .orderBy("district", "rn")
  }

  val topPerDistrictSql: String =
    s"""SELECT district, rn, id, price FROM (
       |  SELECT district, id, price,
       |    ROW_NUMBER() OVER (PARTITION BY district
       |                       ORDER BY price DESC, id ASC) AS rn
       |  FROM (SELECT * FROM $refJson $dedupQualify)
       |  WHERE category IN (1010, 1020, 1040)
       |)
       |WHERE rn <= 3
       |ORDER BY district, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_listing_normalize"    -> (normalize _),
    "q_listing_district_agg" -> (districtAgg _),
    "q_listing_top_district" -> (topPerDistrict _)
  )

  val oracle: Map[String, String] = Map(
    "q_listing_normalize"    -> normalizeSql,
    "q_listing_district_agg" -> districtAggSql,
    "q_listing_top_district" -> topPerDistrictSql
  )
}
