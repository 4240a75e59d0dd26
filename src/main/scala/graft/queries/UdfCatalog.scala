package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Listings, Tables}
import graft.functions.Udfs

/** F8/A6 surface queries: the Vietnamese price-string parser (UDF and its
  * codegen-native twin) over the reference titles, and the custom
  * weighted-mean Aggregator over lineitem.
  */
object UdfCatalog {

  private def titles(spark: SparkSession): DataFrame =
    Listings.normalized(spark).select(col("id"), col("title"))

  /** F8: Scala UDF price parse. */
  def udfPriceParse(spark: SparkSession, sfDir: String): DataFrame =
    titles(spark)
      .select(col("id"), Udfs.priceVndUdf(col("title")).as("price_vnd"))
      .orderBy("id")

  /** Same semantics, pure Catalyst built-ins (stays in codegen). */
  def nativePriceParse(spark: SparkSession, sfDir: String): DataFrame =
    titles(spark)
      .select(col("id"), Udfs.priceVndNative(col("title")).as("price_vnd"))
      .orderBy("id")

  private val priceParseSql: String =
    s"""WITH t AS (
       |  SELECT id, lower(title) AS lt FROM read_json('${Listings.ReferenceRun}/house_*.json')
       |  ${Listings.dedupQualifySql}
       |), m AS (
       |  SELECT id,
       |    NULLIF(regexp_extract(lt, '([0-9]+(?:[.,][0-9]+)?)\\s*(tỷ|triệu)', 1), '') AS num,
       |    regexp_extract(lt, '([0-9]+(?:[.,][0-9]+)?)\\s*(tỷ|triệu)', 2) AS unit
       |  FROM t
       |)
       |SELECT id,
       |  CAST(ROUND(CAST(replace(num, ',', '.') AS DOUBLE) *
       |             CASE unit WHEN 'tỷ' THEN 1000000000 ELSE 1000000 END) AS BIGINT) AS price_vnd
       |FROM m
       |ORDER BY id""".stripMargin

  /** A6: weighted mean via the custom Aggregator — avg discount weighted by
    * quantity, per return flag. */
  def udafWeightedMean(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        Udfs.weightedMean(col("l_discount"), col("l_quantity")).as("wavg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val udafWeightedMeanSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wavg_disc,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_price_parse"    -> (udfPriceParse _),
    "q_native_price_parse" -> (nativePriceParse _),
    "q_udaf_weighted_mean" -> (udafWeightedMean _)
  )

  val oracle: Map[String, String] = Map(
    "q_udf_price_parse"    -> priceParseSql,
    "q_native_price_parse" -> priceParseSql,
    "q_udaf_weighted_mean" -> udafWeightedMeanSql
  )
}
