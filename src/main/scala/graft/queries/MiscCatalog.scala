package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Parity._

/** Remaining operator-class coverage: pivot, generator word-count, exact
  * percentiles, ordered string aggregation, time-range join, correlated
  * scalar subquery through the spark.sql API, and max_by/argmax.
  */
object MiscCatalog {

  /** Pivot (wide aggregation): order totals by priority × status. */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))
      .orderBy("o_orderpriority")

  val pivotStatusSql: String =
    s"""SELECT o_orderpriority,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Generator (F9): explode tokens → corpus word count → top-20. */
  def wordTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  val wordTopKSql: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word ASC
      |LIMIT 20""".stripMargin

  /** Exact interpolated percentiles per group (the dashboards' median). */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Ordered string aggregation: nations per region as a sorted CSV. */
  def stringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("r_name")
  }

  val stringAggSql: String =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Time-range join (J1 range variant): per-user event pairs within 10
    * minutes — hash join on user_id with the range as a residual filter,
    * never a cross product. */
  def eventPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val a = e.select(col("user_id"), col("event_id").as("id1"),
      col("ts").as("ts1"), col("event_type").as("t1"))
    val b = e.select(col("user_id"), col("event_id").as("id2"),
      col("ts").as("ts2"), col("event_type").as("t2"))
    a.join(b, Seq("user_id"))
      .filter(col("id1") < col("id2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("t1", "t2")
  }

  val eventPairsSql: String =
    """SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_pairs
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |WHERE a.event_id < b.event_id
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '10 minutes'
      |GROUP BY t1, t2
      |ORDER BY t1, t2""".stripMargin

  /** Correlated scalar subquery through the spark.sql entry point
    * (Catalyst decorrelates it into an aggregate + join): orders above
    * 1.8× their customer's decimal-exact average. */
  def sqlScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM v_orders o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM v_orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val sqlScalarSubquerySql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.8 * (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** max_by/argmax: richest customer per segment, deterministic composite
    * ordering (acctbal, custkey). */
  def argmax(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("top_customer"),
        max(col("c_acctbal")).as("top_bal"))
      .orderBy("c_mktsegment")

  val argmaxSql: String =
    """SELECT c_mktsegment, c_name AS top_customer, c_acctbal AS top_bal
      |FROM customer
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                           ORDER BY c_acctbal DESC, c_custkey DESC) = 1
      |ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot"         -> (pivotStatus _),
    "q_word_topk"     -> (wordTopK _),
    "q_percentiles"   -> (percentiles _),
    "q_string_agg"    -> (stringAgg _),
    "q_event_pairs"   -> (eventPairs _),
    "q_sql_subquery"  -> (sqlScalarSubquery _),
    "q_argmax"        -> (argmax _)
  )

  val oracle: Map[String, String] = Map(
    "q_pivot"         -> pivotStatusSql,
    "q_word_topk"     -> wordTopKSql,
    "q_percentiles"   -> percentilesSql,
    "q_string_agg"    -> stringAggSql,
    "q_event_pairs"   -> eventPairsSql,
    "q_sql_subquery"  -> sqlScalarSubquerySql,
    "q_argmax"        -> argmaxSql
  )
}
