package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout utilities for the 100 TB posture: date-partitioned
  * layouts for pruning, bucketed tables for exchange-free co-located
  * joins, and the layout conventions every sink in the engine follows.
  *
  * Layout rules:
  *  - fact tables: partition by a low-cardinality time column
  *    (`ingest_date`) → partition pruning turns time-range queries into
  *    directory listings;
  *  - join-heavy tables: bucket by the join key with identical bucket
  *    counts on both sides → SortMergeJoin with NO shuffle exchange
  *    (verified by PlanAudit);
  *  - never `coalesce(1)` in engine paths; file sizing is the writer's
  *    `maxRecordsPerFile` / AQE's job.
  */
object IO {

  /** Date-partitioned parquet sink (the engine's default fact layout). */
  def writePartitioned(df: DataFrame, out: String, dateCol: String): Unit =
    df.write.mode("overwrite").partitionBy(dateCol).parquet(out)

  /** Read with a partition predicate — prunes at the directory level
    * (PartitionFilters in the scan, not a data filter). */
  def readPartition(spark: SparkSession, path: String, dateCol: String,
                    date: String): DataFrame =
    spark.read.parquet(path).filter(col(dateCol) === date)

  /** Upsert (latest-version-wins merge) — the reference's implicit
    * multi-day semantic: a listing re-crawled on a later day supersedes
    * the earlier record with the same id (`CrawlData.py` re-runs land in
    * new date partitions; A1 dedup keeps one per id). Without a
    * table-format MERGE this is union + per-key argmax: one shuffle on
    * the key. Version TIES resolve to the update side (priority 1 > 0) —
    * a same-day re-crawl must win deterministically; tiebreaking on the
    * key would be vacuous (it's constant within the group). */
  def upsert(existing: DataFrame, updates: DataFrame, key: String,
             versionCol: String): DataFrame = {
    val all = existing.withColumn("_prio", lit(0))
      .unionByName(updates.withColumn("_prio", lit(1)))
    val others = all.columns.filter(c => c != key && c != "_prio")
    all.groupBy(col(key))
      .agg(
        max_by(struct(others.map(col): _*), struct(col(versionCol), col("_prio"))).as("_r"))
      .select(col(key) +: others.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** Small-files control: bound rows per output file (the 100 TB sink
    * problem is too MANY files, not too few — a 10k-task job writing
    * per-task files melts the namenode/listing path). Pair with AQE
    * coalescing; never `coalesce(1)`. */
  def writeCompacted(df: DataFrame, out: String, maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(out)

  /** Bucketed table sink: co-locates rows by join key so equal-bucketed
    * joins skip the exchange entirely. Requires a table catalog (works
    * with the default in-memory catalog + spark.sql.warehouse.dir). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — drop BOTH or re-creation fails with
    // LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      // extra sort columns serve ordering-hungry operators (e.g. the
      // as-of join's (key, ts) requirement) straight off the scan
      .sortBy(key, sortCols: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — the plan this
    * produces (SortMergeJoin, zero Exchange) is the point. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      col(leftKey) === col(rightKey))
}
