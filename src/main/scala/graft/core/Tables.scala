package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata layout (`<sfDir>/<name>.parquet`,
  * see /root/repo/TESTDATA.md). Plain parquet scans so Catalyst gets full
  * filter pushdown / column pruning; no caching here — each query owns
  * its plan.
  */
object Tables {
  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame   = read(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = read(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = read(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = read(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * does not map to TimestampType. We read it as raw nanos (LongType) via
    * `spark.sql.legacy.parquet.nanosAsLong` and convert to a microsecond
    * TimestampType column. The nanos are NOT µs-aligned, and DuckDB's
    * `CAST(ts AS TIMESTAMP)` TRUNCATES ns→µs — so the division here must
    * be integer `div` (truncation), not `/` (double division, rounds to
    * nearest: ~12% of rows would land 1 µs high and diverge from the
    * oracle).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Set once and never restored: reading NANOS as long is the only way
    // Spark's parquet reader handles this physical type at all, and the
    // conf is inert for every other table. (A set-then-restore here was
    // racy — concurrent plan-building threads could observe the restore
    // mid-read and fail the scan.)
    Tables.synchronized {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    read(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
