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

  /** `events.ts` has shipped in two physical parquet layouts, so the load
    * dispatches on the observed Spark type rather than assuming either:
    *
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) — current fixtures. Spark
    *    reads TIMESTAMP_NTZ; we cast to TimestampType (session TZ is UTC
    *    everywhere in this repo, so the cast is wall-clock identity and the
    *    DuckDB oracle's `CAST(ts AS TIMESTAMP)` sees the same instants).
    *  - TIMESTAMP(NANOS) — older fixtures. Spark's parquet reader has no
    *    TimestampType mapping for NANOS at all; with
    *    `spark.sql.legacy.parquet.nanosAsLong` it surfaces as raw-nanos
    *    LongType, which we truncate to µs. Integer `div`, not `/`: DuckDB
    *    TRUNCATES ns→µs, and double division would round ~12% of rows
    *    1 µs high and diverge from the oracle.
    *
    * Post-load contract (asserted in CatalogSpec): `ts` is TimestampType.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // Set once and never restored: the conf is required for the NANOS
    // layout and inert for every other table/layout. (A set-then-restore
    // was racy — concurrent plan-building threads could observe the
    // restore mid-read and fail the scan.)
    Tables.synchronized {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = read(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
