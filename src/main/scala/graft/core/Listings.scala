package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's one table — the real-estate listing — as a Spark-native
  * module: explicit schema, nested-raw flattening, guarded derivations, and
  * date-partitioned sinks.
  *
  * Semantics replicated from `/root/reference/CrawlData.py`:
  *  - 16-column flat schema fixed by `extract_one` (CrawlData.py:71-88),
  *    every field nullable (dict `.get` semantics).
  *  - P1 flatten/rename of the nested API payload `raw["ad"]`
  *    (CrawlData.py:62-65): `subject`→`title`, `body`→`description`,
  *    `area_name`→`district`, etc.
  *  - P2 truthiness-guarded derivation (CrawlData.py:67-69):
  *    `price_per_m2 = price/area` only when price is non-null AND non-zero
  *    AND area > 0 — Python truthiness makes `price == 0` yield null, which
  *    plain SQL division would not.
  *  - P3 validity filter (CrawlData.py:62-63,126): drop records whose `ad`
  *    payload is missing.
  *  - F2 (CrawlData.py:87): `images = len(ad.get("images", []))` — missing
  *    array counts as 0, hence `coalesce(size(...), 0)`.
  *  - F5 (CrawlData.py:86): `post_time` is epoch milliseconds.
  *  - §1.3 storage: date-partitioned JSON + header CSV with multiline
  *    quoted fields.
  *
  * Scale note: the reference writes one pretty-printed JSON file per record
  * (CrawlData.py:129-134) — an artifact of row-at-a-time Python. Reading
  * that layout needs `multiLine=true`, which makes files non-splittable; at
  * 100 TB the engine's own sink writes JSONL (the Spark default), which
  * splits and parallelizes. Both read paths are provided.
  */
object Listings {

  /** Directory of the reference's one real crawl run (317 records). */
  val ReferenceRun = "/root/reference/data_input/house/2025-12-12"

  /** The 16-column listing schema (SURVEY.md §1.2), all nullable. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("price", LongType),
    StructField("area_m2", IntegerType),
    StructField("price_per_m2", DoubleType),
    StructField("region", StringType),
    StructField("district", StringType),
    StructField("ward", StringType),
    StructField("street", StringType),
    StructField("lat", DoubleType),
    StructField("lng", DoubleType),
    StructField("property_type", StringType),
    StructField("category", IntegerType),
    StructField("post_time", LongType),
    StructField("images", IntegerType)))

  /** Schema of the raw chotot detail payload — only the fields the
    * extractor touches (CrawlData.py:72-87). `images` is the raw array
    * (only its length survives extraction). */
  val adSchema: StructType = StructType(Seq(
    StructField("list_id", LongType),
    StructField("subject", StringType),
    StructField("body", StringType),
    StructField("price", LongType),
    StructField("area", IntegerType),
    StructField("region_name", StringType),
    StructField("area_name", StringType),
    StructField("ward_name", StringType),
    StructField("street_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("property_type", StringType),
    StructField("category", IntegerType),
    StructField("list_time", LongType),
    StructField("images", ArrayType(StringType))))

  /** Schema of a full detail-API response: `{"ad": {...}}`. */
  val rawSchema: StructType = StructType(Seq(StructField("ad", adSchema)))

  /** P2: the truthiness-guarded price-per-area derivation. Null unless
    * price is non-null and non-zero and area is strictly positive. */
  def guardedPpm2(price: Column, area: Column): Column =
    when(price.isNotNull && price =!= 0L && area.isNotNull && area > 0,
      price.cast(DoubleType) / area)
      .otherwise(lit(null).cast(DoubleType))

  /** P1+P3+F2+F5: flatten raw `{"ad": ...}` responses into the 16-column
    * listing shape. Pure column operations — fully codegen'd, no UDF. */
  def fromRaw(raw: DataFrame): DataFrame =
    raw.filter(col("ad").isNotNull)                          // P3
      .select(
        col("ad.list_id").as("id"),                          // P1 renames
        col("ad.subject").as("title"),
        col("ad.body").as("description"),
        col("ad.price").as("price"),
        col("ad.area").as("area_m2"),
        guardedPpm2(col("ad.price"), col("ad.area")).as("price_per_m2"), // P2
        col("ad.region_name").as("region"),
        col("ad.area_name").as("district"),
        col("ad.ward_name").as("ward"),
        col("ad.street_name").as("street"),
        col("ad.latitude").as("lat"),
        col("ad.longitude").as("lng"),
        col("ad.property_type").as("property_type"),
        col("ad.category").as("category"),
        col("ad.list_time").as("post_time"),                 // F5: epoch ms
        coalesce(size(col("ad.images")), lit(0)).as("images")) // F2
      // Deliberate engine-side strictness DEVIATION (not P3 parity): the
      // reference's extract_one keeps id-null records (a truthy dict even
      // when list_id is absent — CrawlData.py:71-88; only a missing "ad"
      // payload yields None). A keyless record can't be deduped, upserted,
      // or joined, so this engine drops it at the door instead.
      .filter(col("id").isNotNull)

  /** Read the per-record pretty-printed JSON layout (S3's output). Explicit
    * schema — never inference in production paths. The matching files are
    * enumerated driver-side and passed as an explicit list: handing Spark
    * the `house_*.json` glob makes the FileStreamSink metadata probe
    * stat the glob string itself, which fails and logs an error-shaped
    * stack on every first read of the directory (cosmetic, but it lands
    * in run logs looking like a failure). */
  def readJson(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/house_*.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .map(_.getPath.toString)
    require(files.nonEmpty, s"no house_*.json files under $dir")
    spark.read.schema(schema).option("multiLine", "true").json(files: _*)
  }

  /** Read the aggregate CSV (S4's output): header + UTF-8 + quoted
    * multiline descriptions. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      // the reference data has fields with trailing spaces ("Tựu Liệt ");
      // Spark's CSV reader trims them by default, which would break the
      // byte-exact round-trip the golden test asserts
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** A1: crawl pagination overlaps, so ids repeat — keep one row per id
    * (the reference dedupes with a set before fetching, CrawlData.py:32-34).
    *
    * DETERMINISTIC representative: `dropDuplicates` keeps an arbitrary
    * partitioning-dependent row per key, which only looks correct while
    * duplicate ids carry identical payloads. Instead keep the latest
    * `post_time`, tiebreaking on every remaining column — the same result
    * on any cluster and any partitioning (mirrors dedupEvents). */
  def dedup(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hasPost = df.columns.contains("post_time")
    val tiebreak = df.columns.filter(c => c != "id" && c != "post_time")
      .map(c => col(c).asc_nulls_first)
    val ordering =
      (if (hasPost) Seq(col("post_time").desc_nulls_last) else Nil) ++ tiebreak
    if (ordering.isEmpty) df.dropDuplicates("id") // key-only frame: rows identical
    else {
      val w = Window.partitionBy(col("id")).orderBy(ordering: _*)
      df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    }
  }

  /** The DuckDB spelling of [[dedup]]'s representative choice, for oracle
    * queries over the same data (NULLS pinned — Spark's ASC default is
    * NULLS FIRST, DuckDB's is NULLS LAST). */
  def dedupQualifySql: String = {
    val tiebreak = schema.fieldNames.filter(c => c != "id" && c != "post_time")
      .map(c => s"$c ASC NULLS FIRST").mkString(", ")
    s"QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY post_time DESC NULLS LAST, $tiebreak) = 1"
  }

  // bounded per-key memo: evicting an entry costs a re-land, and — ONLY
  // when the evicted session is stopped — deletes the aged-out landed dir
  // (an unbounded map would pin stopped sessions; exit-hook-only cleanup
  // would accumulate orphan dirs on a long-lived multi-session JVM). A
  // LIVE session's dir is left alone: DataFrames it already returned
  // still scan it, and deleting it under them fails their re-execution
  // with FileNotFound (MemoSpec proves the 5-concurrent-session case);
  // the per-dir exit hook below is the backstop for those. The land
  // itself runs outside the shared lock.
  private val landedRun = new BoundedMemo[SparkSession, String](4)((spark, dir) =>
    if (spark.sparkContext.isStopped)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit)

  /** The one normalized listing frame every downstream query shares: the
    * reference run read ONCE per session, deduped, and landed as parquet
    * in a temp dir, with subsequent calls scanning the columnar copy.
    * Reading the reference's layout costs per-file driver listing plus a
    * non-splittable task per pretty-printed multiLine file — measured at
    * multiple seconds of pure overhead for 317 tiny files, and it was
    * paid again by every query that touched listings. Landing mirrors
    * the engine's own architecture (raw crawl → landed store → queries):
    * the ingest cost is paid exactly once, which is also the only shape
    * that survives a 100 TB crawl archive. The landed dir is deleted on
    * JVM exit. */
  def normalized(spark: SparkSession): DataFrame = {
    val dir = landedRun.get(spark) {
      val d = java.nio.file.Files.createTempDirectory("graft_listings_landed")
      dedup(readJson(spark, ReferenceRun)).write.mode("overwrite").parquet(d.toString)
      // exit-hook backstop for entries never evicted (deleteQuietly on an
      // already-evicted dir is a no-op, so the two cleanups coexist)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
      d.toString
    }
    spark.read.parquet(dir)
  }

  /** S3 engine-side: date-partitioned JSONL sink (splittable at scale,
    * unlike the reference's one-pretty-file-per-record layout). */
  def writeJson(df: DataFrame, out: String, ingestDate: String): Unit =
    df.withColumn("ingest_date", lit(ingestDate))
      .write.mode("overwrite").partitionBy("ingest_date").json(out)

  /** S4 engine-side: header CSV with quoted multiline fields. No
    * `coalesce(1)` — single-file output is a harness concern, not an
    * engine semantic. */
  def writeCsv(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      // Spark's CSV writer ALSO trims by default — same round-trip hazard
      // as the reader (see readCsv)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
}
