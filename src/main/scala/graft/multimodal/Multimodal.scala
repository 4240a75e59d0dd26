package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction / resize / frame sampling as partition-local batch
  * operators.
  *
  * The DECODE STEP IS A STUB: the container has no image/audio codecs, so
  * `decodeStub` derives a deterministic fake from the bytes. Everything
  * around it — schema, binaryFile ingestion, `mapPartitions` with
  * fixed-size inference batches, partitioning strategy — is the real
  * Spark plumbing a production pipeline would keep, swapping only the
  * function body for a codec/model call.
  *
  * Scale posture: payloads stay in executors end-to-end (no collect); the
  * inference batch shape (`BatchSize`) amortizes per-call model overhead;
  * repartition by media_id spreads variable-size payloads; for on-disk
  * media dirs, `spark.read.format("binaryFile")` with
  * `spark.sql.files.maxPartitionBytes` sized to a few payloads per task.
  */
object Multimodal {

  /** One media object: payload + the typed metadata a real pipeline
    * carries alongside (never re-derive width/height from bytes at query
    * time). */
  case class Media(media_id: Long, kind: String, mime: String,
                   width: Int, height: Int, duration_ms: Long,
                   content: Array[Byte])

  /** Fixed-dimension feature row produced by the (stubbed) encoder. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           batch_size: Int, feature: Array[Float])

  val FeatureDim = 16
  val BatchSize = 64

  /** Deterministic synthetic media corpus (id-seeded payload bytes) —
    * stands in for a crawled media bucket. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video"
      val len = 256 + (i * 37 % 512).toInt
      val bytes = Array.tabulate(len)(j => ((i * 131 + j * 17) % 251).toByte)
      val (w, h, d) = kind match {
        case "image" => (64 + (i % 16).toInt * 32, 64 + (i % 9).toInt * 32, 0L)
        case "audio" => (0, 0, 1000L + i % 60000)
        case _       => (320, 240, 2000L + i % 120000)
      }
      Media(i, kind, s"application/x-fake-$kind", w, h, d, bytes)
    }
  }

  /** THE STUB: a real implementation calls the codec/model here
    * (e.g. JPEG decode + CNN forward). Deterministic byte-derived fake
    * keeps the contract (fixed FeatureDim, value depends on content
    * only) testable without the libs. */
  private def decodeStub(content: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < content.length) {
      f(i % FeatureDim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Feature extraction with inference batching: each partition is
    * processed in `BatchSize` groups — the shape a model runtime wants —
    * without materializing the partition. Records the batch size each row
    * rode in so tests can assert the shape. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // a real impl would run ONE model call on the whole batch here
        batch.map(m => MediaFeatures(m.media_id, m.kind, m.content.length,
          batch.size, decodeStub(m.content)))
      }
    }
  }

  /** Resize stub: deterministic payload transform + metadata update in
    * one pass (a real impl decodes, scales, re-encodes). Keeps the
    * invariant that metadata always matches the payload. */
  def resizeImages(media: Dataset[Media], maxSide: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image" || math.max(m.width, m.height) <= maxSide) m
      else {
        val scale = maxSide.toDouble / math.max(m.width, m.height)
        val nw = math.max(1, (m.width * scale).toInt)
        val nh = math.max(1, (m.height * scale).toInt)
        val nlen = math.max(1, (m.content.length * scale * scale).toInt)
        m.copy(width = nw, height = nh,
          content = java.util.Arrays.copyOf(m.content, nlen))
      }
    }
  }

  /** Frame sampling for video payloads: every k-th fixed-size chunk —
    * the chunking/explode plumbing of real frame extraction. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[Media], frameBytes: Int, every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, idx) if idx % every == 0 => Frame(m.media_id, idx, chunk) }
    }
  }

  /** Ingest an on-disk media directory via Spark's binaryFile source —
    * the real entry point for crawled image/audio dumps. */
  def readMediaDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))

  /** The ORACLED slice of the multimodal family: the binary layer.
    * Per-payload byte profile — length, byte sum, and md5 of the
    * lowercase hex spelling (DuckDB's md5 takes VARCHAR only, so the
    * digest rides the hex string; one flipped byte anywhere still flips
    * the hash). [[syntheticMedia]]'s payloads are pure integer
    * arithmetic, so DuckDB rebuilds them digit-for-digit and the driver
    * hash-checks that the typed-Dataset plumbing (case-class encoder,
    * map, binary column round-trip) delivers exactly the declared
    * bytes. The DECODE stub stays rows-only — this proves the layer
    * beneath it. */
  def byteProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    syntheticMedia(spark, 300)
      .map(m => (m.media_id, m.kind, m.content.length,
        m.content.foldLeft(0L)((a, b) => a + (b & 0xff)),
        m.content.map(b => f"${b & 0xff}%02x").mkString))
      .toDF("media_id", "kind", "n_bytes", "byte_sum", "hx")
      .select(col("media_id"), col("kind"), col("n_bytes").cast("long").as("n_bytes"),
        col("byte_sum"), md5(col("hx")).as("hex_md5"))
      .orderBy("media_id")
  }

  val byteProfileSql: String =
    """WITH m AS (
      |  SELECT i AS media_id,
      |    CASE WHEN i % 3 = 0 THEN 'image'
      |         WHEN i % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    256 + (i * 37 % 512) AS len
      |  FROM range(0, 300) t(i)
      |), b AS (
      |  SELECT media_id, kind, len,
      |    string_agg(format('{:02x}', (media_id * 131 + j * 17) % 251), '' ORDER BY j) AS hx,
      |    SUM((media_id * 131 + j * 17) % 251) AS byte_sum
      |  FROM m, (SELECT unnest(range(0, len)) AS j)
      |  GROUP BY media_id, kind, len
      |)
      |SELECT media_id, kind, CAST(len AS BIGINT) AS n_bytes,
      |  CAST(byte_sum AS BIGINT) AS byte_sum, md5(hx) AS hex_md5
      |FROM b
      |ORDER BY media_id""".stripMargin

  /** Rows-only catalog query: synthesize → batch-extract → profile per
    * kind. Deterministic, so the driver's rows-only check is stable; no
    * SQL oracle (binary payloads + custom features). */
  def featureProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats = extractFeatures(syntheticMedia(spark, 300).repartition(8, col("media_id")))
    feats.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        aggregate(col("feature"), lit(0.0d), (acc, x) => acc + x.cast("double")).as("feat_sum"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("feat_sum").cast("decimal(28,6)")).cast("double").as("feat_mass"))
      .orderBy("kind")
  }
}
