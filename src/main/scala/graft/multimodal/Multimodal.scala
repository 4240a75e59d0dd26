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

  /** Payload for the media-dedup corpus: md5-derived bytes, so distinct
    * ids give statistically independent content (the [[syntheticMedia]]
    * LCG payloads are all rotations of ONE cyclic sequence — every pair
    * is a structural near-dup, useless for testing a detector). `pert`
    * bumps one byte per 128 — a sparse corruption standing in for
    * re-encoding noise. */
  private[graft] def dedupPayload(i: Long, pert: Boolean): Array[Byte] = {
    val ln = 256 + (i * 37 % 512).toInt
    val b = Array.tabulate(ln) { j =>
      java.lang.Long.remainderUnsigned(
        graft.functions.TextOps.md5Upper64(s"$i|$j"), 251L).toByte
    }
    if (pert) {
      var j = 0
      while (j < ln) { b(j) = (((b(j) & 0xff) + 1) % 251).toByte; j += 128 }
    }
    b
  }

  /** Byte-level simhash: votes over md5-hashed overlapping 4-byte grams
    * (hex-spelled — the TextOps discipline, so DuckDB rebuilds the exact
    * signature). With real codecs this would be a perceptual hash over
    * decoded pixels/spectra; the gram signature is the honest analog on
    * the layer below the stub, and the banding/verify machinery is
    * identical either way. */
  def mediaSimhash64(content: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j + 3 < content.length) {
      val sb = new java.lang.StringBuilder(8)
      var t = 0
      while (t < 4) { sb.append(f"${content(j + t) & 0xff}%02x"); t += 1 }
      val h = graft.functions.TextOps.md5Upper64(sb.toString)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Near-duplicate media detection over the binary layer
    * (`q_media_dedup`) — the multimodal member of the dedup family:
    * byte-gram simhash per payload, banded 8×8 (pigeonhole: hamming ≤ 7
    * always shares a band; the planted corruptions measure ≤ 9 and all
    * share bands), within-band candidates verified by exact
    * hamming ≤ 12. Planted: 5 exact copies (ids 10000-10004) and 5
    * sparse corruptions (ids 10005-10009); unrelated md5-derived
    * payloads measure hamming ≥ ~25, so the detector separates cleanly
    * and the driver hash-checks the whole decision. Scale shape: the
    * signature is one narrow pass, the join shuffles (band, key) pairs —
    * never O(n²) payload comparisons; payload bytes never shuffle at
    * all. */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = spark.range(300)
      .map(i => (i.toLong, dedupPayload(i, pert = false)))
    val exact = spark.range(5)
      .map(i => (i + 10000L, dedupPayload(i, pert = false)))
    val near = spark.range(5, 10)
      .map(i => (i + 10000L, dedupPayload(i, pert = true)))
    val sigs = base.union(exact).union(near)
      .map { case (id, c) => (id, mediaSimhash64(c)) }
      .toDF("media_id", "sig")
    val bands = mediaBandsOf(sigs)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("m1"), col("y.media_id").as("m2"),
        graft.functions.TextOps.hamming(col("x.sig"), col("y.sig")).as("dist"))
      .filter(col("dist") <= 12)
      .dropDuplicates("m1", "m2")
      .orderBy("m1", "m2")
  }

  val mediaDedupSql: String =
    """WITH m AS (
      |  SELECT i AS media_id, i AS orig, 256 + (i * 37 % 512) AS len, FALSE AS pert
      |  FROM range(0, 300) t(i)
      |  UNION ALL SELECT i + 10000, i, 256 + (i * 37 % 512), FALSE FROM range(0, 5) t(i)
      |  UNION ALL SELECT i + 10000, i, 256 + (i * 37 % 512), TRUE FROM range(5, 10) t(i)
      |), byts AS (
      |  SELECT media_id, j,
      |    CAST(CASE WHEN pert AND j % 128 = 0
      |         THEN (md5_number_upper(CAST(orig AS VARCHAR) || '|' || CAST(j AS VARCHAR)) % 251 + 1) % 251
      |         ELSE md5_number_upper(CAST(orig AS VARCHAR) || '|' || CAST(j AS VARCHAR)) % 251 END
      |      AS BIGINT) AS v
      |  FROM m, (SELECT unnest(range(0, len)) AS j)
      |), g AS (
      |  SELECT media_id, j,
      |    md5_number_upper(format('{:02x}{:02x}{:02x}{:02x}', v,
      |      lead(v, 1) OVER w, lead(v, 2) OVER w, lead(v, 3) OVER w)) AS h
      |  FROM byts
      |  WINDOW w AS (PARTITION BY media_id ORDER BY j)
      |  QUALIFY lead(v, 3) OVER w IS NOT NULL
      |), votes AS (
      |  SELECT media_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vt
      |  FROM g, range(0, 64) r(b)
      |  GROUP BY media_id, b
      |), acc AS (
      |  SELECT media_id, SUM(CASE WHEN vt > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS u
      |  FROM votes GROUP BY media_id
      |), sg AS (
      |  SELECT media_id,
      |    CAST(u - CASE WHEN u >= 9223372036854775808::HUGEINT
      |                  THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS sig
      |  FROM acc
      |), bands AS (
      |  SELECT media_id, sig, b AS band, (sig >> CAST(b * 8 AS INTEGER)) & 255 AS key
      |  FROM sg, range(0, 8) r(b)
      |)
      |SELECT DISTINCT x.media_id AS m1, y.media_id AS m2,
      |  CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS dist
      |FROM bands x JOIN bands y
      |  ON x.band = y.band AND x.key = y.key AND x.media_id < y.media_id
      |WHERE bit_count(xor(x.sig, y.sig)) <= 12
      |ORDER BY m1, m2""".stripMargin

  /** Band explosion of a (media_id, sig) frame — shared by the one-shot
    * [[mediaDedup]] self-join and the incremental probe. */
  private def mediaBandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("media_id"), col("sig"),
      explode(expr("transform(sequence(0, 7), b -> " +
        "struct(b AS band, shiftright(sig, b * 8) & 255 AS key))")).as("bk"))
      .select(col("media_id"), col("sig"), col("bk.band"), col("bk.key"))

  /** The shared incremental probe: historical bands are only ever
    * SCANNED, the new batch's bands BROADCAST into a narrow hash
    * probe — hamming verification needs nothing but the signatures
    * already in the index (unlike text MinHash, which re-reads stored
    * shingles for the exact-Jaccard verify). */
  private def mediaProbe(histBands: DataFrame, newSigs: DataFrame,
      maxDist: Int): DataFrame =
    histBands.as("x")
      .join(broadcast(mediaBandsOf(newSigs).as("y")),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.media_id").as("m1"), col("y.media_id").as("m2"),
        graft.functions.TextOps.hamming(col("x.sig"), col("y.sig")).as("dist"))
      .filter(col("dist") <= maxDist)
      .dropDuplicates("m1", "m2")
      .orderBy("m1", "m2")

  /** The media signature index's manifest-store root and row shape —
    * a snapshot-isolated [[graft.core.EpochManifest]] store since r11,
    * like the text band index and the IVF-PQ codes store. */
  def mediaBandsRoot(indexDir: String): String = s"$indexDir/bands"

  val mediaBandsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sig",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType)))

  /** Persist (or extend) the media signature band index — the stored
    * form of the banding [[mediaDedup]] computes in-session. Each epoch
    * is an immutable attempt dir committed by an atomic manifest rename,
    * so streaming retries replace their own entry ([[graft.streaming
    * .Jobs.mediaIngest]] exactly-once semantics) and a concurrent probe
    * keeps its snapshot. */
  private[graft] def appendMediaIndex(sigs: DataFrame, indexDir: String,
      epoch: Long): Unit =
    graft.core.EpochManifest.append(mediaBandsOf(sigs),
      mediaBandsRoot(indexDir), epoch)

  /** Probe a persisted media index with a new batch's signatures —
    * history never shuffles; each arriving batch costs one index scan
    * plus a broadcast. `maxEpoch` bounds the history to index epochs
    * <= maxEpoch (partition-pruned): [[graft.streaming.Jobs.mediaIngest]]
    * extends the index before its checkpoint commits, so a retried batch
    * would otherwise probe an index already holding its own signatures
    * and emit self-pairs (m1 == m2, dist 0) — the ingest passes its
    * stream epoch so a retry reads exactly what the first attempt read. */
  def mediaDedupAgainstIndex(newSigs: DataFrame, indexDir: String,
      maxDist: Int = 12, maxEpoch: Long = Long.MaxValue): DataFrame =
    mediaProbe(
      // r13: the signature index reads through the DSv2 connector
      // (pinned manifest scan, maxEpoch pruned at planning)
      graft.sources.EpochStore.read(newSigs.sparkSession,
        mediaBandsRoot(indexDir), mediaBandsSchema, maxEpoch = maxEpoch),
      newSigs, maxDist)

  /** Incremental media dedup (`q_media_dedup_incr`) — the probe-shaped
    * twin of [[mediaDedup]], mirroring the text family's
    * `q_doc_dedup_incr`: the historical signature index is only ever
    * SCANNED (at 100 TB it is the persisted band index; re-shuffling it
    * per arriving batch is the anti-pattern), while the new batch's
    * bands BROADCAST into a narrow hash probe. Same planted batch as
    * [[mediaDedup]], so the decision is identical — what this query
    * oracle-checks is the incremental JOIN SHAPE producing it. */
  def mediaDedupIncr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val histSigs = spark.range(300)
      .map(i => (i.toLong, mediaSimhash64(dedupPayload(i, pert = false))))
      .toDF("media_id", "sig")
    val newSigs = spark.range(10)
      .map(i => (i + 10000L,
        mediaSimhash64(dedupPayload(i, pert = i >= 5))))
      .toDF("media_id", "sig")
    mediaProbe(mediaBandsOf(histSigs), newSigs, maxDist = 12)
  }

  val mediaDedupIncrSql: String = {
    val derived = mediaDedupSql.replace(
      "ON x.band = y.band AND x.key = y.key AND x.media_id < y.media_id",
      "ON x.band = y.band AND x.key = y.key\n" +
        "  AND x.media_id < 10000 AND y.media_id >= 10000")
    // the derivation is a literal-string replace: if the join-condition
    // line in mediaDedupSql is ever reworded the replace silently no-ops
    // and the incremental oracle reverts to one-shot semantics — which
    // this fixture cannot distinguish, so fail loudly instead
    require(derived != mediaDedupSql,
      "mediaDedupIncrSql derivation no-oped: the join-condition line in " +
        "mediaDedupSql changed without updating the replace target")
    derived
  }

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
