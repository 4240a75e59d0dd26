package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import java.nio.file.Files

class MultimodalSpec extends SparkSpec {

  test("feature extraction: fixed dim, deterministic, partition-invariant") {
    val media = Multimodal.syntheticMedia(spark, 200)
    val a = Multimodal.extractFeatures(media).collect()
    assert(a.length == 200)
    assert(a.forall(_.feature.length == Multimodal.FeatureDim))
    val b = Multimodal.extractFeatures(media.repartition(7)).collect()
    val am = a.map(f => f.media_id -> f.feature.toSeq).toMap
    val bm = b.map(f => f.media_id -> f.feature.toSeq).toMap
    assert(am == bm) // decode depends on content only, not partitioning
  }

  test("inference batches never exceed BatchSize and cover every row") {
    val media = Multimodal.syntheticMedia(spark, 200).repartition(3)
    val sizes = Multimodal.extractFeatures(media).collect().map(_.batch_size)
    assert(sizes.forall(s => s >= 1 && s <= Multimodal.BatchSize))
    assert(sizes.count(_ == Multimodal.BatchSize) > 0) // full batches dominate
  }

  test("resize: metadata tracks payload, aspect preserved, idempotent") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val resized = Multimodal.resizeImages(media, 128)
    val imgs = resized.filter(_.kind == "image").collect()
    assert(imgs.forall(m => math.max(m.width, m.height) <= 128))
    val twice = Multimodal.resizeImages(resized, 128).filter(_.kind == "image")
      .collect().map(m => m.media_id -> (m.width, m.height, m.content.length)).toMap
    val once = imgs.map(m => m.media_id -> (m.width, m.height, m.content.length)).toMap
    assert(once == twice)
  }

  test("frame sampling picks every k-th chunk") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(spark, 30), 64, 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(_.frame.length <= 64))
  }

  test("binaryFile ingestion reads payloads back byte-exact") {
    val dir = Files.createTempDirectory("graft_media").toString
    val payload = Array.tabulate(1024)(i => (i % 251).toByte)
    Files.write(java.nio.file.Paths.get(s"$dir/a.bin"), payload)
    val df = Multimodal.readMediaDir(spark, dir)
    val row = df.head
    assert(row.getAs[Long]("length") == 1024L)
    assert(row.getAs[Array[Byte]]("content").sameElements(payload))
  }

  test("feature profile query is stable across runs") {
    val a = Multimodal.featureProfile(spark, sf0001).collect()
    val b = Multimodal.featureProfile(spark, sf0001).collect()
    assert(a.sameElements(b))
    assert(a.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
  }

  test("media dedup finds exactly the planted copies: exact at 0, corruptions under 12") {
    val pairs = Multimodal.mediaDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // each planted duplicate pairs with its original and nothing else
    assert(pairs.map(p => (p._1, p._2)).toSeq ==
      (0L until 10L).map(i => (i, i + 10000L)),
      s"wrong pair set: ${pairs.mkString(", ")}")
    // exact copies at hamming 0; sparse corruptions strictly positive but
    // separated by a wide margin from unrelated payloads (~32 expected)
    pairs.foreach { case (m1, _, d) =>
      if (m1 < 5) assert(d == 0, s"exact copy $m1 at hamming $d")
      else assert(d > 0 && d <= 12, s"corruption $m1 at hamming $d")
    }
  }

  test("incremental media probe reaches the same decision as the one-shot dedup") {
    val once = Multimodal.mediaDedup(spark, sf0001).collect().map(_.toSeq).toSeq
    val incr = Multimodal.mediaDedupIncr(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(incr == once)
  }

  test("a retried media epoch does not probe its own previous attempt's signatures") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_media_retry").toString
    val baseSigs = spark.range(300)
      .map(i => (i.toLong, Multimodal.mediaSimhash64(
        Multimodal.dedupPayload(i, pert = false))))
      .toDF("media_id", "sig")
    Multimodal.appendMediaIndex(baseSigs, s"$dir/idx", epoch = 0L)
    // stream epoch 0's batch: two copies of base payload 3
    val batch = spark.createDataset(Seq(
        (30001L, Multimodal.mediaSimhash64(Multimodal.dedupPayload(3L, pert = false))),
        (30002L, Multimodal.mediaSimhash64(Multimodal.dedupPayload(3L, pert = false)))))
      .toDF("media_id", "sig")
    def probe(maxEpoch: Long) =
      Multimodal.mediaDedupAgainstIndex(batch, s"$dir/idx", 12, maxEpoch)
        .select("m1", "m2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val firstAttempt = probe(maxEpoch = 0L)
    // first attempt appended epoch 1 then crashed before checkpoint commit
    Multimodal.appendMediaIndex(batch, s"$dir/idx", epoch = 1L)
    val unbounded = probe(maxEpoch = Long.MaxValue)
    assert(unbounded.exists(p => p._1 >= 30001L),
      s"expected the unbounded retry to self-match (fixture lost its teeth): $unbounded")
    assert(probe(maxEpoch = 0L) == firstAttempt)
    assert(firstAttempt == Set((3L, 30001L), (3L, 30002L)),
      s"unexpected first-attempt pairs: $firstAttempt")
  }

  test("streaming media ingest dedups later batches against streamed history") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_media_ingest").toString
    // base index: the 300 organic payloads at epoch 0
    val baseSigs = spark.range(300)
      .map(i => (i.toLong, Multimodal.mediaSimhash64(
        Multimodal.dedupPayload(i, pert = false))))
      .toDF("media_id", "sig")
    Multimodal.appendMediaIndex(baseSigs, s"$dir/idx", epoch = 0L)
    val fresh = Multimodal.dedupPayload(900L, pert = false) // not in the base
    val in = MemoryStream[(Long, Array[Byte])]
    def run(): Unit =
      graft.streaming.Jobs.mediaIngest(in.toDF().toDF("media_id", "content"),
        s"$dir/idx", s"$dir/out", s"$dir/cp").awaitTermination(60000)
    // batch 1: an exact copy of base payload 3, plus the fresh payload
    in.addData((30001L, Multimodal.dedupPayload(3L, pert = false)), (30002L, fresh))
    run()
    // batch 2: a sparse corruption of the STREAMED fresh payload (only
    // findable if batch 1 extended the index), plus a corruption of base 7
    val freshPert = fresh.clone()
    var j = 0
    while (j < freshPert.length) {
      freshPert(j) = (((freshPert(j) & 0xff) + 1) % 251).toByte; j += 128
    }
    in.addData((30003L, freshPert),
      (30004L, Multimodal.dedupPayload(7L, pert = true)))
    run()
    val pairs = spark.read.parquet(s"$dir/out")
      .select(col("m1"), col("m2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 30001L)), s"base copy not caught: $pairs")
    assert(pairs.contains((7L, 30004L)), s"second-batch corruption not caught: $pairs")
    assert(pairs.contains((30002L, 30003L)),
      s"streamed-history near-dup not caught — index did not grow: $pairs")
    assert(!pairs.exists(_._2 == 30002L), s"fresh payload false-matched: $pairs")
  }
}
