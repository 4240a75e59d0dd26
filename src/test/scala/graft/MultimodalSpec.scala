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
}
