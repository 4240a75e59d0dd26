package graft

import graft.core.EpochManifest
import graft.sources.{EpochStore, EpochStoreDelta, EpochStoreDv}

/** `MERGE … WHEN NOT MATCHED BY SOURCE` (the Spark 4 three-way merge)
  * through all three row-level paths — group-based copy-on-write,
  * equality-delta merge-on-read (declared rowid), and position-delta
  * merge-on-read (identity-less under DV mode). The SCD-style sync
  * (delete/update target rows the source no longer carries) must see
  * EVERY target row — including entries the ON condition's source keys
  * never touch — with first-matching-clause-wins ordering, and the
  * delta paths must stay delta-sized: tombstones/journal positions for
  * exactly the touched rows, never a history rewrite. */
class MergeBySourceSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_nmbs").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Entry 0: ids 0..9 (n = id*10); entry 1: ids 100..109 — the source
    * keys only ever touch entry 0, so entry 1's rows reach the merge
    * exclusively through the by-source clauses. */
  private def build(wh: String): Unit = {
    import spark.implicits._
    EpochStore.write((0 until 10).map(i => (i.toLong, i * 10L))
      .toDF("id", "n"), s"$wh/t", 0L)
    EpochStore.write((100 until 110).map(i => (i.toLong, i * 10L))
      .toDF("id", "n"), s"$wh/t", 1L)
  }

  /** Matched updates (1, 2), an insert (500), an UPDATE-by-source
    * clause flagging every id >= 100 and a DELETE-by-source clause for
    * ids 8..9 — clause order decides rows matching both conditions. */
  private def runMerge(c: String): Set[(Long, Long)] = {
    import spark.implicits._
    Seq((1L, 111L), (2L, 222L), (500L, 555L)).toDF("id", "n")
      .createOrReplaceTempView(s"${c}_src")
    spark.sql(
      s"""MERGE INTO $c.t t USING ${c}_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET n = s.n
         |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.n)
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 100 THEN UPDATE SET n = -1
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN DELETE
         |""".stripMargin)
    spark.sql(s"SELECT id, n FROM $c.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private val want: Set[(Long, Long)] =
    (0 until 8).filterNot(i => i == 1 || i == 2)
      .map(i => (i.toLong, i * 10L)).toSet ++
      Set((1L, 111L), (2L, 222L), (500L, 555L)) ++
      (100 until 110).map(i => (i.toLong, -1L)).toSet

  test("copy-on-write: by-source clauses reach rows of entries the " +
      "source never keys into; the pre-merge snapshot stays " +
      "time-travelable") {
    val wh = tmp()
    cat("nmb1", wh)
    build(wh)
    val root = s"$wh/t"
    val gPre = EpochManifest.generations(spark, root).last
    assert(runMerge("nmb1") == want)
    // one atomic generation; the pre-merge snapshot intact behind it
    assert(spark.sql(
      s"SELECT sum(n) FROM nmb1.t VERSION AS OF $gPre").head.getLong(0)
      == (0 until 10).map(_ * 10L).sum + (100 until 110).map(_ * 10L).sum)
  }

  test("equality-delta: by-source actions land in ONE delta epoch, " +
      "delta-sized — tombstones == touched rows, history entries " +
      "byte-untouched") {
    val wh = tmp()
    cat("nmb2", wh)
    build(wh)
    val root = s"$wh/t"
    EpochStoreDelta.declare(spark, root, Seq("id"))
    val entriesPre = EpochManifest.entries(spark, root).map(_.dir).toSet
    assert(runMerge("nmb2") == want)
    val es = EpochManifest.entries(spark, root)
    assert(entriesPre.subsetOf(es.map(_.dir).toSet),
      "history entries must survive a MoR by-source merge untouched")
    val delta = es.maxBy(_.epoch)
    val fs = hfs(root)
    val tombs = EpochStoreDelta.tombstoneFiles(fs, root, delta.dir)
      .map(_.toString)
    // 2 matched updates + 10 by-source updates + 2 by-source deletes
    assert(spark.read.parquet(tombs: _*).count() == 14L,
      "one tombstone per touched row, nothing else")
    // reinserts: 2 matched + 10 by-source updates + 1 insert
    assert(spark.read.parquet(s"$root/${delta.dir}").count() == 13L)
  }

  test("position-delta: by-source actions journal positions for " +
      "exactly the touched rows in ONE entry — history dirs " +
      "byte-untouched") {
    val wh = tmp()
    cat("nmb3", wh)
    build(wh)
    val root = s"$wh/t"
    val entriesPre = EpochManifest.entries(spark, root).map(_.dir).toSet
    spark.conf.set(EpochStoreDv.EnabledConf, "true")
    try {
      assert(runMerge("nmb3") == want)
      val es = EpochManifest.entries(spark, root)
      assert(entriesPre.subsetOf(es.map(_.dir).toSet),
        "history entries must survive a position-delta by-source merge")
      val journals = es.filter(_.dv.nonEmpty)
      assert(journals.size == 1, "one journal entry for the statement")
      val fs = hfs(root)
      val dvPaths = journals.flatMap(e =>
        EpochStoreDv.dvFiles(fs, root, e.dir)).map(_.toString)
      // one dead position per touched row: 2 + 10 + 2
      assert(spark.read.parquet(dvPaths: _*).count() == 14L)
      // reinserted data rows ride the same entry: 2 + 10 + 1
      assert(spark.read.parquet(s"$root/${journals.head.dir}").count()
        == 13L)
    } finally spark.conf.unset(EpochStoreDv.EnabledConf)
  }

  test("a by-source-only MERGE (no matched/insert clauses) behaves as " +
      "the SCD sync primitive on every path") {
    import spark.implicits._
    for ((c, mode) <- Seq(("nmb4", "cow"), ("nmb5", "eq"), ("nmb6", "dv"))) {
      val wh = tmp()
      cat(c, wh)
      build(wh)
      val root = s"$wh/t"
      if (mode == "eq") EpochStoreDelta.declare(spark, root, Seq("id"))
      if (mode == "dv") spark.conf.set(EpochStoreDv.EnabledConf, "true")
      try {
        Seq((0L, 0L), (100L, 0L)).toDF("id", "n")
          .createOrReplaceTempView(s"${c}_keep")
        // delete everything the source no longer carries
        spark.sql(
          s"""MERGE INTO $c.t t USING ${c}_keep s ON t.id = s.id
             |WHEN NOT MATCHED BY SOURCE THEN DELETE
             |""".stripMargin)
        assert(spark.sql(s"SELECT id FROM $c.t").collect()
          .map(_.getLong(0)).toSet == Set(0L, 100L),
          s"path $mode must keep exactly the source-present rows")
      } finally if (mode == "dv") spark.conf.unset(EpochStoreDv.EnabledConf)
    }
  }
}
