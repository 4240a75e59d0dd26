package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import graft.core.EpochManifest
import graft.sources.{EpochStore, EpochStoreDv}

/** X99 — position-delta merge-on-read UPDATE/MERGE for identity-less
  * stores: the scan serves ROW LINEAGE (`_row_file` root-relative path
  * + `_row_pos` parquet row index), Spark's delta planner keys
  * delete(file, pos) / insert(row) on it, tasks journal positions under
  * `_dv/` and write reinserts through the normal writer, and ONE entry
  * commits both — O(matched) write, history byte-untouched, the DELETE
  * path's posture extended to updates. */
class DvUpdateSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_dvu").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(root: String): Set[(String, Long, Long)] = {
    val fs = hfs(root)
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .flatMap(s =>
          if (s.isDirectory) walk(s.getPath)
          else Seq((s.getPath.toString, s.getLen, s.getModificationTime)))
    EpochManifest.entries(spark, root)
      .flatMap(e => walk(new org.apache.hadoop.fs.Path(s"$root/${e.dir}")))
      .toSet
  }

  private def dvOn[A](body: => A): A = {
    spark.conf.set(EpochStoreDv.EnabledConf, "true")
    try body finally spark.conf.unset(EpochStoreDv.EnabledConf)
  }

  test("row lineage: _row_file/_row_pos serve a distinct per-row " +
      "position, file paths are root-relative, and the combination " +
      "refuses on rowid stores and in CDC mode") {
    import spark.implicits._
    val wh = tmp()
    cat("dvu1", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    EpochStore.write((100 until 200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    val rows = spark.sql(
      "SELECT id, _row_file, _row_pos FROM dvu1.t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 200)
    assert(rows.map(r => (r._2, r._3)).distinct.length == 200,
      "every row must carry a distinct (file, pos)")
    val dirs = EpochManifest.entries(spark, root).map(_.dir).toSet
    assert(rows.forall(r => dirs.contains(r._2.takeWhile(_ != '/'))),
      s"lineage paths must lead with the entry dir: ${rows.head._2}")
    assert(rows.forall(_._3 >= 0L))
    // positions are file-relative ordinals: each file's set is 0..n-1
    rows.groupBy(_._2).foreach { case (f, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq,
        s"file $f positions must be dense ordinals")
    }
    // rowid store: lineage refuses (equality deltas own that path)
    val root2 = s"$wh/rid"
    EpochStore.write((0 until 5).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root2, 0L)
    graft.sources.EpochStoreDelta.declare(spark, root2, Seq("id"))
    val e = intercept[Exception](
      spark.sql("SELECT _row_pos FROM dvu1.rid").collect())
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msg.contains("row-lineage"), msg)
    // CDC mode: lineage refuses too
    val e2 = intercept[Exception](
      spark.sql("SELECT _row_pos, _change_type FROM dvu1.t").collect())
    val msg2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msg2.contains("row-lineage"), msg2)
  }

  test("a position-delta UPDATE answers exactly like the CoW twin with " +
      "history byte-untouched, O(matched) journal + reinserts in ONE " +
      "entry; time travel serves pre-update; compact folds it all") {
    import spark.implicits._
    val wh = tmp()
    cat("dvu2", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 300).map(i => (i.toLong, i * 10L))
      .toDF("id", "n"), root, 0L)
    val before = dataFiles(root)
    val gPre = EpochManifest.generations(spark, root).last

    dvOn { spark.sql("UPDATE dvu2.t SET n = n + 1 WHERE id < 40") }

    val got = spark.sql("SELECT id, n FROM dvu2.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 300).map(i =>
      (i.toLong, if (i < 40) i * 10L + 1 else i * 10L)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // ONE new entry carrying BOTH the journal and the reinserts
    val es = EpochManifest.entries(spark, root)
    assert(es.size == 2, s"entries: ${es.map(_.dir)}")
    val delta = es.maxBy(_.epoch)
    assert(delta.dv.nonEmpty, "the journal must ride the manifest entry")
    val fs = hfs(root)
    val dvPaths = EpochStoreDv.dvFiles(fs, root, delta.dir).map(_.toString)
    assert(spark.read.parquet(dvPaths: _*).count() == 40L,
      "O(matched) positions")
    // history dirs byte-untouched (the delta entry's files are new)
    assert(before.subsetOf(dataFiles(root)),
      "no pre-update data file may move or rewrite")
    // time travel: pre-update generation intact
    assert(spark.sql(
      s"SELECT sum(n) FROM dvu2.t VERSION AS OF $gPre").head.getLong(0)
      == (0 until 300).map(_ * 10L).sum)
    // compact applies + sheds; answers unchanged
    spark.sql("CALL dvu2.system.compact('t')").collect()
    assert(EpochManifest.entries(spark, root).forall(_.dv.isEmpty))
    assert(spark.sql("SELECT id, n FROM dvu2.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("a position-delta MERGE updates matched rows and inserts new " +
      "ones across partition dirs; the CDC feed carries the update as " +
      "full-payload delete + insert events") {
    import spark.implicits._
    val wh = tmp()
    cat("dvu3", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 60).map(i =>
      (i.toLong, i * 2L, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "n", "lang"), root, 0L, partitionColumn = "lang")
    val g1 = EpochManifest.generations(spark, root).last
    Seq((10L, 1000L, "fr"), (11L, 1100L, "fr"), (200L, 9L, "fr"))
      .toDF("id", "n", "lang").createOrReplaceTempView("dvu3_src")
    dvOn {
      spark.sql(
        """MERGE INTO dvu3.t t USING dvu3_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET n = s.n, lang = s.lang
          |WHEN NOT MATCHED THEN INSERT (id, n, lang)
          |  VALUES (s.id, s.n, s.lang)""".stripMargin)
    }
    val got = spark.sql("SELECT id, n, lang FROM dvu3.t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = (0 until 60).map { i =>
      if (i == 10) (10L, 1000L, "fr")
      else if (i == 11) (11L, 1100L, "fr")
      else (i.toLong, i * 2L, if (i % 2 == 0) "en" else "de")
    }.toSet + ((200L, 9L, "fr"))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the updated rows MOVED partition dirs (en/de -> fr) with zero
    // rewrite of the old dirs — positions + reinserts only
    val es = EpochManifest.entries(spark, root)
    assert(es.maxBy(_.epoch).dv.nonEmpty)
    // CDC: the identity-less feed carries the update as a full-payload
    // delete (old row) + insert (new row); the pure insert stays insert
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val feed = EpochStore.readChanges(spark, root, schema, g1,
        partitionColumn = "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    val wantFeed = Set(
      (10L, 20L, "en", "delete"), (11L, 22L, "de", "delete"),
      (10L, 1000L, "fr", "insert"), (11L, 1100L, "fr", "insert"),
      (200L, 9L, "fr", "insert"))
    assert(feed == wantFeed,
      s"extra=${feed -- wantFeed} missing=${wantFeed -- feed}")
  }

  test("a position-delta UPDATE composes over LIVE prior journals: " +
      "dead rows are never re-matched, both journals apply") {
    import spark.implicits._
    val wh = tmp()
    cat("dvu5", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, i * 10L))
      .toDF("id", "n"), root, 0L)
    dvOn {
      spark.sql("DELETE FROM dvu5.t WHERE id >= 90")
      // the update's scan runs WITH the live journal applied — ids
      // 90+ are dead and must not reinsert through the update
      spark.sql("UPDATE dvu5.t SET n = 0 WHERE id >= 80")
    }
    val got = spark.sql("SELECT id, n FROM dvu5.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 90).map(i =>
      (i.toLong, if (i >= 80) 0L else i * 10L)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    spark.sql("CALL dvu5.system.compact('t')").collect()
    assert(spark.sql("SELECT id, n FROM dvu5.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("a position-delta UPDATE over a MIXED-SPEC snapshot (X99 ∘ X92): " +
      "foreign-layout targets journal by position, reinserts land under " +
      "the current layout, answers exact") {
    import spark.implicits._
    val wh = tmp()
    cat("dvu6", wh)
    val root = s"$wh/t"
    // epoch 0 under identity(lang); then evolve to bucket(4, id) —
    // the old entry reads through a foreign-layout profile
    EpochStore.write((0 until 60).map(i =>
      (i.toLong, i * 2L, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "n", "lang"), root, 0L, partitionColumn = "lang")
    spark.sql("CALL dvu6.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    spark.sql("INSERT INTO dvu6.t VALUES " +
      (100 until 112).map(i =>
        s"($i, ${i * 2}, '${if (i % 2 == 0) "en" else "de"}')")
        .mkString(", "))
    dvOn {
      spark.sql("UPDATE dvu6.t SET n = n + 1 WHERE id < 5 OR id >= 110")
    }
    val got = spark.sql("SELECT id, n, lang FROM dvu6.t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val ids = (0 until 60).map(_.toLong) ++ (100 until 112).map(_.toLong)
    val want = ids.map { i =>
      val n = if (i < 5 || i >= 110) i * 2 + 1 else i * 2
      (i, n, if (i % 2 == 0) "en" else "de")
    }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the journal targeted BOTH the foreign-layout entry and the
    // bucketed one; compact normalizes everything
    assert(EpochManifest.entries(spark, root).maxBy(_.epoch).dv.nonEmpty)
    spark.sql("CALL dvu6.system.compact('t')").collect()
    assert(spark.sql("SELECT id, n, lang FROM dvu6.t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet == want)
  }

  test("position-delta DELETE handles conditions the metadata path " +
      "cannot translate (subquery) at O(matched); racing commits " +
      "refuse the strict snapshot") {
    import spark.implicits._
    val wh = tmp()
    cat("dvu4", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    Seq(3L, 4L, 5L).toDF("kill").createOrReplaceTempView("dvu4_kill")
    dvOn {
      spark.sql(
        "DELETE FROM dvu4.t WHERE id IN (SELECT kill FROM dvu4_kill)")
    }
    assert(spark.sql("SELECT count(*) FROM dvu4.t").head.getLong(0) == 97L)
    val es = EpochManifest.entries(spark, root)
    // the untranslatable DELETE routed through the position-delta op:
    // one journal entry, zero data rewrites
    assert(es.maxBy(_.epoch).dv.nonEmpty,
      s"subquery DELETE must journal positions: ${es.map(e =>
        (e.dir, e.dv))}")
    assert(es.size == 2)
  }
}
