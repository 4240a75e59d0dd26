package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import graft.core.EpochManifest
import graft.sources.{EpochStore, EpochStoreDv}

/** X94 — position-delete (deletion-vector) merge-on-read for
  * identity-less stores: a predicate DELETE under
  * `spark.graft.deleteVectors.enabled` writes the matched rows'
  * (file, ordinal) positions into one new `_dv` entry — history dirs
  * byte-untouched, O(matched) write — and the scan drops the dead
  * ordinals through the parquet row index. Compaction applies and
  * sheds them; file-moving operations refuse while they live. */
class DvDeleteSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_dv").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Every data file under the entry dirs: (path, len, mtime). */
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

  test("a DV DELETE answers exactly like the CoW twin with history dirs " +
      "byte-untouched and O(matched) positions written; all-dead " +
      "entries still drop metadata-only; time travel serves pre-delete") {
    import spark.implicits._
    val wh = tmp()
    cat("dv1", wh)
    val root = s"$wh/t"
    def rows(off: Int) = (0 until 300).map { i =>
      val id = (i + off).toLong
      (id, id * 10, if (i % 3 == 0) "en" else "de")
    }.toDF("id", "n", "lang")
    EpochStore.write(rows(0), root, 0L, partitionColumn = "lang")
    EpochStore.write(rows(300), root, 1L, partitionColumn = "lang")
    // epoch 2: an all-xx entry the partition-aligned delete below can
    // PROVE dead from its dirs alone
    EpochStore.write((1000 until 1010).map(i => (i.toLong, i * 10L, "xx"))
      .toDF("id", "n", "lang"), root, 2L, partitionColumn = "lang")
    val before = dataFiles(root)
    val gPre = EpochManifest.generations(spark, root).last

    dvOn { spark.sql("DELETE FROM dv1.t WHERE id >= 100 AND id < 250") }
    // answers exact
    val got = spark.sql("SELECT id FROM dv1.t").collect()
      .map(_.getLong(0)).toSet
    val want = ((0L until 600L) ++ (1000L until 1010L))
      .filterNot(id => id >= 100 && id < 250).toSet
    assert(got == want,
      s"missing=${want -- got} extra=${got -- want}")
    assert(spark.sql("SELECT sum(n) FROM dv1.t").head.getLong(0) ==
      want.map(_ * 10).sum)
    // history dirs byte-untouched — every pre-delete data file survives
    // identically; only the new _dv entry appeared
    val after = dataFiles(root)
    assert(before.subsetOf(after), "no data file may move or rewrite")
    assert((after -- before).isEmpty,
      s"the DV entry holds no data files: ${after -- before}")
    // O(matched): the positions file records exactly the matched count
    val fs = hfs(root)
    val dvEntry = EpochManifest.entries(spark, root).maxBy(_.epoch)
    val dvPaths = EpochStoreDv.dvFiles(fs, root, dvEntry.dir)
      .map(_.toString)
    assert(dvPaths.nonEmpty, "the delete must land a _dv entry")
    assert(spark.read.parquet(dvPaths: _*).count() == 150L)
    // time travel: the pre-delete generation still serves every row
    assert(spark.sql(
      s"SELECT count(*) FROM dv1.t VERSION AS OF $gPre").head.getLong(0)
      == 610L)

    // a PARTITION-ALIGNED all-dead delete stays metadata-only even with
    // DVs live: the xx entry drops from the manifest, nothing rewrites,
    // no new positions land
    val nEntries = EpochManifest.entries(spark, root).size
    dvOn { spark.sql("DELETE FROM dv1.t WHERE lang = 'xx'") }
    assert(EpochManifest.entries(spark, root).size == nEntries - 1,
      "an all-dead entry drops from the manifest")
    assert(spark.sql("SELECT count(*) FROM dv1.t").head.getLong(0) ==
      want.count(_ < 600).toLong)
  }

  test("DV deletes compose across statements, appends stay untouched, " +
      "and CALL compact applies + sheds the positions (metadata " +
      "aggregation returns)") {
    import spark.implicits._
    val wh = tmp()
    cat("dv2", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    dvOn {
      spark.sql("DELETE FROM dv2.t WHERE id >= 10 AND id < 30")
      spark.sql("DELETE FROM dv2.t WHERE id >= 20 AND id < 50")
    }
    val live = (0 until 200).map(_.toLong).filterNot(id =>
      (id >= 10 && id < 30) || (id >= 20 && id < 50))
    assert(spark.sql("SELECT id FROM dv2.t").collect()
      .map(_.getLong(0)).sorted.toSeq == live)
    // an append lands normally and is never targeted
    spark.sql("INSERT INTO dv2.t VALUES (1000, 'x')")
    assert(spark.sql("SELECT count(*) FROM dv2.t").head.getLong(0) ==
      live.size + 1L)
    // row-count pushes are withheld while DVs live (they'd overcount) —
    // the aggregate is a plain row scan, still exact
    val cnt = spark.sql("SELECT count(*) AS n FROM dv2.t")
    assert(!cnt.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "footer aggregation must be withheld while DVs live")
    // LIMIT stays correct (truncation withheld)
    assert(spark.sql("SELECT id FROM dv2.t LIMIT 500").count() ==
      live.size + 1L)
    // compact: positions applied distributed, _dv shed, answers equal
    spark.sql("CALL dv2.system.compact('t')").collect()
    val fs = hfs(root)
    assert(EpochManifest.entries(spark, root).forall(e =>
      EpochStoreDv.dvFiles(fs, root, e.dir).isEmpty),
      "compaction must shed the position files")
    assert(spark.sql("SELECT id FROM dv2.t WHERE id < 1000").collect()
      .map(_.getLong(0)).sorted.toSeq == live)
    // the metadata-only aggregation path reopens post-compact
    val cnt2 = spark.sql("SELECT count(*) AS n FROM dv2.t")
    assert(cnt2.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "footer aggregation must return once DVs are folded")
    assert(cnt2.head.getLong(0) == live.size + 1L)
  }

  test("file-moving operations refuse while DVs live, each naming the " +
      "compact remedy: CoW DELETE, UPDATE, dynamic overwrite, " +
      "rewrite_data_files, the streaming tail") {
    import spark.implicits._
    val wh = tmp()
    cat("dv3", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    dvOn { spark.sql("DELETE FROM dv3.t WHERE id >= 90") }
    def refuses(body: => Unit): String = {
      val e = intercept[Exception](body)
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("position deletes") &&
        msgs.contains("compact"), s"must name DVs + remedy: $msgs")
      msgs
    }
    refuses { spark.sql("DELETE FROM dv3.t WHERE id < 5") } // CoW mode
    refuses { spark.sql("UPDATE dv3.t SET v = 'x' WHERE id = 1") }
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try refuses { spark.sql("INSERT OVERWRITE dv3.t VALUES (0, 'new')") }
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    refuses { EpochStore.rewriteDataFiles(spark, root): Unit }
    refuses {
      val q = spark.readStream.format("epochstore")
        .schema(spark.table("dv3.t").schema)
        .option("path", root).load()
        .writeStream.format("memory").queryName("dv3_tail")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        q.processAllAvailable()
        q.awaitTermination(60000): Unit
      } finally q.stop()
    }
    // a DV delete on a ROW-IDENTITY store refuses — equality tombstones
    // own that path
    val root2 = s"$wh/rid"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root2, 0L)
    graft.sources.EpochStoreDelta.declare(spark, root2, Seq("id"))
    dvOn {
      // rowid stores route DELETE merge-on-read regardless of the conf
      spark.sql("DELETE FROM dv3.rid WHERE id = 3")
    }
    assert(spark.sql("SELECT count(*) FROM dv3.rid").head.getLong(0) == 9L)
  }

  test("a DV DELETE on a column ADDED with a DEFAULT matches old files' " +
      "SERVED existence default, not a phantom null") {
    import spark.implicits._
    val wh = tmp()
    cat("dv4", wh)
    val root = s"$wh/t"
    spark.sql("CREATE TABLE dv4.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dv4.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("ALTER TABLE dv4.t ADD COLUMNS (tier INT DEFAULT 7)")
    spark.sql("INSERT INTO dv4.t VALUES (4, 'd', 9), (5, 'e', 7)")
    // old rows SERVE tier = 7 (the existence default) — a DV delete on
    // tier = 7 must kill them AND the new tier-7 row
    dvOn { spark.sql("DELETE FROM dv4.t WHERE tier = 7") }
    val got = spark.sql("SELECT id, tier FROM dv4.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((4L, 9)),
      s"rows serving the existence default must die with it: $got")
  }
}
