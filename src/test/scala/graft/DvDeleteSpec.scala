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

  test("an epoch-aligned DV DELETE never drops a prior DV journal — the " +
      "earlier delete's rows stay dead (no resurrection)") {
    import spark.implicits._
    val wh = tmp()
    cat("dv5", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    EpochStore.write((100 until 200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    dvOn { spark.sql("DELETE FROM dv5.t WHERE id >= 50 AND id < 60") }
    // the journal landed at epoch 2; an epoch-aligned delete that
    // classifies epoch >= 1 ALL-DEAD must drop the epoch-1 DATA entry
    // metadata-only but KEEP the journal — dropping it would resurrect
    // ids 50-59
    dvOn { spark.sql("DELETE FROM dv5.t WHERE _epoch >= 1") }
    val got = spark.sql("SELECT id FROM dv5.t").collect()
      .map(_.getLong(0)).toSet
    val want = (0L until 100L).filterNot(id => id >= 50 && id < 60).toSet
    assert(got == want,
      s"resurrected=${got -- want} missing=${want -- got}")
    val fs = hfs(root)
    assert(EpochManifest.entries(spark, root).exists(e =>
      EpochStoreDv.dvFiles(fs, root, e.dir).nonEmpty),
      "the prior DV journal must survive the epoch-aligned delete")
  }

  test("a store root containing a segment spelled like an entry dir " +
      "still keys positions by the exact file rel") {
    import spark.implicits._
    // the targeted data entry lands in dir d0-1 — make the store root
    // itself pass through a parent dir named d0-1, so a first-
    // occurrence prefix strip would split at the WRONG /d0-1/, record
    // rels the scan never matches, and serve the deleted rows
    val wh = s"${tmp()}/d0-1"
    cat("dv6", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    dvOn { spark.sql("DELETE FROM dv6.t WHERE id < 40") }
    assert(spark.sql("SELECT id FROM dv6.t").collect()
      .map(_.getLong(0)).toSet == (40L until 100L).toSet,
      "deleted rows must stay dead under a look-alike root segment")
    // compaction's fold application keys the same way
    spark.sql("CALL dv6.system.compact('t')").collect()
    assert(spark.sql("SELECT id FROM dv6.t").collect()
      .map(_.getLong(0)).toSet == (40L until 100L).toSet)
  }

  test("time travel to a DV generation AFTER compact still withholds " +
      "limit/top-N truncation and footer aggregation — counts exact") {
    import spark.implicits._
    val wh = tmp()
    cat("dv7", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 500).map(i => (i.toLong, i * 2L))
      .toDF("id", "n"), root, 0L, statsColumns = Seq("id", "n"))
    dvOn { spark.sql("DELETE FROM dv7.t WHERE id >= 400") }
    val gDv = EpochManifest.generations(spark, root).last
    spark.sql("CALL dv7.system.compact('t')").collect()
    // the HEAD is clean now; the pinned older generation still carries
    // the DV — every row-count-dependent push must stay off there
    val asOf = spark.sql(s"SELECT count(*) AS c FROM dv7.t VERSION AS OF $gDv")
    assert(!asOf.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "footer aggregation must refuse on the pinned DV generation")
    assert(asOf.head.getLong(0) == 400L)
    assert(spark.sql(
      s"SELECT id FROM dv7.t VERSION AS OF $gDv LIMIT 1000").count() == 400L)
    assert(spark.sql(
      s"SELECT id FROM dv7.t VERSION AS OF $gDv ORDER BY id DESC LIMIT 5")
      .collect().map(_.getLong(0)).toSeq == Seq(399L, 398L, 397L, 396L, 395L))
    // the live read serves the folded store with pushes back on
    assert(spark.sql("SELECT count(*) FROM dv7.t").head.getLong(0) == 400L)
  }

  test("the changefeed over a DV delete: the raw feed refuses loudly, " +
      "readChanges synthesizes full-payload delete events, in-window " +
      "insert+delete pairs net out") {
    import spark.implicits._
    val wh = tmp()
    cat("dv8", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    val g1 = EpochManifest.generations(spark, root).last
    // in-window append, then one DV delete targeting BOTH the pre-base
    // entry (ids 10-14) and the in-window entry (ids 100-104)
    EpochStore.write((100 until 110).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    dvOn {
      spark.sql("DELETE FROM dv8.t WHERE (id >= 10 AND id < 15) OR " +
        "(id >= 100 AND id < 105)")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    // raw feed: loud refusal naming the CDC feed + compact remedy
    val e = intercept[Exception](
      EpochStore.changes(spark, root, schema, g1).collect())
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msg.contains("position deletes") && msg.contains("readChanges"),
      s"raw feed must refuse with the remedy: $msg")
    // CDC feed: in-window survivors as inserts, pre-base dead rows as
    // full-payload delete events at the journal's epoch
    val feed = EpochStore.readChanges(spark, root, schema, g1)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    val journalEpoch = EpochManifest.entries(spark, root)
      .map(_.epoch).max
    val wantIns = (105 until 110).map(i =>
      (i.toLong, s"v$i", "insert", 1L)).toSet
    val wantDel = (10 until 15).map(i =>
      (i.toLong, s"v$i", "delete", journalEpoch)).toSet
    assert(feed == wantIns ++ wantDel,
      s"extra=${feed -- wantIns -- wantDel} " +
        s"missing=${(wantIns ++ wantDel) -- feed}")
    // replay check: base snapshot + feed == current snapshot
    val replayed = (0L until 100L).toSet ++
      feed.collect { case (id, _, "insert", _) => id } --
      feed.collect { case (id, _, "delete", _) => id }
    val now = spark.sql("SELECT id FROM dv8.t").collect()
      .map(_.getLong(0)).toSet
    assert(replayed == now)
  }

  test("the changefeed refuses when an entry DISAPPEARED since the base " +
      "(metadata-only all-dead delete) — the delta is not " +
      "reconstructible") {
    import spark.implicits._
    val wh = tmp()
    cat("dv9", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 50).map(i => (i.toLong, if (i < 25) "de"
      else "xx")).toDF("id", "lang"), root, 0L, partitionColumn = "lang")
    val g1 = EpochManifest.generations(spark, root).last
    // partition-aligned: the lang=xx half of epoch 0... lands in the
    // same entry; write a second all-xx entry instead and drop IT
    EpochStore.write((100 until 120).map(i => (i.toLong, "xx"))
      .toDF("id", "lang"), root, 1L, partitionColumn = "lang")
    val g2 = EpochManifest.generations(spark, root).last
    dvOn { spark.sql("DELETE FROM dv9.t WHERE lang = 'xx'") }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    def feedMsg(base: Long): String = {
      val e = intercept[Exception](
        EpochStore.readChanges(spark, root, schema, base).collect())
      Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    }
    // g2 saw the dropped all-xx entry — its deletes have no events
    assert(feedMsg(g2).contains("not reconstructible"), feedMsg(g2))
    // g1 predates the dropped entry ENTIRELY... the epoch-0 entry is
    // MIXED (xx rows die by position) so its events DO synthesize; the
    // epoch-1 entry is in-window and netted — feed must work from g1
    val feed = EpochStore.readChanges(spark, root, schema, g1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val want = (25 until 50).map(i => (i.toLong, "xx", "delete")).toSet
    assert(feed == want, s"extra=${feed -- want} missing=${want -- feed}")
  }

  test("while DVs live, only TARGETED files pay the filtering wrapper: " +
      "untargeted partitions route to the plain factory (no row-index " +
      "widening, no per-row copy)") {
    import spark.implicits._
    val wh = tmp()
    cat("dv10", wh)
    val root = s"$wh/t"
    // two entries; the delete targets only the first
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    EpochStore.write((100 until 200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    dvOn { spark.sql("DELETE FROM dv10.t WHERE id < 10") }
    val df = spark.sql("SELECT id, v FROM dv10.t")
    val scan = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collectFirst { case s: graft.sources.EpochStoreScan => s }.get
    val parts = scan.planInputPartitions()
    val (targeted, plain) = parts.partition(
      _.isInstanceOf[EpochStoreDv.DvFilePartition])
    assert(targeted.nonEmpty && plain.nonEmpty,
      s"both kinds must plan: targeted=${targeted.length} " +
        s"plain=${plain.length}")
    val f = scan.createReaderFactory()
    assert(f.isInstanceOf[EpochStoreDv.DvRoutingFactory],
      s"expected the DV routing factory, got ${f.getClass}")
    // Spark forbids mixing columnar and row partitions in one scan —
    // row-based scan-wide while DVs live, but only targeted partitions
    // go through the filtering wrapper
    assert(parts.forall(p => !f.supportColumnarReads(p)))
    // functional routing: a plain partition's reader serves rows
    // directly; results stay exact end to end
    assert(df.collect().map(_.getLong(0)).toSet ==
      (10L until 200L).toSet)
  }

  test("an OVERSIZED DV DELETE auto-routes to the copy-on-write rewrite " +
      "instead of publishing a journal reads would refuse; with another " +
      "journal live it refuses naming compact") {
    import spark.implicits._
    val wh = tmp()
    cat("dv11", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 300).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    spark.conf.set(EpochStoreDv.MaxDriverPositionsConf, "50")
    try {
      // 100 matched positions > bound 50 -> lands as CoW: rows gone,
      // NO journal anywhere, store fully readable, pushes intact
      dvOn { spark.sql("DELETE FROM dv11.t WHERE id < 100") }
      val fs = hfs(root)
      assert(EpochManifest.entries(spark, root).forall(e =>
        EpochStoreDv.dvFiles(fs, root, e.dir).isEmpty),
        "an oversized delete must not publish a journal")
      assert(spark.sql("SELECT id FROM dv11.t").collect()
        .map(_.getLong(0)).toSet == (100L until 300L).toSet)
      // a small delete journals as usual...
      dvOn { spark.sql("DELETE FROM dv11.t WHERE id >= 290") }
      assert(EpochManifest.entries(spark, root).exists(e =>
        EpochStoreDv.dvFiles(fs, root, e.dir).nonEmpty))
      // ...and an oversized one now REFUSES (CoW would strand the live
      // journal's positions) with the compact remedy
      val e = intercept[Exception](dvOn {
        spark.sql("DELETE FROM dv11.t WHERE id < 200") })
      val msg = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msg.contains("position deletes") && msg.contains("compact"),
        s"must name the live journal + remedy: $msg")
      assert(spark.sql("SELECT count(*) FROM dv11.t").head.getLong(0) ==
        190L, "the refused delete must not change the store")
    } finally spark.conf.unset(EpochStoreDv.MaxDriverPositionsConf)
  }

  test("overlapping DV DELETEs journal DISJOINT positions — a row dies " +
      "once, and the CDC feed carries exactly ONE delete event for it") {
    import spark.implicits._
    val wh = tmp()
    cat("dv12", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    val g1 = EpochManifest.generations(spark, root).last
    dvOn {
      spark.sql("DELETE FROM dv12.t WHERE id >= 10 AND id < 30")
      // overlaps [20, 30): those rows are ALREADY dead — the second
      // journal must not re-record them
      spark.sql("DELETE FROM dv12.t WHERE id >= 20 AND id < 40")
    }
    val fs = hfs(root)
    val es = EpochManifest.entries(spark, root).filter(_.dv.nonEmpty)
      .sortBy(_.epoch)
    assert(es.size == 2)
    def positions(e: EpochManifest.Entry): Long =
      spark.read.parquet(EpochStoreDv.dvFiles(fs, root, e.dir)
        .map(_.toString): _*).count()
    assert(positions(es.head) == 20L, "first journal: ids 10..29")
    assert(positions(es.last) == 10L,
      "second journal must hold ONLY the newly-dead ids 30..39")
    // CDC: one delete event per dead row, payload exact
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val feed = EpochStore.readChanges(spark, root, schema, g1).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(feed.length == 30, s"one event per dead row: ${feed.length}")
    assert(feed.map(_._1).toSet == (10L until 40L).toSet &&
      feed.forall(_._2 == "delete"))
  }

  test("a RENAME landing after a journal: synthesized delete events " +
      "resolve the targets' historical spelling — payloads exact under " +
      "the new name") {
    import spark.implicits._
    val wh = tmp()
    cat("dv13", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 50).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    val g1 = EpochManifest.generations(spark, root).last
    dvOn { spark.sql("DELETE FROM dv13.t WHERE id < 10") }
    spark.sql("ALTER TABLE dv13.t RENAME COLUMN v TO w")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType)))
    val feed = EpochStore.readChanges(spark, root, schema, g1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = (0 until 10).map(i => (i.toLong, s"v$i", "delete")).toSet
    assert(feed == want,
      s"extra=${feed -- want} missing=${want -- feed}")
  }

  test("BOUNDED changefeeds page history windows deterministically: " +
      "(since, until) covers exactly the window's epochs, DV deletes " +
      "included; a non-retained until refuses") {
    import spark.implicits._
    val wh = tmp()
    cat("dv14", wh)
    val root = s"$wh/t"
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    EpochStore.write(batch(0, 20), root, 0L)
    val g1 = EpochManifest.generations(spark, root).last
    EpochStore.write(batch(20, 40), root, 1L)
    val g2 = EpochManifest.generations(spark, root).last
    dvOn { spark.sql("DELETE FROM dv14.t WHERE id < 5") }
    val g3 = EpochManifest.generations(spark, root).last
    EpochStore.write(batch(40, 50), root, 10L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    def feed(since: Long, until: Long) =
      EpochStore.readChanges(spark, root, schema, since,
        untilGeneration = until)
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // window (g1, g2]: only epoch 1's inserts
    assert(feed(g1, g2) == (20L until 40L).map((_, "insert")).toSet)
    // window (g2, g3]: only the DV delete's synthesized events
    assert(feed(g2, g3) == (0L until 5L).map((_, "delete")).toSet)
    // window (g1, g3]: both
    assert(feed(g1, g3) ==
      (20L until 40L).map((_, "insert")).toSet ++
        (0L until 5L).map((_, "delete")).toSet)
    // unbounded from g3: the trailing append only
    assert(feed(g3, -1L) == (40L until 50L).map((_, "insert")).toSet)
    // paging identity: the union of adjacent windows == the full delta
    assert(feed(g1, g2) ++ feed(g2, g3) == feed(g1, g3))
    val e = intercept[IllegalArgumentException](
      EpochStore.readChanges(spark, root, schema, g1,
        untilGeneration = 9999L))
    assert(String.valueOf(e.getMessage).contains("retained"), e.getMessage)
  }

  test("composed journals each under the write bound refuse BEFORE any " +
      "driver materialization when they SUM past the load bound — the " +
      "clean message, no Spark job") {
    import spark.implicits._
    val wh = tmp()
    cat("dv15", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    dvOn {
      spark.sql("DELETE FROM dv15.t WHERE id < 30")
      spark.sql("DELETE FROM dv15.t WHERE id >= 170")
    }
    // each journal holds 30 positions — fine under a bound of 40; their
    // COMPOSED load (60) is not. The refusal must come off the parquet
    // footers on the driver, before any collect job runs.
    spark.conf.set(EpochStoreDv.MaxDriverPositionsConf, "40")
    try {
      val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
        .length
      val e = intercept[Exception](
        spark.sql("SELECT id FROM dv15.t").collect())
      val msg = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msg.contains("60 positions") &&
        msg.contains("bound 40") && msg.contains("compact"),
        s"must refuse with the composed total + remedy: $msg")
      Thread.sleep(1000)
      val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
        .length
      assert(jobsAfter == jobsBefore,
        s"the refusal must precede any job ($jobsBefore -> $jobsAfter)")
    } finally spark.conf.unset(EpochStoreDv.MaxDriverPositionsConf)
    // with the default bound restored the same journals compose fine
    assert(spark.sql("SELECT count(*) FROM dv15.t").head.getLong(0) == 140L)
  }

  test("the synthesized CDC feed reads each target entry ONCE across " +
      "journals: a 3-journal window's plan width is bounded by target " +
      "entries, never journals x targets") {
    import spark.implicits._
    val wh = tmp()
    cat("dv16", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    EpochStore.write((100 until 200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    val g1 = EpochManifest.generations(spark, root).last
    dvOn {
      // three journals, each targeting BOTH entries
      spark.sql("DELETE FROM dv16.t WHERE id IN (1, 101)")
      spark.sql("DELETE FROM dv16.t WHERE id IN (2, 102)")
      spark.sql("DELETE FROM dv16.t WHERE id IN (3, 103)")
    }
    val journalEpochs = EpochManifest.entries(spark, root)
      .filter(_.dv.nonEmpty).map(_.epoch).sorted
    assert(journalEpochs.size == 3)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val feed = EpochStore.readChanges(spark, root, schema, g1)
    // events exact, each stamped with ITS journal's commit epoch
    val got = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val want = Seq(1L, 101L, 2L, 102L, 3L, 103L).zipWithIndex.map {
      case (id, i) => (id, s"v$id", "delete", journalEpochs(i / 2))
    }.toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // plan width: 2 target reads + 2 references to the ONE journal
    // scan (one per target branch) — 4 v1 parquet leaves, independent
    // of the 3 journals (the per-(journal, target) shape had 12)
    val leaves = feed.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(leaves.length == 4,
      s"expected 4 parquet leaves (2 targets x (read + journal ref)), " +
        s"got ${leaves.length}")
  }

  private def cdcSchemaOf(fields: (String,
      org.apache.spark.sql.types.DataType)*) =
    org.apache.spark.sql.types.StructType(
      fields.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t) } ++ Seq(
        org.apache.spark.sql.types.StructField(EpochStore.EpochColName,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(EpochStore.ChangeColName,
          org.apache.spark.sql.types.StringType, nullable = false)))

  test("X97 on the tail: a CDC AvailableNow tail over a DV-delete epoch " +
      "delivers the SAME event set as batch readChanges — synthesized " +
      "full-payload deletes, in-window pairs netted; a restart " +
      "re-delivers nothing; the resolved tail still refuses") {
    import org.apache.spark.sql.types.{LongType, StringType}
    import spark.implicits._
    val wh = tmp()
    cat("dv17", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    val g1 = EpochManifest.generations(spark, root).last
    EpochStore.write((100 until 110).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    dvOn {
      spark.sql("DELETE FROM dv17.t WHERE (id >= 10 AND id < 15) OR " +
        "(id >= 100 AND id < 105)")
    }
    val journalEpoch = EpochManifest.entries(spark, root).map(_.epoch).max
    val cdc = cdcSchemaOf("id" -> LongType, "v" -> StringType)
    val out = tmp()
    val ckpt = tmp()
    def tail() = spark.readStream.format("epochstore").schema(cdc)
      .option("path", root).option("startingAfterEpoch", "0").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = tail()
    q.processAllAvailable(); q.stop()
    def sunk() = spark.read.schema(cdc).parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val got = sunk()
    // the batch CDC feed over the same window is the contract
    val schema2 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", LongType),
      org.apache.spark.sql.types.StructField("v", StringType)))
    val batchFeed = EpochStore.readChanges(spark, root, schema2, g1)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(3), r.getString(2))).toSet
    assert(got == batchFeed,
      s"tail=${got -- batchFeed} batch-only=${batchFeed -- got}")
    // spelled out: in-window survivors as inserts at their epoch,
    // pre-window dead rows as full-payload deletes at the journal epoch
    val want = (105 until 110).map(i =>
      (i.toLong, s"v$i", 1L, "insert")).toSet ++
      (10 until 15).map(i => (i.toLong, s"v$i", journalEpoch, "delete"))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // exactly-once: a restarted query finds the checkpoint complete
    val q2 = tail()
    q2.processAllAvailable(); q2.stop()
    assert(sunk() == want, "a restart must re-deliver nothing")
    // the RESOLVED tail (no _change_type) still refuses loudly
    val e = intercept[Exception] {
      val q3 = spark.readStream.format("epochstore")
        .schema(spark.table("dv17.t").schema)
        .option("path", root).load()
        .writeStream.format("memory").queryName("dv17_resolved")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q3.processAllAvailable(); q3.awaitTermination(60000): Unit }
      finally q3.stop()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msg.contains("resolved tail") && msg.contains("compact"),
      s"resolved tail must refuse with both remedies: $msg")
  }

  test("X97 paced triggers telescope: with maxEpochsPerTrigger=1 an " +
      "earlier trigger delivers the target unfiltered and the journal's " +
      "trigger synthesizes its delete events — net state == the store") {
    import org.apache.spark.sql.types.{LongType, StringType}
    import spark.implicits._
    val wh = tmp()
    cat("dv18", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 100).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    EpochStore.write((100 until 110).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 1L)
    dvOn {
      spark.sql("DELETE FROM dv18.t WHERE (id >= 10 AND id < 15) OR " +
        "(id >= 100 AND id < 105)")
    }
    val journalEpoch = EpochManifest.entries(spark, root).map(_.epoch).max
    val cdc = cdcSchemaOf("id" -> LongType, "v" -> StringType)
    val q = spark.readStream.format("epochstore").schema(cdc)
      .option("path", root).option("startingAfterEpoch", "0")
      .option("maxEpochsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("dv18cdc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("dv18cdc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    // trigger (0,1] delivered ALL of epoch 1 (the journal was not in
    // its window); trigger (1,2] then synthesized deletes for BOTH
    // pre-batch targets — the pair telescopes to the same net state
    val want = (100 until 110).map(i =>
      (i.toLong, s"v$i", 1L, "insert")).toSet ++
      ((10 until 15) ++ (100 until 105)).map(i =>
        (i.toLong, s"v$i", journalEpoch, "delete"))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // net replay equals the live store
    val replayed = (0L until 100L).toSet ++
      got.collect { case (id, _, _, "insert") => id } --
      got.collect { case (id, _, _, "delete") => id }
    val now = spark.sql("SELECT id FROM dv18.t").collect()
      .map(_.getLong(0)).toSet
    assert(replayed == now)
  }

  test("X97/X99 on the tail: a position-delta UPDATE's journal delivers " +
      "delete events for the OLD payloads and inserts for the " +
      "reinserted rows, both at the journal epoch") {
    import org.apache.spark.sql.types.{LongType, StringType}
    import spark.implicits._
    val wh = tmp()
    cat("dv19", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 20).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    dvOn { spark.sql("UPDATE dv19.t SET v = 'new' WHERE id < 3") }
    val journalEpoch = EpochManifest.entries(spark, root).map(_.epoch).max
    val cdc = cdcSchemaOf("id" -> LongType, "v" -> StringType)
    val q = spark.readStream.format("epochstore").schema(cdc)
      .option("path", root).option("startingAfterEpoch", "0").load()
      .writeStream.format("memory").queryName("dv19cdc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("dv19cdc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val want = (0 until 3).map(i =>
      (i.toLong, s"v$i", journalEpoch, "delete")).toSet ++
      (0 until 3).map(i => (i.toLong, "new", journalEpoch, "insert"))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
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
