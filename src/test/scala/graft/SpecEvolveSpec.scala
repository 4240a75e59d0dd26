package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import graft.sources.EpochStore
import graft.core.EpochManifest

/** X92 — partition-spec evolution WITHOUT rewriting: `CALL
  * evolve_layout` publishes a new table-level layout as metadata only
  * (`_manifests/layout.v<N>.json`). New writes land under it; existing
  * entries keep their recorded specs; scans prune and serve every entry
  * under its OWN spec (Iceberg's mixed-spec snapshots). SPJ/ordering
  * reports and metadata-only aggregation are withheld while specs are
  * mixed; migrate_layout stays the physical normalization. */
class SpecEvolveSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_sev").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : graft.sources.EpochStoreScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collectFirst { case s: graft.sources.EpochStoreScan => s }.get

  test("identity(lang) -> bucket(id): mixed snapshot reads exactly, " +
      "each entry prunes under its OWN spec, old rows serve lang from " +
      "dirs and new rows from files") {
    import spark.implicits._
    val wh = tmp()
    cat("sev", wh)
    val root = s"$wh/docs"
    val langs = IndexedSeq("en", "de", "fr")
    // two lang-partitioned epochs (the OLD spec: lang dirs, lang NOT in
    // files)
    val old = (0 until 60).map(i => (i.toLong, s"v$i", langs(i % 3)))
    EpochStore.write(old.take(30).toDF("id", "v", "lang"), root, 0L,
      partitionColumn = "lang")
    EpochStore.write(old.drop(30).toDF("id", "v", "lang"), root, 1L,
      partitionColumn = "lang")

    val res = spark.sql("CALL sev.system.evolve_layout('docs', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    assert(res.head.getString(0).contains("identity(lang)"),
      s"previous layout reported: ${res.head}")
    assert(res.head.getString(1) == "bucket(4, id)")
    // metadata-only: entry count unchanged, no dirs moved
    assert(res.head.getInt(2) == 2)

    // new epoch lands BUCKETED, lang in the files
    spark.sql("INSERT INTO sev.docs VALUES " +
      (100 until 112).map(i => s"($i, 'n$i', '${langs(i % 3)}')")
        .mkString(", "))
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val newest = EpochManifest.entries(spark, root).maxBy(_.epoch)
    val newDirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${newest.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(newDirs.nonEmpty && newDirs.forall(_.startsWith("id_bucket=")),
      s"post-evolution epoch must land bucketed: $newDirs")

    // the FULL read crosses both specs exactly
    val all = spark.sql(
      "SELECT id, v, lang FROM sev.docs ORDER BY id").collect()
    assert(all.length == 72)
    assert(all.take(60).forall(r =>
      r.getString(2) == langs((r.getLong(0) % 3).toInt)),
      "old entries must serve lang from their dirs")
    assert(all.drop(60).forall(r =>
      r.getString(2) == langs((r.getLong(0) % 3).toInt)),
      "new entries must serve lang from their files")

    // per-entry pruning, OLD spec side: lang = 'en' prunes the two old
    // entries to their en dirs (1 of 3 each); the bucketed entry keeps
    // all 4 bucket dirs (lang is a file column there — residual filter)
    val en = spark.sql("SELECT id FROM sev.docs WHERE lang = 'en'")
    assert(scanOf(en).selectedPartitionDirs == (2 + 4, 6 + 4),
      s"audit: ${scanOf(en).selectedPartitionDirs}")
    assert(en.collect().map(_.getLong(0)).sorted.toSeq ==
      (old.filter(_._3 == "en").map(_._1) ++
        (100 until 112).filter(_ % 3 == 0).map(_.toLong)).sorted.toSeq)

    // per-entry pruning, NEW spec side: an id probe prunes the bucketed
    // entry to 1 of its 4 bucket dirs; old lang entries keep all dirs
    val probe = spark.sql("SELECT v FROM sev.docs WHERE id = 103")
    assert(scanOf(probe).selectedPartitionDirs == (6 + 1, 6 + 4),
      s"audit: ${scanOf(probe).selectedPartitionDirs}")
    assert(probe.head.getString(0) == "n103")

    // mixed specs: no storage-partitioning claim, no order report,
    // no metadata-only aggregation — but the aggregate stays EXACT
    import org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning
    assert(!scanOf(en).outputPartitioning()
      .isInstanceOf[KeyGroupedPartitioning],
      "mixed specs must not claim key-grouped partitioning")
    val agg = spark.sql(
      "SELECT lang, count(*) AS n FROM sev.docs GROUP BY lang ORDER BY lang")
    assert(!agg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "GROUPED metadata aggregation is withheld while specs are mixed")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("de", 24L), ("en", 24L), ("fr", 24L)))
    // UNGROUPED aggregates stay METADATA-ONLY even over the mixed
    // snapshot — the agg walk visits each entry under its own spec
    val uagg = spark.sql(
      "SELECT count(*) AS n, min(id) AS mn, max(id) AS mx FROM sev.docs")
    assert(uagg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "ungrouped aggregates must keep the metadata path on a mixed store")
    assert(uagg.collect().map(_.toSeq).toSeq == Seq(Seq(72L, 0L, 111L)))

    // time travel: the pre-evolution snapshot keeps its exact lang
    // pruning
    val g0 = EpochManifest.generations(spark, root).head
    val tt = spark.sql(
      s"SELECT count(*) FROM sev.docs VERSION AS OF $g0 WHERE lang = 'de'")
    assert(tt.head.getLong(0) == 10L)

    // the streaming tail FLOWS over the mixed snapshot: the template
    // scan's read profiles route each entry — lang from dirs on the old
    // spec, from files on the new one, no normalization prerequisite
    val q = spark.readStream.format("epochstore").option("path", root)
      .schema(spark.table("sev.docs").schema).load()
      .select(col("id"), col("lang"))
      .writeStream.format("memory").queryName("sev_t")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val tailed = spark.table("sev_t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(tailed.size == 72 && tailed.forall { case (id, l) =>
      l == langs((id % 3).toInt) },
      s"mixed tail must serve both specs: ${tailed.take(6)}…")

    // migrate_layout stays the PHYSICAL normalization: after it, one
    // spec again — bucket probes prune everything, SPJ report returns
    spark.sql("CALL sev.system.migrate_layout('docs', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    val probe2 = spark.sql("SELECT v FROM sev.docs WHERE id = 103")
    assert(probe2.head.getString(0) == "n103")
    assert(scanOf(probe2).selectedPartitionDirs == (1, 4),
      s"post-migrate audit: ${scanOf(probe2).selectedPartitionDirs}")
    assert(spark.sql("SELECT count(*) FROM sev.docs").head.getLong(0) == 72L)
  }

  test("bucket -> identity(lang) evolution (the reverse direction) and " +
      "DML over a mixed snapshot stay exact") {
    import spark.implicits._
    val wh = tmp()
    cat("sev2", wh)
    val root = s"$wh/t"
    val langs = IndexedSeq("en", "de", "fr")
    EpochStore.writeBucketed(
      (0 until 40).map(i => (i.toLong, langs(i % 3), i * 10L))
        .toDF("id", "lang", "score"),
      root, 0L, bucketColumn = "id", bucketCount = 4)
    spark.sql("CALL sev2.system.evolve_layout('t', " +
      "partition_columns => 'lang')").collect()
    spark.sql("INSERT INTO sev2.t VALUES " +
      (100 until 109).map(i => s"($i, '${langs(i % 3)}', ${i * 10})")
        .mkString(", "))
    // new epoch landed lang-partitioned
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val newest = EpochManifest.entries(spark, root).maxBy(_.epoch)
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${newest.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs == Seq("lang=de", "lang=en", "lang=fr"), s"$dirs")

    // lang filter: prunes the NEW entry's dirs (1 of 3); the old
    // bucketed entry keeps its 4 bucket dirs, residual filters its rows
    val en = spark.sql(
      "SELECT id, score FROM sev2.t WHERE lang = 'en' ORDER BY id")
    assert(scanOf(en).selectedPartitionDirs == (4 + 1, 4 + 3))
    val want = ((0 until 40) ++ (100 until 109))
      .filter(_ % 3 == 0).map(i => (i.toLong, i * 10L))
    assert(en.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == want)

    // DML over the mixed snapshot: DELETE binds per entry (old entries
    // carry lang in files, new ones in dirs)
    spark.sql("DELETE FROM sev2.t WHERE lang = 'fr'")
    assert(spark.sql("SELECT count(*) FROM sev2.t WHERE lang = 'fr'")
      .head.getLong(0) == 0L)
    val left = ((0 until 40) ++ (100 until 109)).filterNot(_ % 3 == 2)
    assert(spark.sql("SELECT count(*) FROM sev2.t").head.getLong(0) ==
      left.size.toLong)
    // an UPDATE through the row-level path too — one row in the NEW
    // entry, and one in the FOREIGN bucketed entry (the group
    // classification must bind that entry's OWN dir layout, or it
    // misreads "no matching leaf dirs" as Untouched and silently skips
    // the group — the lost-update shape)
    spark.sql("UPDATE sev2.t SET score = -1 WHERE id = 100")
    assert(spark.sql("SELECT score FROM sev2.t WHERE id = 100")
      .head.getLong(0) == -1L)
    spark.sql("UPDATE sev2.t SET score = -2 WHERE id = 6")
    assert(spark.sql("SELECT score FROM sev2.t WHERE id = 6")
      .head.getLong(0) == -2L,
      "a row in the foreign-layout entry must not be skipped")
    spark.sql("UPDATE sev2.t SET score = -3 WHERE lang = 'en' AND id < 4")
    assert(spark.sql("SELECT id, score FROM sev2.t WHERE id < 4 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, -3L), (1L, 10L), (3L, -3L)),
      "a lang-conditioned UPDATE must reach the foreign entry's en rows " +
        "and leave de untouched (fr was deleted)")
    assert(spark.sql("SELECT count(*) FROM sev2.t").head.getLong(0) ==
      left.size.toLong)

    // evolve_layout refuses junk: unknown column, rowid identity
    val bad = intercept[Exception] {
      spark.sql("CALL sev2.system.evolve_layout('t', " +
        "partition_columns => 'nope')").collect()
    }
    assert(String.valueOf(bad.getMessage).contains("not in the schema"))

    // once compaction normalizes every entry to the logged identity
    // layout, GROUPED metadata aggregation comes back
    EpochStore.compactStore(spark, root, parts = 1)
    val gagg = spark.sql(
      "SELECT lang, count(*) AS n FROM sev2.t GROUP BY lang ORDER BY lang")
    assert(gagg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "a normalized store must regain grouped metadata aggregation")
    assert(gagg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("de", left.count(_ % 3 == 1).toLong),
        ("en", left.count(_ % 3 == 0).toLong)))
  }

  test("evolve_layout refuses row-identity stores (migrate_layout is " +
      "the move); TRUNCATE-then-INSERT on an evolved store keeps the " +
      "logged layout") {
    import spark.implicits._
    val wh = tmp()
    cat("sev3", wh)
    // rowid store: metadata-only evolution refuses, names the remedy
    spark.sql("CREATE TABLE sev3.r (id BIGINT, v STRING) " +
      "USING epochstore OPTIONS ('rowid'='id')")
    spark.sql("INSERT INTO sev3.r VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql("CALL sev3.system.evolve_layout('r', " +
        "bucket_column => 'id', bucket_count => 4)").collect()
    }
    assert(String.valueOf(e.getMessage).contains("migrate_layout"),
      s"rowid refusal must name the remedy: ${e.getMessage}")

    // evolved store: TRUNCATE empties the snapshot; the catalog's
    // empty-snapshot fallback must serve the LOGGED layout, so the
    // next INSERT lands bucketed
    val root = s"$wh/t"
    EpochStore.write((0 until 12).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    spark.sql("CALL sev3.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    spark.sql("TRUNCATE TABLE sev3.t")
    spark.sql("INSERT INTO sev3.t VALUES (100, 'x'), (101, 'y')")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val newest = EpochManifest.entries(spark, root).maxBy(_.epoch)
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${newest.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("id_bucket=")),
      s"post-truncate INSERT must land under the logged layout: $dirs")
    assert(spark.sql("SELECT count(*) FROM sev3.t").head.getLong(0) == 2L)
  }

  test("CALL compact is a layout NORMALIZER on a mixed-spec store: the " +
      "fold lands under the logged layout, probes prune again, and the " +
      "streaming tail can start") {
    import spark.implicits._
    val wh = tmp()
    cat("sev4", wh)
    val root = s"$wh/t"
    val langs = IndexedSeq("en", "de", "fr")
    EpochStore.write((0 until 30).map(i => (i.toLong, s"v$i", langs(i % 3)))
      .toDF("id", "v", "lang"), root, 0L, partitionColumn = "lang")
    spark.sql("CALL sev4.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    spark.sql("INSERT INTO sev4.t VALUES (100, 'n100', 'en')")
    // normalize via compact (the stream refusal names it as a remedy)
    spark.sql("CALL sev4.system.compact('t')").collect()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val es = EpochManifest.entries(spark, root)
    assert(es.size == 1, s"one fold: ${es.map(_.dir)}")
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${es.head.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("id_bucket=")),
      s"the fold must land under the LOGGED bucket layout: $dirs")
    // answers exact, lang now a file column everywhere
    assert(spark.sql("SELECT count(*) FROM sev4.t WHERE lang = 'en'")
      .head.getLong(0) == 11L)
    // a bucket probe prunes 1-of-4 through the normalized fold
    val probe = spark.sql("SELECT v FROM sev4.t WHERE id = 100")
    assert(probe.head.getString(0) == "n100")
    assert(scanOf(probe).selectedPartitionDirs == (1, 4),
      s"audit: ${scanOf(probe).selectedPartitionDirs}")
    // and the tail starts (no foreign-spec entries left)
    val q = spark.readStream.format("epochstore")
      .schema(spark.table("sev4.t").schema)
      .option("path", root).load()
      .writeStream.format("memory").queryName("sev4_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("sev4_tail").count() == 31L)

    // a MID-STREAM evolve_layout refuses per batch: the running tail's
    // pinned layout no longer matches what new entries record
    val q2 = spark.readStream.format("epochstore")
      .schema(spark.table("sev4.t").schema)
      .option("path", root).load()
      .writeStream.format("memory").queryName("sev4_tail2").start()
    try {
      q2.processAllAvailable()
      spark.sql("CALL sev4.system.evolve_layout('t', " +
        "partition_columns => 'lang')").collect()
      spark.sql("INSERT INTO sev4.t VALUES (200, 'n200', 'de')")
      val e2 = intercept[Exception] { q2.processAllAvailable() }
      val msgs = Iterator.iterate(e2: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("evolve_layout landed") &&
        msgs.contains("restart"),
        s"mid-stream evolution must refuse with the remedy: $msgs")
    } finally q2.stop()
  }

  test("mixed-spec equivalence sweep: four epochs under four DIFFERENT " +
      "layouts answer every probe exactly like the flat union truth") {
    import spark.implicits._
    val wh = tmp()
    cat("sev5", wh)
    val root = s"$wh/t"
    val langs = IndexedSeq("en", "de", "fr")
    def slice(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"v$i", langs(i % 3),
        (i % 7).toLong)).toDF("id", "v", "lang", "grp")
    // epoch 0: unpartitioned; 1: identity(lang); 2: bucket(4, id);
    // 3: composite identity(lang)+bucket(2, id)
    slice(0, 25).write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0").save()
    slice(25, 50).write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "1")
      .option("partitionColumn", "lang").save()
    slice(50, 75).write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "2")
      .option("bucketColumn", "id").option("bucketCount", "4").save()
    slice(75, 100).write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "3")
      .option("partitionColumn", "lang")
      .option("bucketColumn", "id").option("bucketCount", "2").save()
    // declare a CURRENT layout so the per-entry machinery engages
    spark.sql("CALL sev5.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()

    val truth = slice(0, 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    def got(where: String): Set[(Long, String, String, Long)] =
      spark.sql(s"SELECT id, v, lang, grp FROM sev5.t $where")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
    def want(p: ((Long, String, String, Long)) => Boolean) = truth.filter(p)

    assert(got("") == truth, "full read")
    val probes: Seq[(String, ((Long, String, String, Long)) => Boolean)] =
      Seq(
        ("WHERE lang = 'en'", _._3 == "en"),
        ("WHERE lang <> 'de'", _._3 != "de"),
        ("WHERE id = 7", _._1 == 7L),
        ("WHERE id IN (3, 33, 63, 93)", t => Set(3L, 33L, 63L, 93L)(t._1)),
        ("WHERE id < 20 AND lang = 'fr'", t => t._1 < 20L && t._3 == "fr"),
        ("WHERE grp = 5", _._4 == 5L),
        ("WHERE lang = 'en' AND grp >= 4",
          t => t._3 == "en" && t._4 >= 4L),
        ("WHERE v LIKE 'v9%'", _._2.startsWith("v9")))
    probes.foreach { case (w, p) =>
      assert(got(w) == want(p), s"probe diverged: $w")
    }
    // aggregation across all four specs
    val byLang = spark.sql(
      "SELECT lang, count(*) AS n, sum(grp) AS g FROM sev5.t " +
        "GROUP BY lang ORDER BY lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val wantLang = truth.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (l, ts) => (l, ts.size.toLong, ts.toSeq.map(_._4).sum) }
    assert(byLang == wantLang, s"$byLang vs $wantLang")
    // joins across the mixed snapshot
    Seq((7L, "seven"), (80L, "eighty")).toDF("id", "tag")
      .createOrReplaceTempView("sev5dim")
    val j = spark.sql("SELECT t.id, d.tag FROM sev5.t t " +
      "JOIN sev5dim d ON t.id = d.id ORDER BY t.id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(j == Seq((7L, "seven"), (80L, "eighty")))
  }

  test("evolve_layout composes with time transforms (X92 ∘ X93): " +
      "identity(lang) -> days(ts) -> back, probes exact on the mixed " +
      "store, new epochs prune under the declared unit level") {
    import spark.implicits._
    val wh = tmp()
    cat("sev11", wh)
    val root = s"$wh/ev"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val langs = IndexedSeq("en", "de")
    // epoch 0: the OLD spec — identity(lang) dirs, ts in files
    val old = (0 until 24).map(i =>
      (i.toLong, ts(f"2024-03-${10 + i % 4}%02d 06:00:00"), langs(i % 2)))
    EpochStore.write(old.toDF("id", "ts", "lang"), root, 0L,
      partitionColumn = "lang")

    val res = spark.sql("CALL sev11.system.evolve_layout('ev', " +
      "transform => 'days(ts)')").collect()
    assert(res.head.getString(0).contains("identity(lang)"))
    assert(res.head.getString(1) == "days(ts)")

    // new epoch lands under ts_day unit dirs (lang now in the files)
    spark.sql("INSERT INTO sev11.ev VALUES " +
      (100 until 112).map(i =>
        s"($i, TIMESTAMP '2024-03-${14 + i % 4} 08:00:00', " +
          s"'${langs(i % 2)}')").mkString(", "))
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val e1 = EpochManifest.entries(spark, root).maxBy(_.epoch)
    val dayDirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${e1.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dayDirs == (14 until 18).map(d => s"ts_day=2024-03-$d"),
      s"the evolved write must land unit dirs: $dayDirs")

    // probes exact across BOTH specs; the day probe prunes the new
    // entry's unit dirs while the identity entry degrades to unpruned
    val truth = old.map(t => (t._1, t._3)) ++
      (100 until 112).map(i => (i.toLong, langs(i % 2)))
    def got(w: String) = spark.sql(s"SELECT id, lang FROM sev11.ev $w")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got("") == truth.toSet)
    val day = spark.sql("SELECT id FROM sev11.ev WHERE " +
      "ts >= TIMESTAMP '2024-03-14 00:00:00' AND " +
      "ts < TIMESTAMP '2024-03-15 00:00:00'")
    assert(day.collect().map(_.getLong(0)).toSet ==
      (old.filter(t => t._2.toString.startsWith("2024-03-1") &&
        t._2.getDate == 14).map(_._1) ++
        (100 until 112).filter(i => 14 + i % 4 == 14).map(_.toLong)).toSet)
    val (kept, total) = scanOf(day).selectedPartitionDirs
    assert(kept < total,
      s"the unit level must prune the evolved entry's dirs: $kept/$total")
    assert(got("WHERE lang = 'de'") == truth.filter(_._2 == "de").toSet)

    // DESCRIBE surfaces the composed layout
    val props = spark.sql("DESCRIBE TABLE EXTENDED sev11.ev").collect()
      .collectFirst { case r if r.getString(0) == "Table Properties" =>
        r.getString(1) }.getOrElse("")
    assert(props.contains("layout=days(ts)"), s"layout property: $props")

    // evolve BACK to a transform-free identity layout: all three
    // specs keep answering exactly
    spark.sql("CALL sev11.system.evolve_layout('ev', " +
      "partition_columns => 'lang')").collect()
    spark.sql("INSERT INTO sev11.ev VALUES " +
      "(200, TIMESTAMP '2024-03-20 01:00:00', 'en')")
    assert(got("") == truth.toSet + ((200L, "en")))
    assert(got("WHERE ts >= TIMESTAMP '2024-03-20 00:00:00'") ==
      Set((200L, "en")))
  }

  test("DESCRIBE surfaces the declared layout and the foreign-entry " +
      "count; normalization zeroes it") {
    import spark.implicits._
    val wh = tmp()
    cat("sev6", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i",
      if (i % 2 == 0) "en" else "de")).toDF("id", "v", "lang"),
      root, 0L, partitionColumn = "lang")
    spark.sql("CALL sev6.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    def props(): String =
      spark.sql("DESCRIBE TABLE EXTENDED sev6.t").collect()
        .collectFirst { case r if r.getString(0) == "Table Properties" =>
          r.getString(1) }.getOrElse("")
    val d1 = props()
    assert(d1.contains("layout=bucket(4, id)") &&
      d1.contains("foreignLayoutEntries=1"), d1)
    spark.sql("CALL sev6.system.compact('t')").collect()
    val d2 = props()
    assert(d2.contains("foreignLayoutEntries=0"), d2)
  }

  test("dynamic INSERT OVERWRITE refuses foreign-spec entries on an " +
      "evolved bucket store (a 4->8 bucket-count change would drop rows " +
      "of never-written pairs); compact reopens the path exactly") {
    import spark.implicits._
    import org.apache.spark.sql.types.LongType
    val wh = tmp()
    cat("sev7", wh)
    val root = s"$wh/t"
    (0 until 16).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("bucketColumn", "id").option("bucketCount", "4").save()
    spark.sql("CALL sev7.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 8)").collect()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE sev7.t VALUES (0, 'new0')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("migrate_layout or compact"),
        s"foreign-spec entry must refuse with the remedy: $msgs")
      // the refusal is atomic — nothing replaced, nothing dropped
      assert(spark.sql("SELECT count(*) FROM sev7.t").head.getLong(0) == 16L)
      spark.sql("CALL sev7.system.compact('t')").collect()
      spark.sql("INSERT OVERWRITE sev7.t VALUES (0, 'new0')")
      val got = spark.sql("SELECT id, v FROM sev7.t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val victim = EpochStore.bucketIdOf(0L, LongType, 8)
      val survivors = (0 until 16).map(_.toLong)
        .filterNot(id => EpochStore.bucketIdOf(id, LongType, 8) == victim)
      assert(survivors.forall(id => got.get(id).contains(s"v$id")),
        s"unwritten buckets of the NORMALIZED store survive: $got")
      assert(got(0L) == "new0")
      assert((0 until 16).map(_.toLong)
        .filter(id => EpochStore.bucketIdOf(id, LongType, 8) == victim &&
          id != 0L)
        .forall(id => !got.contains(id)),
        "the written bucket's old rows are replaced")
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("pair-granular dynamic INSERT OVERWRITE refuses foreign-spec " +
      "entries on an evolved composite store") {
    import spark.implicits._
    val wh = tmp()
    cat("sev7b", wh)
    val root = s"$wh/t"
    val langs = IndexedSeq("en", "de")
    (0 until 16).map(i => (i.toLong, s"v$i", langs(i % 2)))
      .toDF("id", "v", "lang")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("partitionColumn", "lang")
      .option("bucketColumn", "id").option("bucketCount", "2").save()
    spark.sql("CALL sev7b.system.evolve_layout('t', " +
      "partition_columns => 'lang', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE sev7b.t VALUES (0, 'new0', 'en')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("migrate_layout or compact"), msgs)
      assert(spark.sql("SELECT count(*) FROM sev7b.t").head.getLong(0) == 16L)
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("a layout-log store whose pinned entries ALL sit on the current " +
      "layout still gates mid-stream foreign-spec appends — the tail " +
      "refuses loudly instead of silently delivering nothing") {
    import spark.implicits._
    val wh = tmp()
    cat("sev8", wh)
    val root = s"$wh/t"
    (0 until 8).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("bucketColumn", "id").option("bucketCount", "4").save()
    // the log matches what the only entry records: at stream start the
    // template has NO non-identity profile — the gate must key on the
    // log's existence, not on profiles existing
    spark.sql("CALL sev8.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    val q = spark.readStream.format("epochstore")
      .schema(spark.table("sev8.t").schema)
      .option("path", root).load()
      .writeStream.format("memory").queryName("sev8_tail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sev8_tail").count() == 8L)
      // mid-stream PATH write with stale layout options lands a
      // foreign-spec entry: identity(v) dirs the pinned template would
      // list under the bucket layout — matching nothing
      (100 until 104).map(i => (i.toLong, s"n$i")).toDF("id", "v")
        .write.format("epochstore").mode("append")
        .option("path", root).option("epoch", "1")
        .option("partitionColumn", "v").save()
      val e = intercept[Exception] { q.processAllAvailable() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("partition spec this tail did not pin"),
        s"mid-stream foreign append must refuse, not vanish: $msgs")
    } finally q.stop()
  }

  test("RENAME/DROP of a live foreign-layout entry's recorded partition " +
      "column refuses (every scan would throw); normalization reopens it") {
    import spark.implicits._
    val wh = tmp()
    cat("sev9", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i",
      if (i % 2 == 0) "en" else "de")).toDF("id", "v", "lang"),
      root, 0L, partitionColumn = "lang")
    spark.sql("CALL sev9.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    // lang is no partition column of the CURRENT layout, but the live
    // epoch-0 entry still walks lang= dirs under its recorded spec
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE sev9.t RENAME COLUMN lang TO language")
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE sev9.t DROP COLUMN lang")
    }
    assert(e2.getMessage.contains("partition"), e2.getMessage)
    // the store stayed readable throughout
    assert(spark.sql("SELECT count(*) FROM sev9.t WHERE lang = 'en'")
      .head.getLong(0) == 5L)
    // compact rewrites the entry under the logged layout (lang becomes
    // a file column) — the rename is safe now and reopens
    spark.sql("CALL sev9.system.compact('t')").collect()
    spark.sql("ALTER TABLE sev9.t RENAME COLUMN lang TO language")
    assert(spark.sql(
      "SELECT count(*) FROM sev9.t WHERE language = 'en'")
      .head.getLong(0) == 5L)
  }

  test("GROUPED metadata-only aggregation over a mixed snapshot: every " +
      "entry dir-serves the current identity columns, each under its " +
      "own nesting — the agg answers from sidecars, exactly") {
    import spark.implicits._
    val wh = tmp()
    cat("sev10", wh)
    val root = s"$wh/t"
    val langs = IndexedSeq("en", "de", "fr")
    // epoch 0: identity (lang, grp) — a SUPERSET of the future layout,
    // lang at a different nesting position than grp
    (0 until 30).map(i => (i.toLong, langs(i % 3), (i % 2).toString))
      .toDF("id", "lang", "grp")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("partitionColumn", "grp,lang").save()
    spark.sql("CALL sev10.system.evolve_layout('t', " +
      "partition_columns => 'lang')").collect()
    spark.sql("INSERT INTO sev10.t VALUES " +
      (100 until 106).map(i => s"($i, '${langs(i % 3)}', 'x')")
        .mkString(", "))
    val agg = spark.sql("SELECT lang, count(*) AS n, min(id) AS mn " +
      "FROM sev10.t GROUP BY lang ORDER BY lang")
    val scans = agg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      "grouped aggregation must stay metadata-only when every entry " +
        s"dir-serves the grouping columns: ${agg.queryExecution}")
    val got = agg.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(("de", 12L, 1L), ("en", 12L, 0L), ("fr", 12L, 2L))
    assert(got == want, s"$got vs $want")
    // the count-only shape answers from the SIDECARS alone (row counts
    // are always recorded) — not even a footer opens, per entry spec
    val cnt = spark.sql(
      "SELECT lang, count(*) AS n FROM sev10.t GROUP BY lang ORDER BY lang")
    assert(cnt.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collectFirst {
      case s: graft.sources.EpochStoreAggScan => s.answeredFromSidecars
    }.contains(true), "the sidecar tier must answer the grouped count")
    assert(cnt.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("de", 12L), ("en", 12L), ("fr", 12L)))
  }
}
