package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import graft.sources.{EpochStore, EpochStoreScan}
import graft.core.EpochManifest

/** X89 — `CALL migrate_layout`: partition-spec evolution by rewrite.
  * The whole store folds into one entry under a NEW identity/bucket/
  * sort layout in one atomic commit; answers are unchanged, the new
  * layout's pruning tiers serve immediately, the OLD layout stays
  * time-travelable one gc cycle, and racing commits refuse. */
class MigrateLayoutSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_mig").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): EpochStoreScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collect { case s: EpochStoreScan => s }.head

  test("lang-partitioned store migrates to a sorted bucket layout: " +
      "answers unchanged, bucket probe prunes, old layout time-travels") {
    import spark.implicits._
    val wh = tmp()
    cat("migc", wh)
    val root = s"$wh/docs"
    val rows = (0 until 120).map(i =>
      (i.toLong, s"v$i", if (i % 3 == 0) "en" else if (i % 3 == 1) "de"
      else "fr"))
    EpochStore.write(rows.take(60).toDF("id", "v", "lang"), root, 0L,
      partitionColumn = "lang")
    EpochStore.write(rows.drop(60).toDF("id", "v", "lang"), root, 1L,
      partitionColumn = "lang")
    val gOld = EpochManifest.generations(spark, root).last

    spark.sql("CALL migc.system.migrate_layout('docs', " +
      "bucket_column => 'id', bucket_count => 8, sort_columns => 'id')")
      .collect()

    // answers unchanged; lang now a FILE column (still filterable)
    val t = spark.table("migc.docs")
    assert(t.count() == 120)
    assert(t.filter($"lang" === "en").count() == 40)
    // the new layout's bucket probe opens 1-of-8 dirs
    val probe = t.filter($"id" === 17L)
    assert(probe.count() == 1)
    assert(scanOf(probe).selectedPartitionDirs == (1, 8),
      s"probe must open one bucket: ${scanOf(probe).selectedPartitionDirs}")
    // sorted single-entry layout reports its order
    assert(scanOf(t).outputOrdering().nonEmpty)
    // the old lang-partitioned layout stays time-travelable
    val old = spark.sql(s"SELECT * FROM migc.docs VERSION AS OF $gOld")
    assert(old.count() == 120)
    assert(scanOf(old.filter($"lang" === "en"))
      .selectedPartitionDirs == (2, 6),
      "the pre-migration snapshot must keep its lang-dir pruning")
  }

  test("restore_snapshot rolls the head back in one commit: answers " +
      "revert, the rolled-back commit stays time-travelable, expired " +
      "generations refuse") {
    import spark.implicits._
    val wh = tmp()
    cat("resc", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root, 0L)
    spark.sql("CALL resc.system.tag('t', 'clean')").collect()
    val gClean = EpochManifest.generations(spark, root).last
    spark.sql("DELETE FROM resc.t WHERE id < 10")
    assert(spark.sql("SELECT count(*) FROM resc.t").head.getLong(0) == 30L)
    val gBad = EpochManifest.generations(spark, root).last
    // restore by TAG: the full corpus is back
    spark.sql("CALL resc.system.restore_snapshot('t', tag => 'clean')")
      .collect()
    assert(spark.sql("SELECT count(*) FROM resc.t").head.getLong(0) == 40L)
    // the rolled-back (deleted) state stays time-travelable
    assert(spark.sql(s"SELECT count(*) FROM resc.t VERSION AS OF $gBad")
      .head.getLong(0) == 30L)
    // restore by generation works too, and an unretained one refuses
    spark.sql(s"CALL resc.system.restore_snapshot('t', $gClean)").collect()
    assert(spark.sql("SELECT count(*) FROM resc.t").head.getLong(0) == 40L)
    val e = intercept[Exception] {
      spark.sql("CALL resc.system.restore_snapshot('t', 99999)").collect() }
    assert(e != null)
    // EPOCH HIGH-WATER: roll back an APPEND (the epoch counter had
    // advanced) — post-restore appends must NOT reuse the rolled-back
    // epoch numbers, or a changefeed based before the restore would
    // silently drop the reused epochs forever
    spark.sql("CALL resc.system.tag('t', 'pre_bad')").collect()
    spark.sql("INSERT INTO resc.t VALUES (400, 'bad')")
    val badMax = EpochManifest.entries(spark, root).map(_.epoch).max
    spark.sql("CALL resc.system.restore_snapshot('t', tag => 'pre_bad')")
      .collect()
    assert(spark.sql("SELECT count(*) FROM resc.t").head.getLong(0) == 40L)
    spark.sql("INSERT INTO resc.t VALUES (500, 'fresh')")
    val es = EpochManifest.entries(spark, root)
    assert(es.map(_.epoch).max > badMax,
      s"post-restore append must allocate ABOVE the rolled-back high " +
        s"water $badMax: ${es.map(_.epoch).sorted}")
    assert(spark.sql("SELECT count(*) FROM resc.t").head.getLong(0) == 41L)
    assert(spark.sql("SELECT count(*) FROM resc.t WHERE id = 500")
      .head.getLong(0) == 1L)
  }

  test("remove_orphan_files: deletes only aged NEVER-COMMITTED dirs — " +
      "committed history and retained generations are untouchable") {
    import spark.implicits._
    val wh = tmp()
    cat("orph", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root, 0L)
    EpochStore.write((20 until 40).map(i => (i.toLong, s"w$i")).toDF("id", "v"),
      root, 1L)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a crashed writer's staging leftover: never committed, aged out
    val orphan = new org.apache.hadoop.fs.Path(s"$root/d9-99")
    fs.mkdirs(orphan)
    fs.setTimes(orphan, System.currentTimeMillis() - 10L * 3600000L, -1)
    val gens = graft.core.EpochManifest.generations(spark, root)
    val dry = spark.sql(
      "CALL orph.system.remove_orphan_files('t', dry_run => true)")
      .collect()
    assert(dry.map(_.getString(0)).toSeq == Seq("d9-99"),
      s"only the aged orphan is a candidate: ${dry.toSeq}")
    assert(!dry.head.getBoolean(1) && fs.exists(orphan),
      "dry_run must not delete")
    val real = spark.sql(
      "CALL orph.system.remove_orphan_files('t')").collect()
    assert(real.map(_.getString(0)).toSeq == Seq("d9-99") &&
      !fs.exists(orphan))
    // committed history untouched: every retained generation still
    // resolves and the data answers exactly
    assert(graft.core.EpochManifest.generations(spark, root) == gens,
      "remove_orphan_files must never expire manifests")
    gens.foreach(g => assert(spark.sql(
      s"SELECT count(*) FROM orph.t VERSION AS OF $g").head.getLong(0) > 0))
    assert(spark.sql("SELECT count(*) FROM orph.t").head.getLong(0) == 40L)
  }

  test("bucket store migrates back to identity partitioning; stats " +
      "survive the rewrite; live MoR tombstones refuse") {
    import spark.implicits._
    val wh = tmp()
    cat("migd", wh)
    val root = s"$wh/t"
    EpochStore.writeBucketed((0 until 80).map(i =>
      (i.toLong, s"L${i % 4}")).toDF("id", "grp"), root, 0L,
      bucketColumn = "id", bucketCount = 4, statsColumns = Seq("id"))
    EpochStore.migrateLayout(spark, root, partitionColumns = Seq("grp"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType)))
    val df = EpochStore.read(spark, root, schema, "grp")
    assert(df.count() == 80)
    val pruned = df.filter(col("grp") === "L2")
    assert(pruned.count() == 20)
    assert(scanOf(pruned).selectedPartitionDirs == (1, 4))
    // id stats re-derived: a range probe skips files
    val st = scanOf(df).estimateStatistics()
    assert(!st.columnStats().isEmpty,
      "migrated store must keep its column stats")

    // a row-identity store with LIVE tombstones refuses migration
    val root2 = s"$wh/u"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root2, 0L)
    graft.sources.EpochStoreDelta.declare(spark, root2, Seq("id"))
    spark.sql("DELETE FROM migd.u WHERE id = 3")
    val e = intercept[Exception] {
      EpochStore.migrateLayout(spark, root2, partitionColumns = Seq("v")) }
    assert(e.getMessage.contains("tombstone"),
      s"live tombstones must refuse migration: ${e.getMessage}")
  }

  test("remove_orphan_files refuses an age inside the in-flight-writer " +
      "window without force; dry_run may peek; force proceeds") {
    import spark.implicits._
    val wh = tmp()
    cat("orpf", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root, 0L)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a FRESH staging dir — exactly what a live concurrent writer looks
    // like right before its manifest commit
    val staged = new org.apache.hadoop.fs.Path(s"$root/d7-77")
    fs.mkdirs(staged)
    val e = intercept[Exception] {
      spark.sql(
        "CALL orpf.system.remove_orphan_files('t', older_than_hours => 0)")
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msgs.contains("in-flight-writer"),
      s"short age must refuse with the reason: $msgs")
    assert(fs.exists(staged), "nothing may be deleted on refusal")
    // dry_run may peek below the floor without deleting
    val dry = spark.sql("CALL orpf.system.remove_orphan_files('t', " +
      "older_than_hours => 0, dry_run => true)").collect()
    assert(dry.map(_.getString(0)).contains("d7-77") && fs.exists(staged))
    // force proceeds (caller asserts no writer can be live)
    val forced = spark.sql("CALL orpf.system.remove_orphan_files('t', " +
      "older_than_hours => 0, force => true)").collect()
    assert(forced.map(_.getString(0)).contains("d7-77") && !fs.exists(staged))
    assert(spark.sql("SELECT count(*) FROM orpf.t").head.getLong(0) == 10L)
  }

  test("restore_snapshot surfaces the still-applied delete journal " +
      "(live_tombstones column) and restores ACROSS a TRUNCATE to an " +
      "empty snapshot without degrading the store") {
    import spark.implicits._
    val wh = tmp()
    cat("resj", wh)
    val root = s"$wh/t"
    spark.sql("CREATE TABLE resj.t (id BIGINT, v STRING) USING epochstore")
    spark.sql("INSERT INTO resj.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("CALL resj.system.tag('t', 'full')").collect()
    // an engine-level keyed-delete journal entry lands AFTER the tag
    EpochStore.delete(spark, root, Seq(2L).toDF("id"), epoch = 100L)
    val res = spark.sql(
      "CALL resj.system.restore_snapshot('t', tag => 'full')").collect()
    assert(res.head.schema.fieldNames.contains("live_tombstones"),
      "the divergence from Delta RESTORE must be surfaced in the result")
    assert(res.head.getAs[Long]("live_tombstones") == 1L,
      s"one journaled key still applies: ${res.head}")

    // restore-to-empty: TRUNCATE commits a ZERO-entry generation; the
    // high-water marker the restore commits must still carry a schema
    // record (derived from the CURRENT snapshot) so catalog loads and
    // evolvedSchema keep working
    spark.sql("INSERT INTO resj.t VALUES (4, 'd')")
    spark.sql("CALL resj.system.tag('t', 'pre_empty')").collect()
    spark.sql("TRUNCATE TABLE resj.t")
    spark.sql("CALL resj.system.tag('t', 'empty')").collect()
    spark.sql("INSERT INTO resj.t VALUES (9, 'z')")
    val r2 = spark.sql(
      "CALL resj.system.restore_snapshot('t', tag => 'empty')").collect()
    assert(r2.head.getAs[Int]("entries") >= 1,
      "the restore-to-empty head carries the marker entry")
    assert(spark.sql("SELECT count(*) FROM resj.t").head.getLong(0) == 0L,
      "restored-to-empty table must read empty")
    assert(spark.table("resj.t").schema.fieldNames.toSeq ==
      Seq("id", "v"), "schema must survive the restore-to-empty")
    // appends keep working above the preserved high water
    spark.sql("INSERT INTO resj.t VALUES (10, 'post')")
    assert(spark.sql("SELECT count(*) FROM resj.t").head.getLong(0) == 1L)
  }
}
