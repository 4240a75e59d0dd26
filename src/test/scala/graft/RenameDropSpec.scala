package graft

import org.apache.spark.sql.functions._
import graft.sources.EpochStore
import graft.core.EpochManifest

/** X85 — RENAME / DROP column evolution: the column-ops log
  * (`_manifests/columns.v<N>.json`) maps entries' as-written (physical)
  * names to the current (logical) schema. Old entries keep their files
  * untouched and serve the renamed column through per-profile reader
  * factories; dropped names (and renamed-away ones) can never be
  * re-added; layout-critical columns refuse the DDL; compaction folds
  * a renamed store back to single-profile. */
class RenameDropSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_ren").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("RENAME COLUMN serves old entries' data under the new name, " +
      "filters stay correct, INSERTs land under it, compaction folds " +
      "the spellings away") {
    import spark.implicits._
    val wh = tmp()
    cat("renc", wh)
    val root = s"$wh/docs"
    EpochStore.write((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root, 0L)
    spark.sql("ALTER TABLE renc.docs RENAME COLUMN v TO val")

    // logical schema speaks the new name; the old one is gone
    val cols = spark.table("renc.docs").columns.toSeq
    assert(cols == Seq("id", "val"), s"got $cols")
    // old entries' values serve under the new name
    assert(spark.sql("SELECT val FROM renc.docs WHERE id = 7")
      .head.getString(0) == "v7")
    // a residual filter on the renamed column stays correct over the
    // pre-rename entry (the pushed filter translates per profile)
    assert(spark.sql("SELECT count(*) FROM renc.docs WHERE val = 'v33'")
      .head.getLong(0) == 1L)

    // post-rename INSERT writes the new name; both profiles read in one
    // query
    spark.sql("INSERT INTO renc.docs VALUES (100, 'v100')")
    assert(spark.sql("SELECT count(*) FROM renc.docs WHERE val LIKE 'v%'")
      .head.getLong(0) == 51L)
    assert(spark.sql(
      "SELECT val FROM renc.docs WHERE id IN (7, 100) ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("v7", "v100"))

    // time travel serves the CURRENT names over the old snapshot
    val gens = EpochManifest.generations(spark, root)
    val tt = spark.sql(
      s"SELECT * FROM renc.docs VERSION AS OF ${gens.head}")
    assert(tt.columns.toSeq == Seq("id", "val") && tt.count() == 50)

    // compaction rewrites to the logical spelling: the fold's record
    // has no alias left and the data still reads
    EpochStore.compactStore(spark, root, parts = 2)
    assert(spark.sql("SELECT count(*) FROM renc.docs WHERE val = 'v100'")
      .head.getLong(0) == 1L)
    val foldRecs = EpochManifest.entries(spark, root).map { e =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, e.dir, "_schema.json")), "UTF-8")
    }
    assert(foldRecs.forall(b => b.contains("\"val\"") && !b.contains("\"v\"")),
      s"fold must record the logical spelling only:\n${foldRecs.mkString}")
  }

  test("DROP COLUMN removes the column; dropped and renamed-away names " +
      "refuse re-ADD; layout columns refuse the DDL") {
    import spark.implicits._
    val wh = tmp()
    cat("rend", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 20).map(i => (i.toLong, s"v$i", i * 2.0))
      .toDF("id", "v", "score"), root, 0L, partitionColumn = null)
    spark.sql("ALTER TABLE rend.t DROP COLUMN score")
    assert(spark.table("rend.t").columns.toSeq == Seq("id", "v"))
    assert(spark.sql("SELECT sum(id) FROM rend.t").head.getLong(0) == 190L)
    // re-adding the dropped name refuses (an old entry still holds it)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE rend.t ADD COLUMNS (score DOUBLE)") }
    assert(e1.getMessage.contains("renamed away or dropped"))
    // renamed-away names refuse re-add and re-use
    spark.sql("ALTER TABLE rend.t RENAME COLUMN v TO w")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE rend.t ADD COLUMNS (v STRING)") }
    assert(e2.getMessage.contains("renamed away or dropped"))
    spark.sql("ALTER TABLE rend.t RENAME COLUMN w TO u")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE rend.t RENAME COLUMN u TO v") }
    assert(e3.getMessage.contains("RETIRED"))
    // the twice-renamed chain still serves the original data
    assert(spark.sql("SELECT u FROM rend.t WHERE id = 3")
      .head.getString(0) == "v3")

    // partition and bucket columns refuse
    val proot = s"$wh/p"
    EpochStore.write((0 until 9).map(i => (i.toLong, s"L${i % 3}"))
      .toDF("id", "lang"), proot, 0L, partitionColumn = "lang")
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE rend.p RENAME COLUMN lang TO language") }
    assert(e4.getMessage.contains("partition"))
    val broot = s"$wh/b"
    EpochStore.writeBucketed((0 until 16).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), broot, 0L, bucketColumn = "id", bucketCount = 4)
    val e5 = intercept[Exception] {
      spark.sql("ALTER TABLE rend.b DROP COLUMN id") }
    assert(e5.getMessage.contains("bucket"))
  }

  test("DELETE and UPDATE stay correct on a renamed store (row-level " +
      "rewrite route); filtered INSERT OVERWRITE refuses") {
    import spark.implicits._
    val wh = tmp()
    cat("renu", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 30).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    spark.sql("ALTER TABLE renu.t RENAME COLUMN v TO val")
    // the filtered replaced-set resolution (static filtered INSERT
    // OVERWRITE / metadata DELETE) refuses while a live entry still
    // spells `val` as physical `v` — its per-entry binding speaks
    // physical names
    val e = intercept[Exception] {
      graft.sources.EpochStoreDml.resolveDelete(spark, root,
        Array(org.apache.spark.sql.sources.EqualTo("val", "v9")))
    }
    assert(e.getMessage.contains("pre-RENAME"), e.getMessage)
    spark.sql("DELETE FROM renu.t WHERE val = 'v5'")
    assert(spark.sql("SELECT count(*) FROM renu.t").head.getLong(0) == 29L)
    spark.sql("UPDATE renu.t SET val = 'updated' WHERE id = 6")
    assert(spark.sql("SELECT val FROM renu.t WHERE id = 6")
      .head.getString(0) == "updated")
    assert(spark.sql("SELECT count(*) FROM renu.t").head.getLong(0) == 29L)
    // the row-level rewrites re-landed every live entry under the
    // CURRENT names — the gate keys on live entry need (liveAliasNeed),
    // not the immutable ops log, so the metadata path reopens
    assert(!EpochStore.liveAliasNeed(spark, root),
      "the CoW rewrites normalized the spellings")
    val surv = graft.sources.EpochStoreDml.resolveDelete(spark, root,
      Array(org.apache.spark.sql.sources.EqualTo("val", "v9")))
    assert(surv.nonEmpty, "post-rewrite resolution must work")
  }

  test("one ALTER batch validates sequentially: dropping every column " +
      "and double-renames to one target refuse") {
    import spark.implicits._
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val wh = tmp()
    cat("renb", wh)
    EpochStore.write(Seq((1L, "a", "b")).toDF("id", "x", "y"), s"$wh/t", 0L)
    val c = spark.sessionState.catalogManager.catalog("renb")
      .asInstanceOf[graft.sources.EpochStoreCatalog]
    val ident = Identifier.of(Array.empty, "t")
    val e1 = intercept[Exception] { c.alterTable(ident,
      TableChange.deleteColumn(Array("id"), false),
      TableChange.deleteColumn(Array("x"), false),
      TableChange.deleteColumn(Array("y"), false)) }
    assert(e1.getMessage.contains("last column"), e1.getMessage)
    val e2 = intercept[Exception] { c.alterTable(ident,
      TableChange.renameColumn(Array("x"), "z"),
      TableChange.renameColumn(Array("y"), "z")) }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // nothing landed: the table still has its three columns
    assert(spark.table("renb.t").columns.toSeq == Seq("id", "x", "y"))
  }

  test("column-ops log is multi-writer: racing appends all land exactly " +
      "once, each validated against the log it actually follows") {
    import spark.implicits._
    val wh = tmp()
    val root = s"$wh/t"
    EpochStore.write((0 until 8).map(i =>
      (i.toLong, s"a$i", s"b$i", s"c$i", s"d$i"))
      .toDF("id", "c1", "c2", "c3", "c4"), root, 0L)
    val sparkRef = spark
    val threads = (1 to 4).map { i =>
      new Thread(() => EpochManifest.appendColumnOps(sparkRef, root,
        Seq(EpochManifest.ColumnOp.Rename(s"c$i", s"r$i"))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val ops = EpochManifest.columnOps(spark, root)
    assert(ops.size == 4 && ops.toSet == (1 to 4).map(i =>
      EpochManifest.ColumnOp.Rename(s"c$i", s"r$i")).toSet,
      s"all four racing ops must land exactly once: $ops")
    // and the served schema reflects every rename
    cat("renocc", wh)
    assert(spark.table("renocc.t").columns.toSeq ==
      Seq("id", "r1", "r2", "r3", "r4"))
    assert(spark.sql("SELECT r3 FROM renocc.t WHERE id = 5")
      .head.getString(0) == "c5")
  }

  test("q_store_rename matches the raw-table recomputation of its oracle") {
    val got = graft.queries.MiscCatalog.storeRename(spark, sf0001)
      .collect().toSeq.map(_.toSeq)
    val want = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("lang").isNotNull)
      .filter(col("n_chars").cast("long") > 300)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(col("n_chars").cast("long")).as("chars"))
      .orderBy("lang").collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty && got == want, s"got=$got\nwant=$want")
  }

  test("aggregate pushdown is alias-aware: COUNT/MIN/MAX over a renamed " +
      "store stay metadata-only and exact; the rename gates reopen after " +
      "compaction (liveAliasNeed, not the immutable ops log)") {
    import spark.implicits._
    val wh = tmp()
    cat("rag", wh)
    val root = s"$wh/t"
    // pre-rename epoch: column `x`, with x-stats in the sidecars
    EpochStore.write((0 until 40).map(i => (i.toLong, i * 2L,
      if (i % 2 == 0) "a" else "b")).toDF("id", "x", "p"),
      root, 0L, partitionColumn = "p", statsColumns = Seq("x"))
    spark.sql("ALTER TABLE rag.t RENAME COLUMN x TO score")
    // post-rename epoch written under the current name
    spark.sql("INSERT INTO rag.t VALUES (100, 999, 'a')")
    assert(EpochStore.liveAliasNeed(spark, root),
      "the pre-rename epoch still serves `score` as physical `x`")

    // the aggregate must PUSH (pre-fix the rename history disabled the
    // metadata path forever) and fold each entry under its OWN spelling
    val agg = spark.sql("SELECT count(*) AS n, count(score) AS ns, " +
      "min(score) AS mn, max(score) AS mx FROM rag.t")
    val scans = agg.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.EpochStoreAggScan]),
      s"aggregate must push on the renamed store: $scans")
    assert(agg.collect().map(_.toSeq).toSeq ==
      Seq(Seq(41L, 41L, 0L, 999L)), s"alias-aware fold diverged")
    // grouped by the (never-renamed) partition column too
    val grouped = spark.sql("SELECT p, max(score) AS mx FROM rag.t " +
      "GROUP BY p ORDER BY p").collect().map(_.toSeq).toSeq
    assert(grouped == Seq(Seq("a", 999L), Seq("b", 78L)), s"got $grouped")

    // filtered INSERT OVERWRITE refuses while a live entry needs
    // aliasing — with the message's promise...
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE rag.t PARTITION (p = 'a') " +
        "VALUES (500, 1)")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msgs.contains("CALL compact"),
      s"refusal must name the remedy:\n$msgs")
    // ...actually KEPT: after compaction rewrites entries to current
    // names, the gate reopens (pre-fix it keyed on the immutable ops
    // log and refused forever)
    EpochStore.compactStore(spark, root, parts = 1)
    assert(!EpochStore.liveAliasNeed(spark, root),
      "compaction rewrote every entry to the current names")
    spark.sql("INSERT OVERWRITE rag.t PARTITION (p = 'a') " +
      "VALUES (100, 999)")
    val post = spark.sql(
      "SELECT p, count(*) AS n FROM rag.t GROUP BY p ORDER BY p")
      .collect().map(_.toSeq).toSeq
    assert(post == Seq(Seq("a", 1L), Seq("b", 20L)),
      s"overwrite must replace only p='a': $post")
    // and the metadata-first DELETE path reopens with it
    spark.sql("DELETE FROM rag.t WHERE p = 'b'")
    assert(spark.sql("SELECT count(*) FROM rag.t").head.getLong(0) == 1L)
  }

  test("streaming tail over a RENAME-history store: pre-rename epochs " +
      "serve the current names per profile, no compaction prerequisite; " +
      "a mid-stream rename refuses loudly") {
    import spark.implicits._
    val wh = tmp()
    cat("rst", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 20).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    spark.sql("ALTER TABLE rst.t RENAME COLUMN v TO val")
    spark.sql("INSERT INTO rst.t VALUES (100, 'v100')")
    // the tail starts on the MIXED-spelling history and drains both
    // epochs — the pre-rename epoch's rows serve under `val`
    val q = spark.readStream.format("epochstore")
      .schema(spark.table("rst.t").schema)
      .option("path", root).load()
      .select(col("id"), col("val"))
      .writeStream.format("memory").queryName("rst_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("rst_tail").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val want = ((0 until 20).map(i => (i.toLong, s"v$i")) :+
      (100L, "v100")).sortBy(_._1)
    assert(got == want, s"tail must serve the current names over both " +
      s"profiles: got ${got.take(5)}…")

    // mid-stream rename: the running query's mapping is pinned at
    // start — a rename landing between triggers refuses loudly
    val q2 = spark.readStream.format("epochstore")
      .schema(spark.table("rst.t").schema)
      .option("path", root).option("maxEpochsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("rst_tail2").start()
    try {
      q2.processAllAvailable()
      spark.sql("ALTER TABLE rst.t RENAME COLUMN val TO value")
      spark.sql("INSERT INTO rst.t VALUES (200, 'v200')")
      val e = intercept[Exception] { q2.processAllAvailable() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("landed") && msgs.contains("restart"),
        s"mid-stream rename must refuse with the remedy: $msgs")
    } finally q2.stop()
    // a RESTARTED tail picks up the new mapping and serves `value`
    val q3 = spark.readStream.format("epochstore")
      .schema(spark.table("rst.t").schema)
      .option("path", root).load()
      .select(col("id"), col("value"))
      .writeStream.format("memory").queryName("rst_tail3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q3.awaitTermination(60000)
    assert(spark.table("rst_tail3").count() == 22)
    assert(spark.table("rst_tail3").filter(col("id") === 7L)
      .head.getString(1) == "v7")
  }

  test("mid-stream ADD COLUMN is pure widening: the running tail keeps " +
      "flowing under its pinned shape; a restart serves the merged " +
      "schema with nulls for pre-column rows") {
    import spark.implicits._
    val wh = tmp()
    cat("radd", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root, 0L)
    val q = spark.readStream.format("epochstore")
      .schema(spark.table("radd.t").schema)
      .option("path", root).load()
      .writeStream.format("memory").queryName("radd_tail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("radd_tail").count() == 10L)
      // ADD COLUMN lands mid-stream (an empty widened epoch + a write
      // carrying the new column): non-destructive — the running tail
      // keeps flowing under the shape it pinned at start, the new
      // column's values simply not selected until a restart re-pins
      spark.sql("ALTER TABLE radd.t ADD COLUMNS (score DOUBLE)")
      spark.sql("INSERT INTO radd.t VALUES (100, 'v100', 1.5)")
      q.processAllAvailable()
      val got = spark.table("radd_tail").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got.size == 11 && got.last == (100L, "v100"),
        s"the tail must keep flowing across ADD COLUMN: $got")
    } finally q.stop()
    // restart: the merged schema serves — old rows null, new row valued
    val q2 = spark.readStream.format("epochstore")
      .schema(spark.table("radd.t").schema)
      .option("path", root).load()
      .writeStream.format("memory").queryName("radd_tail2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val rows = spark.table("radd_tail2").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows.size == 11)
    assert(rows(100L).contains(1.5) && rows(0L).isEmpty,
      s"merged schema after restart: $rows")
  }
}
