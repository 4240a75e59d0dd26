package graft

import org.apache.spark.sql.functions._
import graft.sources.EpochStore
import graft.core.EpochManifest

/** X84 — metadata tables over a manifest store (`$history` / `$files` /
  * `$partitions` / `$refs`): SQL-readable, driver-computed, planned as
  * a LocalTableScan (no tasks). Counts must agree with the data, the
  * nested `cat.store.kind` spelling must resolve, and a real store
  * named like a kind must shadow the metadata resolution. */
class MetaTablesSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_meta").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("partitions/files/history/refs agree with the data and plan " +
      "as LocalTableScan") {
    import spark.implicits._
    val wh = tmp()
    cat("metac", wh)
    val root = s"$wh/docs"
    val df0 = (0 until 60).map(i => (i.toLong, s"v$i", if (i % 3 == 0) "en"
      else if (i % 3 == 1) "de" else "fr")).toDF("id", "v", "lang")
    EpochStore.write(df0.filter($"id" < 30), root, 0L,
      partitionColumn = "lang")
    EpochStore.write(df0.filter($"id" >= 30), root, 1L,
      partitionColumn = "lang")
    EpochManifest.tag(spark, root, "gold")
    EpochManifest.createBranch(spark, root, "audit")

    // $partitions: per-lang row counts equal the data's
    val parts = spark.sql(
      "SELECT lang, rows FROM metac.`docs$partitions` ORDER BY lang")
    val planStr = parts.queryExecution.executedPlan.toString
    assert(planStr.contains("LocalTableScan"),
      s"metadata table must plan as LocalTableScan:\n$planStr")
    val got = parts.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = df0.groupBy("lang").count().orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got=$got want=$want")

    // $files: row-count sum equals the table's count; bytes positive
    val files = spark.sql("SELECT * FROM metac.`docs$files`")
    assert(files.agg(sum("rows")).head.getLong(0) == 60L)
    assert(files.filter($"bytes" <= 0L).count() == 0)
    assert(files.select("epoch").distinct().count() == 2)

    // nested Iceberg-style spelling resolves the same rows
    assert(spark.sql("SELECT sum(rows) FROM metac.docs.files")
      .head.getLong(0) == 60L)

    // $history: one row per retained generation, head flagged
    val hist = spark.sql(
      "SELECT generation, entries, is_current FROM metac.`docs$history` " +
        "ORDER BY generation").collect()
    assert(hist.nonEmpty && hist.last.getBoolean(2) &&
      hist.init.forall(!_.getBoolean(2)))
    assert(hist.last.getInt(1) == 2) // two live entries at head

    // $refs: the tag pins a generation, the branch pins none
    val refs = spark.sql(
      "SELECT name, type, generation FROM metac.`docs$refs` ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.isNullAt(2)))
    assert(refs.toSeq == Seq(("audit", "branch", true),
      ("gold", "tag", false)))
  }

  test("bucketed store's partitions carry bucket_id; a real store named " +
      "'files' shadows the nested metadata spelling") {
    import spark.implicits._
    val wh = tmp()
    cat("metab", wh)
    EpochStore.writeBucketed((0 until 64).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), s"$wh/docs", 0L, bucketColumn = "id",
      bucketCount = 4)
    val parts = spark.sql(
      "SELECT bucket_id, rows FROM metab.`docs$partitions` ORDER BY bucket_id")
      .collect()
    assert(parts.length == 4 && parts.map(_.getLong(1)).sum == 64L)

    // a real nested store named "files" wins over the metadata kind
    val inner = s"$wh/ns/files"
    EpochStore.write(Seq((1L, "x")).toDF("id", "v"), inner, 0L)
    assert(spark.sql("SELECT count(*) FROM metab.ns.files")
      .head.getLong(0) == 1L)

    // the SAME rule for the dollar spelling: a real store whose
    // directory is literally `docs$files` wins over docs' metadata
    // table — before the fix, the $ branch shadowed it unconditionally
    EpochStore.write((0 until 7).map(i => (i.toLong, s"d$i"))
      .toDF("id", "v"), s"$wh/docs$$files", 0L)
    assert(spark.sql("SELECT count(*) FROM metab.`docs$files`")
      .head.getLong(0) == 7L,
      "a real store named docs$files must stay reachable")
    // and a store with no such clash keeps its metadata table
    assert(spark.sql("SELECT count(*) FROM metab.`docs$partitions`")
      .head.getLong(0) == 4L)
  }

  test("metadata tables compose with VERSION AS OF: files describes the " +
      "pinned snapshot") {
    import spark.implicits._
    val wh = tmp()
    cat("metav", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 30).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      root, 0L)
    val g0 = graft.core.EpochManifest.generations(spark, root).last
    EpochStore.write((30 until 50).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      root, 1L)
    assert(spark.sql("SELECT sum(rows) FROM metav.`t$files`")
      .head.getLong(0) == 50L)
    assert(spark.sql(
      s"SELECT sum(rows) FROM metav.`t$$files` VERSION AS OF $g0")
      .head.getLong(0) == 30L,
      "a pinned files table must describe the pinned snapshot")
  }

  test("metadata tables honor a BRANCH pin: files describes the branch " +
      "head, not main") {
    import spark.implicits._
    val wh = tmp()
    cat("metab2", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 30).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      root, 0L)
    graft.core.EpochManifest.createBranch(spark, root, "audit")
    EpochStore.write((30 until 45).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      root, 1L, branch = "audit")
    assert(spark.sql("SELECT sum(rows) FROM metab2.`t$files`")
      .head.getLong(0) == 30L, "main's files table must not see the branch")
    assert(spark.sql(
      "SELECT sum(rows) FROM metab2.`t$files` VERSION AS OF 'audit'")
      .head.getLong(0) == 45L,
      "the branch-pinned files table must describe the branch head")
  }

  test("q_store_meta matches the raw-table recomputation of its oracle") {
    val got = graft.queries.MiscCatalog.storeMeta(spark, sf0001)
      .collect().toSeq.map(_.toSeq)
    val want = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang").collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty && got == want, s"got=$got\nwant=$want")
  }

  test("metadata tables on a spec-evolved store: $files lists every " +
      "entry under its own layout; $partitions renders per-entry specs " +
      "while mixed and serves typed tuples after normalization") {
    import spark.implicits._
    val wh = tmp()
    cat("metae", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 30).map(i => (i.toLong, s"v$i",
      if (i % 2 == 0) "en" else "de")).toDF("id", "v", "lang"),
      root, 0L, partitionColumn = "lang")
    spark.sql("CALL metae.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    spark.sql("INSERT INTO metae.t VALUES (100, 'x', 'fr')")
    // $files: both specs' files appear, each partition string rendered
    // under its OWN entry's identity columns
    val files = spark.sql(
      "SELECT file, partition, bucket_id FROM metae.`t$files`").collect()
    assert(files.count(_.getString(1) != null) >= 2 &&
      files.filter(_.getString(1) != null)
        .forall(_.getString(1).startsWith("lang=")),
      s"old files must render lang= partitions: ${files.toSeq}")
    assert(files.exists(r => r.getString(1) == null && !r.isNullAt(2)),
      s"the bucketed file must carry its bucket_id: ${files.toSeq}")
    assert(spark.sql("SELECT sum(rows) FROM metae.`t$files`")
      .head.getLong(0) == 31L, "every spec's files must be listed")
    // $partitions while MIXED: one row per (spec, rendered tuple,
    // bucket id), each partition under ITS entry's recorded layout
    val mixedParts = spark.sql(
      "SELECT spec, partition, bucket_id, rows FROM metae.`t$partitions`")
      .collect()
    val bySpec = mixedParts.groupBy(_.getString(0))
    assert(bySpec.keySet == Set("identity(lang)", "bucket(4, id)"),
      s"both specs must render: ${bySpec.keySet}")
    assert(bySpec("identity(lang)")
      .forall(r => r.getString(1).startsWith("lang=") && r.isNullAt(2)),
      s"identity rows: ${mixedParts.toSeq}")
    assert(bySpec("bucket(4, id)")
      .forall(r => r.isNullAt(1) && !r.isNullAt(2)),
      s"bucket rows: ${mixedParts.toSeq}")
    assert(mixedParts.map(_.getLong(3)).sum == 31L,
      s"every spec's rows must be counted: ${mixedParts.toSeq}")
    // normalize -> $partitions serves the current (bucket) tuples
    spark.sql("CALL metae.system.compact('t')").collect()
    val parts = spark.sql(
      "SELECT bucket_id, rows FROM metae.`t$partitions` ORDER BY bucket_id")
      .collect()
    assert(parts.map(_.getLong(1)).sum == 31L &&
      parts.forall(!_.isNullAt(0)),
      s"normalized partitions: ${parts.toSeq}")
  }
}
