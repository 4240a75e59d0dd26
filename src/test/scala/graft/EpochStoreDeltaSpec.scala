package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EpochManifest
import graft.sources.{EpochStore, EpochStoreDelta}

/** Merge-on-read row-level operations ([[graft.sources.EpochStoreDelta]],
  * `SupportsDelta`): a store with a declared row identity takes SQL
  * UPDATE/MERGE/DELETE as ONE delta epoch (reinserted rows + equality
  * tombstones inside the entry dir) at DELTA cost, scans apply the
  * tombstones, answers equal the copy-on-write twin, and `CALL compact`
  * folds tombstones physically. */
class EpochStoreDeltaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("n", LongType),
    StructField("lang", StringType)))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_delta").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** 2 epochs × 500 rows, lang-partitioned. */
  private def build(root: String, withRowId: Boolean): Unit = {
    import spark.implicits._
    def rows(off: Int) = (0 until 500).map { i =>
      val id = (i + off).toLong
      (id, id * 10, if (i % 3 == 0) "en" else "de")
    }.toDF("id", "n", "lang")
    EpochStore.write(rows(0), root, 0L, partitionColumn = "lang")
    EpochStore.write(rows(500), root, 1L, partitionColumn = "lang")
    if (withRowId) EpochStoreDelta.declare(spark, root, Seq("id"))
  }

  private def dataRowsOf(root: String, dir: String): Long =
    spark.read.schema(StructType(schema.filterNot(_.name == "lang")))
      .parquet(s"$root/$dir").count()

  test("a 1-row MERGE on a rowid store writes O(1 row), not O(entry): " +
      "one delta epoch, untouched history dirs, exact answers") {
    import spark.implicits._
    val wh = tmp()
    cat("mor1", wh)
    build(s"$wh/t", withRowId = true)
    val before = EpochManifest.entries(spark, s"$wh/t")
    Seq((7L, 777L, "en"), (10007L, 42L, "xx")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor1src")
    spark.sql(
      """MERGE INTO mor1.t t USING mor1src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n
        |WHEN NOT MATCHED THEN INSERT (id, n, lang)
        |  VALUES (s.id, s.n, s.lang)""".stripMargin)
    val after = EpochManifest.entries(spark, s"$wh/t")
    // exactly one NEW entry; every pre-merge dir untouched
    assert(after.size == before.size + 1 &&
      before.map(_.dir).forall(after.map(_.dir).contains),
      s"history must not rewrite: $before -> $after")
    val delta = after.filterNot(e => before.map(_.dir).contains(e.dir)).head
    // delta cost: 2 reinserted rows (1 update + 1 insert), 1 tombstone
    assert(dataRowsOf(s"$wh/t", delta.dir) == 2,
      s"delta entry must hold exactly the touched rows")
    val tombs = EpochStoreDelta.tombstoneFiles(
      hfs(s"$wh/t"), s"$wh/t", delta.dir)
    assert(tombs.nonEmpty)
    assert(spark.read.schema(StructType(Seq(StructField("id", LongType))))
      .parquet(tombs.map(_.toString): _*).collect().map(_.getLong(0)).toSeq
      == Seq(7L), "one equality tombstone for the updated key")
    // answers: updated value served, old version gone, insert visible
    val got = spark.table("mor1.t")
      .filter(col("id").isin(7L, 10007L, 8L))
      .select("id", "n").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((7L, 777L), (10007L, 42L), (8L, 80L)), s"got $got")
    assert(spark.table("mor1.t").count() == 1001)
  }

  test("delta MERGE answers equal the copy-on-write twin, including " +
      "partition-dir routing of updated rows") {
    import spark.implicits._
    val wh = tmp()
    cat("mor2", wh)
    build(s"$wh/cow", withRowId = false)
    build(s"$wh/mor", withRowId = true)
    // the update MOVES rows across the lang partition too
    (0 until 50).map(i => (i.toLong * 7, i.toLong, "fr"))
      .toDF("id", "n", "lang").createOrReplaceTempView("mor2src")
    def merge(t: String): Unit = spark.sql(
      s"""MERGE INTO mor2.$t t USING mor2src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET n = s.n, lang = s.lang
         |WHEN NOT MATCHED THEN INSERT (id, n, lang)
         |  VALUES (s.id, s.n, s.lang)""".stripMargin)
    merge("cow")
    merge("mor")
    val cow = spark.table("mor2.cow").collect().map(_.toSeq).toSet
    val mor = spark.table("mor2.mor").collect().map(_.toSeq).toSet
    assert(mor == cow, s"MoR answers diverge from CoW: " +
      s"only-cow=${(cow -- mor).take(3)} only-mor=${(mor -- cow).take(3)}")
    // aggregation over the MoR table matches too (filtered scan path)
    val aggCow = spark.sql(
      "SELECT lang, COUNT(*) AS c, SUM(n) AS s FROM mor2.cow " +
        "GROUP BY lang ORDER BY lang").collect().toSeq
    val aggMor = spark.sql(
      "SELECT lang, COUNT(*) AS c, SUM(n) AS s FROM mor2.mor " +
        "GROUP BY lang ORDER BY lang").collect().toSeq
    assert(aggCow == aggMor)
  }

  test("UPDATE and an untranslatable DELETE run merge-on-read; time " +
      "travel serves the pre-delta snapshot; a later append resurrects") {
    val wh = tmp()
    cat("mor3", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    val g1 = EpochManifest.generations(spark, root).last
    spark.sql("UPDATE mor3.t SET n = -1 WHERE id = 11")
    assert(spark.table("mor3.t").filter(col("id") === 11L)
      .head.getLong(1) == -1L)
    // pre-delta generation: tombstones ride in entries, so the pinned
    // snapshot never sees them
    assert(EpochStore.read(spark, root, schema, "lang", asOfGeneration = g1)
      .filter(col("id") === 11L).head.getLong(1) == 110L)
    // untranslatable DELETE (expression on a data column) → tombstones
    val pre = spark.table("mor3.t").count()
    spark.sql("DELETE FROM mor3.t WHERE id % 250 = 13 AND n > 0")
    val expectDel = (0L until 1000L).count(i => i % 250 == 13)
    assert(spark.table("mor3.t").count() == pre - expectDel)
    // a later APPEND of a deleted key resurrects it (epoch above the
    // tombstone's)
    import spark.implicits._
    EpochStore.write(Seq((13L, 1313L, "en")).toDF("id", "n", "lang"),
      root, 99L, partitionColumn = "lang")
    val got = spark.table("mor3.t").filter(col("id") === 13L).collect()
    assert(got.length == 1 && got.head.getLong(1) == 1313L)
  }

  test("a TRANSLATABLE DELETE on a rowid store routes merge-on-read too " +
      "(the metadata-first path would strand tombstones and resurrect " +
      "rows); filter overwrites refuse while tombstones are live") {
    import spark.implicits._
    val wh = tmp()
    cat("mor5", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    // update-then-delete the same key: the delete must NOT drop the
    // delta entry's tombstone and resurrect the pre-update row
    spark.sql("UPDATE mor5.t SET n = -1 WHERE id = 11")
    spark.sql("DELETE FROM mor5.t WHERE id = 11")
    assert(spark.table("mor5.t").filter(col("id") === 11L).count() == 0,
      "updated-then-deleted key must stay deleted")
    assert(spark.table("mor5.t").count() == 999)
    // static partition overwrite would strand live tombstones — refuse
    val err = intercept[Exception](spark.sql(
      "INSERT OVERWRITE mor5.t PARTITION (lang = 'en') " +
        "SELECT id, n FROM mor5.t WHERE lang = 'de' LIMIT 1"))
    assert(err.getMessage.contains("tombstones"),
      s"unexpected: ${err.getMessage}")
    // whole-table TRUNCATE stays allowed (everything goes, nothing can
    // resurrect)
    spark.sql("TRUNCATE TABLE mor5.t")
    assert(spark.table("mor5.t").count() == 0)
  }

  test("multi-column rowid declared OUT of schema order: compact folds " +
      "the right rows (key order agrees between tombstones and join)") {
    import spark.implicits._
    val wh = tmp()
    cat("mor6", wh)
    val root = s"$wh/t"
    // schema order (id, n, lang); rowid declared as (lang, id)
    (0 until 100).map(i => (i.toLong, i * 10L, s"l${i % 4}"))
      .toDF("id", "n", "lang")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0").save()
    EpochStoreDelta.declare(spark, root, Seq("lang", "id"))
    spark.sql("UPDATE mor6.t SET n = -5 WHERE id = 14")
    spark.sql("DELETE FROM mor6.t WHERE id = 15 AND n >= 0")
    val pre = spark.table("mor6.t").collect().map(_.toSeq).toSet
    assert(pre.exists(r => r.head == 14L && r(1) == -5L) &&
      !pre.exists(_.head == 15L))
    spark.sql("CALL mor6.system.compact(table => 't')").collect()
    val post = spark.table("mor6.t").collect().map(_.toSeq).toSet
    assert(post == pre,
      s"multi-col-key fold diverged: only-pre=${(pre -- post).take(3)} " +
        s"only-post=${(post -- pre).take(3)}")
  }

  test("changefeed with change types: a MoR update's tombstone+reinsert " +
      "pair arrives as update_preimage (full OLD row) / update_postimage " +
      "— the Delta CDF contract") {
    import spark.implicits._
    val wh = tmp()
    cat("mor7", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    val g1 = EpochManifest.generations(spark, root).last
    Seq((7L, 777L, "de")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor7src")
    spark.sql(
      """MERGE INTO mor7.t t USING mor7src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n""".stripMargin)
    val got = EpochStore.readChanges(spark, root, schema, g1,
      partitionColumn = "lang")
      .collect().map(r => (r.getAs[Any]("id"), r.getAs[Any]("n"),
        r.getAs[Any]("lang"), r.getAs[String]("_change_type"))).toSet
    // the update's pair: the PREIMAGE carries the key's full OLD row
    // (resolved from the pre-epoch MoR state), the POSTIMAGE the new one
    assert(got == Set(
      (7L, 777L, "de", "update_postimage"),
      (7L, 70L, "de", "update_preimage")), s"got $got")
    // the resolved (non-CDC) read still applies the tombstone
    assert(spark.table("mor7.t").filter(col("id") === 7L)
      .head.getLong(1) == 777L)
    // a store without a row identity feeds inserts only
    val root2 = s"$wh/plain"
    build(root2, withRowId = false)
    val g2 = EpochManifest.generations(spark, root2).last
    EpochStore.write(Seq((5000L, 1L, "en")).toDF("id", "n", "lang"),
      root2, 9L, partitionColumn = "lang")
    val got2 = EpochStore.readChanges(spark, root2, schema, g2,
      partitionColumn = "lang").collect()
    assert(got2.length == 1 &&
      got2.head.getAs[String]("_change_type") == "insert")
  }

  test("row-count pushes on a row-identity store: footer aggregation " +
      "stays available while NO tombstones are live, falls back to row " +
      "scans (right answers) once a delta lands") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val wh = tmp()
    cat("mor9", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    def scanKinds(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.scan.getClass.getSimpleName
      }
    // no live tombstones: COUNT(*) answers from footers/sidecars
    val q1 = spark.sql("SELECT COUNT(*) AS n FROM mor9.t")
    assert(scanKinds(q1).contains("EpochStoreAggScan"),
      s"tombstone-free rowid store must keep agg pushdown: ${scanKinds(q1)}")
    assert(q1.head.getLong(0) == 1000L)
    // a delta lands: the same query routes the row scan and stays exact
    spark.sql("UPDATE mor9.t SET n = -1 WHERE id = 11")
    spark.sql("DELETE FROM mor9.t WHERE id = 12")
    val q2 = spark.sql("SELECT COUNT(*) AS n FROM mor9.t")
    assert(!scanKinds(q2).contains("EpochStoreAggScan"),
      s"live tombstones must disable footer counts: ${scanKinds(q2)}")
    assert(q2.head.getLong(0) == 999L)
    // LIMIT under live tombstones: truncation off, Spark's limit exact
    assert(spark.sql("SELECT id FROM mor9.t LIMIT 5").collect().length == 5)
  }

  test("streaming CDC tail: each trigger's epoch range delivers insert " +
      "rows AND tombstone delete events with _epoch/_change_type") {
    import spark.implicits._
    val wh = tmp()
    cat("mor8", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    Seq((7L, 777L, "de")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor8src")
    spark.sql(
      """MERGE INTO mor8.t t USING mor8src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n""".stripMargin)
    // CDC stream contract: declare the feed schema = table schema with
    // _epoch and _change_type APPENDED (streaming relations don't route
    // metadata-column selection into the source's pruned schema — the
    // explicit schema is the contract, mirroring readChanges' shape)
    val cdcSchema = StructType(schema.fields.toSeq ++ Seq(
      StructField(EpochStore.EpochColName, LongType, nullable = false),
      StructField(EpochStore.ChangeColName, StringType, nullable = false)))
    val q = spark.readStream.format("epochstore").schema(cdcSchema)
      .option("path", root).option("partitionColumn", "lang")
      .option("startingAfterEpoch", "1") // tail only the delta epoch
      .load()
      .select(col("id"), col("n"), col("_epoch"), col("_change_type"))
      .writeStream.format("memory").queryName("mor8cdc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("mor8cdc").collect()
      .map(r => (r.getAs[Any]("id"), r.getAs[Any]("n"),
        r.getAs[Long]("_epoch"), r.getAs[String]("_change_type"))).toSet
    assert(got == Set(
      (7L, 777L, 2L, "insert"),
      (7L, null, 2L, "delete")), s"got $got")
  }

  test("rewrite_data_files bin-packs ADJACENT small entries only: big " +
      "entries and merge-on-read delta entries untouched, answers exact") {
    import spark.implicits._
    val wh = tmp()
    cat("rdf1", wh)
    val root = s"$wh/t"
    def smallRows(off: Int) = (0 until 10)
      .map(i => ((i + off).toLong, s"v${i + off}")).toDF("id", "v")
    val bigRows = (100000 until 103000)
      .map(i => (i.toLong, "x" * 120 + i)).toDF("id", "v")
    EpochStore.write(smallRows(0), root, 0L)
    EpochStore.write(smallRows(10), root, 1L)
    EpochStore.write(bigRows, root, 2L)
    EpochStore.write(smallRows(20), root, 3L)
    EpochStore.write(smallRows(30), root, 4L)
    val pre = spark.table("rdf1.t").collect().map(_.toSeq).toSet
    val bigDir = EpochManifest.entries(spark, root).find(_.epoch == 2L).get.dir
    // threshold between the ~1 KB small entries and the ~100 KB big one
    val runs = EpochStore.rewriteDataFiles(spark, root,
      targetBytes = 20000L, minEntries = 2)
    assert(runs == 2, s"expected the two adjacent small runs, got $runs")
    val es = EpochManifest.entries(spark, root)
    assert(es.size == 3, s"5 entries must fold to 3: $es")
    assert(es.exists(e => e.epoch == 2L && e.dir == bigDir),
      "the big entry's dirs must be untouched")
    assert(es.exists(e => e.epoch == 1L && e.minEpoch == 0L) &&
      es.exists(e => e.epoch == 4L && e.minEpoch == 3L),
      s"folds must span exactly their runs: $es")
    assert(spark.table("rdf1.t").collect().map(_.toSeq).toSet == pre)
    // a run may not swallow a delta entry: its tombstones can neither
    // drop (rows below resurrect) nor ride (the fold epoch would kill
    // the fold's own reinserts)
    val root2 = s"$wh/u"
    cat("rdf2", wh)
    EpochStore.write(smallRows(0).withColumn("lang", lit("en")),
      root2, 0L, partitionColumn = "lang")
    EpochStore.write(smallRows(10).withColumn("lang", lit("en")),
      root2, 1L, partitionColumn = "lang")
    EpochStoreDelta.declare(spark, root2, Seq("id"))
    spark.sql("UPDATE rdf2.u SET v = 'upd' WHERE id = 3") // delta epoch 2
    EpochStore.write(smallRows(20).withColumn("lang", lit("en")),
      root2, 9L, partitionColumn = "lang")
    EpochStore.write(smallRows(30).withColumn("lang", lit("en")),
      root2, 10L, partitionColumn = "lang")
    val pre2 = spark.table("rdf2.u").collect().map(_.toSeq).toSet
    val runs2 = EpochStore.rewriteDataFiles(spark, root2,
      targetBytes = 20000L, minEntries = 2)
    assert(runs2 == 2, s"two runs around the delta entry, got $runs2")
    val es2 = EpochManifest.entries(spark, root2)
    assert(es2.size == 3 && es2.exists(e =>
      EpochStoreDelta.tombstoneFiles(hfs(root2), root2, e.dir).nonEmpty),
      s"the delta entry must survive untouched: $es2")
    assert(spark.table("rdf2.u").collect().map(_.toSeq).toSet == pre2,
      "answers must hold through selective folding around the delta")
    // CALL surface: everything-small store folds to one entry
    val root3 = s"$wh/w"
    (0 until 3).foreach(e =>
      EpochStore.write(smallRows(e * 10), s"$root3", e.toLong))
    val r = spark.sql("CALL rdf1.system.rewrite_data_files(" +
      "table => 'w', target_mb => 1, min_entries => 2)").head
    assert(r.getInt(0) == 1 && r.getInt(1) == 3 && r.getInt(2) == 1,
      s"CALL result: $r")
  }

  test("DROP TABLE invalidates cached tombstone views: a re-created " +
      "store at the same path (same attempt-dir names) never serves " +
      "the old store's deletes") {
    import spark.implicits._
    val wh = tmp()
    cat("mor10", wh)
    val root = s"$wh/t"
    def mk(): Unit = {
      EpochStore.write((0 until 20).map(i => (i.toLong, i * 10L, "en"))
        .toDF("id", "n", "lang"), root, 0L, partitionColumn = "lang")
      EpochStoreDelta.declare(spark, root, Seq("id"))
    }
    mk()
    spark.sql("DELETE FROM mor10.t WHERE id = 5")
    // populate the caches under this dir set
    assert(spark.table("mor10.t").count() == 19)
    assert(spark.sql("SELECT COUNT(*) AS n FROM mor10.t").head.getLong(0)
      == 19)
    spark.sql("DROP TABLE mor10.t")
    // same path, same epoch, same attempt-dir names — fresh store
    mk()
    assert(spark.table("mor10.t").filter(col("id") === 5L).count() == 1,
      "a re-created store must not inherit the dropped store's deletes")
    assert(spark.sql("SELECT COUNT(*) AS n FROM mor10.t").head.getLong(0)
      == 20)
  }

  test("CALL compact folds tombstones physically: same answers, no " +
      "_delta dirs left, rowid layout preserved") {
    val wh = tmp()
    cat("mor4", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    spark.sql("UPDATE mor4.t SET n = -7 WHERE id = 21")
    spark.sql("DELETE FROM mor4.t WHERE id % 333 = 5 AND n > 0")
    val pre = spark.table("mor4.t").collect().map(_.toSeq).toSet
    spark.sql("CALL mor4.system.compact(table => 't')").collect()
    val es = EpochManifest.entries(spark, root)
    assert(es.size == 1, s"fold to one entry: $es")
    assert(EpochStoreDelta.tombstoneFiles(hfs(root), root, es.head.dir)
      .isEmpty, "tombstones must fold into the data")
    val post = spark.table("mor4.t").collect().map(_.toSeq).toSet
    assert(post == pre,
      s"compaction changed answers: only-pre=${(pre -- post).take(3)} " +
        s"only-post=${(post -- pre).take(3)}")
  }

  test("size-bounded tombstone materialization: an oversized journal " +
      "refuses the read path naming the sizes; CALL compact folds it " +
      "through the distributed anti-join with identical answers") {
    import spark.implicits._
    val wh = tmp()
    cat("mor11", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    // a mass keyed DELETE: 300 tombstones in one delta epoch
    spark.sql("DELETE FROM mor11.t WHERE id % 3 = 1 AND id < 900")
    val expected = (0 until 1000).map(_.toLong)
      .filterNot(id => id % 3 == 1 && id < 900)
    val got0 = spark.sql("SELECT id FROM mor11.t").collect()
      .map(_.getLong(0)).toSet
    assert(got0.size == expected.size && got0 == expected.toSet,
      s"post-delete diff: missing=${expected.toSet -- got0} " +
        s"extra=${got0 -- expected.toSet}")
    // shrink the driver bound below the journal size: the read path
    // refuses, naming both sizes and the remedy
    spark.conf.set("spark.graft.mor.maxDriverTombstoneBytes", "10")
    try {
      val e = intercept[Exception] {
        spark.sql("SELECT count(*) FROM mor11.t").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf).mkString("\n")
      assert(msgs.contains("driver materialization bound") &&
        msgs.contains("CALL compact") && msgs.contains("bytes"),
        s"refusal must name sizes and remedy: $msgs")
      // the remedy works UNDER the tiny bound: compact applies the
      // journal through the distributed anti-join (no driver map)
      EpochStore.compactStore(spark, root, parts = 2)
      val after = spark.sql("SELECT id FROM mor11.t ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(after == expected,
        s"join-path fold diverged: ${after.size} vs ${expected.size}")
      // and the read path is open again (tombstones folded away)
      assert(spark.sql("SELECT count(*) FROM mor11.t WHERE id = 3")
        .head.getLong(0) == 1L)
    } finally spark.conf.unset("spark.graft.mor.maxDriverTombstoneBytes")
  }

  test("commuting-delta rebase: two racing MERGEs with DISJOINT key " +
      "sets both land exactly once (distinct epochs); an overlapping-" +
      "key race still refuses") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val wh = tmp()
    cat("mor12", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    val before = EpochManifest.entries(spark, root)

    // MERGE A's source blocks mid-EXECUTION (after its snapshot pinned
    // at planning) until MERGE B has fully landed — a deterministic
    // race, no timing luck
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    spark.udf.register("mor12_slow", (x: Long) => {
      entered.countDown()
      gate.await(120, java.util.concurrent.TimeUnit.SECONDS)
      x
    })
    Seq((10L, -100L, "en"), (20L, -200L, "en")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor12a")
    Seq((30L, -300L, "en"), (5000L, -500L, "xx")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor12b")
    val a = Future {
      spark.sql(
        """MERGE INTO mor12.t t
          |USING (SELECT mor12_slow(id) AS id, n, lang FROM mor12a) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET n = s.n""".stripMargin)
    }
    entered.await(120, java.util.concurrent.TimeUnit.SECONDS)
    // B: disjoint keys {30 update, 5000 insert} — lands first
    spark.sql(
      """MERGE INTO mor12.t t USING mor12b s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n
        |WHEN NOT MATCHED THEN INSERT (id, n, lang)
        |  VALUES (s.id, s.n, s.lang)""".stripMargin)
    gate.countDown()
    Await.result(a, 120.seconds) // A commits through the rebase

    // both landed exactly once
    val got = spark.table("mor12.t")
      .filter(col("id").isin(10L, 20L, 30L, 5000L))
      .select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, -100L), (20L, -200L), (30L, -300L),
      (5000L, -500L)), s"got $got")
    assert(spark.table("mor12.t").count() == 1001L)
    val after = EpochManifest.entries(spark, root)
    assert(after.size == before.size + 2, s"${after.map(_.dir)}")
    val newEpochs = after.filterNot(e => before.exists(_.dir == e.dir))
      .map(_.epoch)
    assert(newEpochs.distinct.size == 2,
      s"racing deltas must never share an epoch id: $newEpochs")

    // the OVERLAPPING-key race still refuses: C holds key 30, D also
    // touches 30 and lands first -> C must refuse loudly
    val entered2 = new java.util.concurrent.CountDownLatch(1)
    val gate2 = new java.util.concurrent.CountDownLatch(1)
    spark.udf.register("mor12_slow2", (x: Long) => {
      entered2.countDown()
      gate2.await(120, java.util.concurrent.TimeUnit.SECONDS)
      x
    })
    Seq((30L, -31L, "en")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor12c")
    Seq((30L, -32L, "en")).toDF("id", "n", "lang")
      .createOrReplaceTempView("mor12d")
    val cFut = Future {
      spark.sql(
        """MERGE INTO mor12.t t
          |USING (SELECT mor12_slow2(id) AS id, n, lang FROM mor12c) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET n = s.n""".stripMargin)
    }
    entered2.await(120, java.util.concurrent.TimeUnit.SECONDS)
    spark.sql(
      """MERGE INTO mor12.t t USING mor12d s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n""".stripMargin)
    gate2.countDown()
    val e = intercept[Exception] { Await.result(cFut, 120.seconds) }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(msgs.contains("overlapping") || msgs.contains("also touches"),
      s"overlapping-key race must refuse: $msgs")
    // D's value holds; C landed nothing
    assert(spark.table("mor12.t").filter(col("id") === 30L)
      .head.getAs[Long]("n") == -32L)
    assert(spark.table("mor12.t").count() == 1001L)
  }

  test("CDF pairing is per (epoch, key): one MERGE's updates pair, its " +
      "pure inserts stay inserts, a separate DELETE's tombstones stay " +
      "key-only delete events") {
    import spark.implicits._
    val wh = tmp()
    cat("mor20", wh)
    val root = s"$wh/t"
    build(root, withRowId = true)
    val g1 = EpochManifest.generations(spark, root).last
    // one MERGE: updates ids 3,4 (n -> n*100), inserts ids 5000,5001
    Seq((3L, 300L, "en"), (4L, 400L, "de"),
      (5000L, 1L, "xx"), (5001L, 2L, "xx"))
      .toDF("id", "n", "lang").createOrReplaceTempView("mor20src")
    spark.sql(
      """MERGE INTO mor20.t t USING mor20src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n
        |WHEN NOT MATCHED THEN INSERT (id, n, lang)
        |  VALUES (s.id, s.n, s.lang)""".stripMargin)
    // a SEPARATE delete epoch: pure tombstones, no reinsert to pair with
    spark.sql("DELETE FROM mor20.t WHERE id = 10 OR id = 11")
    val feed = EpochStore.readChanges(spark, root, schema, g1,
      partitionColumn = "lang")
      .collect().map(r => (r.getAs[Any]("id"), r.getAs[Any]("n"),
        r.getAs[Any]("lang"), r.getAs[String]("_change_type"))).toSet
    // old rows from build(): id -> (id, id*10, en when id%3==0 else de)
    assert(feed == Set(
      (3L, 30L, "en", "update_preimage"),
      (3L, 300L, "en", "update_postimage"),
      (4L, 40L, "de", "update_preimage"),
      (4L, 400L, "de", "update_postimage"),
      (5000L, 1L, "xx", "insert"),
      (5001L, 2L, "xx", "insert"),
      (10L, null, null, "delete"),
      (11L, null, null, "delete")), s"feed: $feed")
    // replaying the feed reproduces the resolved head state for the
    // touched keys — the CDF consumer contract
    val touched = Set(3L, 4L, 10L, 11L, 5000L, 5001L)
    val head = spark.table("mor20.t")
      .filter(col("id").isin(touched.toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val replayed = feed.toSeq
      .filter(e => e._4 == "insert" || e._4 == "update_postimage")
      .map(e => (e._1.asInstanceOf[Long], e._2.asInstanceOf[Long])).toSet
    assert(head == replayed, s"head $head vs replayed $replayed")
  }
}
