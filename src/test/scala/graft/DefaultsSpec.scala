package graft

import graft.sources.EpochStore

/** X86 — DEFAULT values on added columns: `ALTER TABLE ADD COLUMNS
  * (c INT DEFAULT 7)` records CURRENT_DEFAULT / EXISTS_DEFAULT field
  * metadata in the schema sidecar. Files written BEFORE the column
  * existed serve the EXISTENCE default (not null) straight from the
  * parquet readers — zero rewrite; INSERTs that omit the column (or
  * say DEFAULT) fill the CURRENT default; a non-foldable DEFAULT
  * refuses. */
class DefaultsSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_def").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("ADD COLUMN DEFAULT: old files serve the existence default, " +
      "INSERT fills the current default, explicit values win") {
    import spark.implicits._
    val wh = tmp()
    cat("defc", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root, 0L)
    spark.sql("ALTER TABLE defc.t ADD COLUMNS (score INT DEFAULT 7)")

    // pre-existing rows serve 7, not null
    val old = spark.sql("SELECT score FROM defc.t WHERE id = 3").collect()
    assert(old.length == 1 && !old.head.isNullAt(0) && old.head.getInt(0) == 7,
      s"existence default must fill old files, got ${old.toSeq}")
    assert(spark.sql("SELECT sum(score) FROM defc.t").head.getLong(0) == 70L)

    // INSERT with DEFAULT keyword and with an explicit value
    spark.sql("INSERT INTO defc.t VALUES (100, 'x', DEFAULT)")
    spark.sql("INSERT INTO defc.t VALUES (101, 'y', 42)")
    val got = spark.sql(
      "SELECT id, score FROM defc.t WHERE id >= 100 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((100L, 7), (101L, 42)), s"got $got")

    // a filter on the defaulted column sees old rows under the default
    assert(spark.sql("SELECT count(*) FROM defc.t WHERE score = 7")
      .head.getLong(0) == 11L)

    // non-foldable DEFAULT refuses
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE defc.t ADD COLUMNS (ts DOUBLE DEFAULT rand())")
    }
    assert(e != null)
  }

  test("CREATE TABLE with a DEFAULT column fills INSERTs that omit it") {
    val wh = tmp()
    cat("defd", wh)
    spark.sql(
      "CREATE TABLE defd.u (id BIGINT, tag STRING DEFAULT 'none') " +
        "USING epochstore")
    spark.sql("INSERT INTO defd.u VALUES (1, DEFAULT)")
    spark.sql("INSERT INTO defd.u (id) VALUES (2)")
    spark.sql("INSERT INTO defd.u VALUES (3, 'set')")
    val got = spark.sql("SELECT id, tag FROM defd.u ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "none"), (2L, "none"), (3L, "set")), s"got $got")
  }

  test("defaults agree across every tier: metadata DELETE, compaction, " +
      "aggregates, and the streaming tail all serve the existence default") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmp()
    cat("defx", wh)
    val root = s"$wh/t"
    EpochStore.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root, 0L)
    spark.sql("ALTER TABLE defx.t ADD COLUMNS (score INT DEFAULT 7)")
    spark.sql("INSERT INTO defx.t VALUES (100, 'x', 9)")

    // aggregate over the defaulted column counts pre-ADD rows at 7
    assert(spark.sql("SELECT min(score) FROM defx.t").head.getInt(0) == 7)
    assert(spark.sql("SELECT sum(score) FROM defx.t").head.getLong(0)
      == 20L * 7 + 9)

    // the streaming tail serves the default for pre-ADD epochs
    val tail = spark.readStream.format("epochstore")
      .option("path", root).option("maxEpochsPerTrigger", "10")
      .schema(spark.table("defx.t").schema).load()
      .groupBy().sum("score")
    val q = tail.writeStream.format("memory").queryName("defx_tail")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("defx_tail").head.getLong(0) == 20L * 7 + 9,
      "the tail must serve the existence default like the batch scan")

    // metadata-first DELETE on the defaulted value drops the rows the
    // scan SHOWS as 7 (and DELETE WHERE score IS NULL drops nothing)
    spark.sql("DELETE FROM defx.t WHERE score IS NULL")
    assert(spark.sql("SELECT count(*) FROM defx.t").head.getLong(0) == 21L)
    spark.sql("DELETE FROM defx.t WHERE score = 7")
    assert(spark.sql("SELECT count(*) FROM defx.t").head.getLong(0) == 1L)
    assert(spark.sql("SELECT id FROM defx.t").head.getLong(0) == 100L)

    // compaction must not change what a query returns
    val root2 = s"$wh/u"
    EpochStore.write((0 until 15).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      root2, 0L)
    spark.sql("ALTER TABLE defx.u ADD COLUMNS (boost BIGINT DEFAULT 5)")
    spark.sql("INSERT INTO defx.u VALUES (99, 'y', 11)")
    val before = spark.sql("SELECT sum(boost) FROM defx.u").head.getLong(0)
    EpochStore.compactStore(spark, root2, parts = 2)
    val after = spark.sql("SELECT sum(boost) FROM defx.u").head.getLong(0)
    assert(before == 15L * 5 + 11 && after == before,
      s"compaction changed the answer: $before -> $after")
  }

  test("q_store_default matches the raw-table recomputation of its oracle") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.MiscCatalog.storeDefault(spark, sf0001)
      .collect().toSeq.map(_.toSeq)
    val want = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 2 === 0, lit(5L))
          .otherwise(col("doc_id") % 7)).as("boost_sum"))
      .orderBy("lang").collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty && got == want, s"got=$got\nwant=$want")
  }
}
