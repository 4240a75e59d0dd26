package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types._
import graft.core.EpochManifest
import graft.sources.{EpochStore, EpochStoreScan, EpochStoreStats}

/** File-level manifest-index planning ([[EpochStore.listEntryFiles]]'s
  * index path): every connector write records each file's (relative
  * path, length, mtime) in the stats sidecar, and the scan plans from
  * that record — partition/bucket pruning over the VIRTUAL tree the
  * recorded paths imply — with ZERO `listStatus` below the entry
  * roots. Proven here with an instrumented FileSystem ([[CountingFs]],
  * `cfs://` scheme): the Delta/Iceberg "metadata in the log" property
  * that keeps planning O(manifest) instead of O(files-on-disk) at
  * 100 TB. Pre-index entries (core-tier appends, sidecar-less stores)
  * must still fall back to the recursive listing. */
class EpochStoreIndexSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("bucket", IntegerType)))

  private def tmp(): String = {
    CountingFs.install(spark)
    "cfs://" + java.nio.file.Files.createTempDirectory("graft_idx").toString
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): EpochStoreScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collect { case s: EpochStoreScan => s }.head

  private def rows(off: Int) = {
    import spark.implicits._
    (0 until 40).map(i => ((i + off).toLong, s"v${i + off}", (i + off) % 4))
      .toDF("id", "v", "bucket")
  }

  test("an indexed partitioned store plans with ZERO listStatus below " +
      "the entry roots; pruning audit counts and rows are unchanged") {
    val root = tmp()
    EpochStore.write(rows(0), root, 0L, partitionColumn = "bucket")
    EpochStore.write(rows(40), root, 1L, partitionColumn = "bucket")
    val df = EpochStore.read(spark, root, schema, "bucket")
      .filter(col("bucket").isin(1, 3))
    CountingFs.reset()
    val got = df.collect()
    val below = CountingFs.listedBelow(root)
    assert(below.isEmpty,
      s"index-planned scan still listed entry dirs: ${below.take(5)}")
    assert(got.length == 40 && got.forall(r => Set(1, 3)(r.getAs[Int]("bucket"))))
    // the virtual walk keeps the exact audit semantics of the real one
    assert(scanOf(df).selectedPartitionDirs == (4, 8),
      s"pruning audit: ${scanOf(df).selectedPartitionDirs}")
  }

  test("a pre-index entry (no stats sidecar) falls back to the recursive " +
      "listing — and ONLY that entry lists") {
    val root = tmp()
    EpochStore.write(rows(0), root, 0L, partitionColumn = "bucket")
    EpochStore.write(rows(40), root, 1L, partitionColumn = "bucket")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val legacy = EpochManifest.entries(spark, root).find(_.epoch == 0L).get
    fs.delete(EpochStoreStats.sidecarPath(root, legacy.dir), false)
    val df = EpochStore.read(spark, root, schema, "bucket")
    CountingFs.reset()
    val got = df.collect()
    val below = CountingFs.listedBelow(root)
    assert(below.nonEmpty && below.forall(_.contains(legacy.dir)),
      s"expected listing confined to ${legacy.dir}, got ${below.take(5)}")
    assert(got.length == 80, s"fallback lost rows: ${got.length}")
  }

  test("a hash-bucket store probe plans from the index: zero listing, " +
      "1-of-N bucket dirs kept") {
    val root = tmp()
    import spark.implicits._
    val df0 = (0 until 64).map(i => (i.toLong, s"k$i")).toDF("id", "v")
    EpochStore.writeBucketed(df0, root, 0L, bucketColumn = "id", bucketCount = 8)
    EpochStore.writeBucketed(df0, root, 1L, bucketColumn = "id", bucketCount = 8)
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = EpochStore.readBucketed(spark, root, sch, "id", 8)
      .filter(col("id") === 7L)
    CountingFs.reset()
    val got = df.collect()
    val below = CountingFs.listedBelow(root)
    assert(below.isEmpty,
      s"bucket probe listed entry dirs: ${below.take(5)}")
    assert(got.length == 2 && got.forall(_.getLong(0) == 7L))
    val (kept, total) = scanOf(df).selectedPartitionDirs
    assert(kept == 2 && total == 16, s"bucket pruning audit: ($kept, $total)")
  }

  test("CTAS and WAP-published stores are index-planned too: zero " +
      "listing below the table root") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.idxctas",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.idxctas.warehouse", wh)
    try {
      spark.sql("CREATE TABLE idxctas.t AS " +
        "SELECT id, CAST(id % 4 AS INT) AS g FROM range(0, 100)")
      CountingFs.reset()
      val got = spark.sql("SELECT sum(id) AS s FROM idxctas.t WHERE g = 2")
        .collect()
      val below = CountingFs.listedBelow(s"$wh/t")
      assert(below.isEmpty, s"CTAS scan listed: ${below.take(5)}")
      assert(got.head.getLong(0) == (0L until 100L).filter(_ % 4 == 2).sum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS idxctas.t")
      spark.conf.unset("spark.sql.catalog.idxctas")
      spark.conf.unset("spark.sql.catalog.idxctas.warehouse")
    }

    // WAP: branch epoch + atomic fast-forward publish keep the index
    val root = tmp()
    EpochStore.write(rows(0), root, 0L, partitionColumn = "bucket")
    EpochManifest.createBranch(spark, root, "audit")
    EpochStore.write(rows(40), root, 100L, partitionColumn = "bucket",
      branch = "audit")
    EpochManifest.publishBranch(spark, root, "audit")
    val df = EpochStore.read(spark, root, schema, "bucket")
    CountingFs.reset()
    val got2 = df.collect()
    val below2 = CountingFs.listedBelow(root)
    assert(below2.isEmpty, s"WAP-published scan listed: ${below2.take(5)}")
    assert(got2.length == 80, s"WAP rows: ${got2.length}")
  }

  test("an indexed EMPTY epoch plans as zero files without listing " +
      "(the empty sidecar IS the index record)") {
    val root = tmp()
    import spark.implicits._
    EpochStore.write(rows(0), root, 0L, partitionColumn = "bucket")
    EpochStore.write(Seq.empty[(Long, String, Int)].toDF("id", "v", "bucket"),
      root, 1L, partitionColumn = "bucket")
    val df = EpochStore.read(spark, root, schema, "bucket")
    CountingFs.reset()
    val got = df.collect()
    assert(CountingFs.listedBelow(root).isEmpty)
    assert(got.length == 40)
  }

  test("a DV store plans with zero listStatus below the entry roots — " +
      "journals ride the manifest — both while the DV lives and after " +
      "compact sheds it") {
    val root = tmp()
    EpochStore.write(rows(0), root, 0L, partitionColumn = "bucket")
    EpochStore.write(rows(40), root, 1L, partitionColumn = "bucket")
    // a predicate DELETE in DV mode, driven through the raw connector
    // resolve + commit (the SQL catalog route is proven in DvDeleteSpec)
    val base = EpochManifest.entries(spark, root)
    spark.conf.set(graft.sources.EpochStoreDv.EnabledConf, "true")
    val resolved =
      try graft.sources.EpochStoreDv.resolveDeleteDv(spark, root,
        Array(org.apache.spark.sql.sources.LessThan("id", 10L)))
      finally spark.conf.unset(graft.sources.EpochStoreDv.EnabledConf)
    EpochManifest.commitIfUnchanged(spark, root, base, resolved)
    // the journal's file names are ON the manifest entry
    val journal = EpochManifest.entries(spark, root).maxBy(_.epoch)
    assert(journal.dv.nonEmpty, "journal files must ride the manifest")
    // DV LIVE: planning never walks an entry dir — the only permitted
    // touch below the roots is the position load opening the journal's
    // own RECORDED file paths (file-status probes by spark.read on the
    // exact paths, once per journal set — the load caches after)
    val journalPaths = journal.dv.map(n => s"/${journal.dir}/_dv/$n")
    val df = EpochStore.read(spark, root, schema, "bucket")
    CountingFs.reset()
    assert(df.collect().map(_.getLong(0)).toSet == (10L until 80L).toSet)
    val below = CountingFs.listedBelow(root)
    assert(below.forall(p => journalPaths.exists(p.endsWith)),
      s"DV-live scan listed beyond the recorded journal: ${below.take(5)}")
    // warm position cache: a second scan lists NOTHING below the roots
    val dfWarm = EpochStore.read(spark, root, schema, "bucket")
    CountingFs.reset()
    assert(dfWarm.collect().length == 70)
    val belowWarm = CountingFs.listedBelow(root)
    assert(belowWarm.isEmpty, s"warm DV scan listed: ${belowWarm.take(5)}")
    // post-compact: the fold shed the journal; liveness still decides
    // off the manifest with zero listing (the marker never clears)
    EpochStore.compactStore(spark, root)
    assert(EpochManifest.entries(spark, root).forall(_.dv.isEmpty))
    val df2 = EpochStore.read(spark, root, schema, "bucket")
    CountingFs.reset()
    assert(df2.collect().length == 70)
    val below2 = CountingFs.listedBelow(root)
    assert(below2.isEmpty, s"post-compact scan listed: ${below2.take(5)}")
  }
}
