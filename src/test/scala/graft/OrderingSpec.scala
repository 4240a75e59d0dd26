package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.SparkPlan
import graft.sources.{EpochStore, EpochStoreScan}

/** X83 — `SupportsReportOrdering` on the epochstore scan: a store whose
  * entries record a sort layout (and whose per-file stats prove the
  * planned partitions range-disjoint) reports `sortColumns` ascending,
  * so Spark ELIDES matching SortExec nodes. The flagship shape: two
  * same-bucketed, sorted stores sort-merge join with ZERO exchange and
  * ZERO sort — the classic sorted-bucketed-table property that turns a
  * 100 TB join into a per-bucket streaming merge. Soundness gates: an
  * overlapping multi-epoch store, a missing-stats store, and a
  * mixed-layout store must all report NOTHING. */
class OrderingSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_ord").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): EpochStoreScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collect { case s: EpochStoreScan => s }.head

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      nodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }
  private def sorts(p: SparkPlan) = nodes(p).collect {
    case s: org.apache.spark.sql.execution.SortExec => s
  }
  private def exchanges(p: SparkPlan) = nodes(p).collect {
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
  }

  private def sortedWrite(df: org.apache.spark.sql.DataFrame, root: String,
                          epoch: Long): Unit =
    df.write.format("epochstore").mode("append")
      .option("path", root).option("epoch", epoch.toString)
      .option("sortColumns", "id").option("statsColumns", "id")
      .save()

  test("sorted store with disjoint epochs reports its sort order; " +
      "overlapping epochs / missing sort record report nothing") {
    import spark.implicits._
    val root = tmp()
    // two epochs with DISJOINT id ranges — the stats chain proves order
    sortedWrite((0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      root, 0L)
    sortedWrite((100 until 200).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      root, 1L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val df = EpochStore.read(spark, root, schema)
    val ord = scanOf(df).outputOrdering()
    assert(ord.length == 1 && ord.head.toString.contains("id"),
      s"disjoint sorted store must report its order, got " +
        ord.mkString("[", ",", "]"))
    // rows stay correct under the ordered packing
    assert(df.count() == 200)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 200L).sum)
    // every planned partition is internally sorted by id
    val perPart = df.select("id").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
    perPart.foreach(p => assert(p == p.sorted,
      s"partition not internally sorted: $p"))

    // OVERLAPPING epoch kills the proof
    val root2 = tmp()
    sortedWrite((0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      root2, 0L)
    sortedWrite((50 until 150).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      root2, 1L)
    assert(scanOf(EpochStore.read(spark, root2, schema)).outputOrdering().isEmpty,
      "overlapping epochs must not report an order")

    // an UNSORTED entry in the mix kills it too
    val root3 = tmp()
    sortedWrite((0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      root3, 0L)
    EpochStore.write((100 until 200).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      root3, 1L)
    assert(scanOf(EpochStore.read(spark, root3, schema)).outputOrdering().isEmpty,
      "an unsorted entry must not report an order")
  }

  test("sorted same-bucketed stores sort-merge join with zero exchange " +
      "and zero sort") {
    import spark.implicits._
    val wh = tmp()
    cat("ordspj", wh)
    val left = s"$wh/l"
    val right = s"$wh/r"
    EpochStore.writeBucketed((0 until 400).map(i => (i.toLong, s"L$i"))
      .toDF("id", "v"), left, 0L, bucketColumn = "id", bucketCount = 8,
      statsColumns = Seq("id"), sortColumns = Seq("id"))
    EpochStore.writeBucketed((0 until 400).map(i => (i.toLong, s"R$i"))
      .toDF("id", "v"), right, 0L, bucketColumn = "id", bucketCount = 8,
      statsColumns = Seq("id"), sortColumns = Seq("id"))
    def l() = spark.table("ordspj.l")
    def r() = spark.table("ordspj.r").withColumnRenamed("v", "w")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = l().join(r(), "id")
      assert(j.count() == 400)
      val plan = j.queryExecution.executedPlan
      val smj = nodes(plan).collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      assert(exchanges(plan).isEmpty,
        s"same-bucket sorted join must run storage-partitioned:\n$plan")
      assert(sorts(plan).isEmpty,
        s"reported sort order must elide both SMJ sorts:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucket-preserving compaction keeps (and a sorted fold creates) " +
      "the reported order") {
    import spark.implicits._
    val root = tmp()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    // OVERLAPPING unsorted epochs — no order reportable pre-compaction
    EpochStore.write((0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      root, 0L)
    EpochStore.write((50 until 150).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      root, 1L)
    assert(scanOf(EpochStore.read(spark, root, schema)).outputOrdering().isEmpty)
    // a SORTED compaction fold re-establishes it (single fold entry:
    // every file internally sorted, ranges disjoint by the range
    // repartition)
    EpochStore.compactStore(spark, root, sortColumns = Seq("id"), parts = 3)
    val ord = scanOf(EpochStore.read(spark, root, schema)).outputOrdering()
    assert(ord.length == 1 && ord.head.toString.contains("id"),
      s"sorted fold must report its order, got ${ord.mkString("[", ",", "]")}")
    val df = EpochStore.read(spark, root, schema)
    assert(df.count() == 200)
  }

  test("streaming sink lands BUCKETED (and sorted) epochs: bucket dirs, " +
      "probe pruning, and the tail layout survive each trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp() + "/store"
    val cp = tmp() + "/cp"
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v")
      .writeStream.format("epochstore")
      .option("path", root)
      .option("bucketColumn", "id").option("bucketCount", "4")
      .option("statsColumns", "id").option("sortColumns", "id")
      .option("checkpointLocation", cp)
      .outputMode("append").start()
    try {
      (0 until 2).foreach { b =>
        in.addData((0 until 40).map(i => ((b * 40 + i).toLong, s"v$b-$i")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    // every streamed epoch landed the bucket layout
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    graft.core.EpochManifest.entries(spark, root).foreach { e =>
      val buckets = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/${e.dir}")).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("id_bucket="))
      assert(buckets.nonEmpty, s"epoch ${e.dir} must land bucket dirs")
    }
    // a point probe opens 1-of-4 buckets; rows stay exact
    val df = graft.sources.EpochStore.readBucketed(spark, root, schema,
      "id", 4)
    assert(df.count() == 80)
    val probe = df.filter($"id" === 7L)
    assert(probe.count() == 1)
    val sc = scanOf(probe)
    val (sel, tot) = sc.selectedPartitionDirs
    assert(sel * 4 <= tot && tot == 8,
      s"probe must open 1 bucket per epoch: $sel/$tot")
    // disjoint-epoch sorted buckets report their order
    assert(scanOf(df).outputOrdering().nonEmpty,
      "streamed sorted disjoint epochs must report the order")
  }

  test("clusterByBucket: a catalog-routed bucketed write lands at most " +
      "one file per bucket regardless of input partitioning") {
    import spark.implicits._
    val wh = tmp()
    cat("ordcb", wh)
    val root = s"$wh/t"
    // seed the layout, then append a deliberately 8-way-shuffled batch
    EpochStore.writeBucketed((0 until 4).map(i => (i.toLong, s"s$i"))
      .toDF("id", "v"), root, 0L, bucketColumn = "id", bucketCount = 4,
      statsColumns = Seq("id"), sortColumns = Seq("id"))
    (4 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(8)
      .writeTo("ordcb.t")
      .option("clusterByBucket", "true")
      .option("sortColumns", "id").option("statsColumns", "id")
      .append()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val newest = graft.core.EpochManifest.entries(spark, root)
      .maxBy(_.epoch)
    val filesPerBucket = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${newest.dir}")).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("id_bucket="))
      .map(d => d.getPath.getName ->
        fs.listStatus(d.getPath).count(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet")))
    assert(filesPerBucket.size == 4 && filesPerBucket.forall(_._2 == 1),
      s"bucket-clustered write must land one file per bucket: " +
        s"$filesPerBucket")
    // rows exact through the layout
    assert(spark.table("ordcb.t").count() == 400)
  }

  test("a runtime (DPP) narrowing recomputes the ordered plan: results " +
      "exact, surviving partitions still internally sorted") {
    import spark.implicits._
    val root = tmp()
    // four disjoint sorted epochs; a selective dim narrows at runtime
    (0 until 4).foreach { e =>
      sortedWrite((e * 100 until (e + 1) * 100)
        .map(i => (i.toLong, s"v$i")).toDF("id", "v"), root, e.toLong)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val df = EpochStore.read(spark, root, schema)
    assert(scanOf(df).outputOrdering().nonEmpty)
    val dimDir = tmp()
    Seq((150L, "keep"), (151L, "keep")).toDF("id", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = df.join(org.apache.spark.sql.functions.broadcast(dim), "id")
    assert(j.count() == 2)
    assert(j.select("v").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("v150", "v151"))
    // the full frame keeps per-partition sortedness after any replan
    val perPart = df.select("id").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
    perPart.foreach(p => assert(p == p.sorted))
  }

  test("a PARTITIONED sorted fold's files are physically ordered (the " +
      "dynamic-partition writer must not re-sort the claim away)") {
    import spark.implicits._
    val root = tmp()
    // values deliberately shuffled so an unsorted write would show;
    // two epochs — a single covered entry makes compact a no-op
    val rows = scala.util.Random.shuffle((0 until 3000).toList)
      .map(i => (i.toLong, s"L${i % 3}"))
    EpochStore.write(rows.take(1500).toDF("id", "lang"), root, 0L,
      partitionColumn = "lang")
    EpochStore.write(rows.drop(1500).toDF("id", "lang"), root, 1L,
      partitionColumn = "lang")
    EpochStore.compactStore(spark, root, sortColumns = Seq("id"), parts = 2)
    // every FILE of the fold must be internally id-sorted — the sidecar
    // records sortColumns, so an unsorted file is a FALSE order proof
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val entry = graft.core.EpochManifest.entries(spark, root).head
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap(s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath)
        else Nil)
    val files = walk(new org.apache.hadoop.fs.Path(s"$root/${entry.dir}"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.toString).select("id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"fold file $f is not internally sorted")
    }
  }

  test("q_store_sorted matches the raw-table recomputation of its oracle") {
    val res = graft.queries.MiscCatalog.storeSorted(spark, sf0001)
    val got = res.collect().toSeq.map(_.toSeq)
    // production-shape plan gate: the TWO-epoch bucketed catalog route
    // must still join merge-style with zero exchange below the final
    // ORDER BY/aggregate and zero SMJ sorts (the only allowed sorts
    // serve the query's own ORDER BY)
    val plan = res.queryExecution.executedPlan
    assert(nodes(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"expected a sort-merge join:\n$plan")
    val smjSorts = nodes(plan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        nodes(j).tail.collect {
          case s: org.apache.spark.sql.execution.SortExec => s }
    }.flatten
    assert(smjSorts.isEmpty, s"SMJ inputs must arrive pre-sorted:\n$plan")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    import org.apache.spark.sql.functions._
    val want = docs.filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(col("n_chars").cast("long")).as("chars"),
        sum((col("doc_id") % 89).cast("long")).as("score_sum"))
      .orderBy("lang").collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty && got == want, s"got=$got\nwant=$want")
  }

  test("DESCENDING sort layouts report DESC NULLS LAST: a matching " +
      "sortWithinPartitions is ELIDED (zero sort); mixed directions " +
      "report nothing") {
    import spark.implicits._
    val root = tmp()
    def descWrite(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
      df.write.format("epochstore").mode("append")
        .option("path", root).option("epoch", epoch.toString)
        .option("sortColumns", "id desc").option("statsColumns", "id")
        .option("writePartitions", "2")
        .save()
    // DISJOINT ranges; within each file rows are written id-DESC
    descWrite((0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"), 0L)
    descWrite((100 until 200).map(i => (i.toLong, s"b$i")).toDF("id", "v"), 1L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    // the sidecar records the direction
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rec = graft.core.EpochManifest.entries(spark, root).map { e =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, e.dir, "_schema.json")), "UTF-8")
    }
    assert(rec.forall(_.contains("\"sortColumns\":\"id DESC\"")),
      s"recorded: $rec")

    // the scan REPORTS id DESC NULLS LAST
    val df0 = EpochStore.read(spark, root, schema)
    val ord = scanOf(df0).outputOrdering()
    assert(ord.length == 1 &&
      ord.head.direction() == org.apache.spark.sql.connector.expressions
        .SortDirection.DESCENDING &&
      ord.head.nullOrdering() == org.apache.spark.sql.connector.expressions
        .NullOrdering.NULLS_LAST,
      s"report: ${ord.mkString(",")}")

    // zero-sort gate: a DESC NULLS LAST per-partition sort is elided
    val q = EpochStore.read(spark, root, schema)
      .sortWithinPartitions(org.apache.spark.sql.functions.col("id")
        .desc_nulls_last)
    q.collect()
    assert(sorts(q.queryExecution.executedPlan).isEmpty,
      s"the reported DESC order must elide the sort:\n" +
        q.queryExecution.executedPlan)
    // and the served rows ARE descending within every partition
    import org.apache.spark.sql.functions.spark_partition_id
    val rows = EpochStore.read(spark, root, schema)
      .select(spark_partition_id().as("p"),
        org.apache.spark.sql.functions.col("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (_, part) =>
      val ids = part.map(_._2).toSeq
      assert(ids == ids.sortBy(-_),
        s"partition rows must be id-DESC: ${ids.take(10)}")
    }
    // an ASC-matching sort over the DESC store is NOT elided
    val q2 = EpochStore.read(spark, root, schema)
      .sortWithinPartitions(org.apache.spark.sql.functions.col("id"))
    q2.collect()
    assert(sorts(q2.queryExecution.executedPlan).nonEmpty,
      "an ascending sort cannot be served by the DESC layout")

    // soundness: MIXED directions across entries report nothing
    val root2 = tmp()
    descWrite((0 until 50).map(i => (i.toLong, s"a$i")).toDF("id", "v"), 0L)
    (50 until 100).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root2).option("epoch", "1")
      .option("sortColumns", "id").option("statsColumns", "id").save()
    (0 until 50).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root2).option("epoch", "0")
      .option("sortColumns", "id desc").option("statsColumns", "id").save()
    assert(scanOf(EpochStore.read(spark, root2, schema))
      .outputOrdering().isEmpty,
      "mixed asc/desc entries must not report an order")
  }
}
