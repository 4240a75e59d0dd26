package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import graft.sources.EpochStore

/** X88 — column-level statistics for CBO: the scan folds the pruned
  * file set's per-file sidecar min/max/null counts into v2
  * ColumnStatistics, which Spark's transformV2Stats turns into
  * attributeStats. Bounds must be exact over the PRUNED set, absent
  * (never wrong) when any planned file lacks them. */
class CboStatsSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_cbo").toString

  test("attributeStats carry exact folded min/max/nullCount; narrowing " +
      "the scan narrows the bounds; a stats-less store reports none") {
    import spark.implicits._
    val root = tmp()
    def df0(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, if (i % 10 == 0) None else Some(i * 2.0), s"v$i"))
      .toDF("id", "score", "v")
    EpochStore.write(df0(0, 100), root, 0L,
      statsColumns = Seq("id", "score"))
    EpochStore.write(df0(100, 200), root, 1L,
      statsColumns = Seq("id", "score"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats
      }.head
    val st = statsOf(EpochStore.read(spark, root, schema))
    assert(st.rowCount.contains(BigInt(200)))
    val attrs = st.attributeStats.toSeq.map { case (a, cs) => a.name -> cs }
      .toMap
    assert(attrs.contains("id") && attrs.contains("score"),
      s"numeric stats columns must report: ${attrs.keys}")
    assert(attrs("id").min.contains(0L) && attrs("id").max.contains(199L))
    assert(attrs("id").nullCount.contains(BigInt(0)))
    assert(attrs("score").nullCount.contains(BigInt(20)))
    assert(attrs("score").min.contains(2.0) &&
      attrs("score").max.contains(398.0))
    // v carries no sidecar stats here (not in statsColumns) — absent,
    // never guessed; string columns WITH 'S' sidecars do report (the
    // dedicated test below)
    assert(!attrs.contains("v"))

    // a stats-range-narrowed scan reports the SURVIVING files' bounds
    val narrowed = statsOf(EpochStore.read(spark, root, schema)
      .filter(org.apache.spark.sql.functions.col("id") >= 100L))
    val nid = narrowed.attributeStats.toSeq
      .collectFirst { case (a, cs) if a.name == "id" => cs }.get
    assert(nid.min.contains(100L) && nid.max.contains(199L),
      s"pruned scan must fold pruned bounds: ${nid.min} .. ${nid.max}")

    // no statsColumns -> no column stats, row counts still exact
    val root2 = tmp()
    EpochStore.write(df0(0, 50), root2, 0L)
    val st2 = statsOf(EpochStore.read(spark, root2, schema))
    assert(st2.attributeStats.isEmpty && st2.rowCount.contains(BigInt(50)))
  }

  test("string nullCount drives a plan-gated selectivity change under " +
      "CBO: IS NOT NULL over a mostly-null string column shrinks the " +
      "filter's row estimate exactly") {
    import spark.implicits._
    val root = tmp()
    // 40% null strings, stats on the string column
    EpochStore.write((0 until 100)
      .map(i => (i.toLong, if (i % 5 < 2) None else Some(s"s$i")))
      .toDF("id", "v"), root, 0L, statsColumns = Seq("id", "v"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    // the 'S' sidecar serves exact UTF-8-binary-order string bounds
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats
      }.head
    val attrs = statsOf(EpochStore.read(spark, root, schema))
      .attributeStats.toSeq.map { case (a, cs) => a.name -> cs }.toMap
    assert(attrs.contains("v"), s"string stats must report: ${attrs.keys}")
    assert(attrs("v").nullCount.contains(BigInt(40)))
    // byte-lexicographic min: s10/s11 are null, and "s12" < "s2"
    assert(attrs("v").min.map(String.valueOf).contains("s12") &&
      attrs("v").max.map(String.valueOf).contains("s99"),
      s"string bounds: ${attrs("v").min} .. ${attrs("v").max}")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = EpochStore.read(spark, root, schema)
        .filter(org.apache.spark.sql.functions.col("v").isNotNull)
      val filterNode = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }.head
      // FilterEstimation: 100 rows * (1 - 40/100) = 60 — only reachable
      // through the served string nullCount
      assert(filterNode.stats.rowCount.contains(BigInt(60)),
        s"IS NOT NULL selectivity must come from the string stats: " +
          s"${filterNode.stats.rowCount}")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("distinctCount folds per-file HLL sketches within sketch error; " +
      "narrowing the scan narrows it; a sketch-less file silences it") {
    import spark.implicits._
    val root = tmp()
    def df0(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, (i % 10).toLong)).toDF("id", "grp")
    EpochStore.write(df0(0, 100), root, 0L, statsColumns = Seq("id", "grp"))
    EpochStore.write(df0(100, 200), root, 1L,
      statsColumns = Seq("id", "grp"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.LongType)))
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats
      }.head
    def ndvOf(df: org.apache.spark.sql.DataFrame, c: String)
        : Option[BigInt] =
      statsOf(df).attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == c => cs }
        .flatMap(_.distinctCount)
    val full = EpochStore.read(spark, root, schema)
    val idNdv = ndvOf(full, "id").get.toLong
    assert(math.abs(idNdv - 200L) <= 20L,
      s"id ndv within sketch error of 200: $idNdv")
    val grpNdv = ndvOf(full, "grp").get.toLong
    assert(grpNdv >= 8L && grpNdv <= 12L,
      s"grp ndv near-exact at low cardinality: $grpNdv")
    // the PLANNED-set fold: a stats-narrowed scan re-estimates over the
    // surviving files only
    val half = EpochStore.read(spark, root, schema)
      .filter(org.apache.spark.sql.functions.col("id") >= 100L)
    val halfNdv = ndvOf(half, "id").get.toLong
    assert(math.abs(halfNdv - 100L) <= 10L,
      s"pruned scan folds pruned sketches: $halfNdv")
    // strip one entry's sketches (a pre-NDV sidecar): distinctCount
    // goes ABSENT — never guessed — while min/max keep reporting
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val e0 = graft.core.EpochManifest.entries(spark, root).head
    val stripped = graft.sources.EpochStoreStats.read(fs, root, e0.dir)
      .toSeq.map { case (rel, st) =>
        rel -> st.copy(cols = st.cols.map { case (c, cs) =>
          c -> cs.copy(ndv = None) })
      }
    graft.sources.EpochStoreStats.write(fs, root, e0.dir, stripped)
    val after = EpochStore.read(spark, root, schema)
    assert(ndvOf(after, "id").isEmpty,
      "a sketch-less planned file must silence distinctCount")
    val attrs2 = statsOf(after).attributeStats.toSeq
      .map { case (a, cs) => a.name -> cs }.toMap
    assert(attrs2("id").min.contains(0L) && attrs2("id").max.contains(199L),
      "min/max keep reporting without sketches")
  }

  test("CBO join reorder keys on the served distinctCount: the planted " +
      "3-table skewed shape joins the selective dim first") {
    import spark.implicits._
    val whF = tmp(); val whA = tmp(); val whB = tmp()
    // fact: 2000 rows, a in [0,400), b in [0,10)
    EpochStore.write((0 until 2000)
      .map(i => (i.toLong, (i % 400).toLong, (i % 10).toLong))
      .toDF("id", "a", "b"), whF, 0L, statsColumns = Seq("a", "b"))
    EpochStore.write((0 until 400).map(i => (i.toLong, s"a$i"))
      .toDF("aid", "aname"), whA, 0L, statsColumns = Seq("aid"))
    // dimB holds only 2 of the 10 b-values: F JOIN B is the selective
    // join (2000*2/10 = 400 rows) vs F JOIN A (2000 rows)
    EpochStore.write(Seq((0L, "b0"), (1L, "b1")).toDF("bid", "bname"),
      whB, 0L, statsColumns = Seq("bid"))
    val sf = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType)))
    val sa = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("aid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("aname",
        org.apache.spark.sql.types.StringType)))
    val sb = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bname",
        org.apache.spark.sql.types.StringType)))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // syntactic order joins A FIRST; the cost-based reorder should
      // move the selective B join ahead — reachable only through the
      // join-key ndv the sketches serve
      val f = EpochStore.read(spark, whF, sf)
      val a = EpochStore.read(spark, whA, sa)
      val b = EpochStore.read(spark, whB, sb)
      val q = f.join(a, f("a") === a("aid"))
        .join(b, f("b") === b("bid"))
        .select(f("id"), a("aname"), b("bname"))
      def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case r: DataSourceV2ScanRelation => r.scan match {
            case s: graft.sources.EpochStoreScan => s.root
            case _ => "?"
          }
        }
      val order = leafOrder(q)
      assert(order.indexOf(whB) < order.indexOf(whA),
        s"the selective dim must join first under CBO: $order " +
          "(fact-B intermediate = 400 rows vs fact-A = 2000 — only the " +
          "served distinctCount exposes that)")
      // correctness unchanged by the reorder
      assert(q.count() == 400L)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("NDV sketches fold to ONE blob per (entry, column) at commit — " +
      "the stats sidecar carries none per file, and sidecar bytes stay " +
      "flat in the file count") {
    import spark.implicits._
    val root = tmp()
    // many files: force a wide write so the entry holds >1 data file
    (0 until 2000).map(i => (i.toLong, (i % 50).toLong)).toDF("id", "grp")
      .repartition(16)
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("statsColumns", "id,grp").save()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val e0 = graft.core.EpochManifest.entries(spark, root).head
    val statsP = graft.sources.EpochStoreStats.sidecarPath(root, e0.dir)
    val body = {
      val in = fs.open(statsP)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val nFiles = graft.sources.EpochStoreStats.read(fs, root, e0.dir).size
    assert(nFiles > 1, s"need a multi-file entry, got $nFiles")
    assert(!body.contains("\"ndv\":"),
      "stats.json must carry no per-file register vectors")
    val entryNdv = graft.sources.EpochStoreStats.readEntryNdv(fs, root, e0.dir)
    assert(entryNdv.keySet == Set("id", "grp"),
      s"one merged sketch per stats column: ${entryNdv.keySet}")
    // the merged sketch serves the same estimate the per-file fold did
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.LongType)))
    val st = EpochStore.read(spark, root, schema)
      .queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.stats
      }.head
    val ndv = st.attributeStats.toSeq
      .collectFirst { case (a, cs) if a.name == "id" => cs }
      .flatMap(_.distinctCount).get.toLong
    assert(math.abs(ndv - 2000L) <= 200L, s"id ndv within error: $ndv")
  }
}
