package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.plans.MaterializedAgg

/** Materialized-aggregate rewrite ([[graft.plans.MaterializedAgg]]):
  * rewritten results must equal the base plan row-for-row, the base path
  * must disappear from the rewritten plan's scan set, and everything
  * outside the soundness envelope must be REFUSED (kept on the base
  * plan), never silently wrong. */
class MvSpec extends SparkSpec {

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def base = graft.core.Tables.lineitem(spark, sf001)

  private def rollup() = base
    .groupBy(col("l_returnflag"))
    .agg(count(lit(1)).as("n_rows"),
      sum(col("l_quantity").cast("long")).as("qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))
    .orderBy("l_returnflag")

  test("roll-up over the base rewrites to the MV scan with identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    // avg/count(col) coverage: integral measure registered as a plain
    // sum (long partial sums → bit-exact decomposed average)
    def stats() = base
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_linenumber")).as("avg_ln"),
        count(col("l_linenumber")).as("cnt_ln"),
        sum(col("l_linenumber")).as("sum_ln"))
      .orderBy("l_returnflag")
    val want = rollup().collect().map(_.toSeq).toSeq // pre-registration: base plan
    val wantStats = stats().collect().map(_.toSeq).toSeq
    MaterializedAgg.register(base, Seq("l_returnflag", "l_linestatus"),
      s"$dir/mv", sumLongCols = Seq("l_quantity"),
      minCols = Seq("l_extendedprice"), maxCols = Seq("l_extendedprice"),
      sumCols = Seq("l_linenumber"), cntCols = Seq("l_linenumber"))
    try {
      val df = rollup()
      assert(df.collect().map(_.toSeq).toSeq == want, "rewrite changed the answer")
      val paths = scannedPaths(df)
      assert(paths.exists(_.contains("graft_mv")), s"MV not scanned: $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")),
        s"base still scanned after rewrite: $paths")
      val sdf = stats()
      assert(!scannedPaths(sdf).exists(_.contains("lineitem.parquet")),
        "avg/count(col) decomposition did not rewrite")
      assert(sdf.collect().map(_.toSeq).toSeq == wantStats,
        "decomposed avg/count(col) changed the answer")

      // exact-grouping (non-roll-up) shape with a group-col filter: the
      // filter must ride onto the MV scan
      def filtered() = base
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy("l_returnflag", "l_linestatus")
      val fdf = filtered()
      assert(!scannedPaths(fdf).exists(_.contains("lineitem.parquet")),
        "group-col filter prevented the rewrite")
      MaterializedAgg.unregister(base)
      assert(fdf.collect().map(_.toSeq).toSeq ==
        filtered().collect().map(_.toSeq).toSeq)
      // re-arm for the refusal block below
      MaterializedAgg.register(base, Seq("l_returnflag", "l_linestatus"),
        s"$dir/mv2", sumLongCols = Seq("l_quantity"),
        minCols = Seq("l_extendedprice"), maxCols = Seq("l_extendedprice"))

      // refusals — each keeps the base scan (and therefore stays correct)
      val measureFilter = base.filter(col("l_quantity") > 10)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(scannedPaths(measureFilter).exists(_.contains("lineitem.parquet")),
        "filter on a measure column must refuse the rewrite")
      val foreignGroup = base.groupBy(col("l_shipdate"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(foreignGroup).exists(_.contains("lineitem.parquet")),
        "grouping outside the MV columns must refuse the rewrite")
      val nonDecomposable = base.groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("a"))
      assert(scannedPaths(nonDecomposable).exists(_.contains("lineitem.parquet")),
        "an unregistered aggregate (avg) must refuse the rewrite")
      val distinctAgg = base.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("d"))
      assert(scannedPaths(distinctAgg).exists(_.contains("lineitem.parquet")),
        "DISTINCT aggregates must refuse the rewrite")
      val nonDet = base.filter(rand() < 0.5)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(scannedPaths(nonDet).exists(_.contains("lineitem.parquet")),
        "a nondeterministic filter must refuse the rewrite (per-group rand() lies)")
      // GLOBAL count with an empty-match group-col filter: the rewrite
      // fires (no grouping, group-col predicate) and must still return
      // 0 — Sum-over-partials alone would yield NULL on empty input
      val emptyCount = base.filter(col("l_returnflag") === "Z")
        .agg(count(lit(1)).as("n"))
      assert(!scannedPaths(emptyCount).exists(_.contains("lineitem.parquet")),
        "empty-match global count should still rewrite")
      assert(emptyCount.head.getLong(0) == 0L,
        "empty-match global count must be 0, not NULL")
    } finally MaterializedAgg.unregister(base)
  }

  test("re-register resets the store: stale delta epochs cannot double-count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_rereg").toString
    def q() = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
      .orderBy("l_returnflag")
    val want = q().collect().map(_.toSeq).toSeq
    MaterializedAgg.register(base, Seq("l_returnflag"), s"$dir/mv",
      sumLongCols = Seq("l_quantity"))
    try {
      // a delta epoch duplicating the whole base: counts visibly double
      MaterializedAgg.append(base, base, epoch = 1L)
      val doubled = q().collect().map(_.toSeq).toSeq
      assert(doubled != want, "duplicate delta invisible — fixture lost its teeth")
      // the rebuild path: re-register after a base change must RESET the
      // manifest to the fresh cube, not merge with the stale epochs
      MaterializedAgg.register(base, Seq("l_returnflag"), s"$dir/mv",
        sumLongCols = Seq("l_quantity"))
      assert(q().collect().map(_.toSeq).toSeq == want,
        "re-register left stale epochs double-counting")
    } finally MaterializedAgg.unregister(base)
  }

  test("decomposed avg: all-null group returns NULL, no divide-by-zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_nullavg").toString
    Seq(("a", Some(1L)), ("a", Some(3L)), ("b", None: Option[Long]))
      .toDF("g", "m").write.parquet(s"$dir/t")
    def t = spark.read.parquet(s"$dir/t")
    def q() = t.groupBy(col("g"))
      .agg(avg(col("m")).as("a"), count(col("m")).as("c")).orderBy("g")
    val want = q().collect().map(_.toSeq).toSeq // (a, 2.0-ish) and (b, null)
    assert(want.exists(r => r(1) == null), "fixture must have an all-null group")
    MaterializedAgg.register(t, Seq("g"), s"$dir/mv",
      sumCols = Seq("m"), cntCols = Seq("m"))
    try {
      val df = q()
      assert(!scannedPaths(df).exists(_.endsWith("/t")), "avg did not rewrite")
      assert(df.collect().map(_.toSeq).toSeq == want,
        "decomposed avg diverged on the all-null group")
    } finally MaterializedAgg.unregister(t)
  }

  test("cube lattice: the narrowest covering view answers each roll-up") {
    val wide = java.nio.file.Files.createTempDirectory("graft_mv_wide").toString
    val narrow = java.nio.file.Files.createTempDirectory("graft_mv_narrow").toString
    def q(cols: String*) = base
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
      .orderBy(cols.map(col): _*)
    val wantRf = q("l_returnflag").collect().map(_.toSeq).toSeq
    val wantBoth = q("l_returnflag", "l_linestatus").collect().map(_.toSeq).toSeq
    MaterializedAgg.register(base, Seq("l_returnflag", "l_linestatus"),
      s"$wide/mv", sumLongCols = Seq("l_quantity"))
    MaterializedAgg.register(base, Seq("l_returnflag"),
      s"$narrow/mv", sumLongCols = Seq("l_quantity"))
    try {
      // single-col roll-up: both views cover it; the 3-row narrow one wins
      val rf = q("l_returnflag")
      val rfPaths = scannedPaths(rf)
      assert(rfPaths.exists(_.contains("graft_mv_narrow")),
        s"narrow view not chosen: $rfPaths")
      assert(!rfPaths.exists(_.contains("graft_mv_wide")) &&
        !rfPaths.exists(_.contains("lineitem.parquet")),
        s"wrong relation scanned: $rfPaths")
      assert(rf.collect().map(_.toSeq).toSeq == wantRf)
      // two-col grouping: only the wide view covers it
      val both = q("l_returnflag", "l_linestatus")
      val bothPaths = scannedPaths(both)
      assert(bothPaths.exists(_.contains("graft_mv_wide")),
        s"wide view not chosen: $bothPaths")
      assert(!bothPaths.exists(_.contains("lineitem.parquet")),
        s"base still scanned: $bothPaths")
      assert(both.collect().map(_.toSeq).toSeq == wantBoth)
    } finally MaterializedAgg.unregister(base)
  }

  test("an unreadable MV store falls back to the base plan and unregisters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_gone").toString
    def q() = base.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    val want = q().collect().map(_.toSeq).toSeq
    MaterializedAgg.register(base, Seq("l_returnflag"), s"$dir/mv")
    try {
      assert(!scannedPaths(q()).exists(_.contains("lineitem.parquet")))
      // the store vanishes out from under the registry (another session's
      // workspace eviction, an operator rm) — the documented contract is
      // "non-matching query keeps its base plan", not an exception from
      // inside the optimizer
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rm); p.delete(); ()
      }
      rm(new java.io.File(s"$dir/mv"))
      val df = q()
      assert(df.collect().map(_.toSeq).toSeq == want,
        "query over a lost store must still answer from the base")
      assert(scannedPaths(df).exists(_.contains("lineitem.parquet")),
        "lost store must fall back to the base scan")
    } finally MaterializedAgg.unregister(base)
  }

  test("unregister(mvRoot) drops one lattice member; the rest keep serving") {
    val wide = java.nio.file.Files.createTempDirectory("graft_mv_w2").toString
    val narrow = java.nio.file.Files.createTempDirectory("graft_mv_n2").toString
    def q() = base.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    MaterializedAgg.register(base, Seq("l_returnflag", "l_linestatus"), s"$wide/mv")
    MaterializedAgg.register(base, Seq("l_returnflag"), s"$narrow/mv")
    try {
      assert(scannedPaths(q()).exists(_.contains("graft_mv_n2")))
      MaterializedAgg.unregister(base, mvRoot = s"$narrow/mv")
      val paths = scannedPaths(q())
      assert(paths.exists(_.contains("graft_mv_w2")),
        s"surviving lattice member must serve the roll-up: $paths")
      assert(!paths.exists(_.contains("graft_mv_n2")),
        s"dropped member still scanned: $paths")
    } finally MaterializedAgg.unregister(base)
  }

  test("time-bucketed lattice: coarser date_trunc roll-ups compose from the stored bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_time").toString
    def orders = graft.core.Tables.orders(spark, sf001)
    def q(unit: String, withPri: Boolean = false) = {
      val grp = if (withPri)
        Seq(date_trunc(unit, col("o_orderdate")).as("bucket"), col("o_orderpriority"))
      else Seq(date_trunc(unit, col("o_orderdate")).as("bucket"))
      orders.groupBy(grp: _*)
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .orderBy(Seq(col("bucket")) ++
          (if (withPri) Seq(col("o_orderpriority")) else Nil): _*)
    }
    val wantMonth = q("month").collect().map(_.toSeq).toSeq
    val wantYear = q("year", withPri = true).collect().map(_.toSeq).toSeq
    val wantDay = q("day").collect().map(_.toSeq).toSeq
    MaterializedAgg.register(orders, Seq("o_orderpriority"), s"$dir/mv",
      minCols = Seq("o_totalprice"), maxCols = Seq("o_totalprice"),
      timeBuckets = Seq(("o_orderdate", "day")))
    try {
      // coarser unit + grouping subset: month∘day composes, priority drops
      val m = q("month")
      assert(!scannedPaths(m).exists(_.contains("orders.parquet")),
        s"month roll-up did not rewrite: ${scannedPaths(m)}")
      assert(m.collect().map(_.toSeq).toSeq == wantMonth,
        "month-over-day composition changed the answer")
      // coarser unit + full grouping
      val y = q("year", withPri = true)
      assert(!scannedPaths(y).exists(_.contains("orders.parquet")),
        "year roll-up with priority did not rewrite")
      assert(y.collect().map(_.toSeq).toSeq == wantYear)
      // equal unit: day-over-day
      val d = q("day")
      assert(!scannedPaths(d).exists(_.contains("orders.parquet")),
        "same-unit day query did not rewrite")
      assert(d.collect().map(_.toSeq).toSeq == wantDay)
      // refusals: finer than stored, and a raw-time filter
      assert(scannedPaths(q("hour")).exists(_.contains("orders.parquet")),
        "hour query over a day store must refuse — day buckets can't split")
      // a query truncating under a DIFFERENT session zone than the
      // buckets were built in must refuse (day boundaries shift)
      val prevTz = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert(scannedPaths(q("month")).exists(_.contains("orders.parquet")),
          "cross-zone truncation must refuse the rewrite")
      } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
      val rawFilter = orders
        .filter(col("o_orderdate") > lit("1995-06-15").cast("timestamp"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(rawFilter).exists(_.contains("orders.parquet")),
        "a filter on the raw time column must refuse (mid-bucket boundary)")
    } finally MaterializedAgg.unregister(orders)
  }

  test("week composes from day but not from month") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_week").toString
    def orders = graft.core.Tables.orders(spark, sf001)
    def weekQ = orders
      .groupBy(date_trunc("week", col("o_orderdate")).as("bucket"))
      .agg(count(lit(1)).as("n")).orderBy("bucket")
    val want = weekQ.collect().map(_.toSeq).toSeq
    MaterializedAgg.register(orders, Nil, s"$dir/mv",
      timeBuckets = Seq(("o_orderdate", "day")))
    try {
      val w = weekQ
      assert(!scannedPaths(w).exists(_.contains("orders.parquet")),
        "week-over-day must compose")
      assert(w.collect().map(_.toSeq).toSeq == want)
    } finally MaterializedAgg.unregister(orders)
    MaterializedAgg.register(orders, Nil, s"$dir/mv_month",
      timeBuckets = Seq(("o_orderdate", "month")))
    try {
      assert(scannedPaths(weekQ).exists(_.contains("orders.parquet")),
        "week-over-month must refuse — weeks straddle month boundaries")
    } finally MaterializedAgg.unregister(orders)
  }

  test("streaming-maintained MV: appended epochs are live, compaction re-folds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_stream").toString
    val want = rollup().collect().map(_.toSeq).toSeq // truth: full base, plain plan
    // register the cube built from HALF the fact table (the base scan's
    // path set is what's registered, so the rewrite still matches full-
    // table queries); stream the other half in as delta epochs
    MaterializedAgg.register(
      base.filter(col("l_orderkey") % 2 === 0),
      Seq("l_returnflag", "l_linestatus"), s"$dir/mv",
      sumLongCols = Seq("l_quantity"),
      minCols = Seq("l_extendedprice"), maxCols = Seq("l_extendedprice"))
    try {
      // before the deltas arrive the MV answers only half the base —
      // visibly different, proving the later equality isn't vacuous
      assert(rollup().collect().map(_.toSeq).toSeq != want,
        "half-base MV already equals the full answer — fixture lost its teeth")
      val deltaRows = base.filter(col("l_orderkey") % 2 =!= 0)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      val in = MemoryStream[(String, String, Double, Double)]
      def run(): Unit = graft.streaming.Jobs.mvMaintain(
        in.toDF().toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"),
        base, s"$dir/cp", compactEvery = 2).awaitTermination(60000)
      val batches = deltaRows.grouped((deltaRows.length / 3).max(1)).toSeq
      assert(batches.size >= 3, "need enough delta batches to cross the compaction boundary")
      batches.foreach { b => in.addData(b.toSeq); run() }
      // the rewrite answers current — and still off the MV, not the base
      val df = rollup()
      assert(df.collect().map(_.toSeq).toSeq == want,
        "streaming-maintained MV diverged from the full-base answer")
      assert(!scannedPaths(df).exists(_.contains("lineitem.parquet")),
        "query fell back to the base after streaming maintenance")
      // the mid-stream compaction bounded the manifest
      val entries = graft.core.EpochManifest.entries(spark, s"$dir/mv")
      assert(entries.size < 1 + batches.size,
        s"compaction never fired: ${entries.size} manifest entries")
    } finally MaterializedAgg.unregister(base)
  }
}
