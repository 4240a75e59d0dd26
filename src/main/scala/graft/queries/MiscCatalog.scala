package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Parity._

/** Remaining operator-class coverage: pivot, generator word-count, exact
  * percentiles, ordered string aggregation, time-range join, correlated
  * scalar subquery through the spark.sql API, and max_by/argmax.
  */
object MiscCatalog {

  /** Pivot (wide aggregation): order totals by priority × status. */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))
      .orderBy("o_orderpriority")

  val pivotStatusSql: String =
    s"""SELECT o_orderpriority,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Generator (F9): explode tokens → corpus word count → top-20. */
  def wordTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  val wordTopKSql: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word ASC
      |LIMIT 20""".stripMargin

  /** Exact interpolated percentiles per group (the dashboards' median).
    *
    * ORACLE-SF-ONLY: Spark's exact `percentile` buffers EVERY group value
    * in executor memory — with 3 order-status groups, one group holds
    * ~1/3 of all orders, which OOMs long before 100 TB. The exact form
    * exists because exact linear interpolation is what DuckDB's
    * `quantile_cont` reproduces cell-for-cell; the bounded-memory scale
    * path is [[percentilesApprox]], its rows-only + spec-bounded twin. */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Rank-error guarantee of [[percentilesApprox]]: 1/PctAccuracy. */
  val PctAccuracy = 10000

  /** The 100 TB percentile path: `percentile_approx` keeps a BOUNDED
    * O(accuracy·log n) Greenwald–Khanna quantile summary per group
    * instead of buffering every value, with a hard rank-error guarantee —
    * the returned value's rank is within n/[[PctAccuracy]] of the target
    * rank. Sketch contents depend on merge order, so the values are not
    * ANSI-SQL-reproducible (rows-only driver check); MiscSpec pins the
    * guarantee instead, asserting each approx percentile falls between
    * the EXACT (p ± 1/accuracy) order statistics per group. Same output
    * shape as [[percentiles]] so dashboards can swap the twin in
    * unchanged. */
  def percentilesApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr(s"percentile_approx(o_totalprice, 0.25, $PctAccuracy)").as("p25"),
        expr(s"percentile_approx(o_totalprice, 0.5, $PctAccuracy)").as("p50"),
        expr(s"percentile_approx(o_totalprice, 0.75, $PctAccuracy)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Ordered string aggregation: nations per region as a sorted CSV. */
  def stringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("r_name")
  }

  val stringAggSql: String =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Time-range join (J1 range variant): per-user event pairs within 10
    * minutes. The r11 shape was a self-join on user_id with the range as
    * a residual filter — correct, but the join materializes every
    * per-(user, key-match) row pair BEFORE the filter prunes it, a
    * |events-per-user|² blowup that a hot user turns into the dominant
    * cost at scale. This is the scale-safe replacement: ONE hash
    * exchange on user_id (shuffle == |input| rows, measured in
    * MiscSpec), a per-partition sort by (user, ts, id), and a forward
    * merge over a bounded look-back deque holding only the trailing
    * 10-minute window — the [[graft.plans.AsOfJoinExec]] single-
    * candidate merge generalized to an interval buffer. Pair semantics
    * (id1 < id2 ∧ ts1 ≤ ts2 ≤ ts1 + 10 min) fold per partition into a
    * tiny (t1, t2) count map, so the second exchange carries ≤ |types|²
    * rows per partition, never pairs. Memory is bounded by events per
    * user per 10 minutes (the deque), not events per user. */
  def eventPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val windowUs = 10L * 60L * 1000000L
    val partial = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[(Long, Long, java.sql.Timestamp, String)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { rows =>
        def us(t: java.sql.Timestamp): Long =
          t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        // (tsUs, event_id, event_type) of the trailing window, ts-ascending
        val buf = scala.collection.mutable.ArrayDeque.empty[(Long, Long, String)]
        var curUser = Long.MinValue
        var any = false
        rows.foreach { case (user, id, ts, tp) =>
          if (!any || user != curUser) { buf.clear(); curUser = user; any = true }
          val tUs = us(ts)
          while (buf.nonEmpty && buf.head._1 < tUs - windowUs) buf.removeHead()
          buf.foreach { case (dUs, dId, dTp) =>
            // earlier-or-equal event d vs current event e, exactly one
            // orientation can satisfy (id1 < id2, ts2 ≥ ts1): d as the
            // lower id (always in-window here), or — only at EQUAL ts,
            // since ts2 ≥ ts1 needs dUs ≥ tUs — e as the lower id
            if (dId < id) counts((dTp, tp)) = counts.getOrElse((dTp, tp), 0L) + 1L
            else if (dUs == tUs) counts((tp, dTp)) = counts.getOrElse((tp, dTp), 0L) + 1L
          }
          buf.append((tUs, id, tp))
        }
        counts.iterator.map { case ((t1, t2), n) => (t1, t2, n) }
      }
      .toDF("t1", "t2", "n")
    partial.groupBy(col("t1"), col("t2"))
      .agg(sum(col("n")).as("n_pairs"))
      .orderBy("t1", "t2")
  }

  /** The r11 self-join form of [[eventPairs]], kept as the semantic twin
    * MiscSpec proves the merge against (and the shape whose pair-
    * expansion exchange the merge exists to avoid). */
  def eventPairsJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val a = e.select(col("user_id"), col("event_id").as("id1"),
      col("ts").as("ts1"), col("event_type").as("t1"))
    val b = e.select(col("user_id"), col("event_id").as("id2"),
      col("ts").as("ts2"), col("event_type").as("t2"))
    a.join(b, Seq("user_id"))
      .filter(col("id1") < col("id2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("t1", "t2")
  }

  val eventPairsSql: String =
    """SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_pairs
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |WHERE a.event_id < b.event_id
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '10 minutes'
      |GROUP BY t1, t2
      |ORDER BY t1, t2""".stripMargin

  /** Correlated scalar subquery through the spark.sql entry point
    * (Catalyst decorrelates it into an aggregate + join): orders above
    * 1.8× their customer's decimal-exact average. */
  def sqlScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM v_orders o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM v_orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val sqlScalarSubquerySql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.8 * (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** max_by/argmax: richest customer per segment, deterministic composite
    * ordering (acctbal, custkey). */
  def argmax(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("top_customer"),
        max(col("c_acctbal")).as("top_bal"))
      .orderBy("c_mktsegment")

  val argmaxSql: String =
    """SELECT c_mktsegment, c_name AS top_customer, c_acctbal AS top_bal
      |FROM customer
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                           ORDER BY c_acctbal DESC, c_custkey DESC) = 1
      |ORDER BY c_mktsegment""".stripMargin

  /** As-of join (composed from equi-join + max_by — option (a) in the
    * custom-operator preference order, since built-ins express it): for
    * each purchase event, the same user's latest click at or before it
    * (attribution's classic shape). Deterministic via the (ts, event_id)
    * composite. At scale this is a hash join on the user key with
    * per-key reduction — no sort-merge range scan needed until event
    * history per key stops fitting a reduce task, at which point bucket
    * both sides by key. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts"))
      .groupBy(col("p_id"))
      .agg(
        max_by(col("c_id"), struct(col("c_ts"), col("c_id"))).as("asof_click"),
        max(col("c_ts")).as("asof_ts"))
      .orderBy("p_id")
  }

  // ts is CAST to µs-truncated TIMESTAMP everywhere (comparisons, ordering,
  // output) so DuckDB's ns-precision view can't order or emit differently
  // than Spark's µs column
  val asofJoinSql: String =
    """SELECT p_id, c_id AS asof_click, c_ts AS asof_ts
      |FROM (
      |  SELECT p.event_id AS p_id, c.event_id AS c_id,
      |    CAST(c.ts AS TIMESTAMP) AS c_ts,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id
      |                       ORDER BY CAST(c.ts AS TIMESTAMP) DESC, c.event_id DESC) AS rn
      |  FROM events p JOIN events c
      |    ON p.user_id = c.user_id AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
      |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |)
      |WHERE rn = 1
      |ORDER BY p_id""".stripMargin

  /** As-of join on the NATIVE sort-merge operator ([[graft.plans.AsOfJoin]]:
    * logical node + strategy + physical exec — the (c) option of the
    * custom-operator preference order) — same semantics and the same
    * DuckDB oracle as [[asofJoin]], the plan-twin pattern F8 uses for the
    * UDF/codegen pair. Where the compositional form materializes every
    * qualifying (purchase, earlier click) pair before `max_by` discards
    * all but one — saved at this SF only by a broadcast join, quadratic
    * per hot key once neither side broadcasts — the native exec is one
    * hash exchange + sort per side and a zero-expansion forward merge
    * holding a single candidate row. */
  def asofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin.asofBackward(purchases, clicks, Seq("user_id"),
        "p_ts", "c_ts", rightTieBreaks = Seq("c_id"))
      .select(col("p_id"), col("c_id").as("asof_click"), col("c_ts").as("asof_ts"))
      .orderBy("p_id")
  }

  /** Left-outer as-of: every purchase appears, null-extended when the
    * user has no prior click (the point-in-time feature-lookup contract —
    * a missing feature row must not drop the example). */
  def asofNativeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin.asofBackward(purchases, clicks, Seq("user_id"),
        "p_ts", "c_ts", rightTieBreaks = Seq("c_id"), outer = true)
      .select(col("p_id"), col("c_id").as("asof_click"), col("c_ts").as("asof_ts"))
      .orderBy("p_id")
  }

  val asofNativeOuterSql: String =
    """SELECT p_id, c_id AS asof_click, c_ts AS asof_ts
      |FROM (
      |  SELECT p.event_id AS p_id, c.event_id AS c_id,
      |    CAST(c.ts AS TIMESTAMP) AS c_ts,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id
      |                       ORDER BY CAST(c.ts AS TIMESTAMP) DESC, c.event_id DESC) AS rn
      |  FROM events p LEFT JOIN events c
      |    ON p.user_id = c.user_id AND c.event_type = 'click'
      |   AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
      |  WHERE p.event_type = 'purchase'
      |)
      |WHERE rn = 1
      |ORDER BY p_id""".stripMargin

  /** Unpivot/melt — pivot's inverse: the per-status totals back to long
    * form (wide→narrow reshaping for the dashboard layer). */
  def unpivot(spark: SparkSession, sfDir: String): DataFrame =
    pivotStatus(spark, sfDir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")),
        "status", "total")
      .filter(col("total").isNotNull)
      .orderBy("o_orderpriority", "status")

  val unpivotSql: String =
    s"""WITH wide AS (${pivotStatusSql.replace("ORDER BY o_orderpriority", "")})
       |SELECT o_orderpriority, status, total
       |FROM wide UNPIVOT (total FOR status IN (F, O, P))
       |ORDER BY o_orderpriority, status""".stripMargin

  /** Ranking-function breadth: ntile/percent_rank/cume_dist over a total
    * order (deterministic tie-break on custkey). */
  def windowStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  val windowStatsSql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** Histogram via explicit binning (floor division — portable, unlike
    * engine-specific histogram aggregates). */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy((floor(col("o_totalprice") / 50000) * 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val histogramSql: String =
    """SELECT CAST(FLOOR(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket, COUNT(*) AS n
      |FROM orders
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  /** Null/conditional breadth: coalesce, nullif, least/greatest, CASE. */
  def nullFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
        least(col("o_totalprice"), lit(100000.0)).as("capped"),
        greatest(col("o_totalprice") - 100000.0, lit(0.0)).as("excess"),
        when(col("o_orderpriority").startsWith("1"), "urgent")
          .when(col("o_orderpriority").startsWith("2"), "high")
          .otherwise("normal").as("pri_class"))
      .orderBy("o_orderkey")
      .limit(3000)

  val nullFuncsSql: String =
    """SELECT o_orderkey,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
      |  LEAST(o_totalprice, 100000.0) AS capped,
      |  GREATEST(o_totalprice - 100000.0, 0.0) AS excess,
      |  CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent'
      |       WHEN o_orderpriority LIKE '2%' THEN 'high'
      |       ELSE 'normal' END AS pri_class
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 3000""".stripMargin

  /** Z-order (Morton) curve position per row ([[graft.core.Layout]]) —
    * the expression the z-ordered WRITE clusters on, surfaced as a query
    * so the driver hash-checks the curve itself: DuckDB replays the
    * identical 32-term interleave ([[graft.core.Layout.zvalueSql]]),
    * proving the two engines agree on every row's curve position and
    * therefore on the physical order a z-ordered table lands in. The
    * layout's PAYOFF — a 2-D box predicate reading strictly fewer rows
    * from a z-ordered copy than from a single-key sort — is measured in
    * LayoutSpec via `Metrics.scanRows` over real parquet writes. */
  def zorderQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        graft.core.Layout.zvalue(col("l_partkey"), col("l_suppkey"), 16).as("zval"))
      .orderBy("zval", "l_orderkey", "l_linenumber")

  val zorderSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  ${graft.core.Layout.zvalueSql("l_partkey", "l_suppkey", 16)} AS zval
       |FROM lineitem
       |WHERE l_orderkey <= 2000
       |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin

  /** Snapshot reconciliation — the operational diff a 100 TB pipeline
    * runs between yesterday's and today's landed table (backfill audit,
    * replication check, CDC validation): full-outer join on the row
    * KEY with each side reduced to a 16-byte content fingerprint
    * first, so the shuffle moves (key, md5) pairs — fixed ~24 bytes per
    * row regardless of row width — never the rows themselves.
    * Added/removed/changed/unchanged classify from null-ness and
    * fingerprint inequality. The two "snapshots" here are deterministic
    * perturbations of the same fixture (≈1% membership drift per side
    * via coprime moduli, ≈1% value drift), so every class is non-empty
    * and both engines rebuild the exact counts. */
  def tableDiffQ(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    // snapshot = keyed aggregate state (the fixture's (orderkey,
    // linenumber) is not unique, so the diffable unit is the per-key
    // group: quantity mass + row count, fingerprinted to 16 bytes).
    // Map-side partial aggregation shrinks each side BEFORE its shuffle.
    def snap(dropMod: Int, bump: Boolean, hname: String): DataFrame = {
      val qty = if (bump)
        col("l_quantity") + when(col("l_orderkey") % 101 === 0, 1).otherwise(0)
      else col("l_quantity")
      li.filter(col("l_orderkey") % dropMod =!= 0)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(qty.cast("long")).as("q"), count(lit(1)).as("c"))
        .select(col("l_orderkey"), col("l_linenumber"),
          md5(concat_ws("|", col("q").cast("string"), col("c").cast("string"))).as(hname))
    }
    val prev = snap(89, bump = false, "h_old")
    val cur = snap(97, bump = true, "h_new")
    prev.join(cur, Seq("l_orderkey", "l_linenumber"), "full_outer")
      .select(when(col("h_new").isNull, "removed")
        .when(col("h_old").isNull, "added")
        .when(col("h_old") =!= col("h_new"), "changed")
        .otherwise("unchanged").as("diff_class"))
      .groupBy("diff_class")
      .agg(count(lit(1)).as("n"))
      .orderBy("diff_class")
  }

  val tableDiffSql: String = {
    def fp(qty: String) =
      s"md5(CAST(CAST(SUM(CAST($qty AS BIGINT)) AS BIGINT) AS VARCHAR) || '|' || " +
        "CAST(COUNT(*) AS VARCHAR))"
    s"""WITH o AS (
      |  SELECT l_orderkey, l_linenumber, ${fp("l_quantity")} AS h_old
      |  FROM lineitem WHERE l_orderkey % 89 <> 0
      |  GROUP BY 1, 2
      |), c AS (
      |  SELECT l_orderkey, l_linenumber,
      |    ${fp("l_quantity + CASE WHEN l_orderkey % 101 = 0 THEN 1 ELSE 0 END")} AS h_new
      |  FROM lineitem WHERE l_orderkey % 97 <> 0
      |  GROUP BY 1, 2
      |)
      |SELECT CASE WHEN c.h_new IS NULL THEN 'removed'
      |            WHEN o.h_old IS NULL THEN 'added'
      |            WHEN o.h_old <> c.h_new THEN 'changed'
      |            ELSE 'unchanged' END AS diff_class,
      |  COUNT(*) AS n
      |FROM o FULL OUTER JOIN c
      |  ON o.l_orderkey = c.l_orderkey AND o.l_linenumber = c.l_linenumber
      |GROUP BY 1
      |ORDER BY diff_class""".stripMargin
  }

  /** ORC source/sink round-trip (`q_orc_roundtrip`) — format-parity
    * coverage for the second columnar format Spark ships natively: the
    * orders table is landed ONCE per (session, sfDir) as ORC (memoized,
    * the [[graft.core.Listings.normalized]] land-once pattern), then the
    * query runs scan → pushed filter → grouped aggregate over the ORC
    * copy. The DuckDB oracle computes the same aggregate from the
    * original parquet — equal results prove the sink/source pair is
    * lossless for every column type it touches (int64, string, double,
    * timestamp partition pruning aside).
    *
    * Scale posture: identical to the parquet path — ORC scans get the
    * same predicate pushdown and column pruning from the v2 source
    * (IOSpec gates `PushedFilters` on the ORC scan node), and the landed
    * copy is splittable. The sum is the engine's cross-engine-exact
    * decimal fold ([[Parity.dsum]]). */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"orc_orders:$sfDir", "graft_orc_orders")(
      d => Tables.orders(spark, sfDir).write.mode("overwrite").orc(d))
    spark.read.orc(dir)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val orcRoundtripSql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  ${sqlSum("o_totalprice")} AS revenue
      |FROM orders
      |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Snapshot time travel through the DSv2 connector (`q_store_timetravel`):
    * land a two-epoch [[graft.core.EpochManifest]] store over the
    * documents table ONCE per (session, sfDir) — epoch 0 = even doc_ids
    * (manifest generation 1), epoch 1 = odd doc_ids (generation 2) —
    * then answer per-lang counts from BOTH the generation-1 pin
    * (`option("asOfGeneration", g1)`) and the live read in one result.
    * DuckDB rebuilds both columns straight from the raw table (the
    * pinned column is exactly the even-id subset), so a connector that
    * resolved the wrong manifest, leaked a later epoch into the pin, or
    * dropped one from the live read fails the oracle.
    *
    * Scale notes: both reads are connector scans over immutable dirs —
    * the pin costs nothing extra (same storage, older manifest); the
    * [[graft.core.EpochManifest.gc]] two-generation retention bounds how
    * far back a pin can reach, the same contract the spec pins. */
  private def ttStoreSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
  }

  /** The shared two-generation store (landed once per (session, sf)):
    * epoch 0 = even doc_ids (manifest generation 1), epoch 1 = odd
    * doc_ids (generation 2) — `q_store_timetravel` pins generation 1,
    * `q_store_changes` reads the delta since it. */
  private def ttStore(spark: SparkSession, sfDir: String): String =
    graft.core.Landed.dir(spark, s"tt_store:$sfDir", "graft_tt_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull).select(col("doc_id"), col("lang"))
      graft.core.EpochManifest.append(docs.filter(col("doc_id") % 2 === 0), d, 0L)
      graft.core.EpochManifest.append(docs.filter(col("doc_id") % 2 =!= 0), d, 1L)
    }

  def storeTimetravel(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = ttStoreSchema
    val dir = ttStore(spark, sfDir)
    val g1 = graft.core.EpochManifest.generations(spark, dir).head
    val pinned = graft.sources.EpochStore.read(spark, dir, schema,
        asOfGeneration = g1)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_pinned"))
    val live = graft.sources.EpochStore.read(spark, dir, schema)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_live"))
    live.join(pinned, Seq("lang"), "left")
      .select(col("lang"), coalesce(col("n_pinned"), lit(0L)).as("n_pinned"),
        col("n_live"))
      .orderBy("lang")
  }

  val storeTimetravelSql: String =
    """SELECT lang,
      |  COUNT(*) FILTER (WHERE doc_id % 2 = 0) AS n_pinned,
      |  COUNT(*) AS n_live
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** DSv2 sink round-trip (`q_store_write`): the connector's WRITE half
    * ([[graft.sources.EpochStore.write]]) lands two epochs of the
    * documents table as lang-partitioned attempt dirs published by
    * atomic manifest commits — the `EpochManifest.append` protocol with
    * Spark's own parquet encoder doing the bytes — and the answer is a
    * per-lang profile read BACK through the connector (pruned,
    * pinned-snapshot scan). DuckDB recomputes from the raw table, so a
    * sink that dropped rows, mangled a type, double-committed a retried
    * epoch, or wrote a partition dir the read side can't resolve fails
    * the oracle. The store lands once per (session, sf); at 100 TB the
    * write cost is the parquet encode + ONE driver-side rename per
    * epoch, and a reader never sees a half-written epoch. */
  private def langStoreSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("lang", StringType)))
  }

  /** The shared two-epoch lang-partitioned documents store (landed once
    * per (session, sf) through the DSv2 sink) — `q_store_write` proves
    * its write half, `q_store_dpp` joins against it. */
  private[graft] def langStore(spark: SparkSession, sfDir: String): String =
    graft.core.Landed.dir(spark, s"w_store:$sfDir", "graft_w_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"), col("lang"))
      graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 2 === 0), d, 0L, partitionColumn = "lang")
      graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 2 =!= 0), d, 1L, partitionColumn = "lang")
    }

  def storeWrite(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = langStoreSchema
    val dir = langStore(spark, sfDir)
    graft.sources.EpochStore.read(spark, dir, schema, "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  val storeWriteSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Bloom file-skipping through the connector (`q_store_bloomskip`): a
    * five-epoch UNPARTITIONED documents store written with a
    * `bloomColumn = doc_id` sidecar (one bloom per data file, landed by
    * the task and published with the epoch), probed for four doc_ids —
    * the scan consults each candidate file's sidecar at planning and
    * opens only the files whose filter might hold a probed key
    * ([[graft.sources.EpochStoreScan]], no-false-negative skip; the
    * residual filter still runs). DuckDB recomputes the lookup from the
    * raw table, so a sidecar that hashed a different representation
    * than the writer inserted (= a false drop) fails the oracle;
    * PlanAudit gates files-kept < files-listed.
    *
    * Scale shape: the needle-in-100 TB point lookup without partition
    * dirs — IO is a driver-side sidecar probe per candidate file plus
    * the few "maybe present" files, not the table. */
  def storeBloomskip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"bloom_store:$sfDir",
        "graft_bloom_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      (0 until 5).foreach(e => graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 5 === e), d, e.toLong,
        bloomColumn = "doc_id"))
    }
    graft.sources.EpochStore.read(spark, dir, langStoreSchema,
        bloomColumn = "doc_id")
      .filter(col("doc_id").isin(42L, 137L, 256L, 301L))
      .orderBy("doc_id")
  }

  val storeBloomskipSql: String =
    """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, lang
      |FROM documents
      |WHERE doc_id IN (42, 137, 256, 301)
      |ORDER BY doc_id""".stripMargin

  /** Stats-sidecar file skipping (`q_store_statskip`): four RANGE-
    * disjoint epochs (doc_id quartiles) written with `statsColumns =
    * doc_id` — every committed file carries min / max / null counts in
    * its epoch's `_skip/stats.json`, published by the DRIVER at commit
    * from the task messages ([[graft.sources.EpochStoreStats]], the
    * stats-in-the-log design Delta/Iceberg use) — and a fixed id-range
    * probe plans only the files whose recorded range intersects it.
    * DuckDB recomputes the roll-up from the raw table, so a skip that
    * was optimistic (dropped a file holding matching rows) fails the
    * oracle; PlanAudit gates files-kept < files-listed.
    *
    * Scale shape: the range scan over 100 TB of time/id-ordered data —
    * planning IO is one tiny JSON per (dir-pruned) epoch, never a
    * footer, and data IO is only the overlapping files. */
  def storeStatskip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"stat_store:$sfDir",
        "graft_stat_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
      (0 until 4).foreach { e =>
        val lo = maxId * e / 4 + (if (e == 0) 0 else 1)
        val hi = maxId * (e + 1) / 4
        graft.sources.EpochStore.write(
          docs.filter(col("doc_id").between(lo, hi)), d, e.toLong,
          statsColumns = Seq("doc_id"))
      }
    }
    graft.sources.EpochStore.read(spark, dir, langStoreSchema)
      .filter(col("doc_id").between(100L, 220L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  val storeStatskipSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      |FROM documents
      |WHERE doc_id BETWEEN 100 AND 220
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Sorted store + ORDER-BY-LIMIT file bound (`q_store_topn`): the
    * documents land through the sink with `sortColumns = n_chars` — the
    * write itself is RANGE-distributed and sorted
    * ([[graft.sources.EpochStoreWriteBuilder]]'s
    * RequiresDistributionAndOrdering), so the epoch's files cover
    * DISJOINT n_chars ranges — and the query is a plain
    * `ORDER BY n_chars, doc_id LIMIT 20`: Spark pushes the TopN, the
    * scan ranks files by their recorded max, covers 20 non-null rows to
    * fix a value bound, and plans ONLY the files that can beat it
    * ([[graft.sources.EpochStoreScan]]; partial push — Spark still
    * sorts the survivors, so a missing sidecar costs IO, never
    * correctness). DuckDB recomputes the top-20 from the raw table.
    *
    * Scale shape: "smallest/newest k of 100 TB" at metadata cost — the
    * sorted layout turns a full-table TopK into opening one or two
    * files. */
  def storeTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"sorted_store:$sfDir",
        "graft_sorted_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, d, 0L,
        statsColumns = Seq("n_chars"), sortColumns = Seq("n_chars"),
        writePartitions = 8)
    }
    graft.sources.EpochStore.read(spark, dir, langStoreSchema)
      .orderBy(col("n_chars"), col("doc_id"))
      .limit(20)
  }

  val storeTopnSql: String =
    """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, lang
      |FROM documents
      |ORDER BY CAST(n_chars AS BIGINT), doc_id
      |LIMIT 20""".stripMargin

  /** Tombstone deletes through the connector (`q_store_delete`): epoch
    * 0 lands every document, a DELETE tombstone epoch removes every
    * doc_id divisible by 7 ([[graft.sources.EpochStore.delete]] — key
    * rows appended to the `_deletes` sub-store, data history untouched),
    * and a later epoch RE-INSERTS the doc_ids divisible by 14 with
    * n_chars grown by 1000 (a data epoch above the tombstone resurrects
    * the key). The served state is `readLatest(applyDeletes = true)` —
    * latest-wins minus covered tombstones — rolled up per lang; DuckDB
    * recomputes it from the raw table, so a reader that leaked a deleted
    * key, dropped a resurrected one, or served a stale payload fails
    * the oracle.
    *
    * Scale shape: merge-on-read row-level DELETE — a deletion costs one
    * delta-sized tombstone epoch, the read pays one keyed max per side
    * and a keyed join of live keys against tombstoned keys; history is
    * rewritten only by the explicit [[graft.sources.EpochStore
    * .purgeDeletes]] fold (spec-proven answer-preserving). */
  def storeDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"del_store:$sfDir",
        "graft_del_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, d, 0L)
      graft.sources.EpochStore.delete(spark, d,
        docs.filter(col("doc_id") % 7 === 0).select("doc_id"), 1L)
      graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 14 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L),
        d, 2L)
    }
    graft.sources.EpochStore.readLatest(spark, dir, langStoreSchema,
        Seq("doc_id"), applyDeletes = true)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  val storeDeleteSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN doc_id % 14 = 0 THEN CAST(n_chars AS BIGINT) + 1000
      |                ELSE CAST(n_chars AS BIGINT) END) AS BIGINT) AS chars
      |FROM documents
      |WHERE lang IS NOT NULL AND NOT (doc_id % 7 = 0 AND doc_id % 14 <> 0)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Position-delete (deletion-vector) merge-on-read
    * (`q_store_delete_dv`, X94): two predicate DELETEs under
    * `spark.graft.deleteVectors.enabled` land as `_dv` entries holding
    * the matched rows' (file, ordinal) positions — history dirs
    * byte-untouched, O(matched) write cost (the Iceberg
    * position-delete / Delta deletion-vector shape for stores WITHOUT
    * a row identity, where equality tombstones can't apply). The scan
    * applies the dead ordinals through Spark's parquet row-index
    * machinery; DuckDB recomputes the post-delete state relationally,
    * so a mis-applied ordinal, a resurrected row, or a lost delete
    * fails cell-exact (DvDeleteSpec gates untouched-history,
    * composition, compaction fold-in, time travel, and the
    * file-moving-operation refusals).
    *
    * Scale shape: a needle DELETE on a 100 TB store writes positions,
    * not partitions — the copy-on-write rewrite becomes an optional
    * background compaction instead of the write path. */
  def storeDeleteDv(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"dv_wh:$sfDir", "graft_dv_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        root, 0L)
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
        root, 1L)
    }
    val s2 = spark.newSession()
    val c = s"graftdv$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.conf.set(graft.sources.EpochStoreDv.EnabledConf, "true")
    try {
      s2.sql(s"DELETE FROM $c.docs WHERE doc_id >= 40 AND doc_id < 160")
      // the second DV composes with the first at scan time
      s2.sql(s"DELETE FROM $c.docs WHERE lang = 'de' AND doc_id < 300")
    } finally s2.conf.unset(graft.sources.EpochStoreDv.EnabledConf)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeDeleteDvSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id
      |FROM documents
      |WHERE lang IS NOT NULL
      |  AND NOT (doc_id >= 40 AND doc_id < 160)
      |  AND NOT (lang = 'de' AND doc_id < 300)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Schema evolution through the connector (`q_store_evolve`): epoch 0
    * lands the EVEN documents as (doc_id, lang) — no n_chars column
    * existed yet — and epoch 1 lands the ODD documents with the column
    * added; `readEvolved` merges the per-epoch `_schema.json` records by
    * name ([[graft.sources.EpochStore.evolvedSchema]] — first-appearance
    * order, new columns nullable, type changes refuse loudly) and the
    * old epoch serves the missing column as null through Spark's own
    * parquet missing-column path. The per-lang roll-up counts rows,
    * n_chars-bearing rows, and the null-coalesced char mass; DuckDB
    * rebuilds all three from the raw table, so an evolution that
    * mis-filled the missing column, dropped an epoch, or mis-merged the
    * schema fails the oracle.
    *
    * Scale shape: ADD COLUMN on 100 TB is a metadata write — zero data
    * rewritten, old files never touched, readers see the union schema
    * immediately. */
  def storeEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"evo_store:$sfDir",
        "graft_evo_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang"), d, 0L)
      graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "lang", "n_chars"), d, 1L)
    }
    graft.sources.EpochStore.readEvolved(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("n_chars")).as("with_chars"),
        sum(coalesce(col("n_chars"), lit(0L))).as("chars"))
      .orderBy("lang")
  }

  val storeEvolveSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS with_chars,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars AS BIGINT)
      |               ELSE 0 END) AS BIGINT) AS chars
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Stats-preserving compaction (`q_store_compact`): four epochs land
    * INTERLEAVED by doc_id % 4 — every epoch spans the whole id range,
    * so per-file stats can prune nothing — then
    * [[graft.sources.EpochStore.compactStore]] folds them re-sorted on
    * doc_id: the fold records the merged schema, RE-DERIVES per-file
    * min/max/row counts (one read-back pass grouped by file), and its
    * files cover disjoint ranges, so the same range probe that kept
    * everything before the fold now opens one or two files. DuckDB
    * recomputes the roll-up from the raw table, so a fold that dropped
    * rows, duplicated an epoch, or mis-derived a stat (false skip)
    * fails the oracle; PlanAudit gates files-kept < files-listed on
    * the POST-fold store.
    *
    * Scale shape: compaction is where naive stores silently lose their
    * skipping tier — here the metadata survives the fold, so a store
    * stays probe-efficient across its whole maintenance lifecycle. */
  def storeCompact(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"compact_store:$sfDir",
        "graft_compact_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      (0 until 4).foreach(e => graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 4 === e), d, e.toLong,
        statsColumns = Seq("doc_id")))
      graft.sources.EpochStore.compactStore(spark, d,
        sortColumns = Seq("doc_id"), parts = 4)
    }
    graft.sources.EpochStore.read(spark, dir, langStoreSchema)
      .filter(col("doc_id").between(100L, 220L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  val storeCompactSql: String = storeStatskipSql

  /** Z-ordered store + 2-D skipping (`q_store_zorder`): the documents
    * land through [[graft.sources.EpochStore.writeZOrdered]] — clustered
    * along the Morton curve of (doc_id, n_chars) into 8 contiguous
    * segments with min/max stats on BOTH columns — and a 2-D rectangle
    * predicate (id range × char range) skips every file whose recorded
    * rectangle misses it: the multi-dimension pruning a single-column
    * sort cannot give ([[graft.core.Layout]]'s X29 layout, graduated
    * from plain parquet onto the connector's stats-skip path). DuckDB
    * recomputes the roll-up from the raw table, so an optimistic skip
    * fails the oracle; PlanAudit gates files-kept < files-listed.
    *
    * Scale shape: the dashboard slice over 100 TB keyed two ways at
    * once — both dimensions prune at metadata cost, no second copy of
    * the data sorted the other way. */
  def storeZorder(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"zorder_store:$sfDir",
        "graft_zorder_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.writeZOrdered(docs, d, 0L,
        xCol = "doc_id", yCol = "n_chars", bits = 13, parts = 8)
    }
    graft.sources.EpochStore.read(spark, dir, langStoreSchema)
      .filter(col("doc_id").between(100L, 300L) &&
        col("n_chars").between(100L, 250L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  val storeZorderSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      |FROM documents
      |WHERE doc_id BETWEEN 100 AND 300
      |  AND CAST(n_chars AS BIGINT) BETWEEN 100 AND 250
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Pruned-size statistics → auto-broadcast (`q_store_broadcast`): the
    * scan reports byte/row statistics over its PRUNED file set
    * ([[graft.sources.EpochStoreScan.estimateStatistics]], fed by dir
    * pruning + the stats sidecars' row counts), so joining the big
    * probe against ONE partition of the store lets Spark's plain
    * autoBroadcastJoinThreshold fire on the post-pruning reality — no
    * hint, no whole-table size guess. The query itself is a plain
    * doc_id equi-join of all documents against the store's `fr` slice
    * with a three-way checksum; DuckDB recomputes it, so a stats path
    * that mis-listed files (wrong rows under the join) fails the
    * oracle, and PlanAudit gates that the pruned side auto-broadcasts
    * under a threshold the FULL store exceeds. */
  def storeBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = langStore(spark, sfDir)
    val dim = graft.sources.EpochStore.read(spark, dir, langStoreSchema, "lang")
      .filter(col("lang") === "fr")
      .select(col("doc_id"), col("n_chars").as("fr_chars"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .join(dim, "doc_id")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(col("fr_chars")).as("fr_chars"))
  }

  val storeBroadcastSql: String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  CAST(SUM(CAST(v.n_chars AS BIGINT)) AS BIGINT) AS fr_chars
      |FROM documents d
      |JOIN (SELECT doc_id, n_chars FROM documents WHERE lang = 'fr') v
      |  USING (doc_id)""".stripMargin

  /** Derived store through the connector (`q_store_derived`): the
    * 3-epoch documents store tailed by [[graft.streaming.Jobs
    * .derivedStore]] — streaming source → update-mode per-lang aggregate
    * → epochstore sink, one delta epoch of CHANGED keys per trigger —
    * and the answer is [[graft.sources.EpochStore.readLatest]] over the
    * derived store (each lang's newest cumulative row wins). DuckDB
    * recomputes the aggregate from the raw table, so a pipeline that
    * dropped a base epoch, double-counted a replay, or served a stale
    * delta fails the oracle. The full write → tail → derive → serve loop
    * in the public connector surface; per trigger, IO = the new base
    * epoch + a changed-keys delta, never the history (EpochStoreSpec
    * proves both the restart and the delta shape). */
  def storeDerived(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val base = streamStore(spark, sfDir)
    val d = graft.core.Landed.dir(spark, s"derived_store:$sfDir",
        "graft_derived_store") { dd =>
      graft.streaming.Jobs.derivedStore(spark, base, langStoreSchema,
        keyCol = "lang", sumCol = "n_chars",
        outRoot = s"$dd/out", checkpoint = s"$dd/ckpt",
        partitionCol = "lang").awaitTermination()
    }
    val outSchema = StructType(Seq(StructField("lang", StringType),
      StructField("n", LongType), StructField("total", LongType)))
    graft.sources.EpochStore
      .readLatest(spark, s"$d/out", outSchema, Seq("lang"), "lang")
      .orderBy("lang")
  }

  val storeDerivedSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Upsert-by-append through the connector (`q_store_upsert`): epoch 0
    * lands every document, epoch 1 appends CORRECTIONS (every doc_id
    * divisible by 5, with n_chars grown by 1000) — and the latest-wins
    * keyed view ([[graft.sources.EpochStore.readLatest]], ordered by the
    * `_epoch` metadata column) serves each key's newest payload without
    * rewriting history: Delta/Iceberg's merge-on-read shape on the
    * manifest store. The per-lang roll-up over the view is oracled, so a
    * reader that served a stale version, duplicated an updated key, or
    * dropped an untouched one fails DuckDB's recomputation.
    *
    * Scale shape: corrections cost one appended epoch (delta-sized);
    * the read pays one max_by aggregate keyed on doc_id — the shuffle
    * carries each key once per epoch that wrote it, not the history. */
  def storeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"up_store:$sfDir", "graft_up_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"), col("lang"))
      graft.sources.EpochStore.write(docs, d, 0L, partitionColumn = "lang")
      graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L),
        d, 1L, partitionColumn = "lang")
    }
    graft.sources.EpochStore
      .readLatest(spark, dir, langStoreSchema, Seq("doc_id"), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  val storeUpsertSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars
      |    + CASE WHEN doc_id % 5 = 0 THEN 1000 ELSE 0 END AS BIGINT))
      |    AS BIGINT) AS chars
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Storage-partitioned join through the connector (`q_store_spj`):
    * two lang-partitioned stores — the documents store and a per-lang
    * sample-profile store — joined on the partition column and rolled
    * up per lang with ZERO hash exchange: both scans report
    * KeyGroupedPartitioning ([[graft.sources.EpochStoreScan
    * .outputPartitioning]]), so Spark's storage-partitioned join plans
    * one task per lang joining both sides' dirs in place, and the
    * following groupBy(lang) reuses the same key grouping. DuckDB
    * recomputes both sides from the raw table, so a key grouping that
    * mixed two langs' files into one task (wrong join) or dropped one
    * fails the oracle; PlanAudit gates hashExchanges == 0.
    *
    * Scale shape: the co-location win at 100 TB — storage already
    * aligned the two tables on lang; the engine joins them without the
    * terabyte shuffle that would re-align what was never misaligned.
    *
    * `v2.bucketing.enabled` is set on a THROWAWAY child session (shared
    * SparkContext, private SQLConf) and the returned DataFrame executes
    * there — the flag can never leak into the shared session and shadow
    * a later query's plan shape. */
  def storeSpj(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val docsDir = langStore(spark, sfDir)
    val sampDir = graft.core.Landed.dir(spark, s"spj_store:$sfDir",
        "graft_spj_store") { d =>
      graft.sources.EpochStore.write(
        Tables.documents(spark, sfDir)
          .filter(col("lang").isNotNull && col("doc_id") % 7 === 0)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_sample")),
        d, 0L, partitionColumn = "lang")
    }
    val sampSchema = StructType(Seq(
      StructField("n_sample", LongType), StructField("lang", StringType)))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val docs = graft.sources.EpochStore.read(s2, docsDir, langStoreSchema, "lang")
    val samp = graft.sources.EpochStore.read(s2, sampDir, sampSchema, "lang")
    docs.join(samp, Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        max(col("n_sample")).as("sample_n"))
      .orderBy("lang")
  }

  val storeSpjSql: String =
    """SELECT d.lang AS lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MAX(s.n_sample) AS sample_n
      |FROM documents d
      |JOIN (SELECT lang, COUNT(*) AS n_sample FROM documents
      |      WHERE lang IS NOT NULL AND doc_id % 7 = 0
      |      GROUP BY lang) s ON d.lang = s.lang
      |WHERE d.lang IS NOT NULL
      |GROUP BY d.lang
      |ORDER BY d.lang""".stripMargin

  /** Metadata-only aggregation through the connector (`q_store_agg`):
    * per-lang doc counts and doc_id extrema answered WITHOUT reading a
    * data page — the pushed aggregation ([[graft.sources
    * .EpochStoreAggScan]]) folds each parquet file's FOOTER statistics
    * into a partial row and Spark's partial-final rewrite merges them;
    * PlanAudit gates that the plan carries the agg scan (no row scan
    * survives). DuckDB recomputes from the raw table, so a footer fold
    * that miscounted nulls, mixed a min into a max, or dropped a file
    * fails the oracle.
    *
    * Scale shape: the "how big is this table" class of query at 100 TB
    * costs one footer read per file — metadata IO, not table IO. */
  def storeAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = langStore(spark, sfDir)
    graft.sources.EpochStore.read(spark, dir, langStoreSchema, "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  /** Sidecar-answered aggregation (`q_store_agg_meta`): the SAME
    * grouped COUNT / COUNT(col) / MIN / MAX shape as [[storeAgg]], but
    * over a store written with `statsColumns = doc_id` — every file's
    * rows / nulls / min / max are already in its epoch's
    * `_skip/stats.json`, so [[graft.sources.EpochStoreAggScan]] folds
    * the whole answer on the DRIVER from the sidecars: zero file opens,
    * not even a footer (the tier above `q_store_agg`'s footer fold).
    * DuckDB recomputes from the raw table, so a sidecar fold that
    * mis-summed nulls, lost a file, or mangled a type fails the
    * oracle; PlanAudit gates `answeredFromSidecars`.
    *
    * Scale shape: the 100 TB dashboard count costs the manifest + one
    * tiny JSON per epoch — no task even opens a file. */
  def storeAggMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.core.Landed.dir(spark, s"meta_store:$sfDir",
        "graft_meta_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      (0 until 2).foreach(e => graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 2 === e), d, e.toLong,
        partitionColumn = "lang", statsColumns = Seq("doc_id")))
    }
    graft.sources.EpochStore.read(spark, dir, langStoreSchema, "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), count(col("doc_id")).as("n_ids"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  val storeAggMetaSql: String =
    """SELECT lang, COUNT(*) AS n, COUNT(doc_id) AS n_ids,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val storeAggSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Generation changefeed through the connector (`q_store_changes`):
    * per-lang counts of the rows committed AFTER manifest generation 1 —
    * [[graft.sources.EpochStore.changes]] resolves the base generation's
    * high-water epoch at scan planning and reads ONLY the entries whose
    * whole span postdates it (here: epoch 1, the odd doc_ids). DuckDB
    * rebuilds the delta straight from the raw table, so a changefeed
    * that leaked a base row, dropped a delta epoch, or mis-handled the
    * boundary fails the oracle.
    *
    * Scale shape: the incremental-consumer contract at 100 TB — cost is
    * proportional to the DELTA's files (the manifest names them; no
    * diffing scan over the history), and a compaction across the
    * boundary fails loudly instead of corrupting the feed. */
  def storeChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ttStore(spark, sfDir)
    val g1 = graft.core.EpochManifest.generations(spark, dir).head
    graft.sources.EpochStore.changes(spark, dir, ttStoreSchema, g1)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_changed"))
      .orderBy("lang")
  }

  val storeChangesSql: String =
    """SELECT lang, COUNT(*) AS n_changed
      |FROM documents
      |WHERE lang IS NOT NULL AND doc_id % 2 = 1
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Dynamic partition pruning through the connector (`q_store_dpp`):
    * the lang-partitioned store joined to a FILTERED dim (the distinct
    * langs below 'f', a real scan + selective predicate, broadcast) —
    * no lang filter ever touches the store side of the query, yet
    * [[graft.sources.EpochStoreScan.filter]] receives the dim's joined
    * lang set at runtime (Spark's PartitionPruning rule + the scan's
    * SupportsRuntimeFiltering) and the store lists/reads ONLY those
    * langs' dirs. DuckDB recomputes the equivalent semi-join as a plain
    * filter, so a scan that pruned a surviving lang or double-read a dir
    * fails the oracle; PlanAudit executes the join and gates
    * `runtimeFiltered && selected < total`.
    *
    * Scale shape: this is the dashboard/star-join pattern at 100 TB —
    * the fact store never scans outside the dim's partitions, and the
    * pruning costs one reused broadcast, not a second pass. */
  def storeDpp(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = langStore(spark, sfDir)
    val dims = Tables.documents(spark, sfDir)
      .filter(col("lang").isNotNull && col("lang") < lit("f"))
      .select(col("lang")).distinct()
    graft.sources.EpochStore.read(spark, dir, langStoreSchema, "lang")
      .join(broadcast(dims), Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  val storeDppSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      |FROM documents
      |WHERE lang IS NOT NULL AND lang < 'f'
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  private val streamRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Streaming SOURCE through the connector (`q_store_stream`): the
    * documents table lands as a THREE-epoch lang-partitioned store (the
    * DSv2 sink), then `readStream.format("epochstore")` tails it with
    * `maxEpochsPerTrigger = 1` — the manifest epochs arrive as three
    * separate micro-batches through
    * [[graft.sources.EpochStoreMicroBatchStream]] — into a streaming
    * per-lang aggregate drained by Trigger.AvailableNow. The answer is
    * the aggregate AFTER the stream terminates, so a source that dropped
    * an epoch, re-delivered one across triggers, split a batch's rows,
    * or mis-typed the dir-derived partition column fails the DuckDB
    * oracle (which recomputes from the raw table).
    *
    * Scale notes: `latestOffset` is one driver-side manifest read per
    * trigger; each batch lists and scans ONLY its epoch's dirs, so a
    * tail over a 100 TB store does per-trigger work proportional to the
    * new epoch, never the history. The paced catch-up (one epoch per
    * trigger) is the restart posture: a reader resuming behind a large
    * backlog processes it as bounded batches. */
  /** The shared THREE-epoch lang-partitioned documents store (landed
    * once per (session, sf)): epochs split by doc_id % 3 —
    * `q_store_stream` tails it, `q_store_derived` derives from it. */
  private def streamStore(spark: SparkSession, sfDir: String): String =
    graft.core.Landed.dir(spark, s"s_store:$sfDir", "graft_s_store") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"), col("lang"))
      (0 until 3).foreach(e => graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % 3 === e), d, e.toLong,
        partitionColumn = "lang"))
    }

  def storeStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = langStoreSchema
    val dir = streamStore(spark, sfDir)
    // dedicated session: a watermark-less complete-mode aggregate gains
    // nothing from the trailing NO-DATA micro-batch (it exists to
    // advance watermarks / fire timeouts) — skipping it drops one full
    // trigger's plan+state+commit cost at any scale. Session-scoped so
    // watermarked catalog streams keep their flushing batch.
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // State-store sizing tracks KEY cardinality, not input size: this
    // complete-mode aggregate holds ≤ |langs| (~26) keys forever, yet
    // inherits shuffle.partitions = core count, so every trigger plans,
    // snapshots and commits one state store per partition — at 32 cores
    // that is 32 stores ~24 of which are permanently empty, per trigger,
    // per epoch. 8 partitions is keyed to the aggregate's cardinality
    // (NOT the local core count — the same dial is right on any cluster
    // size); scan-side parallelism is untouched (source splits set it).
    s3.conf.set("spark.sql.shuffle.partitions", "8")
    val agg = graft.sources.EpochStore.readStream(s3, dir, schema,
        partitionColumn = "lang", maxEpochsPerTrigger = 1L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    val qn = s"graft_store_stream_${streamRuns.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // copy out of the memory sink (session-scoped — read it on the
    // stream's own session) so the returned frame survives later runs
    val rows = s3.table(qn).collect().toSeq
    s3.catalog.dropTempView(qn)
    val outSchema = StructType(Seq(StructField("lang", StringType),
      StructField("n", LongType), StructField("chars", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), outSchema)
      .orderBy("lang")
  }

  val storeStreamSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Catalog-plugin SQL (`q_store_sql`): the warehouse of manifest
    * stores addressed as PLAIN SQL — `spark.sql.catalog.graftcat` points
    * [[graft.sources.EpochStoreCatalog]] at a landed warehouse holding a
    * lang-partitioned documents store (written through the DSv2 sink),
    * and the query is nothing but `SELECT ... FROM graftcat.docs` —
    * schema and partition column DISCOVERED from the store layout,
    * manifest pinning/pruning/pushdown all riding under SQL resolution.
    * DuckDB recomputes from the raw table, so a catalog that resolved
    * the wrong store, mis-typed a discovered column, or dropped an epoch
    * fails the oracle. */
  def storeSql(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = graft.core.Landed.dir(spark, s"cat_wh:$sfDir", "graft_cat_wh") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"), col("lang"))
      graft.sources.EpochStore.write(docs, s"$d/docs", 0L, partitionColumn = "lang")
    }
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
    spark.sql(
      """SELECT lang, COUNT(*) AS n,
        |  SUM(n_chars) AS chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM graftcat.docs
        |GROUP BY lang
        |ORDER BY lang""".stripMargin)
  }

  val storeSqlSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  private val dmlRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One FRESH lang-partitioned documents store per call (DML mutates
    * it, so bench re-runs must not see a prior run's edits), addressed
    * through a THROWAWAY child session (shared SparkContext, private
    * SQLConf) so the per-run catalog registration dies with the session
    * instead of accumulating on — and shadowing plan shapes in — the
    * shared one. Returns (child session, table ref); run the statements
    * on that session. */
  /** Build-once + clone-per-run for MUTATING store fixtures: the master
    * warehouse lands once per (session, sf, key) via [[graft.core.Landed]]
    * and every invocation receives a fresh FILESYSTEM CLONE to mutate —
    * manifest entries, DV journal targets, and sidecars are all
    * path-relative, so a copied tree is a valid store (StoreCloneSpec
    * pins clone == rebuild through a full DML lifecycle). The measured
    * operator — DML, MERGE, maintenance CALLs, changefeeds — still runs
    * in full per invocation; only the fixture's construction (Spark
    * write jobs over the input parquet) is amortized, the same
    * discipline as the read-only fixtures' land-once. A ~1 MB local
    * copy costs milliseconds vs ~0.3-0.5 s of fixture write jobs. */
  private[graft] def clonedWh(spark: SparkSession, key: String, prefix: String)(
      build: String => Unit): String = {
    val master = graft.core.Landed.dir(spark, key, prefix)(build)
    val src = java.nio.file.Paths.get(master)
    val dst = java.nio.file.Files.createTempDirectory(prefix + "_run")
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(dst.toFile): Unit))
    dst.toString
  }

  private def freshDmlStore(spark: SparkSession, sfDir: String,
                            epochs: Int, rowId: Seq[String] = Nil)
      : (SparkSession, String) = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"dml_wh:$sfDir:$epochs:${rowId.mkString(",")}",
        "graft_dml_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      (0 until epochs).foreach(e => graft.sources.EpochStore.write(
        docs.filter(col("doc_id") % epochs === e), root, e.toLong,
        partitionColumn = "lang", statsColumns = Seq("doc_id")))
      if (rowId.nonEmpty)
        graft.sources.EpochStoreDelta.declare(spark, root, rowId)
    }
    val s2 = spark.newSession()
    val c = s"graftdml$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    (s2, s"$c.docs")
  }

  /** SQL DML through the store catalog (`q_store_dml`): DELETE (the
    * partition-dir condition classifies every dir from metadata; mixed
    * entries rewrite copy-on-write, each as ONE atomic manifest
    * commit), UPDATE (an untranslatable predicate → the group-based
    * row-level rewrite, `plans`' whole-kept-set copy-on-write), then
    * INSERT (auto-allocated next epoch) — and the final aggregate must
    * equal DuckDB replaying the same three statements as relational
    * algebra over the raw table. A delete that leaked a row, an update
    * that dropped a carried-over row, or an insert that landed outside
    * the partition layout all fail the oracle.
    *
    * Scale shape: the delete rewrites only entries whose dirs mix
    * matching and non-matching rows (epoch/partition-aligned deletes
    * are pure manifest edits); the update's copy-on-write is bounded by
    * the kept-entry set; every statement is one manifest commit, and
    * the pre-DML snapshot stays time-travelable. */
  def storeDml(spark: SparkSession, sfDir: String): DataFrame = {
    val (s2, t) = freshDmlStore(spark, sfDir, epochs = 2)
    s2.sql(s"DELETE FROM $t WHERE lang = 'en'")
    s2.sql(s"UPDATE $t SET n_chars = -1 WHERE doc_id % 100 = 0")
    s2.sql(s"INSERT INTO $t VALUES (9000001, 11, 'zz'), (9000002, 22, 'zz')")
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars
         |FROM $t GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeDmlSql: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, lang
      |  FROM documents WHERE lang IS NOT NULL
      |), afterdel AS (
      |  SELECT * FROM base WHERE lang <> 'en'
      |), upd AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 100 = 0 THEN -1 ELSE n_chars END AS n_chars,
      |    lang
      |  FROM afterdel
      |), fin AS (
      |  SELECT * FROM upd
      |  UNION ALL SELECT 9000001, 11, 'zz'
      |  UNION ALL SELECT 9000002, 22, 'zz'
      |)
      |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM fin GROUP BY lang ORDER BY lang""".stripMargin

  /** Composite-key (multi-column) partitioning (`q_store_multipart`):
    * documents land in a `bucket=…/lang=…` two-level dir layout (one
    * sink write, `partitionColumn = "bucket,lang"`), and the query
    * probes a PREFIX predicate (bucket), a SUFFIX predicate (lang) and
    * a mixed one — every probe is answered by dir pruning alone
    * (PlanAudit-gated in EpochStoreSpec: a bucket predicate never even
    * LISTS the pruned buckets' lang dirs), with the final aggregate
    * grouping by both key columns. DuckDB recomputes from the raw
    * table, so a mis-nested dir, a value that round-tripped wrong
    * through the `col=value` escaping, or a wrongly-pruned subtree
    * fails cell-exact.
    *
    * Scale shape: at 100 TB a (date, lang) layout is the normal
    * training-corpus shape — prefix pruning bounds the listing cost by
    * the surviving subtree, and the composite key reports
    * KeyGroupedPartitioning so same-layout joins/aggs run
    * exchange-free. */
  def storeMultipart(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = graft.core.Landed.dir(spark, s"mp_wh:$sfDir", "graft_mp_wh") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          (col("doc_id") % 4).cast("int").as("bucket"), col("lang"))
      graft.sources.EpochStore.write(docs, s"$d/docs", 0L,
        partitionColumn = "bucket,lang")
    }
    val t = graft.sources.EpochStore.read(spark, s"$wh/docs",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))),
      "bucket,lang")
    t.filter(col("bucket").isin(1, 2) && col("lang") =!= "de")
      .groupBy("bucket", "lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"),
        min("doc_id").as("min_id"))
      .orderBy("bucket", "lang")
  }

  val storeMultipartSql: String =
    """SELECT CAST(doc_id % 4 AS INT) AS bucket, lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id
      |FROM documents
      |WHERE lang IS NOT NULL AND doc_id % 4 IN (1, 2) AND lang <> 'de'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Composite identity+bucket layout (`q_store_compbucket`): the
    * canonical 100 TB fact layout `lang=v/doc_id_bucket=K` — identity
    * partitioning on the outer level, hash buckets innermost, BOTH
    * levels pruned independently at scan time (the lang equality is an
    * exact partition filter; the doc_id IN probe hashes to its buckets
    * and opens only those dirs under the surviving lang). The oracle
    * recomputes the probe relationally, so a bucket router that
    * misplaced a row at write OR a walk that pruned a live dir fails
    * cell-exact. SPJ/DPP on the bucketed level and the exact pruned-dir
    * audit are EpochStoreSpec gates. */
  def storeCompBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = graft.core.Landed.dir(spark, s"cb_wh:$sfDir", "graft_cb_wh") { d =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.writeBucketed(docs, s"$d/docs", 0L,
        bucketColumn = "doc_id", bucketCount = 8, partitionColumn = "lang")
    }
    val t = graft.sources.EpochStore.readBucketed(spark, s"$wh/docs",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))),
      "doc_id", 8, partitionColumn = "lang")
    t.filter(col("lang") === "en" &&
        col("doc_id").isin(6L, 50L, 100L, 150L, 200L, 250L, 300L,
          350L, 400L, 450L, 498L))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang")
  }

  val storeCompBucketSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE lang = 'en' AND doc_id IN
      |  (6, 50, 100, 150, 200, 250, 300, 350, 400, 450, 498)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** CTAS / RTAS through the staging catalog (`q_store_ctas`):
    * `CREATE TABLE … PARTITIONED BY (lang) AS SELECT` over a store
    * table stages the SELECT's rows into a claimed-but-unreferenced
    * dir and publishes the manifest only as the staged commit's LAST
    * step ([[graft.sources.StagedEpochStoreTable]]) — then
    * `REPLACE TABLE … AS SELECT` swaps the whole table in one
    * generation (the pre-replace snapshot stays time-travelable). The
    * final aggregate reads the REPLACED table back, so a CTAS that
    * dropped rows, leaked the staged write early, or a replace that
    * half-applied fails the oracle; the nothing-published-on-failure
    * and race-refusal sides are EpochStoreSpec proofs.
    *
    * Scale shape: the staged write is the connector's normal task
    * writer (partition dirs + stats sidecars); commit cost is one
    * manifest CAS regardless of file count. */
  def storeCtas(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"ctas_wh:$sfDir", "graft_ctas_wh") { wh =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, s"$wh/docs", 0L,
        partitionColumn = "lang")
    }
    val s2 = spark.newSession()
    val c = s"graftctas$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(
      s"""CREATE TABLE $c.big PARTITIONED BY (lang) AS
         |SELECT doc_id, n_chars, lang FROM $c.docs
         |WHERE n_chars > 100""".stripMargin)
    s2.sql(
      s"""REPLACE TABLE $c.big PARTITIONED BY (lang) AS
         |SELECT doc_id, n_chars, lang FROM $c.docs
         |WHERE n_chars > 300 AND doc_id % 3 = 0""".stripMargin)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id
         |FROM $c.big GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeCtasSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id
      |FROM documents
      |WHERE lang IS NOT NULL AND CAST(n_chars AS BIGINT) > 300
      |  AND doc_id % 3 = 0
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Hash-bucket layout + storage-partitioned join (`q_store_bucket`):
    * documents and embeddings-metadata land as two stores BUCKETED
    * alike (`bucket(8, doc_id)` / `bucket(8, vec_id)` — `<col>_bucket=K`
    * dirs, murmur3 pmod, the column kept in the files), read through
    * the SQL catalog whose FunctionCatalog face resolves the bucket
    * transform — so the equi-join runs STORAGE-PARTITIONED: zero
    * shuffle on either side (EpochStoreSpec gates the no-exchange
    * plan), plus a point probe that opens exactly one bucket dir.
    * DuckDB recomputes the joined aggregate from the raw tables, so a
    * row hashed into the wrong bucket, a bucket dir dropped by the
    * probe, or a join that lost a bucket's rows fails cell-exact.
    *
    * Scale shape: THE high-cardinality co-location layout — point
    * lookups open |probes| buckets instead of the table, and two 100 TB
    * stores bucketed alike join with no terabyte shuffle, the same win
    * Spark bucketed tables/Iceberg bucket transforms buy. */
  def storeBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    // read-only over the fixture — land the two bucketed stores once
    // per (session, sf) so the bench measures the storage-partitioned
    // join, not the bucketed writes (q_store_timepart discipline)
    val wh = graft.core.Landed.dir(spark, s"bk_wh:$sfDir", "graft_bk_wh") { wh =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.writeBucketed(docs, s"$wh/docs", 0L,
        bucketColumn = "doc_id", bucketCount = 8)
      val scores = Tables.documents(spark, sfDir)
        .select(col("doc_id").as("vec_id"),
          (col("doc_id") % 97).cast("long").as("score"))
      graft.sources.EpochStore.writeBucketed(scores, s"$wh/scores", 0L,
        bucketColumn = "vec_id", bucketCount = 8)
    }
    val s2 = spark.newSession()
    val c = s"graftbk$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.sql(
      s"""SELECT d.lang, COUNT(*) AS n, SUM(d.n_chars) AS chars,
         |  SUM(s.score) AS score_sum
         |FROM $c.docs d JOIN $c.scores s ON d.doc_id = s.vec_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin)
  }

  val storeBucketSql: String =
    """SELECT d.lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  CAST(SUM(s.doc_id % 97) AS BIGINT) AS score_sum
      |FROM documents d JOIN documents s ON d.doc_id = s.doc_id
      |WHERE d.lang IS NOT NULL
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** Sorted-bucketed storage-partitioned join (`q_store_sorted`, X83):
    * two stores land bucketed ALIKE on the join key AND sorted by it
    * (`sortColumns` + `statsColumns` — each file internally ordered,
    * range-distributed tasks making per-bucket files range-disjoint,
    * the layout recorded in the entry's `_schema.json`), each across
    * TWO disjoint-range epochs. The scan proves every planned partition
    * sorted from the recorded per-file bounds and reports the order
    * ([[graft.sources.EpochStoreScan.outputOrdering]] —
    * `SupportsReportOrdering`), so with broadcast off the equi-join
    * runs as a sort-merge join with ZERO exchange (storage-partitioned)
    * and ZERO sort (OrderingSpec gates the plan). DuckDB recomputes the
    * joined aggregate from the raw tables — a file packed out of order,
    * a boundary row misplaced across the epoch chain, or an elided sort
    * that was actually load-bearing fails cell-exact.
    *
    * Scale shape: the sorted-bucketed-table contract — two 100 TB
    * stores laid out alike join as a per-bucket streaming MERGE: no
    * shuffle, no sort, O(bucket) memory, the plan Hive SMB / Iceberg
    * sorted tables exist to reach. */
  def storeSorted(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    // the query only READS (the zero-exchange/zero-sort SMJ is the
    // measured capability) — land the 4-write sorted-bucketed fixture
    // once per (session, sf), the q_store_timepart discipline, so the
    // bench measures the storage-partitioned join, not temp-store
    // construction
    val wh = graft.core.Landed.dir(spark, s"srt_wh:$sfDir", "graft_srt_wh") { wh =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      val median = 10000000L // doc_id space splits around the synth midpoint
      def land(df: DataFrame, root: String, keyCol: String): Unit = {
        graft.sources.EpochStore.writeBucketed(df.filter(col(keyCol) < median),
          root, 0L, bucketColumn = keyCol, bucketCount = 8,
          statsColumns = Seq(keyCol), sortColumns = Seq(keyCol))
        graft.sources.EpochStore.writeBucketed(df.filter(col(keyCol) >= median),
          root, 1L, bucketColumn = keyCol, bucketCount = 8,
          statsColumns = Seq(keyCol), sortColumns = Seq(keyCol))
      }
      land(docs, s"$wh/docs", "doc_id")
      land(Tables.documents(spark, sfDir)
        .select(col("doc_id").as("vec_id"),
          (col("doc_id") % 89).cast("long").as("score")),
        s"$wh/scores", "vec_id")
    }
    val s2 = spark.newSession()
    val c = s"graftsrt$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.sql(
      s"""SELECT d.lang, COUNT(*) AS n, SUM(d.n_chars) AS chars,
         |  SUM(s.score) AS score_sum
         |FROM $c.docs d JOIN $c.scores s ON d.doc_id = s.vec_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin)
  }

  val storeSortedSql: String =
    """SELECT d.lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  CAST(SUM(s.doc_id % 89) AS BIGINT) AS score_sum
      |FROM documents d JOIN documents s ON d.doc_id = s.doc_id
      |WHERE d.lang IS NOT NULL
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** Metadata tables (`q_store_meta`, X84): the corpus lands as a
    * lang-partitioned store across two epochs, then the query reads the
    * `$partitions` METADATA table — per-partition row counts computed
    * on the driver from the manifest + stats sidecars, planned as a
    * LocalTableScan (no tasks, no data I/O). DuckDB recounts the raw
    * table, so a stats sidecar that lost rows, a partition tuple the
    * grouping dropped, or a double-counted multi-epoch dir fails
    * cell-exact.
    *
    * Scale shape: inspecting a 100 TB store costs a few KiB of sidecar
    * reads — `SHOW PARTITIONS`-with-measurements never touches data
    * (MetaTablesSpec gates the LocalTableScan plan). */
  def storeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    // read-only ($partitions metadata table) — land the two-epoch store
    // once per (session, sf); the bench then measures the metadata-table
    // planning, not the fixture writes
    val wh = graft.core.Landed.dir(spark, s"meta_wh:$sfDir", "graft_meta_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        root, 0L, partitionColumn = "lang")
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
        root, 1L, partitionColumn = "lang")
    }
    val s2 = spark.newSession()
    val c = s"graftmeta$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(
      s"""SELECT lang, rows AS n FROM $c.`docs$$partitions`
         |ORDER BY lang""".stripMargin)
  }

  val storeMetaSql: String =
    """SELECT lang, COUNT(*) AS n FROM documents
      |WHERE lang IS NOT NULL GROUP BY lang ORDER BY lang""".stripMargin

  /** RENAME/DROP column evolution (`q_store_rename`, X85): half the
    * corpus lands with columns (doc_id, nc, lang, junk), then
    * `ALTER TABLE … RENAME COLUMN nc TO chars` and `DROP COLUMN junk`
    * land as column-ops commits (no data touched), and the OTHER half
    * inserts under the new name. The aggregate reads both halves
    * through one logical schema — the pre-rename entries serve `chars`
    * through their per-profile reader factory (physical name `nc`,
    * translated requested schema + translated parquet push), the
    * post-rename ones natively — with a residual filter on the renamed
    * column. DuckDB recomputes from the raw table, so a profile that
    * read nulls, a filter that bound the wrong spelling, or a dropped
    * column that leaked fails cell-exact.
    *
    * Scale shape: rename/drop are ONE tiny metadata commit on a 100 TB
    * store — zero rewrite, vectorized reads preserved on both sides of
    * the rename (RenameDropSpec proves serving, guards, and that
    * compaction folds the old spellings away). */
  def storeRename(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val docs = Tables.documents(spark, sfDir)
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("n_chars").cast("long").as("nc"),
        col("lang"), lit("noise").as("junk"))
    // master = the pre-rename epoch only; the ALTERs and the post-rename
    // write ARE the measured lifecycle and run per invocation
    val wh = clonedWh(spark, s"ren_wh:$sfDir", "graft_ren_wh") { wh =>
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        s"$wh/docs", 0L)
    }
    val root = s"$wh/docs"
    val s2 = spark.newSession()
    val c = s"graftren$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"ALTER TABLE $c.docs RENAME COLUMN nc TO chars")
    s2.sql(s"ALTER TABLE $c.docs DROP COLUMN junk")
    graft.sources.EpochStore.write(
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("nc").as("chars"), col("lang")),
      root, 1L)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(chars) AS chars
         |FROM $c.docs WHERE chars > 300
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeRenameSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      |FROM documents
      |WHERE lang IS NOT NULL AND CAST(n_chars AS BIGINT) > 300
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Column DEFAULT values (`q_store_default`, X86): half the corpus
    * lands WITHOUT the `boost` column, `ALTER TABLE ADD COLUMNS (boost
    * BIGINT DEFAULT 5)` records the default as one metadata commit, and
    * the other half inserts explicit values. The aggregate mixes both:
    * pre-ADD files serve the EXISTENCE default straight from the
    * parquet readers (never null, zero rewrite), post-ADD rows their
    * written values. DuckDB recomputes with an explicit CASE on the
    * halves, so a default served as null, applied to the wrong rows,
    * or leaking over explicit values fails cell-exact.
    *
    * Scale shape: Iceberg/Delta's initial-default — backfilling a new
    * column on a 100 TB store is one sidecar commit, not a rewrite. */
  def storeDefault(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val docs = Tables.documents(spark, sfDir)
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"))
    // master = the pre-ADD epoch only; the ALTER + post-default write
    // ARE the measured lifecycle and run per invocation
    val wh = clonedWh(spark, s"def_wh:$sfDir", "graft_def_wh") { wh =>
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        s"$wh/docs", 0L)
    }
    val root = s"$wh/docs"
    val s2 = spark.newSession()
    val c = s"graftdef$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"ALTER TABLE $c.docs ADD COLUMNS (boost BIGINT DEFAULT 5)")
    // epoch 2: the ALTER committed its schema-record epoch at 1 (an
    // explicit epoch-1 write would REPLACE it — epoch replacement is
    // the retry-idempotence contract)
    graft.sources.EpochStore.write(
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("boost", (col("doc_id") % 7).cast("long")),
      root, 2L)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(boost) AS boost_sum
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeDefaultSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE doc_id % 7 END)
      |    AS BIGINT) AS boost_sum
      |FROM documents WHERE lang IS NOT NULL
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Layout migration (`q_store_migrate`, X89): the corpus lands
    * lang-PARTITIONED across two epochs, then `CALL migrate_layout`
    * rewrites the whole store into a sorted `bucket(8, doc_id)` layout
    * as ONE OCC fold — partition-spec evolution the honest-rewrite way
    * (mixed layouts cannot share a snapshot when partition values are
    * served as dir constants; the old layout stays time-travelable one
    * gc cycle). The aggregate reads the migrated store — lang now a
    * FILE column, doc_id bucket dirs serving probes/SPJ — and DuckDB
    * recomputes from the raw table, so a row lost or duplicated by the
    * rewrite, or a lang value mangled crossing from dir-constant to
    * file column, fails cell-exact. MigrateLayoutSpec gates the
    * 1-of-8 probe, the order report, stats survival, the time-traveled
    * old layout, and the live-tombstone refusal. */
  def storeMigrate(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"mig_wh:$sfDir", "graft_mig_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        root, 0L, partitionColumn = "lang")
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
        root, 1L, partitionColumn = "lang")
    }
    val s2 = spark.newSession()
    val c = s"graftmig$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"CALL $c.system.migrate_layout('docs', " +
      "bucket_column => 'doc_id', bucket_count => 8, " +
      "sort_columns => 'doc_id')").collect()
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeMigrateSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id
      |FROM documents WHERE lang IS NOT NULL
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Partition-spec evolution WITHOUT rewrite (`q_store_spec_evolve`,
    * X92): the even half of the corpus lands lang-PARTITIONED, `CALL
    * evolve_layout` publishes `bucket(8, doc_id)` as METADATA ONLY (one
    * tiny versioned log file — no data moves, the Iceberg mixed-spec
    * shape), and the odd half INSERTs through the catalog under the new
    * spec. The final aggregate reads the MIXED snapshot: old entries
    * serve `lang` from their dirs and prune by lang; the new entry
    * serves it from its files and prunes by doc_id buckets — each entry
    * under its OWN recorded spec (SpecEvolveSpec gates the per-entry
    * pruned-dir audits, the SPJ/order withholding, the streaming
    * refusal, and migrate_layout as the physical normalizer). DuckDB
    * recomputes from the raw table, so a row lost or duplicated across
    * the spec boundary, or a lang value mangled crossing dir-constant
    * to file column, fails cell-exact.
    *
    * Scale shape: re-partitioning a 100 TB store costs ONE metadata
    * write up front; the rewrite (migrate_layout) becomes an optional,
    * incremental background move instead of a blocking prerequisite. */
  def storeSpecEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    // master = the pre-evolution epoch only; evolve_layout + the
    // new-spec insert ARE the measured lifecycle
    val wh = clonedWh(spark, s"sev_wh:$sfDir", "graft_sev_wh") { wh =>
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        s"$wh/docs", 0L, partitionColumn = "lang")
    }
    val s2 = spark.newSession()
    val c = s"graftsev$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"CALL $c.system.evolve_layout('docs', " +
      "bucket_column => 'doc_id', bucket_count => 8)").collect()
    Tables.documents(s2, sfDir)
      .filter(col("lang").isNotNull && col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
      .createOrReplaceTempView(s"sev_new_$run")
    s2.sql(s"INSERT INTO $c.docs " +
      s"SELECT doc_id, n_chars, lang FROM sev_new_$run")
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** Spec evolution TO a time transform (`q_store_evolve_tp`, X92 ∘
    * X93): half the events land identity-partitioned by event_type;
    * `CALL evolve_layout(transform => 'days(ts)')` then declares a
    * day-unit layout as METADATA ONLY, and the other half lands under
    * `ts_day=` dirs. The probed aggregate carries a ts day-range: the
    * evolved entry prunes to its matching unit dirs while the identity
    * entry degrades to the unpruned-but-exact per-entry walk — DuckDB
    * recomputes from the raw parquet, so a boundary mis-prune on the
    * mixed snapshot fails cell-exact. */
  def storeEvolveTp(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    // master = the pre-evolution epoch only; evolve_layout + the
    // time-unit-spec insert ARE the measured lifecycle
    val wh = clonedWh(spark, s"sevtp_wh:$sfDir", "graft_sevtp_wh") { wh =>
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"))
      graft.sources.EpochStore.write(ev.filter(col("event_id") % 2 === 0),
        s"$wh/ev", 0L, partitionColumn = "event_type")
    }
    val s2 = spark.newSession()
    val c = s"graftsevtp$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"CALL $c.system.evolve_layout('ev', " +
      "transform => 'days(ts)')").collect()
    Tables.events(s2, sfDir)
      .filter(col("event_id") % 2 =!= 0)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"))
      .createOrReplaceTempView(s"sevtp_new_$run")
    s2.sql(s"INSERT INTO $c.ev " +
      s"SELECT event_id, ts, user_id, event_type FROM sevtp_new_$run")
    s2.sql(
      s"""SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
         |  MAX(event_id) AS max_id
         |FROM $c.ev
         |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val storeEvolveTpSql: String =
    """SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
      |  MAX(event_id) AS max_id
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-unit partition transforms (`q_store_timepart`, X93): the
    * events table lands under `PARTITIONED BY (days(ts),
    * bucket(8, user_id))` — the reference's own date-dir layout
    * (CrawlData.py:111-113) generalized to raw timestamps, composed
    * with the hash-bucket level. The probe is a seven-day ts RANGE:
    * dir pruning converts it to a unit-range dir set at planning time
    * (7 of 30 day dirs listed, before any footer is touched —
    * TimePartSpec gates the pruned-dir audits, boundary inclusivity,
    * the null dir, hours/months/years/truncate kinds, and the
    * unit-granular dynamic overwrite). DuckDB recomputes from the raw
    * parquet, so an over-pruned boundary day or a row mis-landed
    * across a unit boundary fails cell-exact.
    *
    * Scale shape: a 100 TB event store probed for one week lists one
    * week's dirs — O(days-touched × buckets) planning, not O(files). */
  /** The (session, sf)-memoized day×bucket events store: the probe is
    * READ-ONLY, so landing once (the `streamStore` discipline) makes
    * the bench entry measure the engine's unit-dir pruning, not
    * `Files.createTempDirectory` + a fresh 30-day ingest per run. */
  private def timepartWh(spark: SparkSession, sfDir: String): String =
    graft.core.Landed.dir(spark, s"tpt_store:$sfDir", "graft_tpt_wh") { wh =>
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"))
        // no re-clustering shuffle: event ingest is time-ordered, so
        // each input split already covers a narrow day range and the
        // write lands few (day, bucket) dirs per task naturally (a
        // measured repartition(date, bucket) cost MORE than the files
        // it saved); adversarially-ordered input would use the
        // clustered-write path
        .write.format("epochstore").mode("append")
        .option("path", s"$wh/ev").option("epoch", "0")
        .option("transform", "days(ts)")
        .option("bucketColumn", "user_id").option("bucketCount", "8")
        .save()
    }

  def storeTimepart(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = timepartWh(spark, sfDir)
    val s2 = spark.newSession()
    val c = s"grafttpt$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(
      s"""SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
         |  MAX(event_id) AS max_id, COUNT(DISTINCT user_id) AS users
         |FROM $c.ev
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val storeTimepartSql: String =
    """SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
      |  MAX(event_id) AS max_id, COUNT(DISTINCT user_id) AS users
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Snapshot rollback (`q_store_restore`, X90): the corpus lands
    * across two epochs and is TAGGED, a destructive DELETE then drops a
    * third of the rows, and `CALL restore_snapshot(tag)` makes the
    * tagged generation the head again — ONE manifest commit, no data
    * movement, the bad commit still time-travelable until gc. The
    * aggregate reads the restored table; DuckDB recomputes from the
    * raw corpus, so a restore that resurrected the wrong snapshot,
    * lost an epoch, or kept the delete fails cell-exact.
    *
    * Scale shape: Delta RESTORE / Iceberg rollback — undoing a bad
    * commit on a 100 TB store costs one tiny manifest write. */
  def storeRestore(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"res_wh:$sfDir", "graft_res_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        root, 0L)
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
        root, 1L)
    }
    val s2 = spark.newSession()
    val c = s"graftres$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"CALL $c.system.tag('docs', 'clean')").collect()
    s2.sql(s"DELETE FROM $c.docs WHERE doc_id % 3 = 0")
    s2.sql(s"CALL $c.system.restore_snapshot('docs', tag => 'clean')")
      .collect()
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeRestoreSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      |FROM documents WHERE lang IS NOT NULL
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Write-audit-publish branches (`q_store_wap`): half the corpus
    * lands as the base store, the other half is written onto a BRANCH
    * (`CALL create_branch` + the sink's `branch` option — a separate
    * manifest lineage main readers never see), then
    * `CALL publish_branch` fast-forwards main to the audited head in
    * ONE atomic commit. The final aggregate reads the published table,
    * so a branch write that leaked early, a publish that lost either
    * half, or a fast-forward that double-applied fails the DuckDB
    * cell-compare; isolation, CHECK-gated audits, stale-base refusal,
    * and gc protection are EpochStoreSpec proofs.
    *
    * Scale shape: branching copies ONE manifest file (no data); the
    * audit reads the branch head through the same pruned scan; publish
    * is one manifest CAS regardless of branch size. */
  def storeWap(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val docs = Tables.documents(spark, sfDir)
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    // master = the base epoch only; branch/branch-write/publish ARE the
    // measured lifecycle and run per invocation
    val wh = clonedWh(spark, s"wap_wh:$sfDir", "graft_wap_wh") { wh =>
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        s"$wh/docs", 0L, partitionColumn = "lang")
    }
    val root = s"$wh/docs"
    val s2 = spark.newSession()
    val c = s"graftwap$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"CALL $c.system.create_branch('docs', 'ingest')").collect()
    graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
      root, 1L, partitionColumn = "lang", branch = "ingest")
    s2.sql(s"CALL $c.system.publish_branch('docs', 'ingest')").collect()
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeWapSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id
      |FROM documents WHERE lang IS NOT NULL
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** `FOR TIMESTAMP AS OF` time travel (`q_store_ts_asof`): a
    * two-epoch store queried at the FIRST commit's own instant —
    * resolution is newest-manifest-mtime <= ts
    * ([[graft.core.EpochManifest.generationAsOf]], exercised through
    * `EpochStoreCatalog.loadTable(ident, timestamp)`), so the answer is
    * exactly the even-doc_id half the first epoch wrote while the live
    * table already holds both; the oracle recomputes that half
    * relationally. */
  def storeTsAsOf(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    // read-only (TIMESTAMP AS OF resolution) — land the two-instant
    // store once per (session, sf); the manifests are immutable, so the
    // AS-OF boundary keeps resolving identically on reuse
    val wh = graft.core.Landed.dir(spark, s"ttas_wh:$sfDir", "graft_tt_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
        root, 0L, partitionColumn = "lang")
      Thread.sleep(60) // distinct manifest mtimes: the boundary must be real
      graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
        root, 1L, partitionColumn = "lang")
    }
    val root = s"$wh/docs"
    val snaps = graft.core.EpochManifest.snapshots(spark, root)
    // the boundary must be REAL: on a coarse-mtime FS both manifests
    // could share an instant and AS-OF-the-first would resolve to the
    // second — fail loudly rather than return the wrong snapshot
    require(snaps.size == 2 && snaps.head._2 < snaps.last._2,
      s"q_store_ts_asof needs distinct manifest instants, got $snaps — " +
        "coarse filesystem mtime granularity?")
    val firstTs = snaps.head._2
    val s2 = spark.newSession()
    val c = s"grafttt$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MAX(doc_id) AS max_id
         |FROM $c.docs TIMESTAMP AS OF timestamp_millis($firstTs)
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeTsAsOfSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MAX(doc_id) AS max_id
      |FROM documents WHERE lang IS NOT NULL AND doc_id % 2 = 0
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Selective small-file maintenance (`q_store_rewrite`):
    * `CALL rewrite_data_files` bin-packs the fresh store's adjacent
    * small epochs (sizes read from the file-level index — zero listing)
    * into one fold and the aggregate must answer identically — DuckDB
    * recomputes it from the raw table, so a fold that dropped an epoch,
    * a file, or a partition dir fails cell-exact. The selectivity
    * contract (big entries and merge-on-read delta entries untouched,
    * exact run spans) is an EpochStoreDeltaSpec gate. */
  def storeRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    val (s2, t) = freshDmlStore(spark, sfDir, epochs = 3)
    val cat = t.split('.').head
    val r = s2.sql(s"CALL $cat.system.rewrite_data_files(table => 'docs', " +
      "target_mb => 64, min_entries => 2)").head
    require(r.getInt(0) == 1 && r.getInt(2) == 1,
      s"rewrite_data_files must fold the three small epochs: $r")
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM $t GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeRewriteSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents WHERE lang IS NOT NULL
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** SQL CALL maintenance through the store catalog (`q_store_call`):
    * the full store lifecycle driven by SQL alone — a fresh two-epoch
    * store is compacted (`CALL …system.compact`, re-clustered on
    * doc_id) and gc'd (`CALL …system.gc`), then answered. The oracle is
    * the proof that maintenance preserves answers: DuckDB computes the
    * same aggregate from the raw table, so a fold that dropped an
    * epoch, double-counted a file, or lost a partition dir fails
    * cell-exact; the procedure result rows themselves (entries 2→1,
    * two retained manifests) are asserted in EpochStoreSpec. */
  def storeCall(spark: SparkSession, sfDir: String): DataFrame = {
    val (s2, t) = freshDmlStore(spark, sfDir, epochs = 2)
    val cat = t.split('.').head
    val folded = s2.sql(
      s"CALL $cat.system.compact(table => 'docs', " +
        "sort_columns => 'doc_id', parts => 4)").head
    require(folded.getInt(1) == 1, s"compact must fold to one entry: $folded")
    s2.sql(s"CALL $cat.system.gc('docs')").collect()
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM $t GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeCallSql: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE lang IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Named snapshot tags through SQL (`q_store_tag`): tag the initial
    * snapshot (`CALL …system.tag`), DELETE one language, compact and gc
    * — then answer per-lang counts from `VERSION AS OF 'v1'` (the tag,
    * a gc retention anchor whose generation survived the fold) joined
    * with the live read. DuckDB rebuilds both columns from the raw
    * table, so a tag that drifted to the wrong generation, a gc that
    * reclaimed an anchored snapshot, or a delete that leaked into the
    * pin fails cell-exact. */
  def storeTag(spark: SparkSession, sfDir: String): DataFrame = {
    val (s2, t) = freshDmlStore(spark, sfDir, epochs = 2)
    val c = t.split('.').head
    s2.sql(s"CALL $c.system.tag('docs', 'v1')").collect()
    s2.sql(s"DELETE FROM $t WHERE lang = 'en'")
    s2.sql(s"CALL $c.system.compact('docs')").collect()
    s2.sql(s"CALL $c.system.gc('docs')").collect()
    s2.sql(
      s"""SELECT l.lang, COALESCE(p.n_tagged, 0) AS n_tagged, l.n_live
         |FROM (SELECT lang, COUNT(*) AS n_live FROM $t GROUP BY lang) l
         |LEFT JOIN (SELECT lang, COUNT(*) AS n_tagged
         |           FROM $t VERSION AS OF 'v1' GROUP BY lang) p
         |  ON l.lang = p.lang
         |ORDER BY l.lang""".stripMargin)
  }

  val storeTagSql: String =
    """SELECT lang,
      |  COUNT(*) AS n_tagged,
      |  COUNT(*) AS n_live
      |FROM documents
      |WHERE lang IS NOT NULL AND lang <> 'en'
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** SQL MERGE INTO through the store catalog (`q_store_merge`): the
    * group-based row-level rewrite driving a THREE-WAY merge — matched
    * target rows take the source's doubled n_chars, unmatched source
    * rows insert into their partition dirs, and target rows NOT MATCHED
    * BY SOURCE hit the SCD-style sync clauses (short rows delete, the
    * rest update in place; first matching clause wins), all published
    * as ONE manifest generation. DuckDB replays the merge as a union of
    * the three row classes, so a dropped carry-over row, a
    * double-applied update, a misplaced insert, or a by-source action
    * leaking onto matched rows fails the oracle. */
  def storeMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val (s2, t) = freshDmlStore(spark, sfDir, epochs = 1)
    val docs = Tables.documents(s2, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    val src = docs.select(col("doc_id"), (col("n_chars") * 2).as("n_chars"),
        col("lang"))
      .union(docs.select((col("doc_id") + 20000000L).as("doc_id"),
        col("n_chars"), lit("xx").as("lang")))
    val v = "graft_merge_src"
    src.createOrReplaceTempView(v)
    s2.sql(
      s"""MERGE INTO $t t USING $v s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
         |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars, lang)
         |  VALUES (s.doc_id, s.n_chars, s.lang)
         |WHEN NOT MATCHED BY SOURCE AND t.n_chars < 200 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_chars = t.n_chars + 1
         |""".stripMargin)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars
         |FROM $t GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** MERGE-ON-READ twin of `q_store_merge` (`q_store_merge_mor`): the
    * same relational replay, but the store declares `doc_id` as its row
    * identity so the MERGE routes through `SupportsDelta`
    * ([[graft.sources.EpochStoreDelta]]) — ONE delta epoch holding only
    * the touched rows plus equality tombstones, history entries never
    * rewritten, the scan applying the tombstones. Sharing the CoW
    * twin's oracle IS the equivalence proof: both strategies must serve
    * identical answers; the O(delta)-not-O(entry) write-cost side is an
    * EpochStoreDeltaSpec gate. */
  def storeMergeMor(spark: SparkSession, sfDir: String): DataFrame = {
    val (s2, t) = freshDmlStore(spark, sfDir, epochs = 1,
      rowId = Seq("doc_id"))
    val docs = Tables.documents(s2, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    val src = docs.select(col("doc_id"), (col("n_chars") * 2).as("n_chars"),
        col("lang"))
      .union(docs.select((col("doc_id") + 20000000L).as("doc_id"),
        col("n_chars"), lit("xx").as("lang")))
    val v = "graft_merge_mor_src"
    src.createOrReplaceTempView(v)
    s2.sql(
      s"""MERGE INTO $t t USING $v s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
         |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars, lang)
         |  VALUES (s.doc_id, s.n_chars, s.lang)
         |WHEN NOT MATCHED BY SOURCE AND t.n_chars < 200 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_chars = t.n_chars + 1
         |""".stripMargin)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars
         |FROM $t GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** CDC changefeed with change types (`q_store_cdf`, X81): the
    * changefeed over a row-identity store PAIRS a MoR update's
    * tombstone + reinsert of one key in one delta epoch into
    * `update_preimage` / `update_postimage` events — the Delta CDF
    * contract — with the pre-image carrying the key's FULL OLD ROW
    * (resolved from the pre-epoch merge-on-read state); unpaired
    * events keep `insert` / `delete`. The oracle recomputes the exact
    * PAIRED event set — pre-image payloads included — relationally
    * from the MERGE's definition, so a mis-paired key, a lost event,
    * or a wrong old payload fails cell-exact. Scale shape: the feed
    * reads ONLY the since-generation entries (manifest-pruned);
    * pairing is one delta-sized shuffle; pre-image payloads cost one
    * broadcast-keys probe of the pre-state per updating epoch. */
  def storeCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"cdf_wh:$sfDir", "graft_cdf_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, root, 0L, partitionColumn = "lang")
      graft.sources.EpochStoreDelta.declare(spark, root, Seq("doc_id"))
    }
    val root = s"$wh/docs"
    val g1 = graft.core.EpochManifest.generations(spark, root).last
    val s2 = spark.newSession()
    val c = s"graftcdf$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val en = Tables.documents(s2, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    val src = en.select(col("doc_id"), (col("n_chars") * 2).as("n_chars"),
        col("lang"))
      .union(en.select((col("doc_id") + 20000000L).as("doc_id"),
        col("n_chars"), lit("xx").as("lang")))
    src.createOrReplaceTempView("graft_cdf_src")
    s2.sql(
      s"""MERGE INTO $c.docs t USING graft_cdf_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
         |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars, lang)
         |  VALUES (s.doc_id, s.n_chars, s.lang)""".stripMargin)
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    graft.sources.EpochStore.readChanges(s2, root, sch, g1,
        partitionColumn = "lang")
      .groupBy(col("_change_type").as("change"))
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ids"),
        sum("n_chars").as("chars"))
      .orderBy("change")
  }

  val storeCdfSql: String =
    """WITH en AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
      |  FROM documents WHERE lang = 'en'
      |), ev AS (
      |  SELECT 'update_postimage' AS change, doc_id,
      |    n_chars * 2 AS n_chars FROM en
      |  UNION ALL
      |  SELECT 'insert', doc_id + 20000000, n_chars FROM en
      |  UNION ALL
      |  SELECT 'update_preimage', doc_id, n_chars FROM en
      |)
      |SELECT change, COUNT(*) AS n,
      |  CAST(SUM(doc_id) AS BIGINT) AS ids,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM ev GROUP BY change ORDER BY change""".stripMargin

  /** DV changefeed delete events (`q_store_cdf_dv`, X94 meets X81): a
    * position-delete DELETE on an IDENTITY-LESS store must not vanish
    * from the CDC feed — `readChanges` synthesizes full-payload
    * `delete` events for rows the consumer ingested before its base
    * generation (read once from the targeted files' dead ordinals,
    * positions broadcast), while rows inserted AND deleted inside the
    * window net out (the scan's own DV application drops them). The
    * oracle recomputes the exact event set — payload sums included —
    * relationally from the delete's definition, so a lost event, a
    * resurrected row, or a mis-netted pair fails cell-exact. */
  def storeCdfDv(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"cdfdv_wh:$sfDir", "graft_cdfdv_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, root, 0L)
      // in-window append: shifted copies land AFTER the consumer's base
      graft.sources.EpochStore.write(
        docs.select((col("doc_id") + 20000000L).as("doc_id"),
          col("n_chars"), col("lang")), root, 1L)
    }
    val root = s"$wh/docs"
    // consumer base = the epoch-0 commit (second-to-last of the clone's
    // two fixture generations — the same instant the inline build read)
    val gens = graft.core.EpochManifest.generations(spark, root)
    val g1 = gens(gens.size - 2)
    val s2 = spark.newSession()
    val c = s"graftcdfdv$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.conf.set(graft.sources.EpochStoreDv.EnabledConf, "true")
    try s2.sql(s"DELETE FROM $c.docs WHERE n_chars < 300")
    finally s2.conf.unset(graft.sources.EpochStoreDv.EnabledConf)
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    graft.sources.EpochStore.readChanges(s2, root, sch, g1)
      .groupBy(col("_change_type").as("change"))
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ids"),
        sum("n_chars").as("chars"))
      .orderBy("change")
  }

  /** STREAMING twin of `q_store_cdf_dv` (`q_store_cdf_stream`, X97):
    * the same store history — base epoch, in-window append, one
    * position-delete journal — consumed as a CDC TAIL
    * (`readStream` with `_change_type`, AvailableNow) instead of the
    * batch feed. The tail nets the in-window targets (their inserts
    * deliver DV-filtered) and re-reads the pre-window targets at their
    * dead ordinals as full-payload `delete` events stamped with the
    * journal's epoch — zero driver materialization, distributed event
    * synthesis per trigger. Sharing the batch feed's oracle IS the
    * batch/streaming symmetry proof: one event lost, duplicated, or
    * mis-netted on either side fails cell-exact. */
  def storeCdfStream(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"cdfs_wh:$sfDir", "graft_cdfs_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, root, 0L)
      graft.sources.EpochStore.write(
        docs.select((col("doc_id") + 20000000L).as("doc_id"),
          col("n_chars"), col("lang")), root, 1L)
    }
    val root = s"$wh/docs"
    val s2 = spark.newSession()
    val c = s"graftcdfs$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    // stateless append tail, no watermark — the trailing no-data
    // micro-batch buys nothing; skip its full trigger cost
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    s2.conf.set(graft.sources.EpochStoreDv.EnabledConf, "true")
    try s2.sql(s"DELETE FROM $c.docs WHERE n_chars < 300")
    finally s2.conf.unset(graft.sources.EpochStoreDv.EnabledConf)
    val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        graft.sources.EpochStore.EpochColName,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        graft.sources.EpochStore.ChangeColName,
        org.apache.spark.sql.types.StringType, nullable = false)))
    val sink = s"graft_cdfs_tail_$run"
    val q = s2.readStream.format("epochstore").schema(cdcSchema)
      .option("path", root).option("startingAfterEpoch", "0").load()
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    s2.table(sink)
      .groupBy(col("_change_type").as("change"))
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ids"),
        sum("n_chars").as("chars"))
      .orderBy("change")
  }

  val storeCdfDvSql: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
      |  FROM documents WHERE lang IS NOT NULL
      |), ev AS (
      |  SELECT 'insert' AS change, doc_id + 20000000 AS doc_id, n_chars
      |  FROM base WHERE n_chars >= 300
      |  UNION ALL
      |  SELECT 'delete', doc_id, n_chars FROM base WHERE n_chars < 300
      |)
      |SELECT change, COUNT(*) AS n,
      |  CAST(SUM(doc_id) AS BIGINT) AS ids,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM ev GROUP BY change ORDER BY change""".stripMargin

  /** Position-delta MoR MERGE on an IDENTITY-LESS store
    * (`q_store_update_dv`, X99 — the Iceberg `_file`/`_pos` shape):
    * under DV mode, MERGE matched rows land as position journal +
    * reinserted rows in ONE O(matched) entry — history dirs
    * byte-untouched, no group rewrite, no declared rowid. The exact
    * merge `q_store_merge_mor` runs on a rowid store runs here
    * positionally, and shares its oracle — a resurrection, a lost
    * update, or a double-applied journal fails cell-exact. */
  def storeUpdateDv(spark: SparkSession, sfDir: String): DataFrame = {
    val run = dmlRuns.incrementAndGet()
    val wh = clonedWh(spark, s"udv_wh:$sfDir", "graft_udv_wh") { wh =>
      val root = s"$wh/docs"
      val docs = Tables.documents(spark, sfDir)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
      graft.sources.EpochStore.write(docs, root, 0L,
        partitionColumn = "lang")
    }
    val s2 = spark.newSession()
    val c = s"graftudv$run"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val en = Tables.documents(s2, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    val src = en.select(col("doc_id"), (col("n_chars") * 2).as("n_chars"),
        col("lang"))
      .union(en.select((col("doc_id") + 20000000L).as("doc_id"),
        col("n_chars"), lit("xx").as("lang")))
    src.createOrReplaceTempView(s"udv_src_$run")
    s2.conf.set(graft.sources.EpochStoreDv.EnabledConf, "true")
    try s2.sql(
      s"""MERGE INTO $c.docs t USING udv_src_$run s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
         |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars, lang)
         |  VALUES (s.doc_id, s.n_chars, s.lang)
         |WHEN NOT MATCHED BY SOURCE AND t.n_chars < 200 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_chars = t.n_chars + 1
         |""".stripMargin)
    finally s2.conf.unset(graft.sources.EpochStoreDv.EnabledConf)
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val storeMergeSql: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, lang
      |  FROM documents WHERE lang IS NOT NULL
      |), merged AS (
      |  -- WHEN MATCHED: every en row matches its source twin and doubles
      |  SELECT doc_id, n_chars * 2 AS n_chars, lang
      |  FROM base WHERE lang = 'en'
      |  UNION ALL
      |  -- WHEN NOT MATCHED BY SOURCE: short rows delete (first matching
      |  -- clause wins), the rest bump by 1
      |  SELECT doc_id, n_chars + 1, lang
      |  FROM base WHERE lang <> 'en' AND n_chars >= 200
      |  UNION ALL
      |  -- WHEN NOT MATCHED: the shifted en rows insert as lang = 'xx'
      |  SELECT doc_id + 20000000, n_chars, 'xx' FROM base WHERE lang = 'en'
      |)
      |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM merged GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_store_dml"     -> (storeDml _),
    "q_store_ctas"    -> (storeCtas _),
    "q_store_multipart" -> (storeMultipart _),
    "q_store_compbucket" -> (storeCompBucket _),
    "q_store_wap"     -> (storeWap _),
    "q_store_bucket"  -> (storeBucket _),
    "q_store_sorted"  -> (storeSorted _),
    "q_store_meta"    -> (storeMeta _),
    "q_store_rename"  -> (storeRename _),
    "q_store_default" -> (storeDefault _),
    "q_store_migrate" -> (storeMigrate _),
    "q_store_spec_evolve" -> (storeSpecEvolve _),
    "q_store_timepart" -> (storeTimepart _),
    "q_store_evolve_tp" -> (storeEvolveTp _),
    "q_store_restore" -> (storeRestore _),
    "q_store_call"    -> (storeCall _),
    "q_store_tag"     -> (storeTag _),
    "q_store_merge"   -> (storeMerge _),
    "q_store_merge_mor" -> (storeMergeMor _),
    "q_store_update_dv" -> (storeUpdateDv _),
    "q_store_cdf"     -> (storeCdf _),
    "q_store_cdf_dv"  -> (storeCdfDv _),
    "q_store_cdf_stream" -> (storeCdfStream _),
    "q_store_rewrite" -> (storeRewrite _),
    "q_store_timetravel" -> (storeTimetravel _),
    "q_store_ts_asof" -> (storeTsAsOf _),
    "q_store_write"   -> (storeWrite _),
    "q_store_stream"  -> (storeStream _),
    "q_store_dpp"     -> (storeDpp _),
    "q_store_changes" -> (storeChanges _),
    "q_store_agg"     -> (storeAgg _),
    "q_store_agg_meta" -> (storeAggMeta _),
    "q_store_spj"     -> (storeSpj _),
    "q_store_upsert"  -> (storeUpsert _),
    "q_store_derived" -> (storeDerived _),
    "q_store_bloomskip" -> (storeBloomskip _),
    "q_store_statskip" -> (storeStatskip _),
    "q_store_topn"    -> (storeTopn _),
    "q_store_broadcast" -> (storeBroadcast _),
    "q_store_delete"  -> (storeDelete _),
    "q_store_delete_dv" -> (storeDeleteDv _),
    "q_store_evolve"  -> (storeEvolve _),
    "q_store_zorder"  -> (storeZorder _),
    "q_store_compact" -> (storeCompact _),
    "q_store_sql"     -> (storeSql _),
    "q_orc_roundtrip" -> (orcRoundtrip _),
    "q_zorder"        -> (zorderQ _),
    "q_table_diff"    -> (tableDiffQ _),
    "q_asof_join"     -> (asofJoin _),
    "q_asof_native"   -> (asofNative _),
    "q_asof_native_outer" -> (asofNativeOuter _),
    "q_unpivot"       -> (unpivot _),
    "q_window_stats"  -> (windowStats _),
    "q_histogram"     -> (histogram _),
    "q_null_funcs"    -> (nullFuncs _),
    "q_pivot"         -> (pivotStatus _),
    "q_word_topk"     -> (wordTopK _),
    "q_percentiles"   -> (percentiles _),
    "q_percentiles_approx" -> (percentilesApprox _),
    "q_string_agg"    -> (stringAgg _),
    "q_event_pairs"   -> (eventPairs _),
    "q_sql_subquery"  -> (sqlScalarSubquery _),
    "q_argmax"        -> (argmax _)
  )

  val oracle: Map[String, String] = Map(
    "q_store_dml"     -> storeDmlSql,
    "q_store_ctas"    -> storeCtasSql,
    "q_store_multipart" -> storeMultipartSql,
    "q_store_compbucket" -> storeCompBucketSql,
    "q_store_wap"     -> storeWapSql,
    "q_store_bucket"  -> storeBucketSql,
    "q_store_sorted"  -> storeSortedSql,
    "q_store_meta"    -> storeMetaSql,
    "q_store_rename"  -> storeRenameSql,
    "q_store_default" -> storeDefaultSql,
    "q_store_migrate" -> storeMigrateSql,
    "q_store_spec_evolve" -> storeMigrateSql,
    "q_store_timepart" -> storeTimepartSql,
    "q_store_evolve_tp" -> storeEvolveTpSql,
    "q_store_restore" -> storeRestoreSql,
    "q_store_call"    -> storeCallSql,
    "q_store_tag"     -> storeTagSql,
    "q_store_merge"   -> storeMergeSql,
    "q_store_merge_mor" -> storeMergeSql,
    "q_store_update_dv" -> storeMergeSql,
    "q_store_cdf"     -> storeCdfSql,
    "q_store_cdf_dv"  -> storeCdfDvSql,
    "q_store_cdf_stream" -> storeCdfDvSql,
    "q_store_rewrite" -> storeRewriteSql,
    "q_store_timetravel" -> storeTimetravelSql,
    "q_store_ts_asof" -> storeTsAsOfSql,
    "q_store_write"   -> storeWriteSql,
    "q_store_stream"  -> storeStreamSql,
    "q_store_dpp"     -> storeDppSql,
    "q_store_changes" -> storeChangesSql,
    "q_store_agg"     -> storeAggSql,
    "q_store_agg_meta" -> storeAggMetaSql,
    "q_store_spj"     -> storeSpjSql,
    "q_store_upsert"  -> storeUpsertSql,
    "q_store_derived" -> storeDerivedSql,
    "q_store_bloomskip" -> storeBloomskipSql,
    "q_store_statskip" -> storeStatskipSql,
    "q_store_topn"    -> storeTopnSql,
    "q_store_broadcast" -> storeBroadcastSql,
    "q_store_delete"  -> storeDeleteSql,
    "q_store_delete_dv" -> storeDeleteDvSql,
    "q_store_evolve"  -> storeEvolveSql,
    "q_store_zorder"  -> storeZorderSql,
    "q_store_compact" -> storeCompactSql,
    "q_store_sql"     -> storeSqlSql,
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_zorder"        -> zorderSql,
    "q_table_diff"    -> tableDiffSql,
    "q_asof_join"     -> asofJoinSql,
    "q_asof_native"   -> asofJoinSql,
    "q_asof_native_outer" -> asofNativeOuterSql,
    "q_unpivot"       -> unpivotSql,
    "q_window_stats"  -> windowStatsSql,
    "q_histogram"     -> histogramSql,
    "q_null_funcs"    -> nullFuncsSql,
    "q_pivot"         -> pivotStatusSql,
    "q_word_topk"     -> wordTopKSql,
    "q_percentiles"   -> percentilesSql,
    "q_string_agg"    -> stringAggSql,
    "q_event_pairs"   -> eventPairsSql,
    "q_sql_subquery"  -> sqlScalarSubquerySql,
    "q_argmax"        -> argmaxSql
  )
}
