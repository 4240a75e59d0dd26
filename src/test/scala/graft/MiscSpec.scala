package graft

import org.apache.spark.sql.functions._
import graft.queries.MiscCatalog

/** Pins the guarantee that lets `q_percentiles_approx` replace the
  * exact `q_percentiles` at scale: percentile_approx's Greenwald–Khanna
  * summary returns a REAL element of the group whose rank is within
  * n/accuracy of the target rank. The exact query stays oracle-SF-only
  * (it buffers every group value); this spec is the approx twin's
  * correctness story. */
class MiscSpec extends SparkSpec {

  test("event pairs: forward-merge equals the self-join twin and shuffles " +
      "|input| rows, never pairs") {
    val merge = MiscCatalog.eventPairs(spark, sf0001)
    val join = MiscCatalog.eventPairsJoin(spark, sf0001)
    assert(merge.collect().map(_.toSeq).toSeq ==
      join.collect().map(_.toSeq).toSeq,
      "interval merge diverged from the join semantics")
    // the whole plan's shuffle: one |input|-row hash exchange on user_id
    // plus the tiny per-partition (t1,t2) count rows through the final
    // aggregate/sort exchanges — NO pair-expansion exchange. The join twin
    // is allowed its 2·|input| key exchange; what it materializes in
    // memory per matching key-pair is exactly what this bound proves the
    // merge never creates.
    val n = graft.core.Tables.events(spark, sf0001).count()
    val prof = graft.core.Metrics.measure(MiscCatalog.eventPairs(spark, sf0001))
    assert(prof.shuffleRecords >= n,
      s"merge must shuffle each input row once: ${prof.shuffleRecords} < $n")
    assert(prof.shuffleRecords <= n + 1000,
      s"pair expansion leaked into a shuffle: ${prof.shuffleRecords} vs input $n")
  }

  test("q_percentiles_approx: every value is a group element within the GK rank guarantee") {
    val eps = 1.0 / MiscCatalog.PctAccuracy
    val approx = MiscCatalog.percentilesApprox(spark, sf001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val status = r.getString(0)
      val vals = spark.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_orderstatus") === status)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      assert(r.getLong(4) == n.toLong)
      Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2), 0.75 -> r.getDouble(3)).foreach {
        case (p, v) =>
          val lt = vals.count(_ < v)
          val le = vals.count(_ <= v)
          // a quantile summary returns an element it actually saw, never
          // an interpolated value
          assert(le > lt, s"$status p=$p: approx $v is not an element of the group")
          // the element's rank interval must intersect the guaranteed
          // window target ± eps*n (+1 for the floor/ceil edge)
          val target = p * n
          val slack = eps * n + 1
          assert(lt + 1 <= target + slack && le >= target - slack,
            s"$status p=$p: approx=$v has rank in [${lt + 1},$le], " +
              s"outside target $target ± $slack (n=$n)")
      }
    }
  }

  test("q_percentiles_approx matches q_percentiles' shape and group cardinality") {
    val exact = MiscCatalog.percentiles(spark, sf001)
    val approx = MiscCatalog.percentilesApprox(spark, sf001)
    assert(exact.columns.toSeq == approx.columns.toSeq)
    assert(exact.select("o_orderstatus", "n").collect().toSeq ==
      approx.select("o_orderstatus", "n").collect().toSeq)
  }

  test("retention: triangle invariants — day-0 is the cohort size and bounds every offset") {
    val rows = graft.queries.EventsCatalog.retention(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byCohort = rows.groupBy(_._1)
    assert(byCohort.nonEmpty)
    byCohort.foreach { case (day, rs) =>
      val d0 = rs.find(_._2 == 0).map(_._3)
      assert(d0.isDefined, s"cohort $day missing day-0 row")
      rs.foreach { case (_, off, n) =>
        assert(n <= d0.get, s"cohort $day offset $off: $n > day-0 ${d0.get}")
      }
    }
    // cohorts partition the user base: day-0 sizes sum to all users
    val users = spark.read.parquet(s"$sf001/events.parquet")
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum == users)
  }

  test("funnel: strictly-after ordering bites on a constructed fixture") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // u1 completes in order; u2's only click PRECEDES its first view
    // (never enters step 2); u3 stops at click; u4's only purchase
    // precedes its first click (stops at step 2)
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "click", t(1)), (2L, "view", t(2)),
      (3L, "view", t(1)), (3L, "click", t(2)),
      (4L, "purchase", t(1)), (4L, "view", t(2)), (4L, "click", t(3))
    ).toDF("user_id", "event_type", "ts")
    val r = graft.queries.EventsCatalog.funnelOf(ev).collect()(0)
    assert(r.getLong(0) == 4, s"step1 ${r.getLong(0)}")
    assert(r.getLong(1) == 3, s"step2 ${r.getLong(1)} — pre-view click counted?")
    assert(r.getLong(2) == 1, s"step3 ${r.getLong(2)} — pre-click purchase counted?")
    assert(r.getDouble(3) == 0.75 && r.getDouble(4) == 0.333333)
    // nobody past step 1: conv_2_3's divide-by-zero guard yields null
    val lonely = Seq((9L, "view", t(1))).toDF("user_id", "event_type", "ts")
    val l = graft.queries.EventsCatalog.funnelOf(lonely).collect()(0)
    assert(l.getLong(0) == 1 && l.getLong(1) == 0 && l.getLong(2) == 0)
    assert(l.getDouble(3) == 0.0 && l.isNullAt(4), s"guard failed: $l")
  }

  test("table diff: every class non-empty, classes partition the key union, drift is real") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.MiscCatalog.tableDiffQ(spark, sf0001)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set("added", "removed", "changed", "unchanged"),
      s"missing a diff class: $r")
    // the union of both snapshots' keys is exactly what the full-outer
    // join emits — re-derive it independently
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val unionKeys = li.filter(col("l_orderkey") % 89 =!= 0 || col("l_orderkey") % 97 =!= 0)
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(r.values.sum == unionKeys, s"${r.values.sum} classified vs $unionKeys keys")
    // drift magnitudes: ~1% membership each way, ~1% value changes —
    // unchanged must dominate by an order of magnitude
    assert(r("unchanged") > 10 * (r("added") + r("removed") + r("changed")), r.toString)
  }
}
