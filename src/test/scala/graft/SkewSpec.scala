package graft

import org.apache.spark.sql.functions._
import graft.core.Skew

class SkewSpec extends SparkSpec {

  test("salted sum/count equals direct aggregation on a skewed key") {
    // l_returnflag is 3-valued over 60k rows — maximal group skew
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(li, "l_returnflag", "l_quantity",
        salts = 16, spread = Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n)
      assert(math.abs(salted(k)._1 - s) < 1e-6) // double sums, tiny reorder drift
    }
  }

  test("salted count-distinct is exact (value-hash partitioning)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val direct = li.groupBy("l_returnflag").agg(countDistinct("l_partkey").as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedCountDistinct(li, "l_returnflag", "l_partkey", salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(direct == salted)
  }

  test("salt spreads a hot key over all sub-keys") {
    import spark.implicits._
    val hot = (1 to 10000).map(i => ("HOT", i)).toDF("k", "v")
    val groups = Skew.saltedSumCount(hot, "k", "v", salts = 8, spread = Seq("v"))
    // result correct…
    assert(groups.head.getLong(2) == 10000L)
    // …and phase 1 actually produced 8 partials (inspect via the same salt expr)
    val spread = hot.select(pmod(hash(col("v")), lit(8)).as("s")).distinct().count()
    assert(spread == 8)
  }

  test("AQE splits a deliberately skewed sort-merge join at runtime") {
    // Skew.scala's tool #1 is "AQE skew-join splitting, no code changes" —
    // this proves that claim at RUNTIME: one key owning 95% of the probe
    // side must show up as a skew-split join (skew=true) in the FINAL
    // adaptive plan, with results identical to the unskewed semantics.
    // Thresholds are lowered to make a ~5 MB hot partition count as
    // skewed at test scale; the detection logic is the same one that
    // fires at 100 TB defaults (256 MB / 5x median).
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    // getOption-style read: some adaptive confs have no default value at
    // all (conf.get returns null, and set(null) later throws)
    val saved = keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // no broadcast escape hatch — force a shuffled join so skew handling
      // is actually on the table
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // thresholds are COMPRESSED shuffle sizes — keep them small enough
      // that a ~200k-row hot partition of well-compressing longs clears them
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // key 0 owns 190k of 200k left rows; right side is 100 distinct keys;
      // v is hash-mixed so the hot partition can't compress to nothing
      val left = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        pmod(col("id") * 2654435761L, lit(1000003L)).as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val qe = left.join(right, "k").queryExecution
      // execute the SAME plan instance we inspect (Metrics.measure's rule)
      val n = qe.executedPlan.execute().count()
      // k=0: 190000 (id%20!=0) + 1 (id=0) rows; k=20/40/60/80 match too
      assert(n == 190005L, s"skew-split join returned $n rows")
      val finalPlan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
        case o => o.treeString
      }
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire — final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hotKeys: planted hot keys detected, no false positives, uniform data silent") {
    import spark.implicits._
    // two hot keys (30% + 15%) over a 1000-key uniform tail
    val rows = Seq.fill(3000)("hot-a") ++ Seq.fill(1500)("hot-b") ++
      (0 until 1000).flatMap(i => Seq.fill(5)(s"cold$i"))
    val df = rows.toDF("k").repartition(8)
    val n = rows.size
    val hot = Skew.hotKeys(df, "k", minShare = 0.05, m = 64).toMap
    assert(hot.contains("hot-a") && hot.contains("hot-b"), s"missed a planted hot key: $hot")
    // every report is certainly hot: lower bound ≤ true count, and the
    // report condition requires lower ≥ minShare·n
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    hot.foreach { case (k, lower) =>
      assert(lower <= truth(k), s"lower bound above truth for $k")
      assert(truth(k) >= 0.05 * n, s"false positive: $k at ${truth(k)} of $n")
    }
    // uniform data: nothing clears the share bar
    val uniform = (0 until 500).flatMap(i => Seq.fill(10)(s"u$i")).toDF("k")
    assert(Skew.hotKeys(uniform, "k", minShare = 0.05, m = 64).isEmpty)
  }
}
