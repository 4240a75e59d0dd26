package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.JoinAdvisor
import graft.core.JoinAdvisor.{BroadcastDim, HybridSalted, ShuffleJoin}

/** Sketch-informed join planning ([[graft.core.JoinAdvisor]]): each
  * branch of the decision fires on the data shape that demands it, the
  * CMS output estimate never under-prices the join, and — the invariant
  * everything else leans on — every strategy returns exactly the plain
  * join's rows. */
class JoinAdvisorSpec extends SparkSpec {

  private def plainJoin(l: DataFrame, r: DataFrame): Set[(Long, Long, Long)] =
    l.join(r, Seq("k"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  private def rowsOf(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  // 10k fact rows: key 7 owns 30%, key 13 owns 20%, the rest uniform
  // over 1000 keys — classic hot-head distribution
  private def skewedFact: DataFrame = {
    import spark.implicits._
    (0 until 10000).map { i =>
      val k = if (i < 3000) 7L else if (i < 5000) 13L else (i % 1000).toLong
      (k, i.toLong)
    }.toDF("k", "fact_payload")
  }

  private def dim(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i * 100L)).toDF("k", "dim_payload")
  }

  test("small dim → BroadcastDim, and the plan broadcasts") {
    val (joined, advice) = JoinAdvisor.autoJoin(skewedFact, dim(50), "k",
      broadcastRows = 1000, minShare = 0.1)
    assert(advice.strategy == BroadcastDim)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(rowsOf(joined) == plainJoin(skewedFact, dim(50)))
  }

  test("hot probe keys + big dim → HybridSalted, result identical to the plain join") {
    val d = dim(1000)
    val (joined, advice) = JoinAdvisor.autoJoin(skewedFact, d, "k",
      broadcastRows = 10, minShare = 0.1)
    assert(advice.strategy == HybridSalted)
    // both planted hot keys are certainly detected (30% and 20% ≥ 1.5×10%)
    assert(advice.hotKeys.toSet == Set("7", "13"), s"hot=${advice.hotKeys}")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "hot slice should broadcast")
    assert(plan.contains("Union"), "hybrid is a union of hot and cold slices")
    assert(rowsOf(joined) == plainJoin(skewedFact, d))
  }

  test("uniform keys + big dim → ShuffleJoin") {
    import spark.implicits._
    val uniform = (0 until 10000).map(i => ((i % 1000).toLong, i.toLong))
      .toDF("k", "fact_payload")
    val (joined, advice) = JoinAdvisor.autoJoin(uniform, dim(1000), "k",
      broadcastRows = 10, minShare = 0.1)
    assert(advice.strategy == ShuffleJoin)
    assert(advice.hotKeys.isEmpty)
    assert(rowsOf(joined) == plainJoin(uniform, dim(1000)))
  }

  test("CMS estimate never under-prices the join; partition sizing follows it") {
    val d = dim(1000)
    val advice = JoinAdvisor.advise(skewedFact, d, "k",
      broadcastRows = 10, rowsPerPartition = 1000)
    val exact = skewedFact.join(d, Seq("k")).count()
    assert(advice.estJoinRows >= exact,
      s"CMS under-estimated: ${advice.estJoinRows} < $exact")
    assert(advice.suggestedPartitions ==
      ((advice.estJoinRows + 999) / 1000).toInt)
    assert(advice.leftRows == 10000 && advice.rightRows == 1000)
  }

  // ---------------------------------------------------------------
  // Planner integration: arm() once, plain .join() gets the treatment
  // ---------------------------------------------------------------

  private def landTmp(df: DataFrame, name: String): DataFrame = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_advtest_$name").toString
    df.coalesce(2).write.mode("overwrite").parquet(s"$d/t")
    spark.read.parquet(s"$d/t")
  }

  test("armed hybrid profile rewrites a PLAIN join to the hot/cold union plan") {
    val fact = landTmp(skewedFact, "fact")
    val d = landTmp(dim(1000), "dim")
    val advice = JoinAdvisor.arm(fact, d, "k", broadcastRows = 10, minShare = 0.1)
    try {
      assert(advice.strategy == HybridSalted)
      val joined = fact.join(d, Seq("k"))
      val opt = joined.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Union => LUnion}
      assert(opt.collect { case u: LUnion => u }.size == 1,
        s"expected exactly one Union in\n$opt")
      assert(opt.collect { case jn: LJoin => jn }.size == 2,
        s"expected exactly the hot and cold joins in\n$opt")
      val phys = joined.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"), "hot slice should broadcast")
      assert(rowsOf(joined) == plainJoin(skewedFact, dim(1000)))
    } finally JoinAdvisor.disarm(fact, d, "k")
  }

  test("armed rule refuses the uniform fixture — plan untouched") {
    import spark.implicits._
    val uniform = landTmp(
      (0 until 10000).map(i => ((i % 1000).toLong, i.toLong)).toDF("k", "fact_payload"),
      "uni")
    val d = landTmp(dim(1000), "dim2")
    val advice = JoinAdvisor.arm(uniform, d, "k", broadcastRows = 10, minShare = 0.1)
    try {
      assert(advice.strategy == ShuffleJoin)
      val joined = uniform.join(d, Seq("k"))
      val opt = joined.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Union => LUnion}
      assert(opt.collect { case u: LUnion => u }.isEmpty, s"no union expected in\n$opt")
      assert(opt.collect { case jn: LJoin => jn }.size == 1)
    } finally JoinAdvisor.disarm(uniform, d, "k")
  }

  test("armed BroadcastDim profile pins the hint past a disabled auto-threshold") {
    val fact = landTmp(skewedFact, "fact3")
    val d = landTmp(dim(50), "dim3")
    val advice = JoinAdvisor.arm(fact, d, "k", broadcastRows = 1000, minShare = 0.1)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      assert(advice.strategy == BroadcastDim)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fact.join(d, Seq("k"))
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "the armed hint must broadcast even with the size threshold disabled")
      assert(rowsOf(joined) == plainJoin(skewedFact, dim(50)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      JoinAdvisor.disarm(fact, d, "k")
    }
  }

  test("hybrid keeps null keys out of the result like a plain inner join") {
    import spark.implicits._
    val l = Seq[(java.lang.Long, Long)]((7L, 1L), (7L, 2L), (null, 3L), (5L, 4L))
      .toDF("k", "fact_payload")
    val r = Seq[(java.lang.Long, Long)]((7L, 700L), (null, 900L), (5L, 500L))
      .toDF("k", "dim_payload")
    val advice = JoinAdvisor.Advice(HybridSalted, 4, 3, 0, 1, Seq("7"))
    val hybrid = JoinAdvisor.build(l, r, "k", advice)
    assert(rowsOf(hybrid) == plainJoin(l, r))
  }
}
