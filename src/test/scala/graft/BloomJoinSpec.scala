package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.plans.BloomJoin

/** Bloom-filter semi-join reduction: exact equality with the plain join
  * (no false negatives), actual fact-side pruning (the point of the
  * operator), and the empty-dim short-circuit. */
class BloomJoinSpec extends SparkSpec {

  private def dim = Tables.supplier(spark, sf001).filter(col("s_nationkey") === 3)
  private def fact = Tables.lineitem(spark, sf001)

  test("reduced join equals the plain inner join exactly") {
    val reduced = BloomJoin.reducedJoin(fact, dim, col("l_suppkey"), col("s_suppkey"), 100000L)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
    assert(plain.count() > 0) // the equality must not be vacuous
  }

  test("probe prunes the fact side ahead of the join, keeping all true matches") {
    val bf = BloomJoin.buildFilter(dim, col("s_suppkey"), 100000L).get
    val kept = fact.filter(BloomJoin.mightContain(bf, col("l_suppkey"))).count()
    val total = fact.count()
    val trueMatches = fact.join(dim, col("l_suppkey") === col("s_suppkey")).count()
    assert(kept >= trueMatches, "a Bloom filter must never drop a true match")
    // 3/100 dim keys survive the predicate; at fpp ~3% the probe should
    // drop the vast majority of the fact side
    assert(kept < total / 2, s"probe kept $kept of $total rows — no reduction happened")
  }

  test("empty dim side short-circuits to an empty result") {
    val none = Tables.supplier(spark, sf001).filter(col("s_acctbal") > 1e12)
    assert(BloomJoin.buildFilter(none, col("s_suppkey"), 100L).isEmpty)
    assert(BloomJoin.reducedJoin(fact, none, col("l_suppkey"), col("s_suppkey"), 100L).isEmpty)
  }
}
