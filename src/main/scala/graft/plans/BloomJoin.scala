package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: prune the fact side of a selective
  * join BEFORE its shuffle (/ scan of the join itself), using a compact
  * filter built from the dim side's keys.
  *
  * Why this exists at 100 TB: when a join keeps only a small fraction of
  * the fact table (selective dim predicate), the dominant cost is moving
  * fact rows that the join will immediately drop. A Bloom filter over the
  * dim keys is a few hundred KB regardless of fact size, has NO false
  * negatives (the reduced join is exactly equal to the plain join — the
  * equi-join itself clears the false positives), and the `might_contain`
  * probe is a codegen'd xxhash64 + bit-test that runs inside the fact
  * scan stage, upstream of any exchange. This is the same mechanism as
  * Spark's AQE runtime bloom filter (`InjectRuntimeFilter`); the explicit
  * operator form makes the reduction deterministic and available when the
  * optimizer's heuristics (creation-side size thresholds, shuffle-stage
  * requirements) decline to inject one — e.g. a pre-filtered tiny dim
  * read from an unbucketed source.
  *
  * Build is distributed: `BloomFilterAggregate` builds per-partition
  * filters and ORs them in the merge phase; only the final ~KB..MB binary
  * reaches the driver (a 1-row aggregate — not a data collect). The
  * binary ships to executors as a plan literal inside the task binary,
  * which Spark broadcasts once per stage.
  *
  * Sizing: `expectedItems` should be an upper bound on DISTINCT dim keys;
  * the default false-positive rate at that capacity is ~3%
  * (`BloomFilter.DEFAULT_FPP`), and an overestimate only costs bits
  * (~9.6 bits/key), never correctness. At 1M expected keys the filter is
  * ~1.2 MB — still a broadcast-trivial artifact.
  */
object BloomJoin {

  /** Distributed Bloom-filter build over `key`; returns the serialized
    * filter (spark.util.sketch format), or None if `dim` has no rows
    * (the aggregate yields NULL — there is nothing to probe).
    *
    * EAGER: this runs a Spark job NOW (aggregate + head) — callers that
    * compose it into a DataFrame ([[reducedJoin]]) therefore do cluster
    * work at construction time, not first execution. That is inherent to
    * embedding the filter as a plan literal; the filter must exist before
    * the probe side can be planned. */
  def buildFilter(dim: DataFrame, key: Column, expectedItems: Long): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(key))), expectedItems)
      .toAggregateExpression()
    Option(dim.select(GraftBridge.column(agg).as("bf")).head.getAs[Array[Byte]](0))
  }

  /** Codegen'd membership probe: xxhash64(key) tested against the
    * serialized filter. False positives possible, false negatives not. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(key)))))

  /** `fact JOIN dim ON factKey = dimKey`, with the fact side Bloom-pruned
    * before the join. Result is exactly the plain inner join (the join
    * predicate removes the filter's false positives). An empty dim side
    * short-circuits to an always-false filter — same empty result, no
    * probe work. */
  def reducedJoin(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
                  expectedItems: Long): DataFrame = {
    val pre = buildFilter(dim, dimKey, expectedItems) match {
      case Some(bf) => fact.filter(mightContain(bf, factKey))
      case None     => fact.filter(lit(false))
    }
    pre.join(dim, factKey === dimKey)
  }
}
