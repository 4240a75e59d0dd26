package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph ops for dedup clustering: near-dup PAIRS
  * aren't a dedup result until they're clustered (a≈b, b≈c ⇒ keep one of
  * {a,b,c}) — that's connected components over the pair graph.
  *
  * Min-label propagation: every vertex starts labeled with its own id;
  * each round takes the min of its own and its neighbors' labels; at
  * fixpoint the label is the component's minimum vertex id (deterministic
  * canonical representative). Rounds = graph diameter — near-dup
  * clusters are tiny and dense, so 3-5 rounds in practice.
  *
  * Scale notes: each round is one join + one aggregation, shuffling on
  * vertex id; `localCheckpoint` cuts the lineage each round (iterative
  * DataFrame loops otherwise build exponential plans); the driver sees
  * only the per-round changed-count.
  */
object Graph {

  /** Connected components of an undirected edge list (`src`, `dst`).
    * Returns (id, comp) with comp = min vertex id in the component. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      val updated = labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp2"))
        .localCheckpoint(true)
      changed = updated.filter(col("comp2") < col("comp")).count()
      labels = updated.select(col("id"), col("comp2").as("comp"))
      i += 1
    }
    // silent non-convergence would split components and corrupt the dedup
    // decision downstream — fail loudly instead
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — raise maxIter (graph diameter exceeds it)")
    labels
  }

  /** Dedup decision from near-dup pairs: cluster, keep the minimum id of
    * each component, mark the rest as duplicates. Returns
    * (id, comp, keep). Vertices not in any pair are implicitly kept. */
  def dedupClusters(pairs: DataFrame, col1: String, col2: String): DataFrame =
    connectedComponents(
      pairs.select(col(col1).as("src"), col(col2).as("dst")))
      .withColumn("keep", col("id") === col("comp"))
}
