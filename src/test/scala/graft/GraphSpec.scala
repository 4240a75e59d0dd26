package graft

import org.apache.spark.sql.functions._
import graft.functions.Graph
import graft.queries.TextCatalog

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connected components on a known graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (8L, 9L), (9L, 10L))
      .toDF("src", "dst")
    val comp = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L))
  }

  test("long chain converges (diameter > 1 iteration)") {
    val edges = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Graph.connectedComponents(edges).select("comp").distinct().collect()
    assert(comp.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("dedup clusters keep exactly one representative per component") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("d1", "d2")
    val d = Graph.dedupClusters(pairs, "d1", "d2").collect()
    val byComp = d.groupBy(_.getLong(1))
    byComp.foreach { case (comp, rows) =>
      assert(rows.count(_.getBoolean(2)) == 1)      // one keeper
      assert(rows.find(_.getBoolean(2)).get.getLong(0) == comp) // it's the min
    }
  }

  test("corpus dedup clusters are consistent with the LSH pairs") {
    val pairs = TextCatalog.minhashLsh(spark, sf0001)
      .select(col("d1"), col("d2"))
    val nVerts = pairs.select(explode(array(col("d1"), col("d2"))).as("v"))
      .distinct().count()
    val clusters = TextCatalog.dedupClustersQ(spark, sf0001).collect()
    assert(clusters.map(_.getAs[Long]("cluster_size")).sum == nVerts)
    // every cluster drops size-1 docs
    clusters.foreach { r =>
      assert(r.getAs[Long]("n_dropped") == r.getAs[Long]("cluster_size") - 1)
    }
  }
}
