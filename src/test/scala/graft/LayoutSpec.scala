package graft

import org.apache.spark.sql.functions._
import graft.core.{Layout, Metrics, Tables}

class LayoutSpec extends SparkSpec {

  test("zvalue: bit-interleave semantics and monotone rectangles") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (3L, 5L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // hand-computed Morton codes: x bits at even positions, y at odd
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)
    assert(rows((0L, 1L)) == 2L)
    assert(rows((1L, 1L)) == 3L)
    assert(rows((2L, 0L)) == 4L)
    assert(rows((3L, 5L)) == (1L | 2L | 4L | 32L)) // x=11b, y=101b → 100111b
  }

  test("zvalue/deinterleave round-trip on random 16-bit points") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val back = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y"), 16).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Layout.deinterleave(r.getLong(2), 16)))
    back.foreach { case (x, y, (dx, dy)) =>
      assert((dx, dy) == (x, y), s"round-trip broke at ($x, $y) → ($dx, $dy)")
    }
  }

  test("z-ordered write: a 2-D box reads fewer rows than a single-key sort, same answer") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // both copies: ~12 files of ≤500 rows, so parquet min/max stats are
    // per-file-tight and pruning is observable at fixture scale
    Layout.writeZOrdered(li, s"$tmp/z", col("l_partkey"), col("l_suppkey"),
      bits = 16, parts = 1, maxRecordsPerFile = 500L)
    li.repartitionByRange(1, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").option("maxRecordsPerFile", 500L)
      .parquet(s"$tmp/linear")

    def box(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(1, 12) && col("l_suppkey").between(1, 2))

    // correctness first: layout must never change the answer
    val zRows = box(s"$tmp/z").agg(count(lit(1)), sum(col("l_quantity"))).head
    val lRows = box(s"$tmp/linear").agg(count(lit(1)), sum(col("l_quantity"))).head
    assert(zRows == lRows, s"layouts disagree: $zRows vs $lRows")
    assert(zRows.getLong(0) > 0, "empty box — the fixture no longer covers the test range")

    // the scale claim: the z-layout's per-file rectangles let the box
    // predicate skip most files; the orderkey sort has full-range
    // partkey/suppkey stats in every file and prunes nothing
    val zScan = Metrics.measure(box(s"$tmp/z")).scanRows
    val lScan = Metrics.measure(box(s"$tmp/linear")).scanRows
    val total = li.count()
    assert(lScan == total, s"linear layout unexpectedly pruned: $lScan of $total")
    assert(zScan * 2 <= lScan, s"z-order pruned nothing: $zScan vs $lScan")
  }
}
