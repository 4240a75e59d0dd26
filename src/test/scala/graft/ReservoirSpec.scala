package graft

import org.apache.spark.sql.functions._
import graft.plans.ReservoirSampleAgg.reservoirSample

class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  test("small groups pass through complete and exact") {
    val df = Seq((1, 10L), (1, 20L), (2, 30L)).toDF("g", "v")
    val got = df.groupBy("g").agg(reservoirSample(col("v"), 5).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    assert(got(1) == Set(10L, 20L))
    assert(got(2) == Set(30L))
  }

  test("large groups cap at k with elements drawn from the group") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val out = li.groupBy("l_returnflag")
      .agg(reservoirSample(col("l_orderkey"), 10).as("s"))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val s = r.getSeq[Long](1)
      assert(s.length == 10)
      assert(s.distinct.length >= 1)
    }
    // membership: sampled ids exist under that flag
    val flags = li.select("l_returnflag", "l_orderkey").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    out.foreach { r =>
      val f = r.getString(0)
      r.getSeq[Long](1).foreach(id => assert(flags.contains((f, id))))
    }
  }

  test("fixed partitioning + seed reproduces exactly") {
    val df = spark.range(10000).select((col("id") % 4).as("g"), col("id").as("v"))
      .repartition(1)
    def run() = df.groupBy("g").agg(reservoirSample(col("v"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(run() == run())
  }

  test("sample is roughly uniform (chi-square-ish sanity)") {
    // 100 runs sampling 10 of 0..99 with varying seeds → each decade
    // should appear, no hot decade
    val df = spark.range(100).select(lit(1).as("g"), col("id").as("v")).repartition(1)
    val counts = new Array[Int](10)
    (1 to 50).foreach { s =>
      df.groupBy("g").agg(reservoirSample(col("v"), 10, seed = s.toLong).as("smp"))
        .head.getSeq[Long](1).foreach(v => counts((v / 10).toInt) += 1)
    }
    assert(counts.forall(_ > 10), counts.mkString(","))  // every decade sampled
    assert(counts.max < 150, counts.mkString(","))        // no pathological skew
  }
}
