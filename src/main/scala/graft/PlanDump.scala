package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named catalog queries to files —
  * the optimization rounds' evidence trail (`plans/r<N>/<query>_before/
  * _after.txt`). Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <query> [query ...]"
  *
  * writes `<outDir>/<query>_<suffix>.txt` per query. The session is
  * built from `Bench.sessionBuilder` — the SAME recipe, join configs
  * included — so the dumped initial plans correspond to what the bench
  * executes (r18's copy diverged: it omitted the SHJ preference and
  * could dump SortMergeJoin where Bench ran ShuffledHashJoin). Queries whose
  * builder runs a store lifecycle execute it; the dumped plan is the
  * query's returned frame — exactly what the bench times through the
  * noop sink.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Bench.sessionBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.silenceBenignStreamingTermination()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] no such query: $n")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
            df.explain("formatted")
          }
          val p = java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt")
          java.nio.file.Files.write(p, out.toByteArray)
          System.err.println(s"[plandump] wrote $p")
      }
    }
    spark.stop()
  }
}
