package graft.core

import org.apache.spark.sql.SparkSession

/** Shared land-once helper for session-scoped artifacts built into temp
  * dirs — the [[Listings]] `landedRun` pattern, factored out after three
  * call sites re-implemented it verbatim (ORC copy, inverted-index
  * store, MV store): a bounded per-(session, key) memo whose eviction
  * deletes the dir ONLY for stopped sessions (a live session's returned
  * DataFrames still scan it — MemoSpec's 5-concurrent-session case),
  * with a per-dir JVM-exit hook as the backstop for entries never
  * evicted (deleteQuietly on an already-evicted dir is a no-op, so the
  * two cleanups coexist). */
object Landed {
  // capacity must exceed the number of live fixture keys per session
  // (~28 as of r18: Landed.dir reads + clonedWh masters) or masters are
  // silently evicted mid-run and rebuilt on next access, negating the
  // land-once amortization; 64 leaves headroom
  private val memo =
    new BoundedMemo[(SparkSession, String), String](64)((k, dir) =>
      if (k._1.sparkContext.isStopped)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit)

  /** The landed dir for (spark, key), running `build(dir)` exactly once
    * per live memo entry. `key` must identify the artifact AND its
    * inputs (e.g. "orc_orders:<sfDir>"); `prefix` names the temp dir. */
  def dir(spark: SparkSession, key: String, prefix: String)
         (build: String => Unit): String =
    memo.get((spark, key)) {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      build(d.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
      d.toString
    }
}
