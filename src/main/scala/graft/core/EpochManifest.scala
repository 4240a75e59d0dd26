package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Snapshot-isolated epoch store — the commit protocol the persisted
  * IVF-PQ serving index reads through.
  *
  * The plain `epoch=N` dir layout ([[graft.streaming.Jobs.compactEpochStore]])
  * cannot give a CONCURRENT reader isolation: its swap is
  * delete-covered-dirs-then-rename-fold, so a searcher that opened the
  * index just before a compaction reads files that vanish mid-scan.
  * A long-running serving index needs the property real table formats
  * (Iceberg, Delta) are built around: immutable data dirs + an atomic
  * manifest commit + garbage collection that lags live snapshots. This
  * is that idea at the ~100-line scale this engine needs.
  *
  * Layout under `root/`:
  *   d<epoch>-<attempt>/...        immutable data dirs (inner layout free,
  *                                 e.g. list_id=L partitions)
  *   f<epoch>-<attempt>/...        compaction folds (append refuses to
  *                                 replace these — they hold many epochs)
  *   _manifests/m<G>.json          one complete entry list per commit
  *
  * Writer contract: ONE writer process per root at a time. commit() is a
  * read-modify-write of the entry list and generation allocation is
  * last+1 with no lock — two concurrent writers can allocate the same
  * generation and the later rename silently wins (local-FS rename
  * overwrites), losing the other's entries. The shipped flows satisfy
  * this by construction (each store is maintained by one checkpointed
  * streaming query, whose foreachBatch serializes append + compact);
  * multi-writer deployments need a coordination layer, the same contract
  * as Delta on a filesystem without a lock provider.
  *
  * Rules:
  *   - A data dir is VISIBLE iff the highest complete manifest names it.
  *     Manifests are written whole to a tmp path and renamed into place —
  *     rename is atomic on HDFS and local FS, so readers see the old or
  *     the new manifest, never a partial one.
  *   - Committed data dirs are never mutated. A retried epoch writes a
  *     NEW attempt dir and commits a manifest that replaces the epoch's
  *     entry; the orphaned attempt is gc()'d later.
  *   - Compaction writes its fold as a new dir and commits the swap as
  *     ONE manifest. [[gc]] deletes only dirs referenced by NEITHER of
  *     the two most recent manifests — so every dir a reader could have
  *     resolved from the previous manifest survives one full compaction
  *     cycle. A snapshot older than that must reopen (the documented
  *     isolation window; VectorSpec pins both sides of it).
  */
object EpochManifest {

  /** One visible data dir: `dir` is relative to the store root. `lo` is
    * the LOWEST epoch whose rows the dir holds (-1 = just `epoch`, the
    * plain-append case); a compaction fold spans [lo, epoch], and
    * [[append]] keys its must-not-replace guard on that span rather than
    * on the dir-name prefix — coverage travels in the manifest itself,
    * so a store whose fold dirs were written under an older naming
    * scheme is still protected once its NEXT compaction commits. */
  final case class Entry(epoch: Long, dir: String, lo: Long = -1L) {
    /** Lowest covered epoch ([[lo]] defaulted to [[epoch]]). */
    def minEpoch: Long = if (lo < 0L) epoch else lo
  }

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(s"$root/_manifests")

  private def gen(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("m") && n.endsWith(".json"))
      n.stripPrefix("m").stripSuffix(".json").toLongOption
    else None
  }

  /** All complete manifests, ascending by generation. */
  private def manifests(spark: SparkSession, root: String): Seq[(Long, Path)] = {
    val fs = fsOf(spark, root)
    val md = manifestDir(root)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.flatMap(s => gen(s.getPath).map(_ -> s.getPath))
      .sortBy(_._1)
  }

  private def parse(spark: SparkSession, p: Path): Seq[Entry] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      // fixed shape {"epoch":N[,"lo":M],"dir":"..."} written by commit()
      // below — not a general JSON parser, and dir names never contain
      // quotes; "lo" absent (every pre-coverage manifest) defaults to -1
      val e = line.split("\"epoch\":")(1).takeWhile(c => c.isDigit || c == '-').toLong
      val d = line.split("\"dir\":\"")(1).takeWhile(_ != '"')
      val lo =
        if (line.contains("\"lo\":"))
          line.split("\"lo\":")(1).takeWhile(c => c.isDigit || c == '-').toLong
        else -1L
      Entry(e, d, lo)
    }.toSeq
  }

  // ------------------------------------------------------------- tags
  // Named snapshot tags: `_manifests/tags.json` maps name → generation.
  // A tag is a RETENTION ANCHOR — [[gc]] keeps every tagged manifest and
  // the dirs it references alive alongside the two newest, so 'v1' stays
  // readable through any number of later commits and compactions until
  // untagged. Names are [A-Za-z0-9._-]+ (no escaping needed in the
  // fixed-shape JSON); writes are tmp-then-rename like every manifest
  // artifact, under the store's single-writer contract.

  // tags are VERSIONED like the manifests themselves (tags.v<N>.json,
  // highest complete file wins; older versions deleted after the new
  // one lands) — there is never a moment with NO tag file visible, so
  // a concurrent reader (or gc resolving its retention anchors) cannot
  // observe an empty in-between state
  private def tagFiles(spark: SparkSession, root: String): Seq[(Long, Path)] = {
    val fs = fsOf(spark, root)
    val md = manifestDir(root)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("tags.v") && n.endsWith(".json"))
        n.stripPrefix("tags.v").stripSuffix(".json").toLongOption
          .map(_ -> s.getPath)
      else None
    }.sortBy(_._1)
  }

  /** The store's named tags, name → pinned generation. */
  def tags(spark: SparkSession, root: String): Map[String, Long] = {
    val fs = fsOf(spark, root)
    tagFiles(spark, root).lastOption match {
      case None => Map.empty
      case Some((_, p)) =>
        val in = fs.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        body.linesIterator.filter(_.nonEmpty).map { line =>
          // fixed shape {"name":"...","generation":N} per line
          val n = line.split("\"name\":\"")(1).takeWhile(_ != '"')
          val g = line.split("\"generation\":")(1).takeWhile(_.isDigit).toLong
          n -> g
        }.toMap
    }
  }

  private def writeTags(spark: SparkSession, root: String,
                        ts: Map[String, Long]): Unit = {
    val fs = fsOf(spark, root)
    val old = tagFiles(spark, root)
    val next = old.lastOption.map(_._1).getOrElse(0L) + 1L
    val body = ts.toSeq.sortBy(_._1)
      .map { case (n, g) => s"""{"name":"$n","generation":$g}""" }
      .mkString("", "\n", if (ts.isEmpty) "" else "\n")
    val tmp = new Path(manifestDir(root), s".tags.v$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, new Path(manifestDir(root), s"tags.v$next.json")),
      s"tag write rename failed under $root")
    old.foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Pin `name` to a RETAINED `generation` (default: the current one).
    * Re-tagging an existing name moves it. */
  def tag(spark: SparkSession, root: String, name: String,
          generation: Long = -1L): Long = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"tag name '$name' — use [A-Za-z0-9._-]+")
    require(!name.forall(_.isDigit),
      s"tag name '$name' is all digits — VERSION AS OF would read it as " +
        "a generation number, shadowing the tag")
    val ms = manifests(spark, root)
    require(ms.nonEmpty, s"no committed manifest under $root")
    val g = if (generation < 0L) ms.last._1 else generation
    require(ms.exists(_._1 == g),
      s"generation $g not retained under $root — available: " +
        ms.map(_._1).mkString("[", ", ", "]"))
    writeTags(spark, root, tags(spark, root) + (name -> g))
    g
  }

  /** Drop `name`; its generation becomes reclaimable by the next gc
    * (unless it is among the two newest or otherwise tagged). */
  def untag(spark: SparkSession, root: String, name: String): Unit = {
    val ts = tags(spark, root)
    require(ts.contains(name),
      s"no tag '$name' under $root — tags: ${ts.keys.toSeq.sorted}")
    writeTags(spark, root, ts - name)
  }

  /** The current snapshot: entries of the highest complete manifest. */
  def entries(spark: SparkSession, root: String): Seq[Entry] =
    manifests(spark, root).lastOption.map(m => parse(spark, m._2)).getOrElse(Seq.empty)

  /** The RETAINED manifest generations, ascending — the store's time-
    * travel horizon. [[gc]] keeps the two newest manifests (and every
    * dir either references), so after any single commit or compaction
    * the previous generation is still fully resolvable; older ones are
    * gone by design. */
  def generations(spark: SparkSession, root: String): Seq[Long] =
    manifests(spark, root).map(_._1)

  /** Entries of one retained generation — snapshot time travel. Fails
    * loudly for a gc'd (or never-committed) generation rather than
    * answering from a different snapshot. */
  def entriesAt(spark: SparkSession, root: String, generation: Long): Seq[Entry] = {
    val ms = manifests(spark, root)
    val m = ms.find(_._1 == generation).getOrElse(throw new IllegalArgumentException(
      s"generation $generation not retained under $root — " +
        s"available: ${ms.map(_._1).mkString("[", ", ", "]")} (gc keeps the " +
        "two newest manifests; older snapshots are reclaimed by design)"))
    parse(spark, m._2)
  }

  /** Commit a full entry list as the next manifest generation
    * (write-tmp-then-rename — appears atomically or not at all). */
  def commit(spark: SparkSession, root: String, es: Seq[Entry]): Long = {
    val fs = fsOf(spark, root)
    val md = manifestDir(root)
    fs.mkdirs(md)
    val next = manifests(spark, root).lastOption.map(_._1).getOrElse(0L) + 1L
    val body = es.sortBy(_.epoch)
      .map(e => if (e.minEpoch != e.epoch)
        s"""{"epoch":${e.epoch},"lo":${e.minEpoch},"dir":"${e.dir}"}"""
      else s"""{"epoch":${e.epoch},"dir":"${e.dir}"}""")
      .mkString("", "\n", "\n")
    val tmp = new Path(md, s".m$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(md, s"m$next.json")
    require(fs.rename(tmp, dst), s"manifest commit rename $tmp -> $dst failed")
    next
  }

  /** An unused data-dir name for `epoch` (retries bump the attempt). */
  def newDataDir(spark: SparkSession, root: String, epoch: Long): String = {
    val fs = fsOf(spark, root)
    var a = 1
    while (fs.exists(new Path(s"$root/d$epoch-$a"))) a += 1
    s"d$epoch-$a"
  }

  /** An unused FOLD-dir name for `epoch` — the `f` prefix marks an
    * entry that holds MANY folded epochs' rows, which [[append]] must
    * never replace (a retried epoch that replaced a fold would silently
    * discard every earlier epoch the fold covered). */
  def newFoldDir(spark: SparkSession, root: String, epoch: Long): String = {
    val fs = fsOf(spark, root)
    var a = 1
    while (fs.exists(new Path(s"$root/f$epoch-$a"))) a += 1
    s"f$epoch-$a"
  }

  /** Read the snapshot's dirs with epochs ≤ `maxEpoch` — one parquet
    * read per entry (each discovers its OWN inner partition columns, so
    * e.g. list_id pruning stays directory-level), unioned by name. The
    * explicit schema keeps a committed-but-empty epoch dir readable
    * (schema inference has no files to look at there). `asOfGeneration`
    * pins the read to a RETAINED manifest generation ([[generations]]):
    * right after a compaction the previous generation still resolves
    * (gc's two-manifest lag), so an as-of read returns the
    * pre-compaction answer while the live read returns the new one —
    * the audit/debug view every snapshot store owes its operators. */
  def read(spark: SparkSession, root: String, schema: StructType,
           maxEpoch: Long = Long.MaxValue,
           asOfGeneration: Long = -1L): DataFrame = {
    val base = if (asOfGeneration < 0L) entries(spark, root)
      else entriesAt(spark, root, asOfGeneration)
    val live = base.filter(_.epoch <= maxEpoch)
    require(live.nonEmpty,
      s"no committed manifest entries under $root with epoch <= $maxEpoch — " +
        "either the store is empty or a compaction folded the requested " +
        "epochs into a later fold entry (point-in-time reads below a " +
        "compaction boundary are gone by design; raise maxEpoch or " +
        "compact less aggressively)")
    live.map(e => spark.read.schema(schema).parquet(s"$root/${e.dir}"))
      .reduce(_ unionByName _)
  }

  /** Fold every committed entry with epoch < `uptoEpoch` into ONE new
    * data dir and swap it in with a single manifest commit, then gc —
    * the snapshot-isolated compaction every manifest store shares
    * (IVF-PQ codes, text band/shingle, media signatures). Readers
    * holding the pre-compaction manifest keep every dir they resolved
    * ([[gc]]'s two-manifest lag); crash before the commit leaves an
    * orphan fold dir for a later gc and the old manifest fully live. */
  def compact(spark: SparkSession, root: String, schema: StructType,
              uptoEpoch: Long = Long.MaxValue,
              partitionBy: Seq[String] = Nil, coalesceTo: Int = 8): Unit = {
    val es = entries(spark, root)
    val covered = es.filter(_.epoch < uptoEpoch)
    if (covered.size <= 1) return // already compact — makes re-runs no-ops
    val maxCov = covered.map(_.epoch).max
    val folded = covered
      .map(e => spark.read.schema(schema).parquet(s"$root/${e.dir}"))
      .reduce(_ unionByName _)
      .coalesce(coalesceTo)
    val foldDir = newFoldDir(spark, root, maxCov)
    val w = folded.write.mode("overwrite")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .parquet(s"$root/$foldDir")
    commit(spark, root, es.filterNot(_.epoch < uptoEpoch) :+
      Entry(maxCov, foldDir, lo = covered.map(_.minEpoch).min))
    gc(spark, root)
  }

  /** Write a data frame as `epoch`'s attempt dir and commit it as the
    * epoch's (replacement) entry — the shared append step. REFUSES to
    * replace a compaction fold: the fold holds every earlier covered
    * epoch's rows, so "replacing" it with one retried epoch would
    * silently discard all of them. A retry landing on a fold means the
    * compaction boundary overtook the epoch — the caller's sequencing
    * bug, surfaced loudly. Folds are recognized by the manifest-carried
    * coverage span (`Entry.lo` < epoch) with the `f` dir prefix as a
    * second line of defense; a store compacted ONLY by a pre-coverage
    * build (folds named `d<epoch>-<n>`, no `lo` in the manifest) is not
    * detectable from the manifest alone — migrate such a store by
    * running one [[compact]] (which re-commits every fold with its
    * span) before resuming appends against it. */
  def append(df: DataFrame, root: String, epoch: Long,
             partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    guardNotFold(spark, root, epoch)
    val dir = newDataDir(spark, root, epoch)
    val w = df.write.mode("overwrite")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .parquet(s"$root/$dir")
    commitEpochDir(spark, root, epoch, dir)
  }

  /** [[append]]'s fold guard, callable before any files are written —
    * the DSv2 sink checks it at write planning so a doomed job fails
    * before executor work, then again at commit. */
  def guardNotFold(spark: SparkSession, root: String, epoch: Long): Unit =
    entries(spark, root).find(_.epoch == epoch).foreach { e =>
      require(!e.dir.startsWith("f") && e.minEpoch == e.epoch,
        s"epoch $epoch under $root is a compaction fold covering epochs " +
          s"[${e.minEpoch}, ${e.epoch}] — a retried append must not replace it")
    }

  /** [[append]]'s manifest step for writers that land the attempt dir's
    * files themselves (the DSv2 epochstore sink): re-check the fold
    * guard, then commit `dir` as `epoch`'s (replacement) entry. */
  def commitEpochDir(spark: SparkSession, root: String, epoch: Long,
                     dir: String): Unit = {
    guardNotFold(spark, root, epoch)
    val kept = entries(spark, root).filterNot(_.epoch == epoch)
    commit(spark, root, kept :+ Entry(epoch, dir))
    ()
  }

  /** Delete data dirs referenced by NEITHER of the two newest manifests,
    * then manifests older than those two. Called from compaction — never
    * from appends — so between compactions nothing is ever deleted, and
    * across one compaction the previous snapshot's dirs all survive. */
  def gc(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    val ms = manifests(spark, root)
    if (ms.isEmpty) return
    // tagged generations are retention anchors: their manifests and the
    // dirs they reference survive every gc until untagged
    val tagged = tags(spark, root).values.toSet
    val keepManifests =
      ms.takeRight(2) ++ ms.dropRight(2).filter(m => tagged(m._1))
    val keepDirs = keepManifests.flatMap(m => parse(spark, m._2)).map(_.dir).toSet
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory &&
        (s.getPath.getName.startsWith("d") || s.getPath.getName.startsWith("f")))
      .filterNot(s => keepDirs.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, true))
    val keepGen = keepManifests.map(_._1).toSet
    ms.filterNot(m => keepGen.contains(m._1)).foreach(m => fs.delete(m._2, false))
    // a writer that crashed between creating .m<G>.tmp and the rename
    // leaves the tmp behind forever otherwise (gen() filters it from
    // listings, so nothing else ever touches it); under the
    // single-writer contract no live writer's tmp can be here
    fs.listStatus(manifestDir(root)).toSeq
      .filter(_.getPath.getName.endsWith(".tmp"))
      .foreach(s => fs.delete(s.getPath, false))
  }
}
