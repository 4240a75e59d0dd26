package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.EpochManifest

/** SQL DML over the epochstore — the machinery behind `DELETE FROM`,
  * `INSERT OVERWRITE`, `UPDATE` and `MERGE INTO` on
  * [[EpochStoreTable]]:
  *
  *  - [[resolveDelete]] computes the post-delete MANIFEST entry list
  *    for a conjunctive filter: entries whose rows PROVABLY all match
  *    are dropped (metadata-only — partition-dir evaluation, exactly
  *    like scan pruning), entries provably untouched (dir evaluation
  *    or per-file stats sidecars) are kept as-is, and only MIXED
  *    entries are rewritten copy-on-write (their surviving rows land
  *    in a replacement dir at the SAME epoch). The caller publishes
  *    the result as ONE manifest commit, so the delete appears
  *    atomically and the pre-delete snapshot stays readable via the
  *    previous generation — time travel across DML for free.
  *  - [[EpochStoreRowLevelOperation]] is the group-based
  *    (copy-on-write) `SupportsRowLevelOperations` implementation that
  *    Spark's RewriteUpdateTable / RewriteMergeIntoTable /
  *    RewriteDeleteFromTable rules drive: the GROUP is a manifest
  *    entry — the operation's scan skips entries the command's
  *    condition provably cannot touch (recording the KEPT set), the
  *    rewrite reads every row of the kept entries, and the paired
  *    write commits (untouched entries) + (one fold entry holding the
  *    rewritten rows) in one atomic manifest generation, refusing on a
  *    concurrent commit (optimistic concurrency on the pinned
  *    generation).
  *
  * Scale shape: a DELETE/UPDATE aligned with partitions or epochs is
  * metadata-only or rewrites just the affected entries' data; nothing
  * ever rewrites history it can prove untouched, and the single
  * manifest commit keeps readers snapshot-isolated throughout. */
private[graft] object EpochStoreDml {

  /** How old an orphaned `.rlo` staging dir must be before another
    * statement's write planning reclaims it — comfortably longer than
    * any statement this engine runs, so only a crashed driver's leavings
    * qualify (a LIVE concurrent operation keeps its staging dir intact
    * and fails loudly on its own generation check instead). */
  val StagingReclaimAfterMs: Long = 6L * 3600L * 1000L

  /** v1 Filter → Column, for the copy-on-write survivor filter. None =
    * untranslatable (canDeleteWhere / canOverwrite refuse there and
    * Spark falls back to the row-level-operation rewrite). */
  def filterToColumn(f: Filter): Option[Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
      case sources.Or(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
      case sources.Not(c) => filterToColumn(c).map(!_)
      case _ => None
    }
  }

  /** What a conjunctive delete condition PROVABLY does to one entry's
    * rows, from metadata alone (partition-dir values + stats
    * sidecars) — never a file open. */
  sealed trait EntryFate
  /** No row of the entry can match — keep it untouched. */
  case object Untouched extends EntryFate
  /** Every row of the entry matches — drop it from the manifest. */
  case object AllDead extends EntryFate
  /** Unprovable either way — the copy-on-write case. */
  case object Mixed extends EntryFate

  private def filesUnder(fs: org.apache.hadoop.fs.FileSystem,
                         p: Path): Seq[FileStatus] = {
    val (dirs, files) = fs.listStatus(p).toSeq
      .filterNot(s => s.getPath.getName.startsWith("_") ||
        s.getPath.getName.startsWith("."))
      .partition(_.isDirectory)
    files.filter(_.getLen > 0) ++ dirs.flatMap(d => filesUnder(fs, d.getPath))
  }

  private def relIn(fs: org.apache.hadoop.fs.FileSystem, entryPath: String,
                    st: FileStatus): String = {
    val q = fs.makeQualified(new Path(entryPath)).toString
    fs.makeQualified(st.getPath).toString.stripPrefix(q).stripPrefix("/")
  }

  /** Classify one entry against the AND of `filters` — `partFields`
    * are the entry's OWN recorded partition columns in nesting order
    * (entries of an evolved store are classified under their own
    * layout). With no filters nothing is provable → Mixed. */
  def classify(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
               root: String, e: EpochManifest.Entry,
               partFields: Seq[StructField],
               filters: Array[Filter]): EntryFate = {
    if (filters.isEmpty) return Mixed
    val entryPath = s"$root/${e.dir}"
    if (!fs.exists(new Path(entryPath))) return Untouched
    lazy val stats = EpochStoreStats.read(fs, root, e.dir)
    // a file is CLEAN when its stats prove some conjunct unsatisfiable
    def fileClean(st: FileStatus): Boolean =
      stats.get(relIn(fs, entryPath, st)).exists(cs =>
        filters.exists(fl => EpochStoreStats.canMatch(fl, cs).contains(false)))
    // `_epoch` is a per-entry constant (rows of a fold carry the fold's
    // epoch), so it joins the bound map and filters on it — or composite
    // filters mixing it with partition columns — decide HERE: an
    // epoch-aligned DELETE is pure metadata, same as a dir-aligned one
    val epochBound: Map[String, Any] =
      Map(EpochStore.EpochColName -> e.epoch)
    if (partFields.isEmpty) {
      val evals =
        filters.map(fl => EpochStore.evalOnPartitions(fl, epochBound))
      if (evals.exists(_.contains(false))) Untouched
      else if (evals.forall(_.contains(true))) AllDead
      else {
        val fls = filesUnder(fs, new Path(entryPath))
        if (fls.forall(fileClean)) Untouched else Mixed
      }
    } else {
      // enumerate the entry's LEAF dirs (full composite tuples)
      def leafDirs(p: Path, level: Int, bound: Map[String, Any])
          : Seq[(Path, Map[String, Any])] =
        if (level == partFields.length) Seq((p, bound))
        else {
          val f = partFields(level)
          val prefix = s"${f.name}="
          fs.listStatus(p).toSeq
            .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
            .flatMap { sub =>
              val v = EpochStore.parsePartitionValue(
                sub.getPath.getName.stripPrefix(prefix), f.dataType)
              leafDirs(sub.getPath, level + 1, bound + (f.name -> v))
            }
        }
      val subs = leafDirs(new Path(entryPath), 0, epochBound)
      if (subs.isEmpty) return Untouched
      val fates = subs.map { case (p, bound) =>
        val evals = filters.map(fl => EpochStore.evalOnPartitions(fl, bound))
        if (evals.exists(_.contains(false))) 'u'
        else if (evals.forall(_.contains(true))) 'd'
        else if (filesUnder(fs, p).forall(fileClean)) 'u'
        else 'm'
      }
      if (fates.forall(_ == 'u')) Untouched
      else if (fates.forall(_ == 'd')) AllDead
      else Mixed
    }
  }

  /** The post-overwrite entry list for a DYNAMIC `INSERT OVERWRITE`
    * that wrote into `replaced` buckets of a hash-bucket layout: the
    * generic tuple path cannot express "bucket K" as a column filter
    * (many values share a bucket), so survival is resolved on the
    * `<col>_bucket=K` dirs themselves —
    *
    *  - an entry whose bucket dirs are ALL replaced drops;
    *  - one with NO replaced bucket stays untouched;
    *  - a mixed entry carries its kept buckets over by FILE-LEVEL copy
    *    into a replacement dir at the same epoch (no rows decoded —
    *    the kept files, their bloom sidecars, and the stats slice move
    *    as bytes);
    *  - an UNBUCKETED entry (a CoW rewrite's honest downgrade) may hold
    *    any bucket's rows — its survivors are rewritten by the same
    *    pmod(murmur3) predicate the dirs are laid out with.
    *
    * The caller commits the result + the new epoch as ONE manifest
    * generation (refusing on a racing commit), so the overwrite
    * replaces exactly the written buckets — never the whole table. */
  /** PAIR-granular dynamic INSERT OVERWRITE on COMPOSITE
    * identity+bucket layouts: replace exactly the (identity tuple,
    * bucket) PAIRS the batch wrote. `replaced` holds their dir-path
    * prefixes (`date=v/…/col_bucket=K` — the first partLevels+1
    * segments of every committed file, verbatim: both sides came from
    * the same dir encoder, so segment equality IS pair equality).
    * Entries with no dead pair pass through untouched (their dirs
    * byte-identical); all-dead entries drop; mixed entries copy their
    * KEPT files into a replacement dir at the same epoch with sidecars
    * sliced (the schema record verbatim — it carries the layout —
    * stats cut to the kept files, kept blooms copied). An entry holding
    * files OUTSIDE the composite layout refuses loudly: such a file may
    * hold rows of any pair. */
  def resolvePairOverwrite(spark: SparkSession, root: String,
                           partCols: Seq[String],
                           transform: Option[StoreTransform],
                           bucket: Option[EpochStore.StoreBucket],
                           replaced: Set[String])
      : Seq[EpochManifest.Entry] = {
    require(transform.nonEmpty || bucket.nonEmpty,
      "prefix-granular dynamic overwrite needs a transform or bucket level")
    val es = EpochManifest.entries(spark, root)
    if (replaced.isEmpty || es.isEmpty) return es
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val conf = GraftBridge.sessionHadoopConf(spark)
    guardCurrentSpecEntries(spark, fs, root, es, partCols, bucket,
      "dynamic INSERT OVERWRITE")
    // TRANSFORM layouts: dir-prefix survival is only meaningful for
    // entries recorded under the SAME unit function — a days(ts) entry
    // probed with hours(ts) prefixes (or a different truncate width)
    // would silently keep rows of overwritten units. Refuse loudly.
    transform.foreach { t =>
      es.foreach { e =>
        val rt = EpochStoreWrite.readTransformSidecar(fs, root, e.dir)
        require(rt.contains(t),
          s"dynamic INSERT OVERWRITE over $root: entry ${e.dir} " +
            s"records transform ${rt.map(_.spelling).getOrElse("(none)")} " +
            s"but the write lands under ${t.spelling} — run CALL " +
            "compact first")
      }
    }
    val depth = partCols.length + transform.size + bucket.size
    def prefixOf(rel: String): Option[String] = {
      val segs = rel.split('/')
      if (segs.length > depth && segs.take(depth).forall(_.contains("=")))
        Some(segs.take(depth).mkString("/"))
      else None
    }
    es.flatMap { e =>
      val entryPath = new Path(s"$root/${e.dir}")
      val rels: Seq[String] =
        EpochStoreStats.readIndexed(fs, root, e.dir) match {
          case Some(ix) => ix.keys.toSeq.sorted
          case None if fs.exists(entryPath) =>
            val qe = fs.makeQualified(entryPath).toString
            filesUnder(fs, entryPath).map(s =>
              fs.makeQualified(s.getPath).toString
                .stripPrefix(qe).stripPrefix("/"))
          case None => Nil
        }
      val pairs = rels.map(r => r -> prefixOf(r))
      require(pairs.forall(_._2.nonEmpty),
        s"dynamic INSERT OVERWRITE over composite store $root: entry " +
          s"${e.dir} holds files outside the identity+bucket layout — " +
          "run CALL compact first")
      val (dead, kept) = pairs.partition { case (_, p) => p.exists(replaced) }
      if (dead.isEmpty) Some(e)
      else if (kept.isEmpty) None
      else {
        val dir2 =
          if (e.minEpoch < e.epoch)
            EpochManifest.newFoldDir(spark, root, e.epoch)
          else EpochManifest.newDataDir(spark, root, e.epoch)
        val dst = new Path(s"$root/$dir2")
        fs.mkdirs(dst)
        kept.foreach { case (rel, _) =>
          val d = new Path(dst, rel)
          fs.mkdirs(d.getParent)
          org.apache.hadoop.fs.FileUtil.copy(fs,
            new Path(entryPath, rel), fs, d, false, conf)
        }
        val sc = new Path(entryPath, "_schema.json")
        if (fs.exists(sc))
          org.apache.hadoop.fs.FileUtil.copy(fs, sc, fs,
            new Path(dst, "_schema.json"), false, conf)
        val keptSet = kept.map(_._1).toSet
        EpochStoreStats.readIndexed(fs, root, e.dir).foreach { stats =>
          EpochStoreStats.write(fs, root, dir2,
            stats.toSeq.filter { case (rel, _) => keptSet(rel) })
        }
        val skip = new Path(entryPath, "_skip")
        if (fs.exists(skip)) {
          def walk(p: Path): Seq[FileStatus] =
            fs.listStatus(p).toSeq.flatMap(s =>
              if (s.isDirectory) walk(s.getPath) else Seq(s))
          val qskip = fs.makeQualified(skip).toString
          walk(skip).filter(_.getPath.getName.endsWith(".bloom"))
            .foreach { s =>
              val rel = fs.makeQualified(s.getPath).toString
                .stripPrefix(qskip).stripPrefix("/")
              if (keptSet(rel.stripSuffix(".bloom"))) {
                val d = new Path(s"$root/$dir2/_skip/$rel")
                fs.mkdirs(d.getParent)
                org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath,
                  fs, d, false, conf)
              }
            }
        }
        Some(e.copy(dir = dir2))
      }
    }
  }

  /** SPEC-EVOLVED stores (X92): the composite-pair and bucket dynamic
    * overwrites above/below resolve entry survival by LITERAL dir-prefix
    * / bucket-id match — meaningful only for entries RECORDED under the
    * CURRENT layout. A foreign-spec entry (pre-`evolve_layout` bucket
    * count, or different identity/bucket columns) would either match a
    * written prefix spuriously (`id_bucket=3` of 4 vs of 8 — its
    * never-overwritten rows silently drop) or never match (its rows of
    * overwritten pairs silently survive as duplicates). Refuse loudly
    * instead — exactly like `$partitions` does — until the store is
    * normalized. Zero cost for never-evolved stores (no layout log →
    * one directory probe, no sidecar reads). */
  private def guardCurrentSpecEntries(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      es: Seq[EpochManifest.Entry], partCols: Seq[String],
      bucket: Option[EpochStore.StoreBucket], op: String): Unit = {
    if (EpochManifest.currentLayout(spark, root).isEmpty) return
    es.foreach { e =>
      val rec = EpochStoreWrite.readSchemaSidecar(fs, root, e.dir)
        .map(r => EpochStore.splitPartCols(r._2)).getOrElse(partCols)
      val rb = EpochStoreWrite.readBucketSidecar(fs, root, e.dir)
      def render(pc: Seq[String], bk: Option[EpochStore.StoreBucket]) =
        (pc ++ bk.map(b => s"bucket(${b.n}, ${b.col})")).mkString(", ")
      require(rec == partCols && rb == bucket,
        s"$op over $root: entry ${e.dir} is recorded under partition " +
          s"spec (${render(rec, rb)}) but the current layout is " +
          s"(${render(partCols, bucket)}) — dynamic overwrite survival " +
          "is resolved on the current layout's dirs; run CALL " +
          "migrate_layout or compact first")
    }
  }

  def resolveBucketOverwrite(spark: SparkSession, root: String,
                             b: EpochStore.StoreBucket,
                             replaced: Set[Int]): Seq[EpochManifest.Entry] = {
    import org.apache.spark.sql.functions.{col, expr, not}
    val es = EpochManifest.entries(spark, root)
    if (replaced.isEmpty || es.isEmpty) return es
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val conf = GraftBridge.sessionHadoopConf(spark)
    guardCurrentSpecEntries(spark, fs, root, es, Nil, Some(b),
      "dynamic INSERT OVERWRITE")
    es.flatMap { e =>
      val entryPath = new Path(s"$root/${e.dir}")
      if (!fs.exists(entryPath)) Some(e)
      else {
        val subs = fs.listStatus(entryPath).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(b.dirPrefix))
        if (subs.nonEmpty) {
          val (dead, kept) = subs.partition(s =>
            s.getPath.getName.stripPrefix(b.dirPrefix).toIntOption
              .exists(replaced))
          if (dead.isEmpty) Some(e)
          else if (kept.isEmpty) None
          else {
            val dir2 =
              if (e.minEpoch < e.epoch)
                EpochManifest.newFoldDir(spark, root, e.epoch)
              else EpochManifest.newDataDir(spark, root, e.epoch)
            val dst = new Path(s"$root/$dir2")
            fs.mkdirs(dst)
            val keptNames = kept.map(_.getPath.getName).toSet
            kept.foreach(s => org.apache.hadoop.fs.FileUtil.copy(
              fs, s.getPath, fs, new Path(dst, s.getPath.getName),
              false, conf))
            // sidecars ride along: the schema record verbatim, the
            // stats sidecar sliced to the kept files, kept blooms copied
            val sc = new Path(entryPath, "_schema.json")
            if (fs.exists(sc))
              org.apache.hadoop.fs.FileUtil.copy(fs, sc, fs,
                new Path(dst, "_schema.json"), false, conf)
            val keptRel: String => Boolean =
              rel => rel.split('/').headOption.exists(keptNames)
            // slice only when the SOURCE had a sidecar: an empty sidecar
            // is now an authoritative "no files" index
            // ([[EpochStoreStats.readIndexed]]) — writing one for a
            // pre-index entry would plan its copied rows away
            EpochStoreStats.readIndexed(fs, root, e.dir).foreach { stats =>
              EpochStoreStats.write(fs, root, dir2,
                stats.toSeq.filter { case (rel, _) => keptRel(rel) })
            }
            val skip = new Path(entryPath, "_skip")
            if (fs.exists(skip)) {
              def walk(p: Path): Seq[FileStatus] =
                fs.listStatus(p).toSeq.flatMap(s =>
                  if (s.isDirectory) walk(s.getPath) else Seq(s))
              val qskip = fs.makeQualified(skip).toString
              walk(skip)
                .filter(_.getPath.getName.endsWith(".bloom"))
                .foreach { s =>
                  val rel = fs.makeQualified(s.getPath).toString
                    .stripPrefix(qskip).stripPrefix("/")
                  if (keptRel(rel)) {
                    val d = new Path(s"$root/$dir2/_skip/$rel")
                    fs.mkdirs(d.getParent)
                    org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath,
                      fs, d, false, conf)
                  }
                }
            }
            Some(e.copy(dir = dir2))
          }
        } else if (filesUnder(fs, entryPath).isEmpty) Some(e)
        else {
          // unbucketed entry: rows of any bucket may live here — keep
          // the rows whose bucket is NOT replaced, by the layout's hash
          val (schema, pc) = EpochStoreWrite.readSchemaSidecar(fs, root, e.dir)
            .getOrElse(throw new IllegalStateException(
              s"dynamic INSERT OVERWRITE over bucket store $root: entry " +
                s"${e.dir} predates schema records — compact the store first"))
          val surv = spark.read.schema(schema).parquet(s"$root/${e.dir}")
            .filter(not(expr(s"pmod(hash(`${b.col}`), ${b.n})")
              .isin(replaced.toSeq: _*)))
          val dir2 =
            if (e.minEpoch < e.epoch)
              EpochManifest.newFoldDir(spark, root, e.epoch)
            else EpochManifest.newDataDir(spark, root, e.epoch)
          surv.write.mode("overwrite").parquet(s"$root/$dir2")
          EpochStoreWrite.writeSchemaSidecar(fs, root, dir2, schema,
            EpochStore.splitPartCols(pc))
          val kinds = EpochStoreStats.read(fs, root, e.dir).valuesIterator
            .flatMap(_.cols.toSeq)
            .map { case (c, cs) => (c, if (cs.kind == 's') 'S' else cs.kind) }
            .toSeq.distinct.filter(k => schema.fieldNames.contains(k._1))
          EpochStore.rederiveStats(spark, fs, root, dir2, schema, kinds)
          Some(e.copy(dir = dir2))
        }
      }
    }
  }

  /** The post-delete entry list for `DELETE WHERE and(filters)`:
    * untouched entries pass through, all-dead entries drop, mixed
    * entries are rewritten copy-on-write (survivors = rows where the
    * condition is not TRUE — SQL DELETE keeps null-evaluating rows) to
    * a replacement dir at the same epoch, schema sidecar preserved.
    * The CALLER commits the returned list (one atomic manifest
    * generation); an abandoned rewrite dir is just an uncommitted
    * orphan for the next gc. */
  def resolveDelete(spark: SparkSession, root: String,
                    filters: Array[Filter]): Seq[EpochManifest.Entry] = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val es = EpochManifest.entries(spark, root)
    if (filters.isEmpty || es.isEmpty) return es
    if (filters.exists { case sources.AlwaysFalse() => true; case _ => false })
      return es
    if (filters.forall { case sources.AlwaysTrue() => true; case _ => false })
      return Seq.empty
    // RENAMED store with live pre-rename entries: the per-entry binding
    // below speaks each entry's recorded (physical) names — a logical
    // condition on a renamed column would bind null in those entries
    // and silently keep their matching rows. SQL DELETE routes to the
    // alias-aware row-level rewrite (canDeleteWhere); the static
    // filtered INSERT OVERWRITE refuses loudly here instead. The gate
    // is liveAliasNeed, NOT the immutable ops log: once CALL compact
    // rewrites every entry to the current names the binding is sound
    // again and the path reopens, as the message promises.
    require(!EpochStore.liveAliasNeed(spark, root),
      s"filtered overwrite/delete on $root: live entries still serve " +
        "columns under pre-RENAME names — run CALL compact to rewrite " +
        "them to the current names first")
    // X94: the CoW rewrite reads survivor rows RAW — live position
    // deletes would resurrect in the rewritten dirs
    EpochStoreDv.guardNoLiveDvs(spark, root, "metadata-path DELETE")
    val cond = filters.map(f => filterToColumn(f).getOrElse(
      throw new IllegalArgumentException(
        s"epochstore DELETE cannot translate filter $f"))).reduce(_ && _)
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // a column ADDED with a DEFAULT serves its EXISTENCE default for
    // files that predate it — the per-entry binding below must agree
    // with what the scan serves, or `DELETE WHERE added = default`
    // silently keeps the rows it shows. Absent records (pre-evolution
    // stores, where ALTER is refused anyway) mean no defaults exist.
    val existsDefaults: Map[String, (String, org.apache.spark.sql.types
      .DataType)] =
      (try EpochStore.evolvedSchema(spark, root)._1.fields.toSeq
       catch { case _: IllegalArgumentException => Nil })
        .filter(_.metadata.contains("EXISTS_DEFAULT"))
        .map(f => f.name ->
          (f.metadata.getString("EXISTS_DEFAULT"), f.dataType)).toMap
    es.flatMap { e =>
      val rec = EpochStoreWrite.readSchemaSidecar(fs, root, e.dir)
      val pf = rec.toSeq.flatMap { case (s, pc) =>
        EpochStore.splitPartCols(pc).map(c => s(c)) }
      classify(spark, fs, root, e, pf, filters) match {
        case Untouched => Some(e)
        case AllDead => None
        case Mixed =>
          val (schema, pc) = rec.getOrElse(throw new IllegalStateException(
            s"DELETE over $root: entry ${e.dir} predates schema records and " +
              "its rows cannot be proven untouched — compact the store first"))
          // the condition may reference columns this (older) entry's
          // schema lacks — `_epoch` binds to the entry's constant, an
          // evolved-away column to null (exactly what its rows serve)
          val present = schema.fieldNames.toSet
          val bound = filters.flatMap(_.references).distinct
            .filterNot(present)
            .foldLeft(spark.read.schema(schema).parquet(s"$root/${e.dir}")) {
              (d, c) =>
                if (c == EpochStore.EpochColName) d.withColumn(c, lit(e.epoch))
                else existsDefaults.get(c) match {
                  // the value this entry's rows actually SERVE for the
                  // evolved-added column
                  case Some((sql, dt)) => d.withColumn(c,
                    org.apache.spark.sql.functions.expr(sql).cast(dt))
                  case None => d.withColumn(c, lit(null))
                }
            }
          val surv = bound.filter(not(coalesce(cond, lit(false))))
            .select(schema.fieldNames.map(
              org.apache.spark.sql.functions.col): _*)
          val dir2 =
            if (e.minEpoch < e.epoch) EpochManifest.newFoldDir(spark, root, e.epoch)
            else EpochManifest.newDataDir(spark, root, e.epoch)
          val w = surv.write.mode("overwrite")
          val pcs = EpochStore.splitPartCols(pc)
          (if (pcs.isEmpty) w else w.partitionBy(pcs: _*))
            .parquet(s"$root/$dir2")
          EpochStoreWrite.writeSchemaSidecar(fs, root, dir2, schema, pcs)
          // keep file skipping alive across the rewrite: re-derive every
          // stat the ORIGINAL entry declared — strings included, now that
          // both sides compare under UTF-8 binary order (blooms still
          // drop honestly — the documented always-keep fallback)
          val kinds = EpochStoreStats.read(fs, root, e.dir).valuesIterator
            .flatMap(_.cols.toSeq)
            // legacy 's' re-derives as 'S' (Spark min/max = UTF-8 order)
            .map { case (c, cs) => (c, if (cs.kind == 's') 'S' else cs.kind) }
            .toSeq.distinct.filter(k => present.contains(k._1))
          EpochStore.rederiveStats(spark, fs, root, dir2, schema, kinds)
          Some(e.copy(dir = dir2))
      }
    }
  }
}

/** Group-based (copy-on-write) row-level operation over the store: the
  * GROUP is a manifest entry. Spark's UPDATE / MERGE / DELETE rewrites
  * drive this when a metadata-only delete is impossible:
  * [[newScanBuilder]] pins the CURRENT generation and skips entries the
  * command's pushed condition provably cannot touch (recording the kept
  * set — the groups to replace); the paired [[EpochStoreReplaceWrite]]
  * reads back that set at commit and publishes (untouched entries) +
  * (one fold entry with the rewritten rows) as one atomic manifest
  * generation. A commit that observes a DIFFERENT live generation than
  * the one the scan pinned refuses — optimistic concurrency, never a
  * lost update. */
final class EpochStoreRowLevelOperation(
    tableSchema: StructType, tableOptions: CaseInsensitiveStringMap,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  require(tableOptions.get("asOfGeneration") == null,
    "cannot UPDATE/MERGE/DELETE a time-traveled epochstore table — " +
      "drop VERSION AS OF")
  require(tableOptions.get("branch") == null,
    "cannot UPDATE/MERGE/DELETE a branch-pinned epochstore table — " +
      "branches take epoch appends; publish, then mutate main")

  private[sources] val root: String = EpochStore.rootOf(tableOptions)
  private[sources] val partCols: Seq[String] =
    EpochStore.partColsOf(tableOptions)

  private[sources] val generation: Long = {
    val spark = SparkSession.active
    val gens = EpochManifest.generations(spark, root)
    require(gens.nonEmpty, s"no committed manifest under $root")
    gens.last
  }
  private[sources] val pinned: Seq[EpochManifest.Entry] =
    EpochManifest.entriesAt(SparkSession.active, root, generation)

  /** The entries whose rows the rewrite READS — set by the scan
    * builder at build time, consumed by the write at commit: exactly
    * the groups the commit replaces. Defaults to everything (a write
    * planned without a scan-side proof replaces the whole table). */
  @volatile private[sources] var kept: Seq[EpochManifest.Entry] = pinned

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"epochstore $cmd gen=$generation ($root)"

  /** Require the `_epoch` metadata column: this routes Spark's
    * ReplaceData through the metadata-projecting write task, whose
    * contract hands the writer a PROJECTED data row (without it, the
    * raw rewrite row — `__row_operation` included — reaches the sink
    * unprojected). The writer ignores the metadata row itself
    * ([[EpochStoreDataWriter]]'s two-arg write). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(EpochStore.EpochColName))

  /** The rewrite's read half: the normal pinned scan, with two
    * group-contract deviations ([[EpochStoreScanBuilder]]'s `rlo`
    * mode) — pushed filters prune WHOLE entries only (a group must be
    * read in full once any of its rows might match), and runtime
    * filtering is off (a runtime-narrowed read would desynchronize
    * from what the commit replaces). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EpochStoreScanBuilder(tableSchema, tableOptions, rlo = this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val op = this
    // X94 — guarded HERE, not at construction: Spark builds the
    // row-level operation during analysis even for statements the
    // metadata-only delete path later takes over; only a write that
    // actually PLANS re-homes kept groups' files and must refuse while
    // position deletes target them
    EpochStoreDv.guardNoLiveDvs(SparkSession.active, root,
      "row-level rewrite")
    new WriteBuilder {
      override def build(): Write = new Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // cluster by the partition dir column so the rewrite lands one
        // file per (task, value) with values collected per task
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (partCols.nonEmpty)
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(partCols.map(c =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .identity(c))
                .toArray[org.apache.spark.sql.connector.expressions.Expression])
          else
            org.apache.spark.sql.connector.distributions.Distributions
              .unspecified()
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        override def toBatch: BatchWrite =
          new EpochStoreReplaceWrite(op, info.schema(), info.queryId())
      }
    }
  }
}

/** The write half of a group-based row-level operation: tasks stage the
  * rewritten rows under `.rlo<queryId>`; commit renames the staging dir
  * to a FOLD entry spanning the kept entries' epoch range and publishes
  * (pinned minus kept) + that entry atomically. Fold naming keeps the
  * append-retry guard protecting it ([[EpochManifest.guardNotFold]]). */
final class EpochStoreReplaceWrite(op: EpochStoreRowLevelOperation,
                                   schema: StructType, queryId: String)
    extends BatchWrite {

  private def staging = s"${op.root}/.rlo$queryId"

  /** Sidecars the fold KEEPS writing: per-file stats for every column
    * any pinned entry declared (kind re-resolved from the write schema)
    * and blooms on the store's declared column — a DML rewrite must not
    * degrade file skipping on the data it carries over. */
  private def statsColsOf(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem): Seq[(String, Char)] = {
    val declared = op.pinned.flatMap(e =>
      EpochStoreStats.read(fs, op.root, e.dir).valuesIterator
        .flatMap(_.cols.keysIterator)).toSet
    schema.fields.toSeq
      .filter(f => declared(f.name) && !op.partCols.contains(f.name))
      .flatMap { f =>
        import org.apache.spark.sql.types._
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(f.name -> 'l')
          case FloatType | DoubleType => Some(f.name -> 'd')
          case StringType => Some(f.name -> 'S')
          case _ => None
        }
      }
  }

  private def bloomOf(spark: SparkSession): Option[BloomSpec] =
    BloomSpec.declared(spark, op.root).flatMap { c =>
      import org.apache.spark.sql.types._
      schema.fields.find(_.name == c)
        .filter(f => Set[DataType](ByteType, ShortType, IntegerType,
          LongType, StringType)(f.dataType) && !op.partCols.contains(c))
        .map(_ => BloomSpec(c, 100000L, 0.03))
    }

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val spark = SparkSession.active
    val fs = new Path(op.root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // reclaim ABANDONED .rlo staging dirs (a crashed driver's query id
    // never repeats, so own-id cleanup alone would leak them forever) —
    // but only ones old enough that no live statement can still be
    // writing into them: deleting a CONCURRENT operation's staging dir
    // would let that op commit a fold silently missing its task files
    // (its pinned-generation check sees nothing wrong), turning the
    // loud optimistic-concurrency failure into quiet row loss
    if (fs.exists(new Path(op.root))) {
      val cutoff = System.currentTimeMillis() - EpochStoreDml.StagingReclaimAfterMs
      fs.listStatus(new Path(op.root)).toSeq
        .filter(s => s.getPath.getName.startsWith(".rlo") &&
          s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, true))
    }
    new EpochStoreWriterFactory(staging, schema, op.partCols,
      EpochStoreBatchWrite.primedConf(spark, schema, op.partCols),
      bloomOf(spark), statsColsOf(spark, fs))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new Path(op.root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val epoch =
      if (op.kept.nonEmpty) op.kept.map(_.epoch).max
      else op.pinned.map(_.epoch).maxOption.getOrElse(-1L) + 1L
    val lo =
      if (op.kept.nonEmpty) math.min(op.kept.map(_.minEpoch).min, epoch)
      else epoch
    val dir = EpochManifest.newFoldDir(spark, op.root, epoch)
    EpochStoreWrite.pruneToCommitted(fs, new Path(staging), messages)
    if (fs.exists(new Path(staging)))
      require(fs.rename(new Path(staging), new Path(s"${op.root}/$dir")),
        s"epochstore replace rename $staging -> ${op.root}/$dir failed")
    else fs.mkdirs(new Path(s"${op.root}/$dir")): Unit
    // quality gate: an UPDATE/MERGE whose rewritten rows violate a
    // declared CHECK fails HERE with the pre-statement state intact
    EpochStoreConstraints.enforce(spark, op.root, s"${op.root}/$dir", schema)
    EpochStoreStats.write(fs, op.root, dir,
      messages.collect { case m: EpochFilesWritten => m.fileStats }
        .flatten.toSeq)
    EpochStoreWrite.writeSchemaSidecar(fs, op.root, dir, schema, op.partCols)
    // OCC commit, strict on the pinned snapshot: the WHERE was
    // evaluated against op.pinned, so ANY touched pinned entry is a
    // serializability conflict (loud refusal); appends that landed
    // ABOVE the fold span commute and both statements land
    EpochManifest.commitWith(spark, op.root)(EpochManifest.rebaseFold(
      op.pinned, op.kept, EpochManifest.Entry(epoch, dir, lo = lo),
      strictBase = true))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new Path(op.root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    fs.delete(new Path(staging), true): Unit
  }
}

/** Builder indirection required by the SupportsRowLevelOperations
  * contract — one operation instance per planned command. */
final class EpochStoreRowLevelOperationBuilder(
    tableSchema: StructType, tableOptions: CaseInsensitiveStringMap,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new EpochStoreRowLevelOperation(tableSchema, tableOptions, info.command())
}
