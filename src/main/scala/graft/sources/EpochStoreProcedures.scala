package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.core.EpochManifest

/** The store catalog's SQL `CALL` surface (Spark 4's ProcedureCatalog —
  * the maintenance tier Iceberg exposes the same way):
  *
  *   CALL cat.system.snapshots('t')                 -- retained generations
  *   CALL cat.system.compact('t', sort_columns => 'id', parts => 2)
  *   CALL cat.system.gc('t')                        -- reclaim unreferenced dirs
  *   CALL cat.system.purge_deletes('t', 'id')       -- fold tombstones physically
  *   CALL cat.system.evolve_layout('t', bucket_column => 'id',
  *                                 bucket_count => 16)  -- metadata-only spec change
  *   CALL cat.system.migrate_layout('t', …)         -- the physical rewrite form
  *
  * Each procedure resolves `table` against the catalog's warehouse,
  * drives the SAME engine entry points the APIs expose
  * ([[EpochStore.compactStore]], [[EpochManifest.gc]],
  * [[EpochStore.purgeDeletes]]) — so SQL-only operators can run the
  * full store lifecycle — and returns a small result-set row (via
  * [[LocalScan]]) so the effect is observable in the CALL's own output.
  * Maintenance keeps every documented isolation contract: compaction
  * and purge are one-manifest-commit swaps, gc honors the two-manifest
  * retention lag. */
private[sources] object EpochStoreProcedures {

  val names: Seq[String] =
    Seq("snapshots", "partitions", "compact", "rewrite_data_files",
      "migrate_layout", "evolve_layout", "restore_snapshot", "gc",
      "remove_orphan_files",
      "expire_snapshots",
      "purge_deletes", "tag", "untag", "tags", "add_constraint",
      "drop_constraint", "constraints", "create_branch", "publish_branch",
      "drop_branch", "branches")

  private def spark = SparkSession.active

  private def str(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) null else row.getUTF8String(i).toString

  private def result(schema: StructType, out: Array[InternalRow])
      : java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = out
      override def readSchema(): StructType = schema
    }).iterator()

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  /** A no-frills procedure: unbound == bound (the parameter list is
    * static; Spark's analyzer coerces arguments to the declared
    * types). */
  private abstract class Proc(procName: String,
                              params: Array[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
  }

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("store name within this catalog's warehouse").build()

  def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"epochstore procedures live under <catalog>.system, got " +
        s"${ident.namespace().mkString(".")}.${ident.name()}")
    def rootOf(table: String): String = {
      val segs = table.split('.').toSeq
      segs.foreach(s => require(s.nonEmpty && s != "." && s != ".." &&
        !s.contains('/') && !s.contains('\\'),
        s"procedure table argument '$table' must name a store INSIDE " +
          "this catalog's warehouse — path segments cannot be empty, " +
          "'..', or contain separators"))
      (warehouse +: segs).mkString("/")
    }
    ident.name() match {

      case "snapshots" => new Proc("snapshots", Array(tableParam)) {
        override def description(): String =
          "retained manifest generations of a store: (generation, " +
            "committed_at, entries, max_epoch) — committed_at is the " +
            "instant TIMESTAMP AS OF resolves against"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val instants = EpochManifest.snapshots(spark, root).toMap
          val out = EpochManifest.generations(spark, root).map { g =>
            val es = EpochManifest.entriesAt(spark, root, g)
            row(g, instants.getOrElse(g, 0L) * 1000L, es.size,
              es.map(_.epoch).maxOption.getOrElse(-1L))
          }
          result(StructType(Seq(
            StructField("generation", LongType, nullable = false),
            StructField("committed_at",
              org.apache.spark.sql.types.TimestampType, nullable = false),
            StructField("entries", IntegerType, nullable = false),
            StructField("max_epoch", LongType, nullable = false))),
            out.toArray)
        }
      }

      case "rewrite_data_files" => new Proc("rewrite_data_files", Array(
        tableParam,
        ProcedureParameter.in("target_mb", LongType)
          .defaultValue("128")
          .comment("bin-pack small entries toward this file size").build(),
        ProcedureParameter.in("min_entries", IntegerType)
          .defaultValue("2")
          .comment("shortest adjacent small-entry run worth folding")
          .build())) {
        override def description(): String =
          "selective small-file maintenance: bin-pack adjacent SMALL " +
            "entries (sizes from the file-level index, zero listing) " +
            "into one fold each, leaving big entries untouched — the " +
            "streaming-ingest counterpart to compact"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val before = EpochManifest.entries(spark, root).size
          val runs = EpochStore.rewriteDataFiles(spark, root,
            targetBytes = input.getLong(1) * 1024L * 1024L,
            minEntries = input.getInt(2))
          result(StructType(Seq(
            StructField("runs_folded", IntegerType, nullable = false),
            StructField("entries_before", IntegerType, nullable = false),
            StructField("entries_after", IntegerType, nullable = false))),
            Array(row(runs, before,
              EpochManifest.entries(spark, root).size)))
        }
      }

      case "restore_snapshot" => new Proc("restore_snapshot", Array(
        tableParam,
        ProcedureParameter.in("generation", LongType)
          .defaultValue("-1")
          .comment("retained manifest generation to restore " +
            "(or pass a tag)").build(),
        ProcedureParameter.in("tag", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("named tag to restore (alternative to generation)")
          .build())) {
        override def description(): String =
          "make a retained older generation the current head again — " +
            "one manifest commit, no data moves, the rolled-back " +
            "commits stay time-travelable until gc. Restores DATA " +
            "commits only: on a row-identity store, keyed-DELETE " +
            "tombstones journaled after the restored generation STILL " +
            "APPLY to latest-wins reads (the live_tombstones result " +
            "column reports how many; purge_deletes clears the journal)"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val tag = Option(str(input, 2)).map(_.trim).filter(_.nonEmpty)
          val gen = (input.getLong(1), tag) match {
            case (g, None) if g >= 0L => g
            case (-1L, Some(t)) =>
              EpochManifest.tags(spark, root).getOrElse(t,
                throw new IllegalArgumentException(
                  s"no tag '$t' on $root — tags: " +
                    EpochManifest.tags(spark, root).keys.toSeq.sorted
                      .mkString(", ")))
            case _ => throw new IllegalArgumentException(
              "restore_snapshot takes EITHER generation OR tag")
          }
          val newHead = EpochStore.restoreSnapshot(spark, root, gen)
          // the divergence from Delta RESTORE the scaladoc documents,
          // surfaced at the call site: a non-zero count means the
          // delete journal still suppresses restored rows
          val liveTombstones = EpochStore.liveDeleteJournalRows(spark, root)
          result(StructType(Seq(
            StructField("restored_generation", LongType, nullable = false),
            StructField("new_head_generation", LongType, nullable = false),
            StructField("entries", IntegerType, nullable = false),
            StructField("live_tombstones", LongType, nullable = false))),
            Array(row(gen, newHead,
              EpochManifest.entriesAt(spark, root, newHead).size,
              liveTombstones)))
        }
      }

      case "migrate_layout" => new Proc("migrate_layout", Array(
        tableParam,
        ProcedureParameter.in("partition_columns", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("comma-separated identity partition columns for the " +
            "NEW layout (empty/null = unpartitioned)").build(),
        ProcedureParameter.in("bucket_column", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("hash-bucket column for the new layout").build(),
        ProcedureParameter.in("bucket_count", IntegerType)
          .defaultValue("0").build(),
        ProcedureParameter.in("sort_columns", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("within-file sort order for the new layout").build(),
        ProcedureParameter.in("parts", IntegerType)
          .defaultValue("8").build(),
        ProcedureParameter.in("transform", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("time-unit/truncate level for the new layout — " +
            "days(col)/months(col)/hours(col)/years(col)/" +
            "truncate(w, col)").build())) {
        override def description(): String =
          "partition-spec evolution by rewrite: fold the whole store " +
            "into ONE entry under a new identity/transform/bucket/sort " +
            "layout (one atomic commit; the old layout stays " +
            "time-travelable one gc cycle)"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          def csv(i: Int): Seq[String] = Option(str(input, i)).toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          val before = EpochManifest.entries(spark, root).size
          EpochStore.migrateLayout(spark, root,
            partitionColumns = csv(1),
            bucketColumn = Option(str(input, 2)).map(_.trim)
              .filter(_.nonEmpty).orNull,
            bucketCount = input.getInt(3),
            sortColumns = csv(4),
            parts = input.getInt(5),
            transform = Option(str(input, 6)).map(_.trim)
              .filter(_.nonEmpty).orNull)
          result(StructType(Seq(
            StructField("entries_before", IntegerType, nullable = false),
            StructField("entries_after", IntegerType, nullable = false))),
            Array(row(before, EpochManifest.entries(spark, root).size)))
        }
      }

      case "evolve_layout" => new Proc("evolve_layout", Array(
        tableParam,
        ProcedureParameter.in("partition_columns", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("comma-separated identity partition columns for the " +
            "NEW layout (empty/null = unpartitioned)").build(),
        ProcedureParameter.in("bucket_column", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("hash-bucket column for the new layout").build(),
        ProcedureParameter.in("bucket_count", IntegerType)
          .defaultValue("0").build(),
        ProcedureParameter.in("transform", StringType)
          .defaultValue("CAST(NULL AS STRING)")
          .comment("time-unit/truncate level for the new layout, e.g. " +
            "'days(ts)' or 'truncate(8, v)'").build())) {
        override def description(): String =
          "partition-spec evolution WITHOUT rewriting: publish a new " +
            "table-level layout as metadata only (Iceberg's mixed-spec " +
            "snapshots) - new writes land under it, existing entries " +
            "keep their recorded specs and every scan prunes each " +
            "entry under its own; migrate_layout stays the physical " +
            "re-clustering option"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val pcs = Option(str(input, 1)).toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          val bCol = Option(str(input, 2)).map(_.trim).filter(_.nonEmpty)
          val bN = input.getInt(3)
          val tf = Option(str(input, 4)).map(_.trim).filter(_.nonEmpty)
          val prev = EpochStore.evolveLayout(spark, root, pcs, bCol, bN, tf)
          def render(pc: Seq[String], b: Option[(String, Int)]): String =
            (pc.map(c => s"identity($c)") ++
              tf.map(t => StoreTransform.parse(t).spelling) ++
              b.map { case (c, n) => s"bucket($n, $c)" })
              .mkString(", ")
          result(StructType(Seq(
            StructField("previous_layout", StringType, nullable = false),
            StructField("new_layout", StringType, nullable = false),
            StructField("entries_kept", IntegerType, nullable = false))),
            Array(row(
              org.apache.spark.unsafe.types.UTF8String.fromString(prev),
              org.apache.spark.unsafe.types.UTF8String.fromString(
                render(pcs, bCol.map(_ -> bN))),
              EpochManifest.entries(spark, root).size)))
        }
      }

      case "compact" => new Proc("compact", Array(
        tableParam,
        ProcedureParameter.in("upto_epoch", LongType)
          .defaultValue(Long.MaxValue.toString)
          .comment("fold entries with epoch < this bound").build(),
        ProcedureParameter.in("sort_columns", StringType)
          .defaultValue("NULL")
          .comment("comma-separated re-cluster columns").build(),
        ProcedureParameter.in("parts", IntegerType)
          .defaultValue("8").comment("fold file count").build(),
        ProcedureParameter.in("zorder_columns", StringType)
          .defaultValue("NULL")
          .comment("two comma-separated numeric columns — Morton-curve " +
            "re-clustering with 2-D stats (exclusive with sort_columns)")
          .build())) {
        override def description(): String =
          "stats-preserving, evolution-aware fold of a store's history " +
            "(one atomic manifest swap; the previous snapshot stays " +
            "readable one gc cycle)"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val before = EpochManifest.entries(spark, root).size
          val sortCols = Option(str(input, 2)).toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          val zCols = Option(str(input, 4)).toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          EpochStore.compactStore(spark, root,
            uptoEpoch = input.getLong(1), sortColumns = sortCols,
            parts = input.getInt(3), zorderColumns = zCols)
          result(StructType(Seq(
            StructField("entries_before", IntegerType, nullable = false),
            StructField("entries_after", IntegerType, nullable = false))),
            Array(row(before, EpochManifest.entries(spark, root).size)))
        }
      }

      case "remove_orphan_files" => new Proc("remove_orphan_files", Array(
        tableParam,
        ProcedureParameter.in("older_than_hours", LongType)
          .defaultValue((EpochManifest.OrphanReclaimAfterMs
            / 3600000L).toString)
          .comment("orphans younger than this survive - a live " +
            "writer may still be staging them").build(),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false")
          .comment("list the reclaimable dirs without deleting")
          .build(),
        ProcedureParameter.in("force", BooleanType)
          .defaultValue("false")
          .comment("allow an age below the in-flight-writer window - " +
            "ONLY when no concurrent writer can be live (a short age " +
            "deletes dirs a racing commit is about to reference)")
          .build())) {
        override def description(): String =
          "delete (or, dry_run, list) dirs NO retained manifest or " +
            "live branch ever committed - crashed writers' staging " +
            "leftovers past the age threshold (ages below the " +
            "in-flight-writer window refuse without force => true). " +
            "Committed history is never touched (gc / expire_snapshots " +
            "are the history-affecting moves, and say so)"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val ageMs = input.getLong(1) * 3600000L
          val dry = input.getBoolean(2)
          val dirs = EpochManifest.removeOrphans(spark, root, ageMs,
            dryRun = dry, force = input.getBoolean(3))
          result(StructType(Seq(
            StructField("dir", StringType, nullable = false),
            StructField("removed", BooleanType, nullable = false))),
            dirs.map(d => row(
              org.apache.spark.unsafe.types.UTF8String.fromString(d),
              !dry)).toArray)
        }
      }

      case "gc" => new Proc("gc", Array(tableParam)) {
        override def description(): String =
          "reclaim dirs referenced by neither of the two newest manifests"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          EpochManifest.gc(spark, root)
          result(StructType(Seq(
            StructField("generations_retained", IntegerType,
              nullable = false))),
            Array(row(EpochManifest.generations(spark, root).size)))
        }
      }

      case "expire_snapshots" => new Proc("expire_snapshots", Array(
        tableParam,
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue(Long.MaxValue.toString)
          .comment("expire only generations whose manifest predates this " +
            "epoch-millis timestamp; default = any age").build(),
        ProcedureParameter.in("keep_last", IntegerType)
          .defaultValue("2")
          .comment("newest generations always retained (floor 2 — the " +
            "isolation window); tagged generations are always immune")
          .build())) {
        override def description(): String =
          "retention policy over the manifest history: expire old " +
            "generations beyond keep_last (tag-aware; pinned reads on " +
            "expired generations fail loudly afterwards)"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val expired = EpochManifest.expireSnapshots(spark, root,
            olderThanMs = input.getLong(1), keepLast = input.getInt(2))
          result(StructType(Seq(
            StructField("expired", IntegerType, nullable = false),
            StructField("generations_retained", IntegerType,
              nullable = false))),
            Array(row(expired.size,
              EpochManifest.generations(spark, root).size)))
        }
      }

      case "purge_deletes" => new Proc("purge_deletes", Array(
        tableParam,
        ProcedureParameter.in("key_columns", StringType)
          .comment("comma-separated key columns of the latest-wins view")
          .build(),
        ProcedureParameter.in("version_column", StringType)
          .defaultValue("NULL")
          .comment("same-epoch tie-break column").build())) {
        override def description(): String =
          "apply tombstones physically: fold the live latest-wins state " +
            "into one entry and clear the delete sub-store"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val keys = str(input, 1).split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq
          require(keys.nonEmpty, "purge_deletes: key_columns is empty")
          val (schema, partCol) = EpochStore.evolvedSchema(spark, root)
          EpochStore.purgeDeletes(spark, root, schema, keys,
            partCol.orNull, str(input, 2))
          result(StructType(Seq(
            StructField("entries_after", IntegerType, nullable = false))),
            Array(row(EpochManifest.entries(spark, root).size)))
        }
      }

      case "tag" => new Proc("tag", Array(
        tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("tag name, [A-Za-z0-9._-]+").build(),
        ProcedureParameter.in("generation", LongType)
          .defaultValue("NULL")
          .comment("retained generation to pin; default = current")
          .build())) {
        override def description(): String =
          "pin a named tag to a manifest generation — a gc retention " +
            "anchor: VERSION AS OF 'name' stays answerable until untag"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val g = EpochManifest.tag(spark, root, str(input, 1),
            if (input.isNullAt(2)) -1L else input.getLong(2))
          result(StructType(Seq(
            StructField("generation", LongType, nullable = false))),
            Array(row(g)))
        }
      }

      case "untag" => new Proc("untag", Array(
        tableParam,
        ProcedureParameter.in("name", StringType).build())) {
        override def description(): String =
          "drop a tag; its generation becomes reclaimable by the next gc"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          EpochManifest.untag(spark, root, str(input, 1))
          result(StructType(Seq(
            StructField("tags_remaining", IntegerType, nullable = false))),
            Array(row(EpochManifest.tags(spark, root).size)))
        }
      }

      case "tags" => new Proc("tags", Array(tableParam)) {
        override def description(): String = "list the store's named tags"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val out = EpochManifest.tags(spark, root).toSeq.sortBy(_._1)
            .map { case (n, g) =>
              row(org.apache.spark.unsafe.types.UTF8String.fromString(n), g) }
          result(StructType(Seq(
            StructField("name", StringType, nullable = false),
            StructField("generation", LongType, nullable = false))),
            out.toArray)
        }
      }

      case "partitions" => new Proc("partitions", Array(tableParam)) {
        override def description(): String =
          "the store's partition/bucket dirs with file and recorded row " +
            "counts (rows = -1 when some file lacks a stats record) — " +
            "SHOW PARTITIONS for the epochstore layout, metadata-only"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
            org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
          val entries = EpochManifest.entries(spark, root)
          // every entry's leaf partition dirs (identity chains AND
          // bucket dirs), with file + sidecar-recorded row counts
          def leaves(p: org.apache.hadoop.fs.Path, rel: String)
              : Seq[(String, org.apache.hadoop.fs.Path)] = {
            val subs = fs.listStatus(p).toSeq.filter(st =>
              st.isDirectory && st.getPath.getName.contains("=") &&
                !st.getPath.getName.startsWith("_"))
            if (subs.isEmpty) Seq((rel, p))
            else subs.flatMap(st => leaves(st.getPath,
              if (rel.isEmpty) st.getPath.getName
              else s"$rel/${st.getPath.getName}"))
          }
          def filesUnder(p: org.apache.hadoop.fs.Path)
              : Seq[org.apache.hadoop.fs.FileStatus] = {
            val (dirs, files) = fs.listStatus(p).toSeq
              .filterNot(st => st.getPath.getName.startsWith("_") ||
                st.getPath.getName.startsWith("."))
              .partition(_.isDirectory)
            files.filter(_.getLen > 0) ++
              dirs.flatMap(d => filesUnder(d.getPath))
          }
          val rows = entries.flatMap { e =>
            val ep = new org.apache.hadoop.fs.Path(s"$root/${e.dir}")
            if (!fs.exists(ep)) Nil
            else {
              val stats = EpochStoreStats.read(fs, root, e.dir)
              val qe = fs.makeQualified(ep).toString
              leaves(ep, "").map { case (part, p) =>
                val fls = filesUnder(p)
                val recorded = fls.map { st =>
                  stats.get(fs.makeQualified(st.getPath).toString
                    .stripPrefix(qe).stripPrefix("/")).map(_.rows)
                }
                val n: Long =
                  if (recorded.forall(_.isDefined)) recorded.flatten.sum
                  else -1L
                ((if (part.isEmpty) "<unpartitioned>" else part),
                  e.epoch, fls.size, n)
              }
            }
          }.sortBy(t => (t._1, t._2))
          val out = rows.map { case (part, epoch, files, n) =>
            row(org.apache.spark.unsafe.types.UTF8String.fromString(part),
              epoch, files, n)
          }
          result(StructType(Seq(
            StructField("partition", StringType, nullable = false),
            StructField("epoch", LongType, nullable = false),
            StructField("files", IntegerType, nullable = false),
            StructField("rows", LongType, nullable = false))),
            out.toArray)
        }
      }

      case "create_branch" => new Proc("create_branch", Array(
        tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("branch name, [A-Za-z0-9._-]+").build())) {
        override def description(): String =
          "start a write-audit-publish branch at the current snapshot: " +
            "writes with option branch=<name> stay invisible to main " +
            "readers until publish_branch fast-forwards"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val base = EpochManifest.createBranch(spark, root, str(input, 1))
          result(StructType(Seq(
            StructField("base_generation", LongType, nullable = false))),
            Array(row(base)))
        }
      }

      case "publish_branch" => new Proc("publish_branch", Array(
        tableParam,
        ProcedureParameter.in("name", StringType).build())) {
        override def description(): String =
          "fast-forward main to the audited branch head in one atomic " +
            "commit (refuses if main advanced past the branch base), " +
            "then drop the branch"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val g = EpochManifest.publishBranch(spark, root, str(input, 1))
          result(StructType(Seq(
            StructField("published_generation", LongType, nullable = false))),
            Array(row(g)))
        }
      }

      case "drop_branch" => new Proc("drop_branch", Array(
        tableParam,
        ProcedureParameter.in("name", StringType).build())) {
        override def description(): String =
          "abandon a branch; its never-published dirs age out via gc"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          EpochManifest.dropBranch(spark, root, str(input, 1))
          result(StructType(Seq(
            StructField("branches_remaining", IntegerType, nullable = false))),
            Array(row(EpochManifest.branches(spark, root).size)))
        }
      }

      case "branches" => new Proc("branches", Array(tableParam)) {
        override def description(): String = "list live branches"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val out = EpochManifest.branches(spark, root).map { b =>
            val (base, head, es) = EpochManifest.branchState(spark, root, b)
            row(org.apache.spark.unsafe.types.UTF8String.fromString(b),
              base, head, es.size)
          }
          result(StructType(Seq(
            StructField("name", StringType, nullable = false),
            StructField("base_generation", LongType, nullable = false),
            StructField("head_generation", LongType, nullable = false),
            StructField("entries", IntegerType, nullable = false))),
            out.toArray)
        }
      }

      case "add_constraint" => new Proc("add_constraint", Array(
        tableParam,
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("expression", StringType)
          .comment("SQL predicate over the store's columns — a row " +
            "violates only when it evaluates FALSE").build())) {
        override def description(): String =
          "declare a write-time CHECK constraint: every future epoch is " +
            "validated before its manifest publish"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          EpochStoreConstraints.add(spark, root, str(input, 1), str(input, 2))
          result(StructType(Seq(
            StructField("constraints", IntegerType, nullable = false))),
            Array(row(EpochStoreConstraints.list(spark, root).size)))
        }
      }

      case "drop_constraint" => new Proc("drop_constraint", Array(
        tableParam,
        ProcedureParameter.in("name", StringType).build())) {
        override def description(): String =
          "drop a declared CHECK constraint; future writes stop checking"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          EpochStoreConstraints.drop(spark, root, str(input, 1))
          result(StructType(Seq(
            StructField("constraints", IntegerType, nullable = false))),
            Array(row(EpochStoreConstraints.list(spark, root).size)))
        }
      }

      case "constraints" => new Proc("constraints", Array(tableParam)) {
        override def description(): String =
          "list the store's declared CHECK constraints"
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = rootOf(str(input, 0))
          val out = EpochStoreConstraints.list(spark, root).map { case (n, e) =>
            row(org.apache.spark.unsafe.types.UTF8String.fromString(n),
              org.apache.spark.unsafe.types.UTF8String.fromString(e))
          }
          result(StructType(Seq(
            StructField("name", StringType, nullable = false),
            StructField("expression", StringType, nullable = false))),
            out.toArray)
        }
      }

      case other => throw new IllegalArgumentException(
        s"unknown epochstore procedure system.$other — available: " +
          names.mkString(", "))
    }
  }
}
