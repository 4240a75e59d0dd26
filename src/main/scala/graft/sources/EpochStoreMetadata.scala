package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.EpochManifest

/** METADATA TABLES over a manifest store — the Iceberg `table$files` /
  * `table.files` inspection surface, SQL-readable through the catalog:
  *
  *   SELECT * FROM cat.`docs$partitions`      -- or cat.docs.partitions
  *
  *  - `history`    one row per RETAINED manifest generation: commit
  *                 instant, entry count, whether it is the current head;
  *  - `files`      one row per live data file: owning epoch, path,
  *                 bytes, recorded row count, partition dir, bucket id;
  *  - `partitions` one row per live partition tuple (identity values ×
  *                 bucket id as the layout declares): file/row/byte
  *                 totals — SHOW PARTITIONS with measurements;
  *  - `refs`       named tags and branches with their pinned
  *                 generations (Iceberg's `refs` shape).
  *
  * All four are METADATA-SIZED and driver-computed: rows come from the
  * manifest, the `_schema.json`/`_skip/stats.json` sidecars, and (for
  * `files`/`partitions`) the same pruned listing the scan plans from —
  * indexed entries never touch the filesystem below the entry root. The
  * scan is a [[LocalScan]], so Spark plans a LocalTableScan: no tasks,
  * no partitions, no shuffle — inspecting a 100 TB store costs a few
  * sidecar reads. Row counts are null where an entry predates stats
  * sidecars rather than guessed. */
object EpochStoreMetadata {

  /** The recognized metadata-table kinds. */
  val Kinds: Set[String] = Set("history", "files", "partitions", "refs")

  def table(spark: SparkSession, root: String, kind: String,
            baseSchema: StructType,
            options: CaseInsensitiveStringMap): Table = {
    val (schema, rows) = kind match {
      case "history" => history(spark, root)
      case "files" => files(spark, root, baseSchema, options)
      case "partitions" => partitions(spark, root, baseSchema, options)
      case "refs" => refs(spark, root)
      case other => throw new IllegalArgumentException(
        s"unknown epochstore metadata table '$other' — " +
          s"one of ${Kinds.toSeq.sorted.mkString(", ")}")
    }
    new EpochStoreMetadataTable(s"epochstore($root).$kind", schema, rows)
  }

  private def utf8(s: String): Any =
    if (s == null) null else UTF8String.fromString(s)

  private def history(spark: SparkSession, root: String)
      : (StructType, Array[InternalRow]) = {
    val schema = StructType(Seq(
      StructField("generation", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("entries", IntegerType, nullable = false),
      StructField("is_current", BooleanType, nullable = false)))
    val snaps = EpochManifest.snapshots(spark, root)
    val head = snaps.map(_._1).maxOption.getOrElse(-1L)
    val rows = snaps.map { case (g, mtime) =>
      new GenericInternalRow(Array[Any](g, mtime * 1000L,
        EpochManifest.entriesAt(spark, root, g).size, g == head))
        : InternalRow
    }.toArray
    (schema, rows)
  }

  private def refs(spark: SparkSession, root: String)
      : (StructType, Array[InternalRow]) = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("generation", LongType, nullable = true)))
    val tags = EpochManifest.tags(spark, root).toSeq.sortBy(_._1)
      .map { case (n, g) =>
        new GenericInternalRow(Array[Any](utf8(n), utf8("tag"), g))
          : InternalRow }
    // a branch pins no single generation — its lineage advances; the
    // generation column is null by design
    val branches = EpochManifest.branches(spark, root).sorted
      .map(n => new GenericInternalRow(
        Array[Any](utf8(n), utf8("branch"), null)): InternalRow)
    (schema, (tags ++ branches).toArray)
  }

  /** The live file set + per-entry stats, through the SAME planning
    * tiers the batch scan uses (manifest entries, file-level index
    * where recorded, listing fallback otherwise). */
  private def listed(spark: SparkSession, root: String,
                     baseSchema: StructType,
                     options: CaseInsensitiveStringMap)
      : (Seq[EpochStore.ListedFile], Seq[String],
         Option[EpochStore.StoreBucket],
         Map[String, Map[String, EpochStoreStats.FileStats]],
         Option[Map[String, (Seq[String], Option[EpochStore.StoreBucket])]]) = {
    val partCols = EpochStore.partColsOf(options)
    val partFields = partCols.map(c => baseSchema.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"partition column $c missing from the schema of $root")))
    val bucket = EpochStore.bucketOf(options)
    // honor a VERSION AS OF pin riding in the base table's options —
    // `files`/`partitions` describe the pinned snapshot, not the head
    val entries = EpochStore.pinnedEntries(spark, root, options)
    val fs = new Path(root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // spec-evolved stores (X92): walk each entry under its OWN recorded
    // layout — the current layout's prefixes never match a foreign
    // entry's dirs, and its files would silently drop from the listing
    val layouts: Option[Map[String, (Seq[String],
        Option[EpochStore.StoreBucket])]] =
      if (graft.core.EpochManifest.currentLayout(spark, root).isEmpty) None
      else Some(entries.map(_.dir).map { d =>
        val pc = EpochStoreWrite.readSchemaSidecar(fs, root, d)
          .map(r => EpochStore.splitPartCols(r._2)).getOrElse(partCols)
        d -> (pc, EpochStoreWrite.readBucketSidecar(fs, root, d))
      }.toMap)
    val (files, _, _) = EpochStore.listEntryFiles(spark, root, entries,
      partFields, Array.empty, bucket = bucket,
      layoutOf = layouts.map(m => (e: graft.core.EpochManifest.Entry) => {
        val (pcs, bkt) = m.getOrElse(e.dir,
          (partCols, None: Option[EpochStore.StoreBucket]))
        (pcs.map(c => baseSchema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"entry ${e.dir} records partition column $c missing from " +
              s"the schema of $root"))), bkt)
      }))
    val stats = entries.map(e =>
      e.dir -> EpochStoreStats.read(fs, root, e.dir)).toMap
    (files, partCols, bucket, stats, layouts)
  }

  private def files(spark: SparkSession, root: String,
                    baseSchema: StructType,
                    options: CaseInsensitiveStringMap)
      : (StructType, Array[InternalRow]) = {
    val schema = StructType(Seq(
      StructField("epoch", LongType, nullable = false),
      StructField("file", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("rows", LongType, nullable = true),
      StructField("partition", StringType, nullable = true),
      StructField("bucket_id", IntegerType, nullable = true)))
    val (fls, partCols, _, stats, layouts) =
      listed(spark, root, baseSchema, options)
    val fs = new Path(root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val rows = fls.sortBy(lf => (lf.epoch, lf.status.getPath.toString))
      .map { lf =>
        val rel = EpochStore.relOf(fs, root, lf)
        val nRows: Any = stats.getOrElse(lf.entryDir, Map.empty)
          .get(rel).map(_.rows).orNull
        // each file's partition string renders under ITS entry's
        // recorded identity columns (values are in that order)
        val pcE = layouts.flatMap(_.get(lf.entryDir)).map(_._1)
          .getOrElse(partCols)
        val part: Any =
          if (pcE.isEmpty) null
          else utf8(pcE.zip(lf.values)
            .map { case (c, v) => s"$c=${String.valueOf(v)}" }.mkString("/"))
        new GenericInternalRow(Array[Any](lf.epoch,
          utf8(s"${lf.entryDir}/$rel"), lf.status.getLen, nRows, part,
          if (lf.bucketId >= 0) lf.bucketId else null)): InternalRow
      }.toArray
    (schema, rows)
  }

  private def partitions(spark: SparkSession, root: String,
                         baseSchema: StructType,
                         options: CaseInsensitiveStringMap)
      : (StructType, Array[InternalRow]) = {
    val (fls, partCols, bucket, stats, layouts) =
      listed(spark, root, baseSchema, options)
    val fsM = new Path(root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // MIXED-spec snapshots (X92): typed current-layout tuple columns
    // cannot describe a foreign-layout entry's dirs — render each
    // partition under ITS entry's recorded spec instead (the $files
    // shape): one row per (spec, rendered tuple, bucket id), with the
    // spec spelled out so the operator sees which layout owns it.
    // Uniform stores keep the typed tuple schema unchanged.
    val mixed = layouts.exists { m =>
      fls.map(_.entryDir).distinct.exists(d =>
        m.get(d).exists(l => l._1 != partCols || l._2 != bucket))
    }
    if (mixed) {
      val m = layouts.get
      val schema = StructType(Seq(
        StructField("spec", StringType, nullable = false),
        StructField("partition", StringType, nullable = true),
        StructField("bucket_id", IntegerType, nullable = true),
        StructField("files", LongType, nullable = false),
        StructField("rows", LongType, nullable = true),
        StructField("bytes", LongType, nullable = false)))
      def specOf(d: String): (Seq[String], Option[EpochStore.StoreBucket]) =
        m.getOrElse(d, (partCols, bucket))
      def render(l: (Seq[String], Option[EpochStore.StoreBucket])): String =
        (l._1.map(c => s"identity($c)") ++
          l._2.map(b => s"bucket(${b.n}, ${b.col})")).mkString(", ") match {
          case "" => "(unpartitioned)"
          case s => s
        }
      val rows = fls.groupBy { lf =>
        val l = specOf(lf.entryDir)
        val part =
          if (l._1.isEmpty) null
          else l._1.zip(lf.values)
            .map { case (c, v) => s"$c=${String.valueOf(v)}" }.mkString("/")
        (render(l), part, lf.bucketId)
      }.toSeq
        .sortBy { case ((sp, part, k), _) =>
          (sp, String.valueOf(part), k) }
        .map { case ((sp, part, k), group) =>
          val counted = group.map(lf =>
            stats.getOrElse(lf.entryDir, Map.empty)
              .get(EpochStore.relOf(fsM, root, lf)).map(_.rows))
          val nRows: Any =
            if (counted.exists(_.isEmpty)) null else counted.flatten.sum
          new GenericInternalRow(Array[Any](utf8(sp), utf8(part),
            if (k >= 0) k else null, group.size.toLong, nRows,
            group.map(_.status.getLen).sum)): InternalRow
        }.toArray
      return (schema, rows)
    }
    val partFields = partCols.map(c => baseSchema.fields.find(_.name == c).get)
    val schema = StructType(
      partFields.map(f => StructField(f.name, f.dataType, nullable = true)) ++
        bucket.map(_ => StructField("bucket_id", IntegerType,
          nullable = false)).toSeq ++
        Seq(StructField("files", LongType, nullable = false),
          StructField("rows", LongType, nullable = true),
          StructField("bytes", LongType, nullable = false)))
    val fs = new Path(root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val rows = fls.groupBy(lf => (lf.values, lf.bucketId)).toSeq
      .sortBy { case ((vs, k), _) =>
        (vs.map(String.valueOf).mkString("\u0000"), k) }
      .map { case ((vs, k), group) =>
        val counted = group.map(lf => stats.getOrElse(lf.entryDir, Map.empty)
          .get(EpochStore.relOf(fs, root, lf)).map(_.rows))
        // any file without a recorded count makes the tuple's rows
        // UNKNOWN (null) — never a partial sum passed off as a total
        val nRows: Any =
          if (counted.exists(_.isEmpty)) null else counted.flatten.sum
        new GenericInternalRow(
          (vs.map(EpochStore.toCatalyst) ++
            (if (bucket.nonEmpty) Seq(k: Any) else Nil) ++
            Seq(group.size.toLong, nRows,
              group.map(_.status.getLen).sum)).toArray): InternalRow
      }.toArray
    (schema, rows)
  }
}

/** A read-only, driver-computed metadata table: its scan is a
  * [[LocalScan]], so Spark plans a LocalTableScan — no tasks, no I/O
  * beyond what the rows' computation already did. */
final class EpochStoreMetadataTable(tableName: String, tableSchema: StructType,
                                    tableRows: Array[InternalRow])
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new LocalScan {
      override def rows(): Array[InternalRow] = tableRows
      override def readSchema(): StructType = tableSchema
      override def description(): String = tableName
    }
  }
}
