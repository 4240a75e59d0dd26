package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate.{
  Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFooterReader
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.core.EpochManifest

/** METADATA-ONLY aggregation over the epochstore: when a query is
  * `COUNT(*)` / `COUNT(col)` / `MIN` / `MAX` (optionally grouped by the
  * store's partition column) with no residual data filter, the scan
  * never reads a data page — each task folds ONE parquet FOOTER's
  * row-group statistics into a partial-aggregate row (Spark's own footer
  * fold, [[GraftBridge.aggRowFromFooter]]) and Spark's partial-final
  * rewrite merges them. A count over a 100 TB store costs one footer
  * read per file: KBs of IO per task instead of the table.
  *
  * Pinned like the row scan: `entries` ARE the snapshot, partition
  * filters prune dirs before any footer is opened, and the time-travel /
  * changefeed options compose (a grouped count over "what changed since
  * generation g" stays metadata-only). A footer without the needed
  * statistics fails loudly (engine-written files always carry them).
  *
  * An EMPTY pruned file set with no grouping emits one zero row (count
  * 0, min/max null) — the partial-final rewrite turns zero partials
  * into NULL counts otherwise; with grouping, zero files correctly
  * yield zero groups. */
final case class EpochStoreAggScan(
    fullSchema: StructType, partCols: Seq[String],
    root: String, generation: Long, entries: Seq[EpochManifest.Entry],
    partFilters: Array[Filter], aggregation: Aggregation,
    aggSchema: StructType)
    extends Scan with Batch {

  private val partFields: Seq[StructField] =
    partCols.flatMap(c => fullSchema.fields.find(_.name == c))

  private val dataSchema: StructType =
    StructType(fullSchema.filterNot(f => partCols.contains(f.name)))

  /** Grouping (any SUBSET of the partition columns — each is constant
    * per leaf dir, so per-file partials stay exact) carries the full
    * partition schema into the footer fold; Spark's util resolves each
    * grouped column from it by name. An ungrouped aggregation reads no
    * partition values at all. */
  private val groupSchema: StructType =
    if (aggregation.groupByExpressions.isEmpty) new StructType()
    else StructType(partFields)

  override def readSchema(): StructType = aggSchema

  override def toBatch: Batch = this

  override def description(): String = {
    val (sel, tot) = selectedPartitionDirs
    s"epochstore-agg $root gen=$generation epochs=${entries.size} " +
      s"partitions=$sel/$tot " +
      s"PushedAggregation: [${aggregation.aggregateExpressions.mkString(", ")}], " +
      s"GroupBy: [${aggregation.groupByExpressions.mkString(", ")}], " +
      s"ReadSchema: ${aggSchema.catalogString}"
  }

  /** Spec-evolved stores (X92): the metadata-agg walk, like the row
    * scan's, visits each entry under its OWN recorded layout — without
    * this a foreign-layout entry's files sit under dir prefixes the
    * current layout's walk never matches and the count silently drops
    * them. The pushdown gate admits only layout-sound shapes (ungrouped
    * over any mix; grouped only when every entry is current). */
  @transient private lazy val entryLayoutsOpt
      : Option[Map[String, (Seq[String], Option[EpochStore.StoreBucket])]] =
    if (EpochManifest.currentLayout(SparkSession.active, root).isEmpty) None
    else {
      val spark = SparkSession.active
      val fs = new Path(root)
        .getFileSystem(GraftBridge.sessionHadoopConf(spark))
      Some(entries.map(_.dir).map { d =>
        val pc = EpochStoreWrite.readSchemaSidecar(fs, root, d)
          .map(r => EpochStore.splitPartCols(r._2))
          .getOrElse(partCols)
        d -> (pc, EpochStoreWrite.readBucketSidecar(fs, root, d))
      }.toMap)
    }

  private lazy val listing =
    EpochStore.listEntryFiles(SparkSession.active, root, entries,
      partFields, partFilters,
      layoutOf = entryLayoutsOpt.map(m => (e: EpochManifest.Entry) => {
        val (pcs, bkt) = m.getOrElse(e.dir,
          (partCols, None: Option[EpochStore.StoreBucket]))
        (pcs.map(c => fullSchema.fields.find(_.name == c).getOrElse(
          throw new IllegalStateException(
            s"entry ${e.dir} records partition column $c missing from " +
              s"the schema of $root"))), bkt)
      }))

  def selectedPartitionDirs: (Int, Int) = (listing._2, listing._3)

  /** A listed file's partition values re-expressed in the CURRENT
    * layout's column order (X92 grouped aggregation over mixed specs):
    * the pushdown gate admits grouped shapes only when every entry's
    * recorded identity columns are a SUPERSET of the current ones, so
    * the name-indexed remap below is total. Identity (and ungrouped)
    * scans pass values through untouched. */
  private def normValues(lf: EpochStore.ListedFile): Seq[Any] =
    entryLayoutsOpt match {
      case None => lf.values
      case Some(m) =>
        val pcs = m.get(lf.entryDir).map(_._1).getOrElse(partCols)
        if (pcs == partCols) lf.values
        else partCols.map(c => lf.values(pcs.indexOf(c)))
    }

  /** RENAME evolution (X85) over the metadata-only path: footers and
    * sidecars speak each entry's PHYSICAL spellings, so the fold asks
    * each entry for the alias chains' resolution of every aggregated
    * column — pre-rename entries answer under their recorded historical
    * name, post-rename (and compacted) entries under the current one.
    * Empty for never-renamed stores: one ops-log probe, no sidecar
    * reads. */
  @transient private lazy val aliases: EpochStore.ColumnAliases =
    EpochStore.columnAliases(SparkSession.active, root)

  @transient private lazy val entryFieldsByDir: Map[String, Set[String]] =
    if (aliases.isEmpty) Map.empty
    else {
      val spark = SparkSession.active
      val fs = new Path(root)
        .getFileSystem(GraftBridge.sessionHadoopConf(spark))
      entries.map(_.dir).map { d =>
        d -> EpochStoreWrite.readSchemaSidecar(fs, root, d)
          .map(_._1.fieldNames.toSet).getOrElse(Set.empty[String])
      }.toMap
    }

  /** The physical spelling `logical` carries in `entryDir`'s files. */
  private def physOf(entryDir: String, logical: String): String =
    if (aliases.isEmpty) logical
    else aliases.resolve(logical,
      entryFieldsByDir.getOrElse(entryDir, Set.empty))

  /** SIDECAR-answered aggregation — the tier ABOVE the footer fold:
    * when every listed file carries a stats record covering the pushed
    * aggregates (rows for COUNT(*), per-column nulls for COUNT(col),
    * exact numeric min/max for MIN/MAX), the DRIVER folds the answer
    * from the `_skip/stats.json` sidecars alone — one partial row per
    * group, ZERO file opens, not even a footer: a grouped count over
    * 100 TB costs exactly the manifest + one tiny JSON per epoch. Any
    * file without the needed record falls the whole scan back to the
    * footer path (sidecar stats are exact task-side accumulations, so
    * falling back is about coverage, never correctness). */
  private lazy val sidecarAnswer: Option[Seq[(Seq[Any], Array[Any])]] =
    computeSidecarAnswer()

  /** The grouped columns (⊆ partCols, enforced at pushdown) and their
    * positions within the partition-value tuples. */
  private val groupCols: Seq[String] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    aggregation.groupByExpressions.toSeq.map {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        nr.fieldNames.head
      case other => throw new IllegalStateException(
        s"unexpected pushed grouping expression $other")
    }
  }
  private val groupIdxInPart: Seq[Int] = groupCols.map(partCols.indexOf)

  private def computeSidecarAnswer(): Option[Seq[(Seq[Any], Array[Any])]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    val spark = SparkSession.active
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val statsBy = entries.map(e =>
      e.dir -> EpochStoreStats.read(fs, root, e.dir)).toMap
    val files = listing._1
    if (files.isEmpty) return None
    val sts = files.map(lf => lf ->
      statsBy.getOrElse(lf.entryDir, Map.empty)
        .get(EpochStore.relOf(fs, root, lf)))
    if (sts.exists(_._2.isEmpty)) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    // a renamed store covers column l when every file's sidecar records
    // it under the file's OWN physical spelling (alias-resolved per entry)
    def covered(n: String): Boolean = sts.forall { case (lf, st) =>
      st.get.cols.contains(physOf(lf.entryDir, n)) }
    val exprs = aggregation.aggregateExpressions.toSeq
    val answerable = exprs.forall {
      case _: CountStar => true
      case c: Count => !c.isDistinct && colOf(c.column).exists(covered)
      case m: Min => colOf(m.column).exists(covered)
      case m: Max => colOf(m.column).exists(covered)
      case _ => false
    }
    if (!answerable) return None
    // Option-typed converters: a stat value the sidecar tier cannot
    // place exactly (non-numeric kind, incomparable pair) bails the
    // WHOLE sidecar answer to the footer path — never a raw None/other
    // marker smuggled into the InternalRow as an aggregate value.
    // (statSafe keeps strings/dates/booleans off this path today; the
    // Option shape keeps that an invariant, not a hope, if someone
    // widens the gate.)
    def conv(v: Any, dt: DataType): Option[Any] = (v, dt) match {
      case (null, _) => Some(null)
      case (n: Number, ByteType) => Some(n.byteValue())
      case (n: Number, ShortType) => Some(n.shortValue())
      case (n: Number, IntegerType) => Some(n.intValue())
      case (n: Number, LongType) => Some(n.longValue())
      case (n: Number, FloatType) => Some(n.floatValue())
      case (n: Number, DoubleType) => Some(n.doubleValue())
      case _ => None // non-numeric stat kind: footer path decides
    }
    def better(a: Any, b: Any, takeMin: Boolean): Option[Any] = (a, b) match {
      case (null, x) => Some(x)
      case (x, null) => Some(x)
      case (x: Number, y: Number) =>
        val c = new java.math.BigDecimal(x.toString)
          .compareTo(new java.math.BigDecimal(y.toString))
        Some(if (c < 0 == takeMin) x else y)
      case _ => None
    }
    def reduceBetter(vs: Seq[Any], takeMin: Boolean): Option[Any] =
      // seed with SQL null (all-null column => null aggregate), which
      // better() treats as "missing — take the other side"
      vs.foldLeft[Option[Any]](Some(null)) { (acc, v) =>
        acc.flatMap(better(_, v, takeMin))
      }
    // each FileStats rides with its owning entry dir so the folds below
    // can ask for the entry's physical spelling of a renamed column
    val groups: Seq[(Seq[Any], Seq[(String, EpochStoreStats.FileStats)])] =
      if (aggregation.groupByExpressions.isEmpty)
        Seq((Seq.empty[Any], sts.map(t => (t._1.entryDir, t._2.get))))
      else sts.groupBy(t => groupIdxInPart.map(normValues(t._1)(_))).toSeq
        .sortBy(t => t._1.map(String.valueOf).mkString("\u0000"))
        .map { case (vs, l) => (vs, l.map(t => (t._1.entryDir, t._2.get))) }
    val rows = groups.map { case (v, fstats) =>
      val vals: Seq[Option[Any]] = exprs.map {
        case _: CountStar => Some(fstats.map(_._2.rows).sum)
        case c: Count =>
          val n = colOf(c.column).get
          Some(fstats.map { case (d, f) =>
            f.rows - f.cols(physOf(d, n)).nulls }.sum)
        case m: Min =>
          val n = colOf(m.column).get
          reduceBetter(fstats.map { case (d, f) =>
            f.cols(physOf(d, n)).min.orNull }, takeMin = true)
            .flatMap(conv(_, dataSchema(n).dataType))
        case m: Max =>
          val n = colOf(m.column).get
          reduceBetter(fstats.map { case (d, f) =>
            f.cols(physOf(d, n)).max.orNull }, takeMin = false)
            .flatMap(conv(_, dataSchema(n).dataType))
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      if (vals.exists(_.isEmpty)) None
      else Some((v, vals.map(_.get).toArray))
    }
    if (rows.exists(_.isEmpty)) None else Some(rows.map(_.get))
  }

  /** True when the answer came from the sidecars alone (no file, not
    * even a footer, was opened) — the audit hook PlanSpec reads. */
  def answeredFromSidecars: Boolean = sidecarAnswer.nonEmpty

  override def planInputPartitions(): Array[InputPartition] = {
    // the pushdown gate admitted this aggregate when the store carried
    // no live merge-on-read tombstones; a delta commit racing in before
    // this scan pinned its snapshot would make the footer counts
    // include killed rows — refuse loudly rather than over-count (the
    // statement retries against the settled snapshot)
    locally {
      val spark = SparkSession.active
      // one sidecar read gates the whole check: stores without a row
      // identity can never carry tombstones — the metadata-only path
      // stays metadata-only for them
      // the PINNED entry list decides (not the current head): a time-
      // travel aggregate over a DV-carrying generation must refuse even
      // after compaction cleaned the head
      EpochStoreDv.guardNoLiveDvsIn(spark, root, entries,
        "epochstore footer aggregation")
      if (EpochStoreDelta.declared(spark, root).nonEmpty) {
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(org.apache.spark.sql.GraftBridge
            .sessionHadoopConf(spark))
        val carrying = entries.filter(e =>
          EpochStoreDelta.tombstoneStatuses(fs, root, e.dir).nonEmpty)
        require(carrying.isEmpty,
          s"epochstore footer aggregation over $root: a merge-on-read " +
            s"commit (${carrying.map(_.dir).mkString(", ")}) raced this " +
            "aggregate's planning — retry the statement")
      }
    }
    sidecarAnswer match {
      case Some(groups) =>
        // place each grouped column's value at its aggSchema position
        // (Spark's pushed-agg layout conventions own the ordering);
        // aggregates fill the remaining slots in expression order
        return groups.map { case (vs, vals) =>
          PrecomputedAggPartition(vals, vs.toArray,
            groupCols.map(aggSchema.fieldIndex).toArray): InputPartition
        }.toArray
      case None => ()
    }
    val files = listing._1
    if (files.isEmpty) {
      if (aggregation.groupByExpressions.isEmpty)
        Array(EpochAggPartition(null, 0L, null)) // the zero row
      else Array.empty // zero files → zero groups
    } else files.map { lf =>
      // renamed stores: ship the (logical -> this file's physical)
      // pairs so the task-side footer fold reads the entry's spelling;
      // empty (the common case) keeps the partition payload unchanged
      val pairs: Array[(String, String)] =
        if (aliases.isEmpty) Array.empty
        else dataSchema.fieldNames.flatMap { l =>
          val p = physOf(lf.entryDir, l)
          if (p == l) None else Some((l, p))
        }
      EpochAggPartition(lf.status.getPath.toString, lf.status.getLen,
        (if (groupSchema.isEmpty) lf.values else normValues(lf)).toArray,
        pairs): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new EpochAggReaderFactory(
      GraftBridge.broadcastHadoopConf(spark,
        GraftBridge.sessionHadoopConf(spark)),
      dataSchema, groupSchema, aggregation, aggSchema)
  }
}

/** One footer to fold; `filePath == null` is the empty-store zero row.
  * `partValues` are the file's partition-dir values in partition-column
  * order (the footer fold resolves grouped columns from them by name).
  * `physPairs` (RENAME evolution) maps each logical data column this
  * file spells differently to its physical name — the fold translates
  * the schema and aggregate references before touching the footer. */
final case class EpochAggPartition(filePath: String, fileLen: Long,
                                   partValues: Array[Any],
                                   physPairs: Array[(String, String)] =
                                     Array.empty)
    extends InputPartition

/** One DRIVER-folded partial row (the sidecar-answered path): `values`
  * are the aggregate results in expression order; `groupValues(i)`
  * goes to aggSchema slot `groupSlots(i)` (empty when ungrouped). The
  * task emits the assembled row verbatim — no IO at all. */
final case class PrecomputedAggPartition(values: Array[Any],
                                         groupValues: Array[Any],
                                         groupSlots: Array[Int])
    extends InputPartition

final class EpochAggReaderFactory(
    bc: Broadcast[SerializableConfiguration], dataSchema: StructType,
    groupSchema: StructType, aggregation: Aggregation,
    aggSchema: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    p match {
      case pre: PrecomputedAggPartition =>
        return new PartitionReader[InternalRow] {
          private var emitted = false
          private val row = {
            val n = pre.values.length + pre.groupSlots.length
            val slots = new Array[Any](n)
            val slotOf = pre.groupSlots.zipWithIndex.toMap
            var vi = 0
            (0 until n).foreach { i =>
              slotOf.get(i) match {
                case Some(gi) =>
                  slots(i) = EpochStore.toCatalyst(pre.groupValues(gi))
                case None => slots(i) = pre.values(vi); vi += 1
              }
            }
            new GenericInternalRow(slots)
          }
          override def next(): Boolean = if (emitted) false else {
            emitted = true; true
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      case _ => ()
    }
    val part = p.asInstanceOf[EpochAggPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false

      private lazy val row: InternalRow =
        if (part.filePath == null) {
          // no files: COUNT = 0, MIN/MAX = null (no grouping by contract)
          val vals = aggregation.aggregateExpressions.map {
            case _: CountStar | _: Count => 0L.asInstanceOf[Any]
            case _: Min | _: Max => null
            case other => throw new IllegalStateException(
              s"unexpected pushed aggregate $other")
          }
          new GenericInternalRow(vals)
        } else {
          val footer = ParquetFooterReader.readFooter(
            HadoopInputFile.fromPath(new Path(part.filePath), bc.value.value),
            ParquetMetadataConverter.NO_FILTER)
          val pv: InternalRow =
            if (groupSchema.isEmpty) InternalRow.empty
            else new GenericInternalRow(
              part.partValues.map(EpochStore.toCatalyst))
          // a pre-rename file's footer speaks its historical spellings:
          // rename the schema fields and aggregate references to match
          // (grouped columns are partition columns, which cannot be
          // renamed — groupSchema stays untouched)
          val (ds, ag, aggS) =
            if (part.physPairs.isEmpty) (dataSchema, aggregation, aggSchema)
            else {
              val m = part.physPairs.toMap
              // Spark's footer fold matches the OUTPUT schema's field
              // names ("min(score)") against the aggregate expressions,
              // so the translated spelling must appear there too; the
              // row it returns is positional with unchanged types, so
              // the upstream partial-merge is unaffected
              val aggS2 = StructType(aggSchema.fields.map { f =>
                f.copy(name = m.foldLeft(f.name) { case (nm, (l, p)) =>
                  nm.replace("(" + l + ")", "(" + p + ")")
                })
              })
              (StructType(dataSchema.fields.map(f =>
                m.get(f.name).map(p => f.copy(name = p)).getOrElse(f))),
                EpochAggReaderFactory.translate(aggregation, m), aggS2)
            }
          GraftBridge.aggRowFromFooter(footer, part.filePath, ds,
            groupSchema, ag, aggS, pv)
        }

      override def next(): Boolean = if (emitted) false else {
        emitted = true; true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

object EpochAggReaderFactory {
  /** The pushed aggregation with every single-column reference a
    * renamed file spells differently rewritten to that file's physical
    * name ([[EpochAggPartition.physPairs]]); grouping references are
    * partition columns (never renameable) and pass through. */
  private[sources] def translate(agg: Aggregation,
      m: Map[String, String]): Aggregation = {
    import org.apache.spark.sql.connector.expressions.{
      Expression, Expressions, NamedReference}
    def tr(e: Expression): Expression = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
          m.contains(nr.fieldNames.head) =>
        Expressions.column(m(nr.fieldNames.head))
      case other => other
    }
    new Aggregation(
      agg.aggregateExpressions.map {
        case c: Count => new Count(tr(c.column), c.isDistinct)
        case mn: Min => new Min(tr(mn.column))
        case mx: Max => new Max(tr(mx.column))
        case other => other
      },
      agg.groupByExpressions)
  }
}
