package graft.sources

import java.util

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.EpochManifest

/** DataSource V2 connector over an [[graft.core.EpochManifest]] snapshot
  * store — the engine-grade read surface for every persisted index
  * (inverted-text postings, IVF-PQ codes, band/shingle stores): instead
  * of path globs + manual manifest resolution at the call site, a store
  * root becomes a Spark TABLE whose scan
  *
  *  - pins ONE manifest snapshot at scan planning (the generation is
  *    part of the Scan — a compaction committing mid-query cannot change
  *    the file set this plan reads; gc's two-manifest lag keeps every
  *    pinned dir alive, the same isolation contract the manual readers
  *    carry),
  *  - prunes the store's partition directories (`bucket=N` / `cell=N`)
  *    from EXACT pushed filters on the partition column — a probe for 3
  *    buckets lists and reads exactly those 3 dirs per epoch, never the
  *    other 61,
  *  - pushes the remaining data filters and the required-column
  *    projection into Spark's OWN vectorized parquet reader
  *    ([[ParquetPartitionReaderFactory]] — this connector plans WHAT to
  *    read; the battle-tested parquet path does the decoding, so rows
  *    here are exactly as fast as a native parquet scan),
  *  - and time-travels: `option("asOfGeneration", g)` resolves a
  *    RETAINED older manifest ([[EpochManifest.generations]]), giving
  *    the pre-compaction / pre-append answer from live storage.
  *
  * Options: `path` (store root, required), `partitionColumn` (the stored
  * partition-dir column, e.g. "bucket" — omit for unpartitioned stores),
  * `maxEpoch` (visibility bound, the [[EpochManifest.read]] contract),
  * `asOfGeneration` (manifest pin, default latest). Registered as format
  * `"epochstore"` via DataSourceRegister; read-only by design — writes
  * go through the manifest commit protocol ([[EpochManifest.append]]),
  * never through a blind sink.
  *
  * Scale shape: listing is one driver-side `listStatus` per visible
  * epoch dir (+ one per surviving partition dir) — proportional to the
  * PRUNED file set, not the store; files split at
  * `spark.sql.files.maxPartitionBytes` boundaries and pack into
  * [[FilePartition]]s exactly like the native file source, so a
  * 1000-executor cluster sees the same task geometry it would on a
  * plain parquet table. */
class EpochStoreProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "epochstore"

  override def supportsExternalMetadata(): Boolean = true

  /** Engine paths always pass the store's declared schema; inference
    * exists for ad-hoc exploration and reads one pinned entry dir (the
    * partition column, if any, is discovered from its `col=value`
    * layout by the normal parquet reader). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val root = EpochStore.rootOf(options)
    val es = EpochStore.pinnedEntries(spark, root, options)
    require(es.nonEmpty, s"cannot infer the schema of empty store $root — " +
      "pass an explicit .schema(...)")
    spark.read.parquet(s"$root/${es.head.dir}").schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EpochStoreTable(schema, new CaseInsensitiveStringMap(properties))
}

final class EpochStoreTable(tableSchema: StructType,
                            options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  override def name(): String = s"epochstore(${EpochStore.rootOf(options)})"

  override def schema(): StructType = tableSchema

  /** The resolved creation options (path, layout, pins) — what the
    * metadata tables ([[EpochStoreMetadata]]) derive their typed
    * partition/bucket columns from. */
  private[sources] def storeOptions: CaseInsensitiveStringMap = options

  /** The store's dir layout as DECLARED partitioning — what lets SQL
    * validate `PARTITION (col=...)` clauses and route dynamic
    * partition overwrite at this table. */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    (EpochStore.partColsOf(options).map(c => Expressions.identity(c)) ++
      EpochStore.transformOf(options).map(t => t.kind match {
        case "year" => Expressions.years(t.col)
        case "month" => Expressions.months(t.col)
        case "day" => Expressions.days(t.col)
        case "hour" => Expressions.hours(t.col)
        case "trunc" => Expressions.apply("truncate",
          Expressions.literal(t.width), Expressions.column(t.col))
      }) ++
      EpochStore.bucketOf(options).map(b =>
        Expressions.bucket(b.n, b.col)))
      .toArray
  }

  /** Operator-facing metadata for `DESCRIBE TABLE EXTENDED` / `SHOW
    * TBLPROPERTIES`: the manifest posture (generation, epochs, retained
    * snapshots), the declared skip column, named tags, and CHECK
    * constraints — the store's whole control surface, readable from
    * SQL. Resolved fresh per call; costs a few driver-side metadata
    * reads, never a file listing. */
  override def properties(): util.Map[String, String] = {
    val spark = SparkSession.active
    val root = EpochStore.rootOf(options)
    val m = new java.util.HashMap[String, String]()
    m.put("path", root)
    Option(options.get("partitionColumn"))
      .foreach(m.put("partitionColumn", _))
    Option(options.get("transform"))
      .foreach(m.put("transform", _))
    Option(options.get("asOfGeneration"))
      .foreach(m.put("asOfGeneration", _))
    val gens = EpochManifest.generations(spark, root)
    if (gens.nonEmpty) {
      m.put("generation", gens.last.toString)
      m.put("retainedGenerations", gens.mkString(", "))
      val es = EpochManifest.entries(spark, root)
      m.put("epochs", es.size.toString)
      es.map(_.epoch).maxOption.foreach(e => m.put("maxEpoch", e.toString))
    }
    BloomSpec.declared(spark, root).foreach(m.put("bloomColumn", _))
    // partition-spec evolution (X92): the DECLARED current layout plus
    // how many live entries still read under a previous spec — the
    // one-glance answer to "is this store mixed, and is migrate/compact
    // due" in DESCRIBE TABLE EXTENDED
    EpochManifest.currentLayout(spark, root).foreach { l =>
      m.put("layout",
        (l.partCols.map(c => s"identity($c)") ++
          l.transform.toSeq ++
          l.bucketCol.map(c => s"bucket(${l.bucketCount}, $c)"))
          .mkString(", ") match { case "" => "(unpartitioned)"; case s => s })
      val fs = new Path(root).getFileSystem(
        GraftBridge.sessionHadoopConf(spark))
      val foreign = EpochManifest.entries(spark, root).count { e =>
        EpochStoreWrite.readSchemaSidecar(fs, root, e.dir).exists {
          case (_, pc) => EpochStore.splitPartCols(pc) != l.partCols
        } || EpochStoreWrite.readBucketSidecar(fs, root, e.dir) !=
          l.bucketCol.map(c => EpochStore.StoreBucket(c, l.bucketCount))
      }
      m.put("foreignLayoutEntries", foreign.toString)
    }
    val ts = EpochManifest.tags(spark, root)
    if (ts.nonEmpty)
      m.put("tags", ts.toSeq.sortBy(_._1)
        .map { case (n, g) => s"$n=$g" }.mkString(", "))
    EpochStoreConstraints.list(spark, root).foreach { case (n, e) =>
      m.put(s"constraint.$n", e)
    }
    m
  }

  /** `_epoch`: the manifest epoch that committed each row's file — the
    * provenance column that turns the append-only store into a
    * latest-wins keyed table ([[EpochStore.readLatest]]). Served as a
    * per-file constant; costs nothing unless selected. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = EpochStore.EpochColName
        override def dataType(): org.apache.spark.sql.types.DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "manifest epoch that committed this row's file"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = EpochStore.ChangeColName
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "changefeed change type: insert (data row) or delete " +
            "(equality tombstone)"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = EpochStore.RowFileColName
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "root-relative data file path of this row (row lineage)"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = EpochStore.RowPosColName
        override def dataType(): org.apache.spark.sql.types.DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "parquet row index of this row within its file (row lineage)"
      })

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    // table-creation options carry path/partitionColumn/maxEpoch/
    // asOfGeneration; scan-time options would only add session defaults
    new EpochStoreScanBuilder(tableSchema, options)

  /** Append = land one epoch + atomic manifest publish (the write half,
    * [[EpochStoreWriteBuilder]]). The TABLE's own options (path,
    * partitionColumn, …) merge UNDER the per-write options, so catalog
    * SQL (`INSERT INTO cat.t …`) reaches the sink with the store's
    * identity and layout even though the statement carries no options;
    * without option("epoch", n) the next epoch is auto-allocated
    * (single-writer contract — concurrent INSERTs race the allocation,
    * use explicit epochs for multi-writer pipelines). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val m = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    m.putAll(info.options().asCaseSensitiveMap())
    val merged = new CaseInsensitiveStringMap(m)
    require(merged.get("asOfGeneration") == null,
      "cannot write to a time-traveled epochstore table — drop VERSION AS OF")
    new EpochStoreWriteBuilder(new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = merged
      override def queryId(): String = info.queryId()
      override def schema(): StructType = info.schema()
    })
  }

  /** SQL `DELETE FROM … WHERE …`, metadata-first: entries provably
    * all-matching drop from the manifest, provably untouched ones stay,
    * and only mixed entries rewrite copy-on-write — published as ONE
    * manifest commit ([[EpochStoreDml.resolveDelete]]), pre-delete
    * snapshot retained. Untranslatable conditions (subqueries, exotic
    * expressions) refuse here and Spark falls back to the row-level
    * rewrite ([[newRowLevelOperationBuilder]]). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    // a row-identity store routes EVERY delete merge-on-read
    // ([[EpochStoreDelta]]): the metadata-first path drops/rewrites
    // entries without carrying their _delta tombstones, which would
    // resurrect rows those tombstones kill. A store with live entries
    // still NEEDING alias resolution routes to the row-level rewrite
    // too — its scan is alias-aware, the metadata path's per-entry
    // classification is not (after CALL compact rewrites every entry
    // to current names, the path reopens — liveAliasNeed, not the
    // immutable ops log, is the gate).
    EpochStoreDelta.morKeysOf(SparkSession.active, options).isEmpty &&
      !EpochStore.liveAliasNeed(SparkSession.active,
        EpochStore.rootOf(options)) &&
      filters.forall(f => EpochStoreDml.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val root = EpochStore.rootOf(options)
    // pin the snapshot the delete resolves against; a commit racing in
    // between refuses loudly (the rewrite's survivor dirs would carry
    // stale rows otherwise) — the generation recheck appends/RLO have
    val base = EpochManifest.entries(spark, root)
    // POSITION-DELETE mode (X94): matched rows' (file, ordinal) land in
    // one new `_dv` entry — history dirs untouched, O(matched) write
    val dvMode = java.lang.Boolean.parseBoolean(
      spark.conf.get(EpochStoreDv.EnabledConf, "false"))
    val resolved =
      if (dvMode) EpochStoreDv.resolveDeleteDv(spark, root, filters)
      else EpochStoreDml.resolveDelete(spark, root, filters)
    EpochManifest.commitIfUnchanged(spark, root, base, resolved)
    ()
  }

  /** SQL `UPDATE` / `MERGE INTO` (and DELETEs the metadata path
    * refuses): group-based copy-on-write where the group is a manifest
    * entry ([[EpochStoreRowLevelOperation]]). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    // a declared row identity routes UPDATE/MERGE/DELETE merge-on-read
    // ([[EpochStoreDelta]] — one delta epoch at delta cost); an
    // IDENTITY-LESS store under `spark.graft.deleteVectors.enabled`
    // routes through POSITION deltas instead (X99 — O(matched) journal
    // + reinserts, [[EpochStoreDvOperation]]); everything else keeps
    // the group-based copy-on-write rewrite
    val keys = EpochStoreDelta.morKeysOf(SparkSession.active, options)
    if (keys.nonEmpty)
      new EpochStoreDeltaOperationBuilder(tableSchema, options, info, keys)
    else if (java.lang.Boolean.parseBoolean(SparkSession.active.conf
      .get(EpochStoreDv.EnabledConf, "false")))
      new EpochStoreDvOperationBuilder(tableSchema, options, info)
    else new EpochStoreRowLevelOperationBuilder(tableSchema, options, info)
  }

  /** SQL `TRUNCATE TABLE` — one empty-entry-list manifest commit: every
    * row gone atomically, the data dirs themselves reclaimed by the
    * next gc (a reader pinned to the pre-truncate generation keeps its
    * snapshot through the usual two-manifest lag). The delete sub-store
    * truncates with it — tombstones against an empty table are noise. */
  override def truncateTable(): Boolean = {
    val spark = SparkSession.active
    val root = EpochStore.rootOf(options)
    // replace exactly the snapshot this statement saw — an append that
    // lands mid-truncate refuses instead of being silently clobbered
    EpochManifest.commitIfUnchanged(spark, root,
      EpochManifest.entries(spark, root), Seq.empty)
    val delRoot = EpochStore.deletesRoot(root)
    if (EpochManifest.generations(spark, delRoot).nonEmpty)
      EpochManifest.commit(spark, delRoot, Seq.empty)
    true
  }
}

final class EpochStoreScanBuilder(tableSchema: StructType,
                                  options: CaseInsensitiveStringMap,
                                  rlo: EpochStoreRowLevelOperation = null)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  /** The table-level layout: a LAYOUT LOG (partition-spec evolution,
    * X92) is AUTHORITATIVE over options — a path-based read with no
    * (or stale) layout options on an evolved store would otherwise
    * misread every current-layout entry as foreign. Never-evolved
    * stores read their options exactly as before (one log probe). */
  private val declaredLayout = EpochManifest.currentLayout(
    SparkSession.active, EpochStore.rootOf(options))
  private val partCols: Seq[String] =
    declaredLayout.map(_.partCols)
      .getOrElse(EpochStore.partColsOf(options))
  private val bucket: Option[EpochStore.StoreBucket] =
    declaredLayout match {
      case Some(l) => l.bucketCol.map(c => EpochStore.StoreBucket(c,
        l.bucketCount))
      case None => EpochStore.bucketOf(options)
    }
  /** The time-unit/truncate level ([[StoreTransform]], X93) — the
    * declared layout's transform on layout-log stores (X92 ∘ X93:
    * entries under other transforms degrade to unpruned-but-exact),
    * otherwise option-declared (the catalog serves it when every
    * pinned entry records the same spelling). */
  private val transform: Option[StoreTransform] =
    (declaredLayout match {
      case Some(l) => l.transform.map(StoreTransform.parse)
      case None => EpochStore.transformOf(options)
    }).map { t =>
      tableSchema.fields.find(_.name == t.col).foreach(f =>
        StoreTransform.validate(t, f.dataType))
      t
    }
  private var required: StructType = tableSchema
  private var partFilters: Array[Filter] = Array.empty
  private var dataFilters: Array[Filter] = Array.empty
  /** rlo mode only: the command condition, used EXCLUSIVELY to skip
    * whole entries (groups) — never dirs or files within a kept entry,
    * which the rewrite must read in full. */
  private var groupFilters: Array[Filter] = Array.empty
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[EpochStore.TopNPush] = None

  /** Both pushes are PARTIAL by design: the scan may return a superset
    * (files without stats disable truncation), so Spark always keeps
    * its own limit/sort operator. */
  override def isPartiallyPushed(): Boolean = true
  private var pushedAgg: Option[(
    org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
    StructType)] = None

  /** LIMIT truncation from the stats sidecars' row counts: with no
    * residual data filter (partition filters are answered exactly, so
    * every surviving file's rows qualify), the scan plans only a prefix
    * of the file list whose recorded rows already cover the limit —
    * `LIMIT 10` over a 10k-file store opens one file. Always PARTIAL
    * (Spark keeps its limit operator), so files without recorded row
    * counts simply disable the truncation, never the correctness. */
  /** Row-identity (merge-on-read) keys this read must honor — explicit
    * option or the store's `_rowid.json` declaration. Nonempty keys
    * disable row-count-dependent pushes (limit/top-N truncation, footer
    * aggregation): live tombstones may drop rows AFTER the file bound,
    * so a prefix proven to cover k raw rows may cover fewer live ones.
    * File skipping (stats/bloom) stays on — supersets are re-filtered. */
  private lazy val morKeys: Seq[String] =
    EpochStoreDelta.morKeysOf(SparkSession.active, options)
  /** Row-count pushes stay available on a row-identity store with NO
    * live tombstones (the common, post-compact state). A delta commit
    * racing in after this check is caught downstream: the scan's own
    * pinned tombstone map disables limit/top-N truncation race-free,
    * and the footer-agg scan re-checks its pinned entries and refuses
    * loudly rather than over-count. */
  /** X94 position deletes disable row-count-dependent pushes the same
    * way live equality tombstones do — dead ordinals drop rows after
    * any file bound. Decided from the PINNED snapshot (asOfGeneration),
    * not the current head: after `CALL compact` folds DVs away, a
    * time-travel read of the DV-carrying generation still drops rows.
    * The scan's own `dvFiltering` re-checks race-free at planning. */
  private lazy val dvLive: Boolean =
    EpochStoreDv.hasLiveDvs(SparkSession.active,
      EpochStore.rootOf(options),
      EpochStore.pinnedEntries(SparkSession.active,
        EpochStore.rootOf(options), options))
  private lazy val morLiveTombstones: Boolean =
    morKeys.nonEmpty &&
      EpochStoreDelta.hasLiveTombstones(SparkSession.active,
        EpochStore.rootOf(options))

  override def pushLimit(limit: Int): Boolean = {
    if (rlo != null || dataFilters.nonEmpty || limit <= 0 ||
      morLiveTombstones || dvLive) return false
    pushedLimit = Some(limit)
    true
  }

  /** ORDER-BY-LIMIT file bound from the stats sidecars' min/max: for a
    * single-column sort over a stats column, the scan keeps the minimal
    * file set PROVABLY containing the top k — sort candidates by
    * max (asc) / min (desc), take files until their non-null rows cover
    * k, and drop every file whose range lies wholly beyond that bound
    * ([[EpochStoreScan.applyRowBound]]). On a store written with
    * `sortColumns` (range-distributed, per-file disjoint ranges) this
    * reads the one or two files holding the answer. Partial push —
    * Spark still sorts the survivors. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{
      NamedReference, NullOrdering, SortDirection}
    if (rlo != null || dataFilters.nonEmpty || limit <= 0 ||
      orders.isEmpty || morLiveTombstones || dvLive)
      return false
    // bounding on the FIRST sort column alone is sound for a
    // lexicographic top-k: once ≥ k rows have c1 ≤ B, no row with
    // c1 > B can rank in the top k whatever the tie-breaks say — and
    // the push is partial, so Spark re-sorts the survivors fully
    val o = orders.head
    val col = o.expression() match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        nr.fieldNames.head
      case _ => return false
    }
    // the bound needs recorded min/max: data columns only
    if (partCols.contains(col) || col == EpochStore.EpochColName ||
      !tableSchema.fieldNames.contains(col)) return false
    pushedTopN = Some(EpochStore.TopNPush(col,
      o.direction() == SortDirection.DESCENDING,
      o.nullOrdering() == NullOrdering.NULLS_FIRST, limit))
    true
  }

  /** Metadata-only aggregation ([[EpochStoreAggScan]]): accepted when
    * every residual filter is answered by dir pruning (no data filter —
    * footer counts would be wrong otherwise), grouping (if any) is the
    * partition column alone (constant per dir, so per-file partials are
    * exact), and every aggregate is COUNT(*) / non-distinct COUNT(col) /
    * MIN / MAX over a type whose parquet statistics are trustworthy
    * as-is (fixed-width numerics, date, boolean — strings and binaries
    * can carry truncated stats, timestamps carry rebase modes; both
    * refused, Spark then scans rows as usual). Partial pushdown only:
    * each file emits one partial row, Spark's rewrite merges. */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (rlo != null) return false
    if (options.getBoolean("aggregatePushdown", true) == false) return false
    if (dataFilters.nonEmpty) return false
    // a row-identity store with live tombstones — footer counts would
    // include killed rows; Spark scans rows as usual
    if (morLiveTombstones || dvLive) return false
    // a spec-evolved store keeps the metadata path where it stays
    // provably sound: the agg listing walks each entry under its own
    // spec, so UNGROUPED aggregates always qualify; GROUPED ones (keys
    // ⊆ the current partition dirs) need every pinned entry on the
    // CURRENT layout (a foreign entry's tuples aren't those dirs), and
    // an aggregated COLUMN that any entry dir-serves has no file stats
    // there — both checked per entry below
    val specLayout = EpochManifest.currentLayout(SparkSession.active,
      EpochStore.rootOf(options))
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    val statSafe: Set[DataType] = Set(ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, DateType, BooleanType)
    def dataColType(n: String): Option[DataType] =
      tableSchema.fields.find(f => f.name == n && !partCols.contains(n))
        .map(_.dataType)
    val funcsOk = agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count =>
          !c.isDistinct && colOf(c.column).exists(dataColType(_).nonEmpty)
        case m: Min => colOf(m.column).exists(dataColType(_).exists(statSafe))
        case m: Max => colOf(m.column).exists(dataColType(_).exists(statSafe))
        case _ => false
      }
    if (!funcsOk) return false
    // every aggregated COLUMN must exist in every pinned entry's
    // recorded schema — possibly under a historical PHYSICAL name (the
    // footer/sidecar fold resolves each entry's spelling through the
    // alias chains, so a rename history no longer disables the
    // metadata-only path): an entry predating an ADD COLUMN has neither
    // footer stats nor sidecar entries for it, and the footer fold
    // cannot serve the rows' value (null — or the EXISTENCE default);
    // an entry without a record proves nothing. COUNT(*) has no column
    // and stays eligible.
    val aggCols = agg.aggregateExpressions.toSeq.flatMap {
      case c: Count => colOf(c.column)
      case m: Min => colOf(m.column)
      case m: Max => colOf(m.column)
      case _ => Nil
    }.distinct
    val aliases = EpochStore.columnAliases(SparkSession.active,
      EpochStore.rootOf(options))
    if (aggCols.nonEmpty || !aliases.isEmpty || specLayout.nonEmpty) {
      val spark = SparkSession.active
      val root = EpochStore.rootOf(options)
      val fs = new Path(root)
        .getFileSystem(GraftBridge.sessionHadoopConf(spark))
      val ok = EpochStore.pinnedEntries(spark, root, options).forall { e =>
        EpochStoreWrite.readSchemaSidecar(fs, root, e.dir) match {
          case Some((s, pc)) =>
            val efs = s.fieldNames.toSet
            val pcE = EpochStore.splitPartCols(pc)
            val layoutOk = specLayout.forall { l =>
              // grouped: every entry must DIR-SERVE every current
              // identity partition column (its recorded columns are a
              // superset — the agg scan re-expresses each entry's
              // values in current order); the bucket level is inner to
              // the identity dirs and never affects grouping. Ungrouped:
              // any layout. Either way the aggregated columns must be
              // FILE-served in every entry (a dir-served column has
              // neither footer stats nor sidecar entries).
              (agg.groupByExpressions.isEmpty ||
                l.partCols.forall(pcE.contains)) &&
                aggCols.forall(c => !pcE.contains(c))
            }
            layoutOk &&
              aggCols.forall(l => efs.contains(aliases.resolve(l, efs)))
          // pre-evolution entries have no record AND no ALTER history
          // (ALTER refuses without records) — the explicit-schema
          // contract makes their files uniform, footers carry the column
          case None => aliases.isEmpty && specLayout.isEmpty
        }
      }
      if (!ok) return false
    }
    // grouping ⊆ partition columns is enforced by the util below
    org.apache.spark.sql.GraftBridge
      .pushedAggSchema(agg, tableSchema, partCols.toSet) match {
      case Some(s) => pushedAgg = Some((agg, s)); true
      case None => false
    }
  }

  /** Partition-column filters the dir-pruning can answer EXACTLY are
    * fully handled (not returned as residual); everything else stays
    * residual. Data-only filters additionally ride into the parquet
    * reader as row-group/page skip candidates — non-exact there, so
    * they stay residual too (the native parquet source's contract). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (rlo != null) {
      // group contract: the condition may prune whole ENTRIES only —
      // using it for dir/file skipping inside a kept entry would drop
      // rows the copy-on-write rewrite must carry over
      groupFilters = filters
      return filters
    }
    // spec-evolved stores: a filter on ANY entry's identity columns is
    // dir-prunable for THAT entry (the per-entry walk partially binds;
    // entries without those dirs conservatively keep) — so the
    // prunable set is the union of the current layout's and every
    // pinned entry's recorded identity columns
    val prunable: Set[String] = {
      val spark = SparkSession.active
      val root = EpochStore.rootOf(options)
      if (EpochManifest.currentLayout(spark, root).isEmpty) partCols.toSet
      else {
        val fs = new Path(root)
          .getFileSystem(GraftBridge.sessionHadoopConf(spark))
        partCols.toSet ++ EpochStore.pinnedEntries(spark, root, options)
          .flatMap(e => EpochStoreWrite.readSchemaSidecar(fs, root, e.dir))
          .flatMap(r => EpochStore.splitPartCols(r._2))
      }
    }
    val (exact, rest) = filters.partition(f =>
      prunable.nonEmpty &&
        EpochStore.exactPartitionFilter(f, prunable))
    partFilters = exact
    // _epoch is a per-file constant, not a parquet column — filters on it
    // stay residual (Spark re-evaluates them over the served constant)
    dataFilters = rest.filter(f =>
      !f.references.exists(partCols.contains) &&
        !f.references.contains(EpochStore.EpochColName) &&
        !f.references.contains(EpochStore.ChangeColName) &&
        !f.references.contains(EpochStore.RowFileColName) &&
        !f.references.contains(EpochStore.RowPosColName))
    // PARTITION-SPEC evolution: a store with a layout log may hold
    // entries whose files carry the current partition columns IN-ROW —
    // a claimed-exact dir filter would silently pass their rows, so
    // every filter stays RESIDUAL (Spark re-evaluates over the served
    // values) while `partFilters` still prunes each entry's dirs under
    // its own spec. Costs one re-evaluation on fully-migrated stores;
    // never-evolved stores keep today's exact handling.
    if (EpochManifest.currentLayout(SparkSession.active,
      EpochStore.rootOf(options)).nonEmpty) filters
    else rest
  }

  override def pushedFilters(): Array[Filter] = partFilters ++ dataFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** The manifest snapshot is resolved HERE — scan planning — and the
    * pinned entry list travels inside the Scan. */
  override def build(): Scan = {
    val spark = SparkSession.active
    if (rlo != null) {
      // the row-level rewrite's read: pin the operation's generation,
      // skip entries the condition PROVABLY cannot touch (entry-level
      // classification — the same metadata the delete fast path uses),
      // record the kept set as the groups the paired write replaces,
      // and read those entries in full (no dir/file pruning, no
      // runtime narrowing)
      val fs = new Path(rlo.root).getFileSystem(
        GraftBridge.sessionHadoopConf(spark))
      // classification binds each entry's OWN recorded partition fields
      // (exactly like resolveDelete): on a spec-evolved store, walking a
      // foreign-layout entry under the TABLE's dir prefixes would find
      // no leaf dirs and misclassify it Untouched — a silently skipped
      // group, i.e. a lost UPDATE/MERGE. Entries without a record fall
      // back to the table layout (pre-record stores are uniform).
      val tableFields =
        partCols.flatMap(c => tableSchema.fields.find(_.name == c))
      val kept = EpochStore.spanClosure(rlo.pinned,
        rlo.pinned.filter { e =>
          val pf = EpochStoreWrite.readSchemaSidecar(fs, rlo.root, e.dir)
            .map { case (s, pc) =>
              EpochStore.splitPartCols(pc).map(c => s(c)) }
            .getOrElse(tableFields)
          EpochStoreDml.classify(spark, fs, rlo.root, e, pf,
            groupFilters) != EpochStoreDml.Untouched
        })
      rlo.kept = kept
      return EpochStoreScan(tableSchema, required, partCols, rlo.root,
        rlo.generation, kept, Array.empty, Array.empty,
        runtimeFilterable = false, rloRef = rlo)
    }
    val root = EpochStore.rootOf(options)
    val gens = EpochManifest.generations(spark, root)
    require(gens.nonEmpty, s"no committed manifest under $root")
    val asOf = Option(options.get("asOfGeneration")).map(_.toLong).getOrElse(-1L)
    // a BRANCH read (write-audit-publish audit): the pinned snapshot is
    // the branch head's entry list — exclusive with time travel /
    // changefeed (those are main-lineage concepts)
    val branch = Option(options.get("branch"))
    branch.foreach { b =>
      require(asOf < 0L && options.get("changesSinceGeneration") == null,
        s"branch '$b' read cannot combine with asOfGeneration / " +
          "changesSinceGeneration")
    }
    val gen = if (asOf < 0L) gens.last else asOf
    val maxEpoch = Option(options.get("maxEpoch")).map(_.toLong)
      .getOrElse(Long.MaxValue)
    val visible = branch
      .map(b => EpochManifest.branchEntries(spark, root, b))
      .getOrElse(EpochManifest.entriesAt(spark, root, gen))
      .filter(_.epoch <= maxEpoch)
    val branchPinned = branch.nonEmpty
    // changesSinceGeneration: the CHANGEFEED form — only entries whose
    // whole epoch span postdates the base generation's high-water mark.
    // A fold straddling that boundary mixed old rows into new dirs, so
    // the delta is not reconstructible — fail with the boundary rather
    // than over- or under-delivering (compact only up to consumed
    // generations' max epoch and this never trips).
    val entries = Option(options.get("changesSinceGeneration"))
      .map(_.toLong) match {
      case None => visible
      case Some(base) =>
        val baseEs = EpochManifest.entriesAt(spark, root, base)
        val baseMax = baseEs.foldLeft(-1L)((m, e) => math.max(m, e.epoch))
        visible.find(e => e.minEpoch <= baseMax && e.epoch > baseMax)
          .foreach(e => throw new IllegalStateException(
            s"epochstore changefeed over $root: fold ${e.dir} covers epochs " +
              s"[${e.minEpoch}, ${e.epoch}] across generation $base's max " +
              s"epoch $baseMax — the delta since $base is gone; compact " +
              "only below consumed generations"))
        // every base entry must still be visible, or covered by a fold
        // whose span contains it (compaction below the consumed
        // boundary): an entry that DISAPPEARED — a metadata-only
        // all-dead delete, a copy-on-write rewrite, an overwrite, a
        // truncate, a restore — took rows the consumer already holds,
        // and this feed has no delete events to replay for them
        locally {
          val headDirs = visible.map(_.dir).toSet
          baseEs.filterNot(e => headDirs.contains(e.dir)).foreach { e =>
            val covered = visible.exists(h =>
              h.minEpoch <= e.minEpoch && e.epoch <= h.epoch)
            if (!covered) throw new IllegalStateException(
              s"epochstore changefeed over $root: entry ${e.dir} (epochs " +
                s"[${e.minEpoch}, ${e.epoch}]) left the manifest since " +
                s"generation $base with no delete events to replay — the " +
                "delta is not reconstructible (a metadata or copy-on-" +
                "write delete, an overwrite, a truncate, or a restore " +
                "landed); re-seed the consumer from a full snapshot")
          }
        }
        val windowed = visible.filter(_.minEpoch > baseMax)
        // X94: a position-delete journal in the window kills rows
        // committed BEFORE the base — this RAW feed plans it as an
        // empty-data entry and would silently deliver no delete
        // events. [[readChanges]] synthesizes them (it sets the
        // handled flag); every other changefeed read refuses loudly.
        if (options.get("dvChangefeedHandled") == null) {
          val journals = EpochStoreDv.dvCarrying(spark, root, windowed)
          if (journals.nonEmpty) throw new IllegalStateException(
            s"epochstore changefeed over $root: entries " +
              s"${journals.map(_.dir).mkString(", ")} since generation " +
              s"$base carry position deletes (deletion vectors) whose " +
              "delete events this raw feed cannot deliver — read the " +
              "CDC feed (EpochStore.readChanges synthesizes them) or " +
              "run CALL compact below the consumed boundary first")
        }
        windowed
    }
    pushedAgg match {
      case Some((agg, aggSchema)) =>
        EpochStoreAggScan(tableSchema, partCols, root, gen, entries,
          partFilters, agg, aggSchema)
      case None =>
        EpochStoreScan(tableSchema, required, partCols, root, gen, entries,
          partFilters, dataFilters,
          streamOptions = Seq("startingafterepoch", "maxepochspertrigger")
            .flatMap(k => Option(options.get(k)).map(k -> _)).toMap,
          branchPinned = branchPinned,
          bucket = bucket,
          transform = transform,
          // the store's own _bloom.json declaration makes skipping work
          // with no option — SQL/catalog readers included
          bloomCol = Option(options.get("bloomColumn"))
            .orElse(BloomSpec.declared(spark, root)),
          limit = pushedLimit, topN = pushedTopN,
          mergeKeys = morKeys)
    }
  }
}

/** One pinned scan: `generation` + `entries` ARE the snapshot. Also the
  * [[Batch]] (single-phase batch read). */
final case class EpochStoreScan(
    fullSchema: StructType, required: StructType, partCols: Seq[String],
    root: String, generation: Long, entries: Seq[EpochManifest.Entry],
    partFilters: Array[Filter], dataFilters: Array[Filter],
    streamOptions: Map[String, String] = Map.empty,
    branchPinned: Boolean = false,
    bucket: Option[EpochStore.StoreBucket] = None,
    transform: Option[StoreTransform] = None,
    bloomCol: Option[String] = None,
    limit: Option[Int] = None,
    topN: Option[EpochStore.TopNPush] = None,
    runtimeFilterable: Boolean = true,
    rloRef: EpochStoreRowLevelOperation = null,
    mergeKeys: Seq[String] = Nil)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  private val partFields: Seq[StructField] =
    partCols.map(c => fullSchema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"partitionColumn $c is not in the schema")))

  /** The `_epoch` METADATA column ([[EpochStoreTable.metadataColumns]])
    * — requested only when the query names it; served as a per-file
    * constant exactly like the partition-dir value. */
  private val epochRequested: Boolean =
    required.fieldNames.contains(EpochStore.EpochColName)

  /** CDC mode: `_change_type` selected — tombstone files join the plan
    * as DELETE-event rows and merge-on-read resolution turns OFF (a
    * changefeed is the RAW stream of changes). */
  private val changeRequested: Boolean =
    required.fieldNames.contains(EpochStore.ChangeColName)

  /** ROW-LINEAGE columns (X99): `_row_file` (root-relative path — a
    * per-file constant) and `_row_pos` (the parquet row index, widened
    * in and SERVED) — the position identity the identity-less MoR
    * operations key on; selectable by any query. Not served on
    * row-identity stores (their delta ops key on the declared rowid;
    * MoR row drops would also make positions non-contiguous to the
    * served rows) or in CDC mode (tombstone-event rows have no data
    * position). */
  private val fileRequested: Boolean =
    required.fieldNames.contains(EpochStore.RowFileColName)
  private val posRequested: Boolean =
    required.fieldNames.contains(EpochStore.RowPosColName)
  require(!(fileRequested || posRequested) ||
    (mergeKeys.isEmpty && !changeRequested),
    s"row-lineage columns (${EpochStore.RowFileColName}/" +
      s"${EpochStore.RowPosColName}) are not served on row-identity " +
      "stores or in changefeed mode")

  /** Files hold every column EXCEPT the partition-dir columns. */
  private val dataSchema: StructType =
    StructType(fullSchema.filterNot(f => partCols.contains(f.name)))
  private val readDataSchema: StructType =
    StructType(required.filterNot(f =>
      partCols.contains(f.name) || f.name == EpochStore.EpochColName ||
        f.name == EpochStore.ChangeColName ||
        f.name == EpochStore.RowFileColName ||
        f.name == EpochStore.RowPosColName)
      // re-attach the TABLE's field metadata (EXISTS_DEFAULT et al.) —
      // column pruning may hand back bare fields, and the parquet
      // readers fill missing columns from the requested schema's
      // existence defaults (X86)
      .map(f => fullSchema.fields.find(_.name == f.name)
        .filter(_.metadata != org.apache.spark.sql.types.Metadata.empty)
        .map(g => f.copy(metadata = g.metadata)).getOrElse(f)))
  private val readPartSchema: StructType =
    StructType(partFields.filter(f => required.fieldNames.contains(f.name)))
  /** Positions (within the partition-value tuple) of the REQUESTED
    * partition columns, in [[readPartSchema]] order. */
  private val requestedPartIdx: Seq[Int] = partFields.zipWithIndex
    .filter { case (f, _) => required.fieldNames.contains(f.name) }
    .map(_._2)
  /** Per-file CONSTANT columns, in output order: the partition-dir value,
    * then `_epoch` when requested. */
  private val constSchema: StructType =
    StructType(readPartSchema ++
      (if (epochRequested)
        Seq(StructField(EpochStore.EpochColName, LongType, nullable = false))
      else Nil) ++
      (if (changeRequested)
        Seq(StructField(EpochStore.ChangeColName,
          org.apache.spark.sql.types.StringType, nullable = false))
      else Nil) ++
      (if (fileRequested)
        Seq(StructField(EpochStore.RowFileColName,
          org.apache.spark.sql.types.StringType, nullable = false))
      else Nil))

  // the file-source output convention: data columns then constant
  // columns; the served ROW INDEX (a pseudo-data column the parquet
  // readers generate) sits between them
  override def readSchema(): StructType =
    StructType(readDataSchema ++
      (if (posRequested)
        Seq(StructField(EpochStore.RowPosColName, LongType,
          nullable = true)) else Nil) ++
      constSchema)

  /** MERGE-ON-READ: the pinned snapshot's equality tombstones
    * ([[EpochStoreDelta]]), loaded once per scan (driver, delta-sized —
    * one tiny parquet per DELTA entry only; zero cost for stores
    * without a row identity). When nonempty, the readers run with the
    * key columns and `_epoch` temporarily widened in, drop rows whose
    * key a strictly-later epoch tombstoned, and project back — row-based
    * until `CALL compact` folds the tombstones into the data. */
  @transient private lazy val tombstones: Map[Seq[Any], Long] =
    if (mergeKeys.isEmpty || changeRequested) Map.empty
    else {
      val keySchema = StructType(mergeKeys.map(k =>
        dataSchema.fields.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"rowid column $k is not a data column of the store"))))
      keySchema.fields.foreach(f =>
        EpochStoreDelta.requireEqualityStableKeyType(f.name, f.dataType))
      EpochStoreDelta.loadTombstones(SparkSession.active, root, entries,
        keySchema)
    }
  private def morFiltering: Boolean = tombstones.nonEmpty
  /** rowid columns the projection pruned — widened back in for the
    * tombstone probe, projected away before rows leave the reader. */
  @transient private lazy val morAddedFields: Seq[StructField] =
    if (!morFiltering) Nil
    else mergeKeys.filterNot(readDataSchema.fieldNames.contains)
      .map(k => dataSchema.fields.find(_.name == k).get)
  /** X94 position deletes: the pinned snapshot's live (entry dir, file
    * rel) → dead ordinals — empty for every store that never wrote a
    * DV (one marker probe). Mutually exclusive with equality MoR by
    * construction (DV deletes refuse on row-identity stores). */
  @transient private lazy val dvTargets: Map[(String, String), Array[Long]] =
    if (!EpochStoreDv.declared(SparkSession.active, root)) Map.empty
    else EpochStoreDv.load(SparkSession.active, root, entries)
  private def dvFiltering: Boolean = dvTargets.nonEmpty
  @transient private lazy val readDataEff: StructType =
    if (morFiltering) StructType(readDataSchema ++ morAddedFields)
    else if (dvFiltering || posRequested)
      // widen the parquet ROW INDEX in (the TEMPORARY-column marker the
      // parquet readers generate, split-safe, rather than reading) —
      // the DV wrapper filters on it, and a requested `_row_pos`
      // SERVES it (the declared readSchema names it at this position)
      StructType(readDataSchema :+ StructField(
        org.apache.spark.sql.execution.datasources.parquet
          .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        LongType, nullable = true))
    else readDataSchema
  @transient private lazy val constEff: StructType =
    if (!morFiltering || epochRequested) constSchema
    else StructType(constSchema :+
      StructField(EpochStore.EpochColName, LongType, nullable = false))
  private def constantsOfEff(lf: EpochStore.ListedFile): Array[Any] =
    if (!morFiltering || epochRequested) constantsOf(lf)
    else constantsOf(lf) :+ (lf.epoch: Any)

  override def toBatch: Batch = this

  /** Incremental tail of the SAME store: each micro-batch is a committed
    * manifest-epoch range, read through the identical pruned/pushed-down
    * parquet path ([[EpochStoreMicroBatchStream]]). Row-identity stores
    * ([[EpochStoreDelta]]) tail the RAW epoch stream — the changefeed
    * contract: a merge-on-read delete arrives as its delta epoch's
    * reinserted rows, never as a retro-filter of already-emitted
    * batches. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // the micro-batch tail resolves MAIN-lineage epochs per trigger — a
    // branch-pinned stream would silently audit the wrong lineage
    if (branchPinned) throw new UnsupportedOperationException(
      s"epochstore streaming over a BRANCH of $root is not supported — " +
        "branches are write-audit-publish staging; tail main (publish " +
        "first) or batch-read the branch head")
    // neither RENAME/DROP history nor a mixed PARTITION SPEC is a tail
    // prerequisite: the micro-batch stream pins a template of this
    // batch scan at start and routes every trigger's files through its
    // per-entry read profiles; mid-stream DDL refuses per batch inside
    // the stream instead (restart re-pins).
    new EpochStoreMicroBatchStream(fullSchema, required, partCols, root,
      partFilters, dataFilters, streamOptions, bloomCol, bucket, transform)
  }

  /** Runtime (DPP) filters on the partition column — delivered by Spark
    * AFTER the dim side of a join executes ([[filter]]); merged into the
    * dir pruning exactly like planning-time pushed filters. */
  @transient private var runtimeFilters: Array[Filter] = Array.empty

  /** Dynamic partition pruning, the DSv2 way: Spark's PartitionPruning
    * rule sees the partition column here, plants a DynamicPruningSubquery
    * on the dim side of a join over it, and hands the resulting IN-set to
    * [[filter]] at runtime — so `store JOIN dims-with-a-predicate` lists
    * and reads only the joined buckets' dirs, the same benefit static
    * probes get from [[EpochStoreScanBuilder.pushFilters]], without the
    * query author naming the buckets. Advertised ONLY when the column
    * survives the projection: PartitionPruning resolves these refs
    * against the scan OUTPUT and a pruned-away column crashes the rule
    * (a join on other columns can't prune dirs anyway). */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (rloRef != null)
      // row-level rewrite: advertise the GROUP identifier (`_epoch`, in
      // the scan output via requiredMetadataAttributes) — Spark's
      // runtime group filtering evaluates the command condition once
      // and hands back the matched epochs ([[filter]])
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(EpochStore.EpochColName))
    else if (!runtimeFilterable) Array.empty
    else (readPartSchema.fieldNames.toSeq ++
      // the bucket column stays a DATA column (it survives projection
      // or it would not be joinable) — a runtime In() on it narrows the
      // bucket-dir listing exactly like a static probe
      bucket.map(_.col).filter(required.fieldNames.contains).toSeq)
      .map(c => org.apache.spark.sql.connector.expressions.Expressions
        .column(c))
      .toArray[org.apache.spark.sql.connector.expressions.NamedReference]

  /** Keep only filters the dir pruning can answer EXACTLY (same contract
    * as planning-time pushdown); anything else is ignored — Spark
    * re-evaluates the join itself, so ignoring is safe, never wrong.
    * In rlo mode the delivered `_epoch` In-set is the RUNTIME group
    * narrowing: the scan drops whole entries no matching row lives in,
    * and the recorded kept set shrinks with it — an UPDATE/MERGE whose
    * condition is statically unprovable still rewrites only the entries
    * that actually contain matches. */
  override def filter(filters: Array[Filter]): Unit = {
    if (rloRef != null) {
      val epochs: Option[Set[Long]] = filters.collectFirst {
        case sources.In(a, vs) if a == EpochStore.EpochColName &&
          !vs.contains(null) =>
          vs.map(_.asInstanceOf[Number].longValue()).toSet
        case sources.EqualTo(a, v: Number)
          if a == EpochStore.EpochColName => Set(v.longValue())
      }
      epochs.foreach { es =>
        val narrowed = EpochStore.spanClosure(entries,
          entries.filter(e => es.contains(e.epoch)))
        rloRef.kept = narrowed
        runtimeEntries = narrowed
        cachedListing = null; cachedOrderedPlan = null
      }
      return
    }
    val exact = filters.filter(f =>
      partCols.nonEmpty &&
        EpochStore.exactPartitionFilter(f, partCols.toSet))
    // bucket layouts: EqualTo/In runtime filters on the bucket column
    // are NOT exact (many values share a bucket — Spark re-evaluates
    // the join anyway) but they narrow the bucket-dir listing
    val bucketNarrow = bucket.toSeq.flatMap(b => filters.filter {
      case sources.EqualTo(a, _) => a == b.col
      case sources.In(a, _) => a == b.col
      case _ => false
    })
    if (exact.nonEmpty || bucketNarrow.nonEmpty) {
      runtimeFilters = exact ++ bucketNarrow
      cachedListing = null; cachedOrderedPlan = null // re-list with the narrowed dir set
    }
  }

  /** True once a runtime (DPP) filter narrowed this scan — the audit
    * hook PlanSpec reads alongside [[selectedPartitionDirs]]. */
  def runtimeFiltered: Boolean = runtimeFilters.nonEmpty

  /** Driver-side listing over the PINNED snapshot: per entry dir, either
    * its files directly (unpartitioned store) or its `col=value` subdirs
    * filtered by the pushed partition filters (planning-time AND
    * runtime). Cached; invalidated when a runtime filter lands. */
  @transient private var cachedListing
      : (Seq[EpochStore.ListedFile], Int, Int) = null
  /** rlo mode: entries narrowed by the runtime group filter. */
  @transient private var runtimeEntries: Seq[EpochManifest.Entry] = null
  private def listing: (Seq[EpochStore.ListedFile], Int, Int) = {
    if (cachedListing == null) {
      val spark = SparkSession.active
      val (files, sel, tot) = EpochStore.listEntryFiles(spark, root,
        if (runtimeEntries != null) runtimeEntries else entries,
        partFields, partFilters ++ runtimeFilters,
        bucket = bucket,
        bucketKeep = bucket.flatMap(b => EpochStore.bucketProbes(
          dataFilters ++ runtimeFilters, b, fullSchema(b.col).dataType)),
        transform = transform,
        // time-unit/truncate pruning: range/equality predicates on the
        // transform column drop whole unit dirs at PLANNING time —
        // before any footer or sidecar is touched
        unitKeep = transform.flatMap(t => TimeTransforms.unitKeep(
          dataFilters ++ runtimeFilters, t, fullSchema(t.col).dataType)),
        // spec evolution: each entry walks under its OWN recorded
        // layout; filters on columns an entry doesn't dir-serve keep
        // its subtree (they run residually over the served rows)
        layoutOf = layoutResolver)
      val kept = applyRowBound(spark,
        applyStatsSkip(spark, applyBloomSkip(spark, files)))
      // CDC mode: every selected entry's equality tombstones join the
      // plan as DELETE-event files (key columns only — the reader nulls
      // the rest; partition values null, no bucket id). Skipping tiers
      // never apply to them: a changefeed must deliver every delete.
      val withDeletes =
        if (!changeRequested) kept
        else kept ++ EpochStoreDelta.deleteEventFiles(
          new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark)),
          root, if (runtimeEntries != null) runtimeEntries else entries,
          partFields)
      filesAudit = (withDeletes.size, files.size)
      cachedListing = (withDeletes, sel, tot)
    }
    cachedListing
  }

  /** Per-entry stats sidecars ([[EpochStoreStats]]), loaded lazily once
    * per scan — one tiny JSON per pinned entry, never per file. */
  @transient private var cachedStats
      : Map[String, Map[String, EpochStoreStats.FileStats]] = null
  private def statsByEntry(spark: SparkSession)
      : Map[String, Map[String, EpochStoreStats.FileStats]] = {
    if (cachedStats == null) {
      val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
      cachedStats =
        entries.map(e => e.dir -> EpochStoreStats.read(fs, root, e.dir)).toMap
    }
    cachedStats
  }

  /** FILE-skipping on range/equality/null-ness predicates from the
    * recorded min / max / null counts: a file whose stats PROVE no row
    * can satisfy some conjunct never enters the plan. Files without a
    * sidecar or without the probed column always stay; the residual
    * filter still runs — skipping is exact, never optimistic. */
  private def applyStatsSkip(spark: SparkSession,
      files: Seq[EpochStore.ListedFile]): Seq[EpochStore.ListedFile] = {
    if (dataFilters.isEmpty) return files
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    EpochStore.statsSkipFiles(fs, root, statsByEntry(spark), files, dataFilters)
  }

  /** LIMIT / ORDER-BY-LIMIT truncation from the recorded row counts:
    * with a pushed limit, plan only a file prefix whose rows cover it;
    * with a pushed single-column TopN, keep the minimal file set
    * PROVABLY containing the top k — rank files by max (asc) / min
    * (desc), cover k non-null rows to fix a value bound, and drop every
    * file whose whole range lies beyond it (rows ≤ the bound exist in
    * the cover, so the k-th value cannot). Any file without the needed
    * stats disables the truncation — both pushes are PARTIAL, Spark
    * still applies the real limit/sort. */
  private def applyRowBound(spark: SparkSession,
      files: Seq[EpochStore.ListedFile]): Seq[EpochStore.ListedFile] = {
    if (topN.isEmpty && limit.isEmpty) return files
    // LIVE merge-on-read tombstones drop rows AFTER the file bound — a
    // prefix proven to cover k raw rows may cover fewer live ones. The
    // pinned snapshot's own tombstone map decides, so this is race-free
    // even when a delta commit landed between pushdown and planning.
    if (tombstones.nonEmpty) return files
    // same discipline for position deletes: the pinned snapshot's own
    // DV map (not the head the pushdown gate saw) disables truncation
    // — a DV commit racing in, or a time-travel read of a since-
    // compacted DV generation, never under-delivers a LIMIT/top-N
    if (dvFiltering) return files
    val se = statsByEntry(spark)
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val withStats = files.map(lf => lf -> se.getOrElse(lf.entryDir, Map.empty)
      .get(EpochStore.relOf(fs, root, lf)))
    if (withStats.exists(_._2.isEmpty)) return files
    topN match {
      case Some(t) =>
        val cs = withStats.map { case (lf, s) =>
          (lf, s.get, s.get.cols.get(t.col)) }
        // legacy UTF-16-ordered string bounds ('s') cannot bound a
        // UTF-8-ordered sort — treat them as absent
        if (cs.exists(c => c._3.isEmpty || c._3.exists(_.kind == 's')))
          return files
        val totalNonNull = cs.map { case (_, f, c) => f.rows - c.get.nulls }.sum
        // fewer non-null rows than k: null rows fill the tail — every
        // file may contribute, no bound
        if (totalNonNull < t.limit) return files
        // rank by the file's FAR edge in sort direction; all-null files
        // have no edge and join only through the nulls clause below
        val ranked = cs.flatMap { case (lf, f, c) =>
          (if (t.desc) c.get.min else c.get.max).map(k => (f, c.get, k))
        }.sortWith((a, b) => EpochStoreStats.cmp(a._3, b._3)
          .exists(x => if (t.desc) x > 0 else x < 0))
        var acc = 0L
        var bound: Any = null
        val it = ranked.iterator
        while (acc < t.limit && it.hasNext) {
          val e = it.next(); acc += e._1.rows - e._2.nulls; bound = e._3
        }
        if (acc < t.limit || bound == null) return files
        val b = bound
        files.filter { lf =>
          val c = se(lf.entryDir)(EpochStore.relOf(fs, root, lf)).cols(t.col)
          val inRange = (if (t.desc) c.max else c.min) match {
            case Some(edge) => EpochStoreStats.cmp(edge, b)
              .forall(x => if (t.desc) x >= 0 else x <= 0)
            case None => false // all-null file: only the nulls clause keeps it
          }
          inRange || (t.nullsFirst && c.nulls > 0L)
        }
      case None =>
        val k = limit.get.toLong
        var acc = 0L
        val out = Seq.newBuilder[EpochStore.ListedFile]
        val it = withStats.iterator
        while (acc < k && it.hasNext) {
          val (lf, s) = it.next(); acc += s.get.rows; out += lf
        }
        out.result()
    }
  }

  /** Planning-time size/row statistics over the PRUNED file set (dirs,
    * bloom, stats-range, row bounds all applied) — what Spark's join
    * planning consumes: a store narrowed to one partition's files
    * reports that partition's bytes, so the plain auto-broadcast
    * threshold fires on the post-pruning reality instead of a
    * whole-table guess. Row counts come from the stats sidecars and are
    * reported only when every kept file recorded one. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val spark = SparkSession.active
    val files = listing._1
    val size = files.map(_.status.getLen).sum
    val se = statsByEntry(spark)
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val rows = files.foldLeft(Option(0L)) { (acc, lf) =>
      for {
        a <- acc
        st <- se.getOrElse(lf.entryDir, Map.empty)
          .get(EpochStore.relOf(fs, root, lf))
      } yield a + st.rows
    }
    // COLUMN-LEVEL statistics for the cost-based optimizer (X88): fold
    // the pruned file set's recorded per-file min/max/null counts into
    // one v2 ColumnStatistics per requested numeric data column — what
    // Spark's transformV2Stats turns into attributeStats for CBO join
    // sizing and filter selectivity. A column any planned file lacks
    // stats for (or a string/legacy kind — representation mismatch)
    // reports nothing; values are folded with the same comparison the
    // skip tiers prove exactness under, so the bounds are never wrong,
    // only absent. Alias chains resolve renamed columns per entry.
    val colStats: java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      new java.util.HashMap()
    // the planned entries' commit-folded NDV sketches (one tiny sidecar
    // per entry, loaded once per statistics request)
    val entryNdvByDir: Map[String, Map[String, (Char, Array[Byte])]] =
      files.map(_.entryDir).distinct
        .map(d => d -> EpochStoreStats.readEntryNdv(fs, root, d)).toMap
    if (files.nonEmpty) readDataSchema.fields.foreach { f =>
      import org.apache.spark.sql.types._
      // the widening AND the accepted sidecar kind come from the column
      // type together — a kind that disagrees with the type (a confused
      // legacy sidecar) reports nothing rather than casting wrong
      val widenKind: Option[(Any => Any, Char)] = f.dataType match {
        case ByteType => Some((v => v.asInstanceOf[Long].toByte, 'l'))
        case ShortType => Some((v => v.asInstanceOf[Long].toShort, 'l'))
        case IntegerType => Some((v => v.asInstanceOf[Long].toInt, 'l'))
        case LongType => Some((identity, 'l'))
        case FloatType => Some((v => v.asInstanceOf[Double].toFloat, 'd'))
        case DoubleType => Some((identity, 'd'))
        // 'S' string bounds are EXACT task-side accumulations under
        // UTF-8 binary order (never parquet's truncated binary stats) —
        // the same contract the skip tier proves row skipping under.
        // Estimation consumes nullCount for string IS [NOT] NULL
        // selectivity; the bounds ride along as catalyst UTF8Strings
        // (ValueInterval treats string ranges as unbounded, so a
        // present bound can never mis-estimate). Legacy 's' (UTF-16
        // order) sidecars report nothing.
        case StringType => Some((v =>
          org.apache.spark.unsafe.types.UTF8String
            .fromString(v.asInstanceOf[String]), 'S'))
        case _ => None
      }
      val widen = widenKind.map(_._1)
      if (widenKind.nonEmpty) {
        val perFile = files.map { lf =>
          se.getOrElse(lf.entryDir, Map.empty)
            .get(EpochStore.relOf(fs, root, lf))
            .flatMap(_.cols.get(aliases.resolve(f.name,
              entryFieldsByDir.getOrElse(lf.entryDir, Set.empty))))
            .filter(_.kind == widenKind.get._2)
        }
        if (perFile.forall(_.isDefined)) {
          val cs = perFile.flatten
          val nulls = cs.map(_.nulls).sum
          val mins = cs.flatMap(_.min)
          val maxs = cs.flatMap(_.max)
          val lo = mins.reduceOption((a, b) =>
            if (EpochStoreStats.cmp(a, b).exists(_ <= 0)) a else b)
          val hi = maxs.reduceOption((a, b) =>
            if (EpochStoreStats.cmp(a, b).exists(_ >= 0)) a else b)
          // DISTINCT-COUNT for CBO: fold the planned ENTRIES' merged
          // HLL registers (per-register max = lossless union) into one
          // estimate — the statistic join-reorder and join-cardinality
          // estimation actually key on; min/max alone under-inform
          // them. One ~512 B sketch per (entry, column) — commit-time
          // folded ([[EpochStoreStats.writeEntryNdv]]), so a 10k-file
          // entry costs one blob at planning, not 10k. Legacy per-file
          // sketches (pre-fold sidecars) still fold here. Reported only
          // when EVERY planned entry serves the column's sketch.
          val ndv: Option[Long] = {
            val kind = widenKind.get._2
            val perEntry = files.map(_.entryDir).distinct.map { d =>
              val phys = aliases.resolve(f.name,
                entryFieldsByDir.getOrElse(d, Set.empty))
              entryNdvByDir.getOrElse(d, Map.empty).get(phys)
                .filter(_._1 == kind).map(_._2)
                .orElse {
                  val legacy = files.filter(_.entryDir == d).map(lf =>
                    se.getOrElse(d, Map.empty)
                      .get(EpochStore.relOf(fs, root, lf))
                      .flatMap(_.cols.get(phys))
                      .filter(_.kind == kind).flatMap(_.ndv))
                  if (legacy.isEmpty || legacy.exists(_.isEmpty)) None
                  else {
                    val acc = new Array[Byte](EpochStoreStats.Ndv.M)
                    legacy.foreach(r =>
                      EpochStoreStats.Ndv.mergeInto(acc, r.get))
                    Some(acc)
                  }
                }
            }
            if (perEntry.exists(_.isEmpty)) None
            else {
              val acc = new Array[Byte](EpochStoreStats.Ndv.M)
              perEntry.foreach(r =>
                EpochStoreStats.Ndv.mergeInto(acc, r.get))
              Some(EpochStoreStats.Ndv.estimate(acc))
            }
          }
          colStats.put(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(f.name),
            new org.apache.spark.sql.connector.read.colstats
              .ColumnStatistics {
              override def nullCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(nulls)
              override def distinctCount(): java.util.OptionalLong =
                ndv.map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
              override def min(): java.util.Optional[Object] =
                lo.map(v => widen.get(v).asInstanceOf[Object])
                  .map(java.util.Optional.of[Object])
                  .getOrElse(java.util.Optional.empty[Object]())
              override def max(): java.util.Optional[Object] =
                hi.map(v => widen.get(v).asInstanceOf[Object])
                  .map(java.util.Optional.of[Object])
                  .getOrElse(java.util.Optional.empty[Object]())
            })
        }
      }
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }

  /** (files kept, files listed) after the bloom-sidecar skip — the
    * data-skipping audit PlanSpec reads. Equal when no skip applied. */
  @transient private var filesAudit: (Int, Int) = (0, 0)
  def skippedFilesAudit: (Int, Int) = { listing; filesAudit }

  /** FILE-skipping on point lookups: when the store was written with a
    * `bloomColumn` sidecar ([[EpochStoreWriteBuilder]]) and this scan
    * carries a conjunctive EqualTo/In data filter on that column, each
    * candidate file's bloom decides "definitely absent" vs "maybe
    * present" BEFORE the file enters the plan — a needle-in-100 TB probe
    * opens the few files whose filter might hold the key, not every
    * file of the (already dir-pruned) candidate set. Bloom filters have
    * no false negatives, so skipping is exact; false positives only
    * cost an extra file read, and the residual filter still runs. Files
    * without a sidecar (pre-bloom epochs, compaction folds) are always
    * kept. */
  private def applyBloomSkip(spark: SparkSession,
      files: Seq[EpochStore.ListedFile]): Seq[EpochStore.ListedFile] = {
    val probes = EpochStore.bloomProbes(dataFilters, bloomCol)
    if (probes.isEmpty) return files
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    EpochStore.bloomSkipFiles(fs, root, files, probes,
      bloomCol.exists(c => fullSchema(c).dataType == StringType))
  }

  /** selected/total partition dirs across the pinned epochs — the
    * pruning proof PlanSpec reads (also surfaced in [[description]]). */
  def selectedPartitionDirs: (Int, Int) = (listing._2, listing._3)

  override def description(): String = {
    val (sel, tot) = selectedPartitionDirs
    val bound = topN.map(t => s" PushedTopN: ${t.col} " +
        s"${if (t.desc) "DESC" else "ASC"} LIMIT ${t.limit},")
      .orElse(limit.map(l => s" PushedLimit: $l,")).getOrElse("")
    s"epochstore $root gen=$generation epochs=${entries.size} " +
      s"partitions=$sel/$tot$bound " +
      s"PushedFilters: [${(partFilters ++ dataFilters).mkString(", ")}], " +
      s"ReadSchema: ${readSchema().catalogString}"
  }

  /** STORAGE-PARTITIONED execution: when the partition column survives
    * into the output, the scan reports KeyGroupedPartitioning over it —
    * with `spark.sql.sources.v2.bucketing.enabled=true`, Spark groups
    * the input partitions by key and a `groupBy(partCol)` aggregates
    * with ZERO exchange, while a join of two stores partitioned on the
    * same column runs as a storage-partitioned join (each task joins one
    * key's files from both sides — the 100 TB co-location win, no
    * terabyte shuffle to align what storage already aligned). With the
    * conf off (default) Spark ignores the report and plans exchanges as
    * usual — correctness never depends on it. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    // hash-bucket layout: report bucket(n, col) so two same-bucketed
    // stores join storage-partitioned (zero shuffle on either side) —
    // only when the column survives projection and every listed file
    // sits in a real bucket dir (a -1 = an unbucketed rewrite entry)
    if (bucket.nonEmpty) {
      val b = bucket.get
      // composite identity+bucket: the storage key is the FULL tuple
      // (identity values…, bucket id) — reported only when every level's
      // column survives projection and every file sits in a real bucket
      // dir; a bucket-only layout reports bucket(n, col) alone
      if (required.fieldNames.contains(b.col) &&
        readPartSchema.size == partFields.size &&
        listing._1.nonEmpty && listing._1.forall(_.bucketId >= 0) &&
        !hasLayoutProfiles && !dvFiltering)
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
          (partCols.map(c => org.apache.spark.sql.connector.expressions
            .Expressions.identity(c)) :+
            org.apache.spark.sql.connector.expressions.Expressions
              .bucket(b.n, b.col))
            .toArray[org.apache.spark.sql.connector.expressions.Expression],
          listing._1.map(f => (f.values, f.bucketId)).distinct.size)
      else new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
    }
    // report the COMPOSITE key only when every partition column survives
    // into the output (a partial key is not the storage partitioning)
    // AND every planned entry reads under the current layout — a mixed
    // store's foreign-layout entries are not key-clustered on this key
    else if (partFields.nonEmpty && readPartSchema.size == partFields.size &&
      !hasLayoutProfiles && !dvFiltering)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        partCols.map(c => org.apache.spark.sql.connector.expressions
          .Expressions.identity(c))
          .toArray[org.apache.spark.sql.connector.expressions.Expression],
        listing._1.map(_.values).distinct.size)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)

  /** Driver-side fs for per-file constant derivation (row lineage). */
  @transient private lazy val constFs =
    new Path(root).getFileSystem(
      GraftBridge.sessionHadoopConf(SparkSession.active))

  private def constantsOf(lf: EpochStore.ListedFile): Array[Any] = {
    val b = Array.newBuilder[Any]
    requestedPartIdx.foreach(i => b += lf.values(i))
    if (epochRequested) b += lf.epoch
    if (changeRequested) b += (if (lf.isDelete) "delete" else "insert")
    if (fileRequested)
      b += (lf.entryDir + "/" + EpochStore.relOf(constFs, root, lf))
    b.result()
  }

  /** True when planInputPartitions keys partitions by the composite
    * (identity values…, bucket) tuple — the SPJ packing. */
  private def spjBucketKeyed: Boolean =
    bucket.nonEmpty && required.fieldNames.contains(bucket.get.col) &&
      readPartSchema.size == partFields.size &&
      listing._1.nonEmpty && listing._1.forall(_.bucketId >= 0) &&
      !hasLayoutProfiles && !dvFiltering

  /** The file groups [[planInputPartitions]] packs — SPJ bucket-keyed,
    * identity-keyed, or one global group. The ordering feasibility
    * check below MUST group the same way: a reported per-partition sort
    * order only has to hold within each packed group. */
  private def fileGroups: Seq[(Seq[Any], Seq[EpochStore.ListedFile])] =
    if (spjBucketKeyed)
      // pack per (identity values…, bucket) KEY so every task holds one
      // key's files only (the HasPartitionKey contract key-grouped
      // execution requires); bucket-only layouts key by bucket alone
      listing._1.groupBy(f => (f.values, f.bucketId)).toSeq
        .sortBy { case ((vs, k), _) =>
          (vs.map(String.valueOf).mkString("\u0000"), k) }
        .map { case ((vs, k), files) => (vs :+ (k: Any), files) }
    else if (partFields.isEmpty || readPartSchema.size != partFields.size ||
      hasLayoutProfiles)
      Seq((Seq.empty[Any], listing._1))
    else
      // pack per partition VALUE tuple so every task holds one key's
      // files only (the HasPartitionKey contract Spark's key-grouping
      // requires); the key rides on the partition, the rows unchanged
      listing._1.groupBy(_.values).toSeq
        .sortBy(t => t._1.map(String.valueOf).mkString("\u0000"))
        .map { case (vs, files) => ((vs: Seq[Any]), files) }

  /** SORT-ORDER REPORT ([[org.apache.spark.sql.connector.read
    * .SupportsReportOrdering]]): when every planned partition can be
    * packed provably sorted, the scan reports `sortColumns` ascending
    * (nulls first) and Spark ELIDES the matching SortExec — a sort-merge
    * join of two same-bucketed, sorted, compacted stores runs with zero
    * exchange AND zero sort, the sorted-bucketed-table property that
    * turns a 100 TB join into a streaming per-bucket merge.
    *
    * Provably sorted =
    *  - every listed entry records the same `sortColumns` prefix in its
    *    `_schema.json` (each data FILE is internally ordered — the write
    *    enforced it), and the prefix survives projection; and
    *  - within each packed group, either one file, or every file has
    *    recorded min/max for the leading sort column ('S'/numeric — the
    *    same UTF-8/decimal order the rows compare under), no nulls, and
    *    the min-ordered chain is range-disjoint. Strictly disjoint
    *    (max < next min) proves the FULL prefix; a touching boundary
    *    (max == next min) still proves the single leading column (equal
    *    keys may interleave across the boundary, their suborder may not).
    * Anything unprovable reports nothing — plans keep today's shape.
    * Recomputed when a runtime filter narrows the listing (a subset of
    * a disjoint chain stays disjoint, so a reported order never breaks).
    */
  @transient private var cachedOrderedPlan
      : Option[(Seq[(String, Boolean)],
        Map[Seq[Any], Seq[EpochStore.ListedFile]])] = null
  private def orderedPlan
      : Option[(Seq[(String, Boolean)],
        Map[Seq[Any], Seq[EpochStore.ListedFile]])] = {
    if (cachedOrderedPlan == null) cachedOrderedPlan = computeOrderedPlan()
    cachedOrderedPlan
  }
  private def computeOrderedPlan()
      : Option[(Seq[(String, Boolean)],
        Map[Seq[Any], Seq[EpochStore.ListedFile]])] = {
    if (dvFiltering) return None // DV-targeted files pack their own way
    val spark = SparkSession.active
    val files = listing._1
    if (files.isEmpty || changeRequested) return None
    // mixed partition specs: a sort order proven under one layout says
    // nothing across foreign-layout groups — no report (migrate_layout
    // or compaction restores it)
    if (hasLayoutProfiles) return None
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // recorded entries are `name` (asc) or `name DESC` — direction is
    // part of the layout, so the common prefix agrees on BOTH
    val sortsByDir = files.map(_.entryDir).distinct
      .map(d => d -> EpochStoreWrite.readSortSidecar(fs, root, d)
        .map(EpochStore.parseSortCol)).toMap
    if (sortsByDir.valuesIterator.exists(_.isEmpty)) return None
    val common = sortsByDir.valuesIterator.reduceLeft { (a, b) =>
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1) }
    val prefix0 = common.takeWhile(p =>
      readDataSchema.fieldNames.contains(p._1))
    if (prefix0.isEmpty) return None
    val (s1, s1Desc) = prefix0.head
    val se = statsByEntry(spark)
    def statOf(lf: EpochStore.ListedFile): Option[EpochStoreStats.ColStats] =
      se.getOrElse(lf.entryDir, Map.empty)
        .get(EpochStore.relOf(fs, root, lf)).flatMap(_.cols.get(s1))
        // legacy UTF-16-ordered string bounds prove nothing under the
        // UTF-8 row order
        .filterNot(_.kind == 's')
    var len = prefix0.length
    val out = Map.newBuilder[Seq[Any], Seq[EpochStore.ListedFile]]
    fileGroups.foreach { case (key, g) =>
      // a group spanning several NAME PROFILES (rename evolution) packs
      // one partition per profile — key-grouped execution may merge
      // same-key partitions back-to-back, which would interleave the
      // proven chain; no report rather than a false one (compaction
      // collapses the profiles and restores it)
      if (anyProfiles &&
        g.map(f => profileIdxOf(f.entryDir)).distinct.size > 1) return None
      if (g.size <= 1) out += key -> g
      else {
        val withStats = g.map(lf => statOf(lf).map(lf -> _))
        if (withStats.exists(_.isEmpty)) return None
        val gs = withStats.flatten
        // any null in a multi-file group defeats the cross-file
        // nulls-edge proof — conservative, sorted keys are rarely null
        if (gs.exists(x => x._2.nulls > 0L || x._2.min.isEmpty)) return None
        // the chain runs in the RECORDED direction: ascending orders
        // files by min and requires max < next min; descending orders
        // by max (descending) and requires min > next max
        val sortedG =
          if (s1Desc) gs.sortWith((a, b) =>
            EpochStoreStats.cmp(a._2.max.get, b._2.max.get).exists(_ > 0))
          else gs.sortWith((a, b) =>
            EpochStoreStats.cmp(a._2.min.get, b._2.min.get).exists(_ < 0))
        sortedG.sliding(2).foreach {
          case Seq(p, n) =>
            val edge =
              if (s1Desc) EpochStoreStats.cmp(n._2.max.get, p._2.min.get)
              else EpochStoreStats.cmp(p._2.max.get, n._2.min.get)
            edge match {
              case Some(x) if x < 0 => ()
              case Some(0) => len = math.min(len, 1)
              case _ => return None
            }
          case _ => ()
        }
        out += key -> sortedG.map(_._1)
      }
    }
    Some((prefix0.take(len), out.result()))
  }

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    orderedPlan match {
      case Some((cols, _)) => cols.map { case (c, desc) =>
        org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          if (desc)
            org.apache.spark.sql.connector.expressions.SortDirection
              .DESCENDING
          else
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING,
          // the write's defaults: ascending = nulls first, descending =
          // nulls last — exactly the order the files were written in
          if (desc)
            org.apache.spark.sql.connector.expressions.NullOrdering
              .NULLS_LAST
          else
            org.apache.spark.sql.connector.expressions.NullOrdering
              .NULLS_FIRST)
      }.toArray
      case None => Array.empty
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val ordered = orderedPlan.map(_._2)
    // per group: the proven-sorted order when reported (ordered packing
    // keeps splits contiguous so every packed partition stays sorted;
    // the default packs longest-first for balance), then sub-split by
    // name profile (rename evolution) so no packed partition mixes
    // entries that spell a column differently — a subsequence of a
    // sorted chain stays sorted
    // X94: a DV-TARGETED file packs alone (possibly split — row indexes
    // are global within a file) with ITS dead ordinals riding the
    // partition; untargeted files pack exactly as before
    lazy val dvFs = new Path(root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    def dvPosOf(f: EpochStore.ListedFile): Option[Array[Long]] =
      if (!dvFiltering) None
      else dvTargets.get((f.entryDir, EpochStore.relOf(dvFs, root, f)))
    def pack(key: Seq[Any], files: Seq[EpochStore.ListedFile])
        : Seq[(FilePartition, Int, Option[Array[Long]])] = {
      val fseq = ordered.map(_(key)).getOrElse(files)
      val byProfile: Seq[(Seq[EpochStore.ListedFile], Int)] =
        if (!anyProfiles) Seq((fseq, 0))
        else fseq.map(f => profileIdxOf(f.entryDir)).distinct
          .map(pid => (fseq.filter(f => profileIdxOf(f.entryDir) == pid), pid))
      byProfile.flatMap { case (fs2, pid) =>
        // a FOREIGN-layout profile rides its own constant split (its
        // dir-served values); same-layout profiles ride the table's
        val (cs, cof) =
          if (!anyProfiles) (constEff, constantsOfEff _)
          else profiles._1.lift(pid).flatMap(_._2) match {
            case Some((pcE, _)) =>
              (constSchemaFor(pcE), constantsForLayout(pcE))
            case None => (constEff, constantsOfEff _)
          }
        val (dvf, plain) =
          if (!dvFiltering) (Nil, fs2)
          else fs2.partition(f => dvPosOf(f).nonEmpty)
        EpochStore.planFilePartitions(spark, plain, cs, cof,
          preserveOrder = ordered.isDefined)
          .map { case fp: FilePartition => (fp, pid, None) } ++
          dvf.flatMap { f =>
            val ps = dvPosOf(f).get
            EpochStore.planFilePartitions(spark, Seq(f), cs, cof)
              .map { case fp: FilePartition => (fp, pid, Some(ps)) }
          }
      }
    }
    if (spjBucketKeyed ||
      (partFields.nonEmpty && readPartSchema.size == partFields.size &&
        !dvFiltering))
      fileGroups.flatMap { case (key, files) =>
        pack(key, files).map { case (fp, pid, _) =>
          KeyedFilePartition(fp, key, pid) }
      }.toArray
    else
      pack(Seq.empty, listing._1).map { case (fp, pid, dvPos) =>
        val base: InputPartition =
          if (pid == 0 && !anyProfiles) fp
          else ProfiledFilePartition(fp, pid)
        dvPos.map(ps =>
          EpochStoreDv.DvFilePartition(base, ps): InputPartition)
          .getOrElse(base)
      }.toArray
  }

  /** RENAME/DROP evolution (X85) — the store's alias chains
    * ([[EpochStore.columnAliases]]); empty for the overwhelmingly
    * common never-renamed store (one existence probe). */
  @transient private lazy val aliases: EpochStore.ColumnAliases =
    EpochStore.columnAliases(SparkSession.active, root)

  /** Per pinned entry: its RECORDED field names — what alias chains
    * resolve against. Entries without a record resolve identity. */
  @transient private lazy val entryFieldsByDir: Map[String, Set[String]] = {
    val spark = SparkSession.active
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    entries.map(_.dir).map { d =>
      d -> EpochStoreWrite.readSchemaSidecar(fs, root, d)
        .map(_._1.fieldNames.toSet).getOrElse(Set.empty[String])
    }.toMap
  }

  /** PARTITION-SPEC evolution (X92) — per pinned entry, its RECORDED
    * layout (identity partition columns in nesting order + optional
    * hash-bucket spec), resolved only when the store carries a layout
    * log ([[EpochManifest.currentLayout]] — one directory probe for the
    * overwhelmingly common never-evolved store). Each entry is pruned,
    * served, and read under its OWN spec; the table-level `partCols`/
    * `bucket` are the CURRENT layout new writes land under. */
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

  /** The entry's layout when it DIFFERS from the table-level one;
    * None for same-layout (and all never-evolved) entries. */
  private def layoutOfDir(d: String)
      : Option[(Seq[String], Option[EpochStore.StoreBucket])] =
    entryLayoutsOpt.flatMap(_.get(d))
      .filter(l => l._1 != partCols || l._2 != bucket)

  /** The per-entry layout resolver [[EpochStore.listEntryFiles]] walks
    * under — shared by this scan's own listing and the micro-batch
    * stream's per-trigger listings (the stream delegates all routing to
    * a pinned template of this scan). None for never-evolved stores.
    * Entries outside the registry (a stream's later appends) resolve to
    * the current layout. */
  private[sources] def layoutResolver
      : Option[graft.core.EpochManifest.Entry =>
        (Seq[StructField], Option[EpochStore.StoreBucket])] =
    entryLayoutsOpt.map(m => (e: graft.core.EpochManifest.Entry) => {
      val (pcs, bkt) = m.getOrElse(e.dir, (partCols, bucket))
      (pcs.map(c => fullSchema.fields.find(_.name == c).getOrElse(
        throw new IllegalStateException(
          s"entry ${e.dir} records partition column $c missing " +
            s"from the schema of $root"))), bkt)
    })

  /** True when any pinned entry reads under a layout other than the
    * current one — SPJ/ordering reports and value-keyed grouping are
    * withheld (they describe ONE layout), per-entry pruning still runs. */
  @transient private lazy val hasLayoutProfiles: Boolean =
    entryLayoutsOpt.nonEmpty && entries.exists(e => layoutOfDir(e.dir).nonEmpty)

  /** The distinct per-entry READ PROFILES: the entry's physical NAME
    * spelling of every data column (X85 rename evolution; [[dataSchema]]
    * order) plus its layout when ≠ table-level (X92 spec evolution).
    * Index 0 is always the identity profile (untranslated names, current
    * layout). Each profile gets its own reader factory — translated
    * requested schema for renames, a file/dir column re-split plus an
    * output permutation for foreign layouts — so old files keep
    * vectorized reads and serve the logical shape with no rewrite. */
  @transient private lazy val profiles: (IndexedSeq[(Seq[String],
      Option[(Seq[String], Option[EpochStore.StoreBucket])])],
      Map[String, Int]) = {
    val identityNames = dataSchema.fieldNames.toSeq
    val byDir = entries.map(_.dir).map { d =>
      val names =
        if (aliases.isEmpty) identityNames
        else dataSchema.fieldNames.toSeq
          .map(n => aliases.resolve(n, entryFieldsByDir(d)))
      d -> ((names, layoutOfDir(d)))
    }.toMap
    val identity = (identityNames,
      None: Option[(Seq[String], Option[EpochStore.StoreBucket])])
    val distinct = (identity +:
      byDir.values.toSeq.distinct.filterNot(_ == identity)).toIndexedSeq
    (distinct, byDir.map { case (d, p) => d -> distinct.indexOf(p) })
  }

  private def profileIdxOf(dir: String): Int =
    if (aliases.isEmpty && !hasLayoutProfiles) 0
    else profiles._2.getOrElse(dir, 0)

  /** Whether ANY non-identity profile exists (renames or foreign
    * layouts) — the gate the packing/routing fast path keys on. */
  private def anyProfiles: Boolean = !aliases.isEmpty || hasLayoutProfiles

  /** Whether `dir` is covered by this scan's profile registry — the
    * micro-batch stream's drift gate: a late entry outside the registry
    * must be on the identity profile (current names, current layout) or
    * the tail refuses. Gated on the layout LOG (and alias history), not
    * on `anyProfiles`: a layout-log store whose pinned entries all sat
    * on the current layout at stream start has no non-identity profile,
    * yet a foreign-spec entry appended MID-stream (a path write with
    * stale layout options) still needs the registry-membership check —
    * `anyProfiles` alone would wave it through and the tail would list
    * it under the current layout, matching no dirs, silently delivering
    * nothing. */
  private[sources] def profileKnown(dir: String): Boolean =
    (aliases.isEmpty && entryLayoutsOpt.isEmpty) ||
      profiles._2.contains(dir)

  /** Pack an EXTERNALLY-listed file set (the micro-batch stream's
    * per-trigger epochs) with this scan's full profile routing — name
    * translations AND foreign-layout re-splits ride exactly like the
    * batch read; no ordering/SPJ keying (per-trigger batches don't
    * report either). */
  private[sources] def packFiles(spark: SparkSession,
      files: Seq[EpochStore.ListedFile]): Array[InputPartition] = {
    if (!anyProfiles)
      return EpochStore.planFilePartitions(spark, files, constEff,
        constantsOfEff)
    files.map(f => profileIdxOf(f.entryDir)).distinct.sorted.flatMap { pid =>
      val (cs, cof) = profiles._1.lift(pid).flatMap(_._2) match {
        case Some((pcE, _)) => (constSchemaFor(pcE), constantsForLayout(pcE))
        case None => (constEff, constantsOfEff _)
      }
      EpochStore.planFilePartitions(spark,
        files.filter(f => profileIdxOf(f.entryDir) == pid), cs, cof)
        .map {
          case fp: FilePartition if pid != 0 =>
            ProfiledFilePartition(fp, pid): InputPartition
          case other => other
        }
    }.toArray
  }

  /** [[packFiles]] with per-trigger DV routing (the CDC tail, X97):
    * `netted` files are IN-WINDOW journal targets — their inserts
    * deliver with the dead ordinals dropped (net-change semantics);
    * `events` files are PRE-WINDOW targets re-read at their dead
    * ordinals ONLY, packed with `_change_type` = 'delete' and the
    * journal's epoch as per-file constants. Both kinds keep profile
    * routing (rename spellings, foreign layouts) and normal split
    * geometry — row indexes are global within a file. */
  private[sources] def packFilesDv(spark: SparkSession,
      plain: Seq[EpochStore.ListedFile],
      netted: Seq[(EpochStore.ListedFile, Array[Long])],
      events: Seq[(EpochStore.ListedFile, Array[Long])])
      : Array[InputPartition] =
    packFiles(spark, plain) ++
      netted.flatMap { case (f, ps) =>
        packFiles(spark, Seq(f)).map(ip =>
          EpochStoreDv.DvFilePartition(ip, ps): InputPartition)
      } ++
      events.flatMap { case (f, ps) =>
        packFiles(spark, Seq(f)).map(ip =>
          EpochStoreDv.DvEventPartition(ip, ps): InputPartition)
      }

  /** FOREIGN-layout profile split: the declared output columns the
    * entry serves from its partition DIRS (requested ones, in the
    * entry's nesting order) and from its FILES (declared order), plus
    * the per-file constant extras (`_epoch` / `_change_type` / the MoR
    * epoch) in [[constEff]] order. The factory, the packing constants,
    * and the output permutation all derive from this one split. */
  private def layoutSplit(pcE: Seq[String])
      : (Seq[StructField], Seq[StructField], Seq[StructField]) = {
    val declaredAll = readDataEff.fields ++ constEff.fields
    val dirServed = pcE.toSet
    val extraNames = Set(EpochStore.EpochColName, EpochStore.ChangeColName,
      EpochStore.RowFileColName)
    val dataF = declaredAll.toSeq.filter(f =>
      !dirServed(f.name) && !extraNames(f.name))
    val dirF = pcE.flatMap(c => declaredAll.find(_.name == c))
    val extras = constEff.fields.toSeq.filter(f => extraNames(f.name))
    (dirF, dataF, extras)
  }

  /** The constant-column schema a FOREIGN-layout profile's files ride
    * with (dir-served values + extras) — planFilePartitions pairs it
    * with [[constantsForLayout]]. */
  private def constSchemaFor(pcE: Seq[String]): StructType = {
    val (dirF, _, extras) = layoutSplit(pcE)
    StructType(dirF ++ extras)
  }

  private def constantsForLayout(pcE: Seq[String])
      : EpochStore.ListedFile => Array[Any] = {
    val (dirF, _, _) = layoutSplit(pcE)
    val idx = dirF.map(f => pcE.indexOf(f.name))
    lf => {
      val b = Array.newBuilder[Any]
      idx.foreach(i => b += lf.values(i))
      if (epochRequested) b += lf.epoch
      if (changeRequested) b += (if (lf.isDelete) "delete" else "insert")
      if (fileRequested)
        b += (lf.entryDir + "/" + EpochStore.relOf(constFs, root, lf))
      if (morFiltering && !epochRequested) b += (lf.epoch: Any)
      b.result()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    readerFactoryWith(forceDv = false)

  /** The CDC tail's factory ([[EpochStoreMicroBatchStream]]): DV
    * routing armed even when THIS scan's pinned snapshot carries no
    * journal — the stream synthesizes [[EpochStoreDv.DvEventPartition]]s
    * (and nets in-window targets) for journals that land MID-stream,
    * which a start-pinned template cannot anticipate. Only consulted
    * for triggers whose window actually carries journals; clean
    * triggers keep the plain (columnar) factory. */
  private[sources] def streamingReaderFactory(): PartitionReaderFactory =
    readerFactoryWith(forceDv = changeRequested &&
      EpochStoreDv.declared(SparkSession.active, root))

  private def readerFactoryWith(forceDv: Boolean): PartitionReaderFactory = {
    val spark = SparkSession.active
    // `rds0` is the EFFECTIVE read-data schema this factory reads under
    // — [[readDataEff]] (row-index-widened in DV mode, MoR-key-widened
    // under tombstones) or the plain [[readDataSchema]] for the DV
    // routing's untargeted partitions
    def factoryFor(profile: (Seq[String],
        Option[(Seq[String], Option[EpochStore.StoreBucket])]),
        rds0: StructType)
        : PartitionReaderFactory = {
      val m = dataSchema.fieldNames.zip(profile._1).toMap
      val identityNames = m.forall { case (k, v) => k == v }
      val inner = profile._2 match {
        case None =>
          val (ds, rds, flt) =
            if (identityNames) (dataSchema, rds0, dataFilters)
            else
              (StructType(dataSchema.fields.map(f =>
                f.copy(name = m(f.name)))),
                StructType(rds0.fields.map(f =>
                  f.copy(name = m.getOrElse(f.name, f.name)))),
                // untranslatable shapes just drop from the parquet push —
                // data filters are residual, Spark re-evaluates them
                dataFilters.flatMap(EpochStore.renameFilter(_, m)))
          EpochStore.parquetReaderFactory(spark, ds, rds, constEff, flt)
        case Some((pcE, _)) =>
          // FOREIGN layout: this entry's files hold every column except
          // ITS OWN identity dirs — re-split the declared output into
          // file-served vs dir-served, read under that split, then
          // permute back to the declared order (vectorized end to end)
          val (dirF, dataF0, _) = layoutSplit(pcE)
          // layoutSplit derives from readDataEff — cut its dataF down
          // to the columns rds0 actually reads (the plain DV variant
          // drops the widened row index)
          val rds0Names = rds0.fieldNames.toSet ++
            constEff.fieldNames
          val dataF = dataF0.filter(f => rds0Names.contains(f.name))
          val dirServed = pcE.toSet
          def tr(n: String): String = m.getOrElse(n, n)
          val dsE = StructType(fullSchema.fields.toSeq
            .filterNot(f => dirServed(f.name))
            .map(f => f.copy(name = tr(f.name))))
          val rdsE = StructType(dataF.map(f => f.copy(name = tr(f.name))))
          // filters referencing this entry's dir-served columns can't
          // reach its files; all data filters stay residual anyway
          val fltE = dataFilters
            .filterNot(_.references.exists(dirServed))
            .flatMap(EpochStore.renameFilter(_, m))
          val raw = EpochStore.parquetReaderFactory(spark, dsE, rdsE,
            constSchemaFor(pcE), fltE)
          val declared = rds0.fields ++ constEff.fields
          val produced = (dataF ++ dirF ++
            constEff.fields.toSeq.filter(f =>
              f.name == EpochStore.EpochColName ||
                f.name == EpochStore.ChangeColName ||
                f.name == EpochStore.RowFileColName)).map(_.name)
          val perm = declared.map(f => produced.indexOf(f.name))
          require(perm.forall(_ >= 0),
            s"layout profile lost a declared column: " +
              s"${declared.map(_.name).mkString(",")} vs " +
              s"${produced.mkString(",")}")
          if (perm.zipWithIndex.forall { case (p, i) => p == i }) raw
          else new PermutingReaderFactory(raw, perm.toArray,
            declared.map(_.dataType).toArray)
      }
      if (!morFiltering) inner
      else {
        val n0 = readDataSchema.size
        val a = morAddedFields.size
        val keyIdx = mergeKeys.map { k =>
          val i = readDataSchema.fieldNames.indexOf(k)
          if (i >= 0) i else n0 + morAddedFields.indexWhere(_.name == k)
        }.toArray
        val keyTypes = mergeKeys
          .map(k => dataSchema.fields.find(_.name == k).get.dataType).toArray
        val total = n0 + a + constEff.size
        val outIdx = ((0 until n0) ++
          (n0 + a until n0 + a + constSchema.size)).toArray
        val outTypes = outIdx.map { i =>
          if (i < n0) readDataSchema.fields(i).dataType
          else constSchema.fields(i - n0 - a).dataType
        }
        // broadcast: one copy per executor, not one per task closure
        new TombstoneFilteringFactory(inner, keyIdx, keyTypes,
          epochIdx = total - 1, outIdx, outTypes,
          spark.sparkContext.broadcast(tombstones))
      }
    }
    def delegatingFor(rds0: StructType): KeyedDelegatingReaderFactory =
      if (!anyProfiles)
        new KeyedDelegatingReaderFactory(IndexedSeq(factoryFor(
          (dataSchema.fieldNames.toSeq, None), rds0)))
      else new KeyedDelegatingReaderFactory(
        profiles._1.map(p => factoryFor(p, rds0)))
    if (!dvFiltering && !forceDv) delegatingFor(readDataEff)
    else {
      // TARGETED partitions read with the row index widened at n0; the
      // DV wrapper drops their dead ordinals and projects the index
      // away — unless `_row_pos` is itself served, in which case it
      // stays. Synthesized DELETE-EVENT partitions (the CDC tail) read
      // the same widened shape but KEEP only the dead ordinals.
      // UNTARGETED partitions route to a PLAIN factory — no index
      // column (unless served), no per-row copy
      // ([[EpochStoreDv.DvRoutingFactory]]).
      val n0 = readDataSchema.size
      val total = n0 + 1 + constEff.size
      // under forceDv without pinned journals, readDataEff is the plain
      // read schema — widen the row index in explicitly
      val widened =
        if (dvFiltering || posRequested) readDataEff
        else StructType(readDataSchema :+ StructField(
          org.apache.spark.sql.execution.datasources.parquet
            .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
          LongType, nullable = true))
      val outIdx =
        (if (posRequested) 0 until total
        else (0 until n0) ++ (n0 + 1 until total)).toArray
      val outTypes = outIdx.map { i =>
        if (i < n0) readDataSchema.fields(i).dataType
        else if (i == n0) LongType
        else constEff.fields(i - n0 - 1).dataType
      }
      new EpochStoreDv.DvRoutingFactory(
        delegatingFor(if (posRequested) readDataEff else readDataSchema),
        new EpochStoreDv.DvFilteringFactory(delegatingFor(widened),
          rowIdxPos = n0, outIdx, outTypes),
        new EpochStoreDv.DvFilteringFactory(delegatingFor(widened),
          rowIdxPos = n0, outIdx, outTypes, keepOnly = true))
    }
  }
}

/** A [[FilePartition]] tagged with its partition-column value — the
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]] evidence
  * Spark's key-grouped (storage-partitioned) execution consumes. */
final case class KeyedFilePartition(inner: FilePartition,
                                    keyValues: Seq[Any],
                                    profile: Int = 0)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  private val key: InternalRow =
    new GenericInternalRow(keyValues.map(EpochStore.toCatalyst).toArray)
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** A [[FilePartition]] tagged with its name-profile index (rename
  * evolution) — routes the partition to the reader factory whose
  * requested schema speaks its entries' physical names. */
final case class ProfiledFilePartition(inner: FilePartition, profile: Int)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** FOREIGN-layout output alignment (X92): the wrapped factory's readers
  * emit (file-served columns ++ dir-served constants) in the ENTRY's
  * split order; this wrapper permutes each row/batch back to the scan's
  * declared output order. Columnar batches permute the column-vector
  * ARRAY (zero copy, vectorized reads preserved); rows project through
  * an index map. `perm(i)` = the produced slot serving declared slot i,
  * `types(i)` = the declared slot's data type. */
final class PermutingReaderFactory(inner: PartitionReaderFactory,
                                   perm: Array[Int],
                                   types: Array[org.apache.spark.sql.types
                                     .DataType])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val r = inner.createReader(p)
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      override def next(): Boolean = r.next()
      override def get(): InternalRow = {
        val row = r.get()
        val out = new Array[Any](perm.length)
        var i = 0
        while (i < perm.length) {
          out(i) =
            if (row.isNullAt(perm(i))) null else row.get(perm(i), types(i))
          i += 1
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = r.close()
    }
  }
  override def createColumnarReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val r = inner.createColumnarReader(p)
    new org.apache.spark.sql.connector.read.PartitionReader[
      org.apache.spark.sql.vectorized.ColumnarBatch] {
      override def next(): Boolean = r.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = r.get()
        val cols = new Array[org.apache.spark.sql.vectorized.ColumnVector](
          perm.length)
        var i = 0
        while (i < perm.length) { cols(i) = b.column(perm(i)); i += 1 }
        val out = new org.apache.spark.sql.vectorized.ColumnarBatch(cols)
        out.setNumRows(b.numRows())
        out
      }
      override def close(): Unit = r.close()
    }
  }
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(p)
}

/** Unwraps [[KeyedFilePartition]] / [[ProfiledFilePartition]] back to
  * the [[FilePartition]] Spark's own parquet reader factory expects and
  * routes to the partition's name-profile factory (index 0 = the
  * untranslated common case). */
final class KeyedDelegatingReaderFactory(
    inners: IndexedSeq[PartitionReaderFactory])
    extends PartitionReaderFactory {
  private def route(p: InputPartition): (InputPartition, PartitionReaderFactory) =
    p match {
      case k: KeyedFilePartition => (k.inner, inners(k.profile))
      case pr: ProfiledFilePartition => (pr.inner, inners(pr.profile))
      case other => (other, inners(0))
    }
  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val (q, f) = route(p); f.createReader(q)
  }
  override def createColumnarReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val (q, f) = route(p); f.createColumnarReader(q)
  }
  override def supportColumnarReads(p: InputPartition): Boolean = {
    val (q, f) = route(p); f.supportColumnarReads(q)
  }
}

object EpochStore {

  /** Name of the metadata column carrying each row's manifest epoch. */
  val EpochColName = "_epoch"

  /** Name of the metadata column carrying each row's CHANGE TYPE in a
    * changefeed read: "insert" for data rows, "delete" for equality
    * tombstones ([[EpochStoreDelta]]) — selecting it turns
    * `changesSinceGeneration` into a full CDC feed (Delta CDF /
    * Iceberg changelog shape). Served as a per-file constant; tombstone
    * files carry the key columns with everything else null. Selecting
    * it reads the RAW change stream — merge-on-read tombstone
    * resolution is off by definition. */
  val ChangeColName = "_change_type"

  /** ROW-LINEAGE metadata columns (X99 — the Iceberg `_file`/`_pos`
    * shape): `_row_file` is the row's root-relative data file path (a
    * per-file constant), `_row_pos` its parquet row index (widened in
    * and SERVED — split-safe, global within the file). Together they
    * are the POSITION identity the identity-less merge-on-read
    * operations key on; selectable by any query. */
  val RowFileColName = "_row_file"
  val RowPosColName = "_row_pos"

  /** The declared partition columns, in nesting order: `partitionColumn`
    * takes one or a comma-separated list (`"date,lang"` materializes
    * `date=v/lang=v` composite dirs); `partitionColumns` is an explicit
    * plural alias. */
  private[sources] def partColsOf(options: CaseInsensitiveStringMap)
      : Seq[String] =
    Option(options.get("partitionColumn"))
      .orElse(Option(options.get("partitionColumns"))).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** The comma-joined spelling used by options and schema sidecars →
    * column list (None/empty → Nil). */
  private[graft] def splitPartCols(pc: Option[String]): Seq[String] =
    pc.toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** One declared/recorded sort entry → (column, descending?): `"c"` /
    * `"c asc"` → ascending, `"c desc"` (any case) → descending. The
    * sidecar records the normalized `c DESC` spelling; bare names stay
    * bare, so pre-r15 sidecars parse unchanged as ascending. */
  private[sources] def parseSortCol(s: String): (String, Boolean) = {
    val t = s.trim
    val l = t.toLowerCase(java.util.Locale.ROOT)
    if (l.endsWith(" desc")) (t.dropRight(5).trim, true)
    else if (l.endsWith(" asc")) (t.dropRight(4).trim, false)
    else (t, false)
  }

  /** HASH-BUCKET layout spec — `bucketColumn`/`bucketCount` options or
    * SQL `PARTITIONED BY (bucket(n, col))`: rows land under
    * `<col>_bucket=K` dirs with K = pmod(murmur3(value), n) (Spark's
    * own `hash()` murmur3, seed 42 — the null row hashes to the bare
    * seed, exactly like `hash(NULL)`). Unlike identity partitioning the
    * column STAYS in the data files (many values share a bucket); the
    * payoff is high-cardinality layouts: equality/IN probes open only
    * the probed buckets, and two stores bucketed (n, col) alike join
    * storage-partitioned — zero shuffle on either side. */
  final case class StoreBucket(col: String, n: Int) {
    require(n > 0, s"bucketCount must be positive, got $n")
    def dirPrefix: String = s"${col}_bucket="
  }

  private[sources] def bucketOf(options: CaseInsensitiveStringMap)
      : Option[StoreBucket] = {
    val c = Option(options.get("bucketColumn"))
    val n = Option(options.get("bucketCount")).map(_.toInt)
    require(c.isEmpty == n.isEmpty,
      "bucketColumn and bucketCount come together")
    c.map { col =>
      require(!partColsOf(options).contains(col),
        s"bucket column $col is already an identity partition column")
      StoreBucket(col, n.get)
    }
  }

  /** The `transform` option (`days(ts)` / `months(ts)` / `hours(ts)` /
    * `years(ts)` / `truncate(w, col)`) — the time-unit/truncate
    * partition level ([[StoreTransform]], X93). Sits BETWEEN the
    * identity levels and the bucket level; the column stays in the
    * files. */
  private[sources] def transformOf(options: CaseInsensitiveStringMap)
      : Option[StoreTransform] =
    Option(options.get("transform")).map { s =>
      val t = StoreTransform.parse(s)
      require(!partColsOf(options).contains(t.col),
        s"transform column ${t.col} is already an identity partition " +
          "column")
      require(!bucketOf(options).exists(_.col == t.col),
        s"transform column ${t.col} is already the bucket column")
      t
    }

  /** The bucket of one CATALYST-internal value (UTF8String for strings,
    * primitives for integrals; null = the seed's bucket, matching
    * `hash(NULL)` = seed). */
  private[graft] def bucketIdOf(v: Any, dt: DataType, n: Int): Int = {
    val h =
      if (v == null) 42L
      else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, dt, 42L)
    (((h % n) + n) % n).toInt
  }

  /** The buckets a conjunctive filter set can still reach: Some(set)
    * when some conjunct is EqualTo/In on the bucket column (hash each
    * probed value — the reachable set is exact for that conjunct),
    * None = no bounding conjunct, keep every bucket. Null probes bound
    * nothing (EqualTo(c, null) matches no row anyway; IsNull rows DO
    * live in the seed bucket but the conservative answer stays sound). */
  private[sources] def bucketProbes(filters: Array[Filter],
                                    b: StoreBucket, dt: DataType)
      : Option[Set[Int]] = {
    def toCat(v: Any): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v)
    val sets = filters.collect {
      case sources.EqualTo(a, v) if a == b.col && v != null =>
        Set(bucketIdOf(toCat(v), dt, b.n))
      case sources.EqualNullSafe(a, v) if a == b.col && v != null =>
        Set(bucketIdOf(toCat(v), dt, b.n))
      case sources.In(a, vs) if a == b.col && vs.nonEmpty &&
        !vs.contains(null) =>
        vs.map(v => bucketIdOf(toCat(v), dt, b.n)).toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** A pushed single-column ORDER-BY-LIMIT ([[EpochStoreScanBuilder
    * .pushTopN]]): sort column, direction, null placement, k. */
  final case class TopNPush(col: String, desc: Boolean, nullsFirst: Boolean,
                            limit: Int)

  /** Root-relative-within-entry path of a listed file — the key both
    * sidecar families (`_skip/<rel>.bloom`, `_skip/stats.json`) index
    * by. */
  private[sources] def relOf(fs: org.apache.hadoop.fs.FileSystem,
                             root: String, lf: ListedFile): String = {
    val entryPath = fs.makeQualified(new Path(s"$root/${lf.entryDir}")).toString
    fs.makeQualified(lf.status.getPath).toString
      .stripPrefix(entryPath).stripPrefix("/")
  }

  /** Close a row-level-op kept set over epoch-SPAN containment: the
    * replace fold commits at [min kept minEpoch, max kept epoch], and
    * `_epoch` is served as a per-entry constant — so an entry SKIPPED
    * inside that span would rank BELOW the fold even where it holds a
    * key's newer row, and latest-wins reads would serve stale values.
    * Any pinned entry whose own span intersects the kept span is pulled
    * into the rewrite (carried over unchanged), iterating to a
    * fixpoint; entries strictly outside stay skipped. */
  private[sources] def spanClosure(
      pinned: Seq[EpochManifest.Entry],
      kept0: Seq[EpochManifest.Entry]): Seq[EpochManifest.Entry] = {
    if (kept0.isEmpty) return kept0
    var kept = kept0
    var changed = true
    while (changed) {
      val lo = kept.map(_.minEpoch).min
      val hi = kept.map(_.epoch).max
      val inDirs = kept.map(_.dir).toSet
      val more = pinned.filterNot(e => inDirs.contains(e.dir))
        .filter(e => e.epoch >= lo && e.minEpoch <= hi)
      changed = more.nonEmpty
      kept ++= more
    }
    kept.sortBy(_.epoch)
  }

  /** Conjunctive EqualTo/In probe sets on the bloom column — empty when
    * the filters carry no point lookup the sidecars can answer. */
  private[sources] def bloomProbes(dataFilters: Array[Filter],
      bloomCol: Option[String]): Seq[Set[Any]] =
    bloomCol.toSeq.flatMap { c =>
      dataFilters.collect {
        case sources.EqualTo(a, v) if a == c && v != null => Set[Any](v)
        case sources.In(a, vs) if a == c && vs.nonEmpty &&
          !vs.contains(null) => vs.toSet[Any]
      }
    }

  /** Drop every file whose bloom sidecar proves the probed keys absent
    * (no false negatives → exact skip; sidecarless files always stay).
    * Shared by the batch scan and each streaming micro-batch. */
  private[sources] def bloomSkipFiles(
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      files: Seq[ListedFile], probes: Seq[Set[Any]],
      isString: Boolean): Seq[ListedFile] = {
    import org.apache.spark.util.sketch.BloomFilter
    if (probes.isEmpty) return files
    def might(bf: BloomFilter, v: Any): Boolean =
      if (isString) bf.mightContainString(v.toString)
      else bf.mightContainLong(v.asInstanceOf[Number].longValue())
    files.filter { lf =>
      val sc = new Path(s"$root/${lf.entryDir}/_skip/${relOf(fs, root, lf)}.bloom")
      if (!fs.exists(sc)) true
      else {
        val in = fs.open(sc)
        val bf = try BloomFilter.readFrom(in) finally in.close()
        probes.forall(p => p.exists(v => might(bf, v)))
      }
    }
  }

  /** Drop every file whose recorded stats prove some conjunct
    * unsatisfiable ([[EpochStoreStats.canMatch]]; statless files always
    * stay). Shared by the batch scan and each streaming micro-batch. */
  private[sources] def statsSkipFiles(
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      statsByEntry: Map[String, Map[String, EpochStoreStats.FileStats]],
      files: Seq[ListedFile], dataFilters: Array[Filter]): Seq[ListedFile] = {
    if (dataFilters.isEmpty ||
      statsByEntry.valuesIterator.forall(_.isEmpty)) return files
    files.filter { lf =>
      statsByEntry.getOrElse(lf.entryDir, Map.empty)
        .get(relOf(fs, root, lf)) match {
        case None => true
        case Some(st) => !dataFilters.exists(f =>
          EpochStoreStats.canMatch(f, st).contains(false))
      }
    }
  }

  /** One listed file: its partition-dir values in partition-column
    * order (empty for unpartitioned stores), the manifest epoch and
    * root-relative dir of the entry that owns it, and the file itself. */
  private[sources] final case class ListedFile(
      values: Seq[Any], epoch: Long, entryDir: String, status: FileStatus,
      // hash-bucket layouts only: the file's `<col>_bucket=K` id, or -1
      // for a file outside any bucket dir (e.g. a DML rewrite that
      // landed unbucketed — always kept, disables SPJ reporting)
      bucketId: Int = -1,
      // changefeed reads only: true = an equality-tombstone file whose
      // rows are DELETE events (key columns only, bucketId always -1)
      isDelete: Boolean = false)

  /** Driver-side planning of a set of manifest entries: per entry dir,
    * either its files directly (unpartitioned store) or its NESTED
    * `col1=v/col2=v/…` subdirs filtered by the pushed partition filters
    * AT EVERY LEVEL — a filter decidable from the columns bound so far
    * ([[evalOnPartitions]]' partial binding) prunes the subtree without
    * ever examining below it, so a date-level predicate on a
    * (date, lang)-partitioned store never even enumerates the pruned
    * dates' lang dirs. Returns the planned files plus (kept, examined)
    * partition-dir audit counts across all levels — shared by the
    * pinned batch scan, the footer-agg scan, and each streaming
    * micro-batch.
    *
    * An INDEXED entry — one whose stats sidecar records every file's
    * length ([[EpochStoreStats.FileStats.len]], written at commit by
    * every connector path) — is planned from that index alone: the
    * partition/bucket walk runs over the VIRTUAL tree implied by the
    * recorded relative paths, with identical pruning and audit-count
    * semantics and ZERO `listStatus` below the entry root. At 100 TB
    * this is the difference between O(manifest-bytes) planning and
    * re-walking millions of files per query (and per streaming
    * trigger); pre-index entries (core-tier appends, old stores) fall
    * back to the recursive listing. */
  private[sources] def listEntryFiles(
      spark: SparkSession, root: String, entries: Seq[EpochManifest.Entry],
      partFields: Seq[StructField], partFilters: Array[Filter],
      bucket: Option[StoreBucket] = None,
      bucketKeep: Option[Set[Int]] = None,
      transform: Option[StoreTransform] = None,
      unitKeep: Option[String => Boolean] = None,
      layoutOf: Option[EpochManifest.Entry =>
        (Seq[StructField], Option[StoreBucket])] = None)
      : (Seq[ListedFile], Int, Int) = {
    val fs = new Path(root).getFileSystem(
      GraftBridge.sessionHadoopConf(spark))
    def filesUnder(p: Path): Seq[FileStatus] = {
      val (dirs, files) = fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .partition(_.isDirectory)
      files.filter(_.getLen > 0) ++ dirs.flatMap(d => filesUnder(d.getPath))
    }
    var total = 0
    var kept = 0
    val out = Seq.newBuilder[ListedFile]
    // MIXED-SPEC snapshots (X92): each entry is walked under its OWN
    // recorded layout — `layoutOf` resolves it (identity: the uniform
    // table-level layout, the overwhelmingly common case). Bucket
    // probes apply only to entries bucketed under the PROBED spec; an
    // entry under another spec keeps all its files (conservative —
    // residual filters still run).
    def layoutFor(e: EpochManifest.Entry)
        : (Seq[StructField], Option[StoreBucket]) =
      layoutOf.map(_(e)).getOrElse((partFields, bucket))
    def keepFor(bktE: Option[StoreBucket]): Option[Set[Int]] =
      if (bktE == bucket) bucketKeep else None
    // truncate-width safety: `col_trunc=` dir names are WIDTH-agnostic,
    // so a probe built for truncate(4, col) would provably-false-drop
    // dirs an entry wrote under truncate(8, col) (units bound [o, o+4)
    // against rows living in [o, o+8)). Truncate units prune only when
    // the entry RECORDS exactly the probed transform; mismatched
    // entries degrade to unpruned-but-exact, the mixed-spec invariant.
    // Time kinds spell the whole unit in the dir value — no width, no
    // check, no sidecar read.
    val truncKeepCache =
      scala.collection.mutable.Map.empty[String, Option[String => Boolean]]
    def unitKeepFor(e: EpochManifest.Entry, t: StoreTransform)
        : Option[String => Boolean] =
      if (unitKeep.isEmpty || t.kind != "trunc") unitKeep
      else truncKeepCache.getOrElseUpdate(e.dir,
        if (EpochStoreWrite.readTransformSidecar(fs, root, e.dir)
          .contains(t)) unitKeep
        else None)
    // hash-bucket leaf level: prune `<col>_bucket=K` dirs against the
    // probed bucket set; an entry WITHOUT bucket dirs (a DML rewrite
    // that landed unbucketed) serves all its files, always kept
    def bucketLeaf(p: Path, values: Seq[Any], e: EpochManifest.Entry,
                   b: StoreBucket, keep: Option[Set[Int]]): Unit = {
      val subs = fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(b.dirPrefix))
      if (subs.isEmpty) {
        out ++= filesUnder(p).map(ListedFile(values, e.epoch, e.dir, _))
      } else subs.foreach { sub =>
        total += 1
        val k = sub.getPath.getName.stripPrefix(b.dirPrefix).toIntOption
          .getOrElse(-1)
        if (keep.forall(_.contains(k))) {
          kept += 1
          out ++= filesUnder(sub.getPath)
            .map(ListedFile(values, e.epoch, e.dir, _, bucketId = k))
        }
      }
    }
    // time-unit/truncate level ([[StoreTransform]]): walk the
    // `<col>_<kind>=<unit>` dirs between the identity levels and the
    // bucket, dropping units the pushed predicates PROVABLY cannot
    // reach. An entry WITHOUT unit dirs at this level (a DML rewrite's
    // honest downgrade, or a pre-transform epoch) serves all its files
    // — the column lives in the files, so a transform-unaware subtree
    // is still read exactly, just unpruned.
    def transformLeaf(p: Path, values: Seq[Any], e: EpochManifest.Entry,
                      t: StoreTransform, bktE: Option[StoreBucket]): Unit = {
      val subs = fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(t.dirPrefix))
      def below(q: Path): Unit =
        if (bktE.nonEmpty) bucketLeaf(q, values, e, bktE.get, keepFor(bktE))
        else out ++= filesUnder(q).map(ListedFile(values, e.epoch, e.dir, _))
      if (subs.isEmpty) below(p)
      else {
        val keep = unitKeepFor(e, t)
        subs.foreach { sub =>
          total += 1
          val raw = sub.getPath.getName.stripPrefix(t.dirPrefix)
          if (keep.forall(_(raw))) {
            kept += 1
            below(sub.getPath)
          }
        }
      }
    }
    def descend(p: Path, level: Int, bound: Map[String, Any],
                values: Seq[Any], e: EpochManifest.Entry,
                pfE: Seq[StructField], bktE: Option[StoreBucket]): Unit = {
      if (level == pfE.length) {
        if (transform.nonEmpty) transformLeaf(p, values, e, transform.get, bktE)
        else if (bktE.nonEmpty) bucketLeaf(p, values, e, bktE.get, keepFor(bktE))
        else out ++= filesUnder(p).map(ListedFile(values, e.epoch, e.dir, _))
      } else {
        val f = pfE(level)
        val prefix = s"${f.name}="
        fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
          .foreach { sub =>
            total += 1
            val v = EpochStore.parsePartitionValue(
              sub.getPath.getName.stripPrefix(prefix), f.dataType)
            val b2 = bound + (f.name -> v)
            if (partFilters.forall(pf =>
                EpochStore.evalOnPartitions(pf, b2) != Some(false))) {
              kept += 1
              descend(sub.getPath, level + 1, b2, values :+ v, e, pfE, bktE)
            }
          }
      }
    }
    // ---- index path: the same walk over the sidecar's virtual tree —
    // emitted FileStatuses are SYNTHESIZED from the recorded len/mtime.
    // Each element is (full rel path — the status path, tail rel below
    // the level walked so far — the tree position, recorded stats).
    def statusOf(e: EpochManifest.Entry, rel: String,
                 st: EpochStoreStats.FileStats): FileStatus =
      new FileStatus(st.len, false, 1, 128L * 1024 * 1024, st.mtime,
        new Path(s"$root/${e.dir}/$rel"))
    def emitIdx(values: Seq[Any], e: EpochManifest.Entry,
                rels: Seq[(String, String, EpochStoreStats.FileStats)],
                bucketId: Int = -1): Unit =
      out ++= rels.filter(_._3.len > 0L).sortBy(_._1)
        .map { case (rel, _, st) =>
          ListedFile(values, e.epoch, e.dir, statusOf(e, rel, st), bucketId)
        }
    def headSeg(rel: String): String = {
      val i = rel.indexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }
    def bucketIdxLeaf(values: Seq[Any], e: EpochManifest.Entry,
                      rels: Seq[(String, String, EpochStoreStats.FileStats)],
                      bktE: Option[StoreBucket]): Unit = {
      if (bktE.isEmpty) { emitIdx(values, e, rels); return }
      val b = bktE.get
      val keep = keepFor(bktE)
      val (inBucket, bare) =
        rels.partition(r => headSeg(r._2).startsWith(b.dirPrefix))
      if (inBucket.isEmpty) { emitIdx(values, e, bare); return }
      inBucket.groupBy(r => headSeg(r._2)).toSeq.sortBy(_._1)
        .foreach { case (seg, fls) =>
          total += 1
          val k = seg.stripPrefix(b.dirPrefix).toIntOption.getOrElse(-1)
          if (keep.forall(_.contains(k))) {
            kept += 1
            emitIdx(values, e, fls, bucketId = k)
          }
        }
    }
    def descendIdx(level: Int, bound: Map[String, Any], values: Seq[Any],
                   e: EpochManifest.Entry,
                   rels: Seq[(String, String, EpochStoreStats.FileStats)],
                   pfE: Seq[StructField], bktE: Option[StoreBucket])
        : Unit = {
      if (level == pfE.length) {
        transform match {
          case None => bucketIdxLeaf(values, e, rels, bktE)
          case Some(t) =>
            val (inUnit, bare) =
              rels.partition(r => headSeg(r._2).startsWith(t.dirPrefix))
            // a transform-less ENTRY (a rewrite's honest downgrade, a
            // pre-transform epoch) serves all its files — the column
            // lives in the files, so it reads exactly, just unpruned
            if (inUnit.isEmpty) { bucketIdxLeaf(values, e, bare, bktE); return }
            val keep = unitKeepFor(e, t)
            inUnit.groupBy(r => headSeg(r._2)).toSeq.sortBy(_._1)
              .foreach { case (seg, fls) =>
                total += 1
                val raw = seg.stripPrefix(t.dirPrefix)
                if (keep.forall(_(raw))) {
                  kept += 1
                  bucketIdxLeaf(values, e,
                    fls.map(r => (r._1, r._2.stripPrefix(seg + "/"), r._3)),
                    bktE)
                }
              }
        }
      } else {
        val f = pfE(level)
        val prefix = s"${f.name}="
        rels.groupBy(r => headSeg(r._2)).toSeq
          .filter(_._1.startsWith(prefix)).sortBy(_._1)
          .foreach { case (seg, fls) =>
            total += 1
            val v = EpochStore.parsePartitionValue(
              seg.stripPrefix(prefix), f.dataType)
            val b2 = bound + (f.name -> v)
            if (partFilters.forall(pf =>
                EpochStore.evalOnPartitions(pf, b2) != Some(false))) {
              kept += 1
              descendIdx(level + 1, b2, values :+ v, e,
                fls.map(t => (t._1, t._2.stripPrefix(seg + "/"), t._3)),
                pfE, bktE)
            }
          }
      }
    }
    entries.foreach { e =>
      val (pfE, bktE) = layoutFor(e)
      EpochStoreStats.readIndexed(fs, root, e.dir) match {
        case Some(ix) if ix.valuesIterator.forall(_.len >= 0L) =>
          descendIdx(0, Map.empty, Vector.empty, e,
            ix.toSeq.map { case (rel, st) => (rel, rel, st) }, pfE, bktE)
        case _ =>
          val p = new Path(s"$root/${e.dir}")
          if (fs.exists(p))
            descend(p, 0, Map.empty, Vector.empty, e, pfE, bktE)
      }
    }
    (out.result(), kept, total)
  }

  /** Split + pack listed files into [[FilePartition]]s exactly like the
    * native file source (`maxPartitionBytes` bounds, open-cost padding,
    * largest-first packing). `constantsOf` supplies each file's
    * constant-column values (partition dir value, `_epoch`) in
    * `readPartSchema` order. */
  private[sources] def planFilePartitions(
      spark: SparkSession, files: Seq[ListedFile],
      readPartSchema: StructType,
      constantsOf: ListedFile => Array[Any],
      preserveOrder: Boolean = false): Array[InputPartition] = {
    val conf = GraftBridge.sessionConf(spark)
    val openCost = conf.filesOpenCostInBytes
    val minParts = conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism)
    val totalBytes = files.map(_.status.getLen + openCost).sum
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, totalBytes / math.max(1, minParts)))
    val splits = files.flatMap { lf =>
      val st = lf.status
      val pv: InternalRow =
        if (readPartSchema.isEmpty) InternalRow.empty
        else new GenericInternalRow(constantsOf(lf).map(EpochStore.toCatalyst))
      (0L until st.getLen by maxSplit).map { off =>
        PartitionedFile(pv, SparkPath.fromPath(st.getPath), off,
          math.min(maxSplit, st.getLen - off), Array.empty[String],
          st.getModificationTime, st.getLen, Map.empty)
      }
    }
    // preserveOrder: the caller's file order is a PROVEN sort order —
    // keep splits contiguous (getFilePartitions packs consecutively) so
    // every packed partition stays internally ordered; the default
    // longest-first order packs better-balanced partitions
    FilePartition.getFilePartitions(spark,
      if (preserveOrder) splits else splits.sortBy(-_.length),
      maxSplit).toArray
  }

  /** Spark's own vectorized parquet reader, primed exactly the way the
    * native ParquetScan primes it before building this same factory —
    * the record readers resolve their ReadSupport class and the
    * requested Catalyst schema from conf keys, not constructor args. */
  /** Rewrite a pushed filter's attribute names through `m` (logical →
    * one profile's physical names) for the parquet row-group push.
    * Unsupported shapes return None — data filters stay residual, so
    * dropping one costs pushdown, never correctness. Under Not (and in
    * strict mode generally) a partial And translation is refused: Not
    * of a weaker filter is not implied by the original. */
  private[sources] def renameFilter(f: Filter, m: Map[String, String],
                                    strict: Boolean = false)
      : Option[Filter] = {
    def n(a: String): String = m.getOrElse(a, a)
    f match {
      case sources.EqualTo(a, v) => Some(sources.EqualTo(n(a), v))
      case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(n(a), v))
      case sources.GreaterThan(a, v) => Some(sources.GreaterThan(n(a), v))
      case sources.GreaterThanOrEqual(a, v) =>
        Some(sources.GreaterThanOrEqual(n(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(n(a), v))
      case sources.LessThanOrEqual(a, v) =>
        Some(sources.LessThanOrEqual(n(a), v))
      case sources.In(a, vs) => Some(sources.In(n(a), vs))
      case sources.IsNull(a) => Some(sources.IsNull(n(a)))
      case sources.IsNotNull(a) => Some(sources.IsNotNull(n(a)))
      case sources.StringStartsWith(a, v) =>
        Some(sources.StringStartsWith(n(a), v))
      case sources.StringEndsWith(a, v) =>
        Some(sources.StringEndsWith(n(a), v))
      case sources.StringContains(a, v) =>
        Some(sources.StringContains(n(a), v))
      case sources.And(l, r) =>
        (renameFilter(l, m, strict), renameFilter(r, m, strict)) match {
          case (Some(a), Some(b)) => Some(sources.And(a, b))
          case (a, b) => if (strict) None else a.orElse(b)
        }
      case sources.Or(l, r) =>
        for { a <- renameFilter(l, m, strict)
              b <- renameFilter(r, m, strict) } yield sources.Or(a, b)
      case sources.Not(c) =>
        renameFilter(c, m, strict = true).map(sources.Not)
      case sources.AlwaysTrue() => Some(f)
      case sources.AlwaysFalse() => Some(f)
      case _ => None
    }
  }

  private[sources] def parquetReaderFactory(
      spark: SparkSession, dataSchema: StructType,
      readDataSchema: StructType, readPartSchema: StructType,
      dataFilters: Array[Filter]): PartitionReaderFactory = {
    val conf = GraftBridge.sessionConf(spark)
    // a PRIVATE copy: factories for different per-entry name profiles
    // (rename evolution) prime different requested schemas — priming
    // the shared session conf would let the last one win for all
    val hc = new org.apache.hadoop.conf.Configuration(
      GraftBridge.sessionHadoopConf(spark))
    hc.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    hc.set("org.apache.spark.sql.parquet.row.requested_schema", readDataSchema.json)
    hc.set("org.apache.spark.sql.parquet.row.attributes", readDataSchema.json)
    hc.set("spark.sql.session.timeZone", conf.sessionLocalTimeZone)
    hc.setBoolean("spark.sql.optimizer.nestedSchemaPruning.enabled",
      conf.nestedSchemaPruningEnabled)
    hc.setBoolean("spark.sql.caseSensitive", conf.caseSensitiveAnalysis)
    hc.setBoolean("spark.sql.parquet.binaryAsString", conf.isParquetBinaryAsString)
    hc.setBoolean("spark.sql.parquet.int96AsTimestamp",
      conf.isParquetINT96AsTimestamp)
    hc.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled",
      conf.parquetInferTimestampNTZEnabled)
    hc.setBoolean("spark.sql.legacy.parquet.nanosAsLong",
      conf.legacyParquetNanosAsLong)
    val bc = GraftBridge.broadcastHadoopConf(spark, hc)
    ParquetPartitionReaderFactory(conf, bc, dataSchema, readDataSchema,
      readPartSchema, dataFilters, None,
      new ParquetOptions(Map.empty[String, String], conf))
  }

  private[sources] def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "epochstore requires option(\"path\", <store root>)")
    p
  }

  private[sources] def pinnedEntries(spark: SparkSession, root: String,
      options: CaseInsensitiveStringMap): Seq[EpochManifest.Entry] = {
    // a BRANCH pin resolves the branch lineage's head — every options-
    // driven entry resolution (schema inference, the agg-pushdown
    // guard, metadata tables) must see the same snapshot the scan reads
    Option(options.get("branch")) match {
      case Some(b) => return EpochManifest.branchEntries(spark, root, b)
      case None => ()
    }
    val asOf = Option(options.get("asOfGeneration")).map(_.toLong).getOrElse(-1L)
    if (asOf < 0L) EpochManifest.entries(spark, root)
    else EpochManifest.entriesAt(spark, root, asOf)
  }

  /** The engine's read entry point — what the serving paths call instead
    * of manual manifest resolution. The manifest generation is resolved
    * HERE (DataFrame construction), not at first action: a DataFrame
    * handed out by a serving path is a pinned snapshot — a compaction
    * committing between construction and execution cannot change what it
    * reads (TextSpec's probe-through-the-swap proof), the same contract
    * the manual [[EpochManifest.read]] carries via its eager `entries`
    * call. */
  def read(spark: SparkSession, root: String, schema: StructType,
           partitionColumn: String = null,
           maxEpoch: Long = Long.MaxValue,
           asOfGeneration: Long = -1L,
           bloomColumn: String = null,
           branch: String = null): DataFrame = {
    if (branch != null) {
      require(asOfGeneration < 0L,
        "branch reads cannot combine with asOfGeneration")
      var r = spark.read.format("epochstore").schema(schema)
        .option("path", root).option("branch", branch)
      if (partitionColumn != null)
        r = r.option("partitionColumn", partitionColumn)
      if (maxEpoch != Long.MaxValue) r = r.option("maxEpoch", maxEpoch.toString)
      if (bloomColumn != null) r = r.option("bloomColumn", bloomColumn)
      return r.load()
    }
    val gen = if (asOfGeneration >= 0L) asOfGeneration
      else {
        val gens = EpochManifest.generations(spark, root)
        require(gens.nonEmpty, s"no committed manifest under $root")
        gens.last
      }
    var r = spark.read.format("epochstore").schema(schema).option("path", root)
      .option("asOfGeneration", gen.toString)
    if (partitionColumn != null) r = r.option("partitionColumn", partitionColumn)
    if (maxEpoch != Long.MaxValue) r = r.option("maxEpoch", maxEpoch.toString)
    if (bloomColumn != null) r = r.option("bloomColumn", bloomColumn)
    r.load()
  }

  /** [[read]] over a hash-bucket store ([[StoreBucket]]): equality/IN
    * probes on the bucket column open only the probed buckets, and two
    * stores bucketed alike join storage-partitioned. */
  def readBucketed(spark: SparkSession, root: String, schema: StructType,
                   bucketColumn: String, bucketCount: Int,
                   maxEpoch: Long = Long.MaxValue,
                   partitionColumn: String = null): DataFrame = {
    var r = spark.read.format("epochstore").schema(schema)
      .option("path", root)
      .option("bucketColumn", bucketColumn)
      .option("bucketCount", bucketCount.toString)
    if (partitionColumn != null)
      r = r.option("partitionColumn", partitionColumn)
    if (maxEpoch != Long.MaxValue) r = r.option("maxEpoch", maxEpoch.toString)
    r.load()
  }

  /** [[write]] into a hash-bucket layout — alone, or composed under
    * identity partition levels (`partitionColumn`): the canonical
    * 100 TB fact layout `date=v/<col>_bucket=K`, both levels pruned
    * independently at scan time. */
  def writeBucketed(df: DataFrame, root: String, epoch: Long,
                    bucketColumn: String, bucketCount: Int,
                    statsColumns: Seq[String] = Nil,
                    partitionColumn: String = null,
                    sortColumns: Seq[String] = Nil): Unit = {
    var w = df.write.format("epochstore").mode("append")
      .option("path", root).option("epoch", epoch.toString)
      .option("bucketColumn", bucketColumn)
      .option("bucketCount", bucketCount.toString)
    if (partitionColumn != null)
      w = w.option("partitionColumn", partitionColumn)
    if (statsColumns.nonEmpty)
      w = w.option("statsColumns", statsColumns.mkString(","))
    if (sortColumns.nonEmpty)
      w = w.option("sortColumns", sortColumns.mkString(","))
    w.save()
  }

  /** The LATEST-WINS keyed view — the read side of upsert-by-append:
    * each key's row from the HIGHEST manifest epoch that wrote it wins
    * (the `_epoch` metadata column orders versions; ties inside one
    * epoch break on the keyed max of `versionCol` when given, else the
    * writer contract is one row per key per epoch). Appending a
    * correction epoch thus UPDATES keys without rewriting history —
    * Delta/Iceberg's merge-on-read shape on the manifest store. One
    * max_by aggregate per key: the shuffle carries each key once per
    * file-containing epoch, never the dropped history's width. */
  def readLatest(spark: SparkSession, root: String, schema: StructType,
                 keyCols: Seq[String], partitionColumn: String = null,
                 versionCol: String = null,
                 applyDeletes: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, max, max_by, struct}
    require(keyCols.nonEmpty, "readLatest needs at least one key column")
    val t = read(spark, root, schema, partitionColumn)
    val payload = schema.fieldNames.filterNot(keyCols.contains)
    val order =
      if (versionCol == null) col(EpochColName)
      else struct(col(EpochColName), col(versionCol))
    val latest = t
      .select((keyCols ++ payload).map(col) :+ col(EpochColName): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), order).as("_latest"),
        max(col(EpochColName)).as("_data_epoch"))
      .select(keyCols.map(col) ++
        payload.map(n => col(s"_latest.$n").as(n)) :+ col("_data_epoch"): _*)
    val withDeletes =
      if (!applyDeletes) latest
      else {
        val delRoot = deletesRoot(root)
        if (EpochManifest.generations(spark, delRoot).isEmpty ||
          EpochManifest.entries(spark, delRoot).isEmpty) latest
        else {
          // a tombstone at epoch e removes keys whose newest DATA epoch
          // is ≤ e; a later re-insert (data epoch > e) resurrects the
          // key — merge-on-read row-level deletes, history untouched
          val keySchema = StructType(schema.filter(f => keyCols.contains(f.name)))
          val dels = read(spark, delRoot, keySchema)
            .groupBy(keyCols.map(col): _*)
            .agg(max(col(EpochColName)).as("_del_epoch"))
          latest.join(dels, keyCols, "left")
            .filter(col("_del_epoch").isNull ||
              col("_data_epoch") > col("_del_epoch"))
            .drop("_del_epoch")
        }
      }
    withDeletes.drop("_data_epoch")
  }

  /** The delete sub-store: tombstone epochs under `root/_deletes`, a
    * manifest store of their own (gc/manifest dirs never collide with
    * the data entries). */
  def deletesRoot(root: String): String = s"$root/_deletes"

  /** Rows in the `_deletes` journal (0 when none) — the post-restore
    * tombstone count `restore_snapshot` surfaces: the journal keeps its
    * own lineage across a restore, so these keys STILL suppress
    * restored rows in latest-wins reads (the documented divergence from
    * Delta RESTORE). Answered from the sub-store's stats sidecars
    * (zero data IO); pre-index entries fall back to one count. */
  def liveDeleteJournalRows(spark: SparkSession, root: String): Long = {
    val dr = deletesRoot(root)
    val fs = new Path(dr).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    if (!fs.exists(new Path(dr))) return 0L
    EpochManifest.entries(spark, dr).map { e =>
      EpochStoreStats.readIndexed(fs, dr, e.dir) match {
        case Some(ix) => ix.valuesIterator.map(_.rows).sum
        case None => spark.read.parquet(s"$dr/${e.dir}").count()
      }
    }.sum
  }

  /** Row-level DELETE as an appended tombstone epoch: `keys` (the key
    * columns only, deduplicated here) lands in the delete sub-store
    * under `epoch`, and [[readLatest]] with `applyDeletes = true` drops
    * every key whose newest data epoch is ≤ that tombstone's — deletes
    * at delta cost, history never rewritten (the merge-on-read DELETE
    * of Delta/Iceberg position/equality deletes, expressed as equality
    * tombstones). Use an epoch STRICTLY ABOVE every data epoch the
    * delete should cover; a later data epoch for the same key
    * resurrects it. [[purgeDeletes]] folds the tombstones into the
    * data physically. */
  def delete(spark: SparkSession, root: String, keys: DataFrame,
             epoch: Long): Unit =
    write(keys.dropDuplicates(), deletesRoot(root), epoch)

  /** Apply every tombstone PHYSICALLY: fold the store into one entry
    * holding the current latest-wins, delete-applied state (written
    * with the partition layout, schema sidecar included so evolution
    * keeps working), commit it as the single visible entry, clear the
    * delete sub-store, and gc. Version history collapses to the fold —
    * the pre-purge snapshot stays readable via the previous manifest
    * generation until the next gc cycle (the same two-manifest lag
    * every compaction honors). The next append/delete must use an
    * epoch above the fold's. */
  def purgeDeletes(spark: SparkSession, root: String, schema: StructType,
                   keyCols: Seq[String], partitionColumn: String = null,
                   versionCol: String = null): Unit = {
    val es = EpochManifest.entries(spark, root)
    require(es.nonEmpty, s"no committed manifest under $root")
    // pin the TOMBSTONE sub-store alongside the data: a delete committed
    // after this read would be silently wiped by the clearing commit
    // below — refuse it loudly instead (same posture as the data side)
    val delBase = EpochManifest.entries(spark, deletesRoot(root))
    val live = readLatest(spark, root, schema, keyCols, partitionColumn,
      versionCol, applyDeletes = true)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    val maxEpoch = es.map(_.epoch).max
    val foldDir = EpochManifest.newFoldDir(spark, root, maxEpoch)
    val w = live.write.mode("overwrite")
    val pcs = splitPartCols(Option(partitionColumn))
    (if (pcs.isEmpty) w else w.partitionBy(pcs: _*))
      .parquet(s"$root/$foldDir")
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    EpochStoreWrite.writeSchemaSidecar(fs, root, foldDir, schema, pcs)
    // row counts + the file-level index for the fold (no column stats —
    // the purged store's declared kinds fold through compactStore)
    rederiveStats(spark, fs, root, foldDir, schema, Nil)
    // the purge folded EVERY entry AND the tombstone sub-store it read —
    // any commit racing in (data or tombstone) conflicts; refuse loudly
    EpochManifest.commitIfUnchanged(spark, root, es,
      Seq(EpochManifest.Entry(maxEpoch, foldDir,
        lo = es.map(_.minEpoch).min)))
    EpochManifest.gc(spark, root)
    val delRoot = deletesRoot(root)
    if (EpochManifest.generations(spark, delRoot).nonEmpty) {
      EpochManifest.commitIfUnchanged(spark, delRoot, delBase, Seq.empty)
      EpochManifest.gc(spark, delRoot)
    }
  }

  /** ADD-COLUMN schema evolution: merge every epoch's recorded
    * `_schema.json` by name — fields keep first-appearance order, a
    * column new in a later epoch joins as nullable (older files serve
    * it as null through Spark's parquet missing-column handling), and a
    * same-name type conflict refuses loudly (silent coercion corrupts).
    * Entries without a schema record (pre-evolution epochs, generic
    * compaction folds) refuse with the explicit-schema escape hatch. */
  def evolvedSchema(spark: SparkSession, root: String,
                    asOfGeneration: Long = -1L)
      : (StructType, Option[String]) = {
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val es = if (asOfGeneration < 0L) EpochManifest.entries(spark, root)
      else EpochManifest.entriesAt(spark, root, asOfGeneration)
    require(es.nonEmpty, s"no committed manifest under $root")
    val recs = es.map(e =>
      e.dir -> EpochStoreWrite.readSchemaSidecar(fs, root, e.dir))
    val missing = recs.collect { case (d, None) => d }
    require(missing.isEmpty,
      s"store $root entries without a _schema.json record: " +
        s"${missing.mkString(", ")} — pre-evolution epochs; read with an " +
        "explicit .schema(...) instead")
    val layout = EpochManifest.currentLayout(spark, root)
    val (merged, pc0) = mergeRecorded(root, recs.map(_._2.get),
      allowMixedPartitioning = layout.nonEmpty)
    // a layout log owns the CURRENT partitioning (entries may disagree)
    val pc = layout match {
      case Some(l) => Some(l.partCols.mkString(",")).filter(_.nonEmpty)
      case None => pc0
    }
    val ops = EpochManifest.columnOps(spark, root)
    (if (ops.isEmpty) merged else applyColumnOps(root, merged, ops), pc)
  }

  /** RENAME/DROP column evolution (X85) — the replayed view of the
    * store's column-ops log ([[EpochManifest.columnOps]]): for every
    * CURRENT (logical) column, the chain of historical (physical) names
    * an old entry may have written it under, plus every name ever
    * retired (renamed-away or dropped — re-adding one would let an old
    * entry's physical column leak into the new logical column, so DDL
    * refuses it). */
  final case class ColumnAliases(chains: Map[String, List[String]],
                                 retired: Set[String]) {
    def isEmpty: Boolean = chains.isEmpty && retired.isEmpty
    /** The physical name `logical` resolves to in an entry whose
      * recorded fields are `entryFields` — the newest chain name the
      * entry actually has; the logical name itself when none match
      * (the column is simply absent there and serves null). */
    def resolve(logical: String, entryFields: Set[String]): String =
      (logical :: chains.getOrElse(logical, Nil))
        .find(entryFields.contains).getOrElse(logical)
  }

  /** Whether ANY live (latest-snapshot) entry still serves a current
    * logical column under a historical physical name — the question
    * the rename gates actually ask. The column-ops log is immutable
    * (its `retired` set must outlive compaction to keep the re-add
    * refusal sound), so `chains.nonEmpty` stays true forever; but once
    * `CALL compact` rewrites every entry to the current names, no live
    * entry needs aliasing and the gated paths — filtered INSERT
    * OVERWRITE, metadata-first DELETE, footer/sidecar aggregation —
    * must reopen, exactly as their refusal messages promise. An entry
    * predating schema records can't be proven current and counts as
    * needing aliases. One sidecar read per entry, and only on stores
    * whose ops log has live chains (rare). */
  def liveAliasNeed(spark: SparkSession, root: String): Boolean = {
    val aliases = columnAliases(spark, root)
    if (aliases.chains.isEmpty) return false
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val logical =
      try evolvedSchema(spark, root)._1.fieldNames.toSeq
      catch { case _: IllegalArgumentException => return true }
    EpochManifest.entries(spark, root).exists { e =>
      EpochStoreWrite.readSchemaSidecar(fs, root, e.dir) match {
        case None => true
        case Some((s, _)) =>
          val efs = s.fieldNames.toSet
          logical.exists(l => aliases.resolve(l, efs) != l)
      }
    }
  }

  /** Replay the ops log into alias chains. */
  def columnAliases(spark: SparkSession, root: String): ColumnAliases = {
    var chains = Map.empty[String, List[String]]
    var retired = Set.empty[String]
    EpochManifest.columnOps(spark, root).foreach {
      case EpochManifest.ColumnOp.Rename(a, b) =>
        chains = chains - a + (b -> (a :: chains.getOrElse(a, Nil)))
        retired += a
      case EpochManifest.ColumnOp.Drop(c) =>
        retired ++= (c :: chains.getOrElse(c, Nil))
        chains -= c
    }
    ColumnAliases(chains, retired)
  }

  /** The stat-sidecar kind a column of this type accumulates under —
    * None for types without a stable cross-side comparison. Shared by
    * the write option parser, the fold paths, and migrate_layout. */
  private[sources] def statKindOf(dt: org.apache.spark.sql.types.DataType)
      : Option[Char] = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => Some('l')
    case org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType => Some('d')
    case org.apache.spark.sql.types.StringType => Some('S')
    case _ => None
  }

  /** The LOGICAL column a PHYSICAL spelling serves under `aliases`
    * (itself when never renamed); None when the name was dropped. */
  private[sources] def logicalNameOf(aliases: ColumnAliases,
      schema: StructType, phys: String): Option[String] =
    if (aliases.isEmpty) Some(phys).filter(schema.fieldNames.contains)
    else schema.fieldNames.find(l =>
      l == phys || aliases.chains.getOrElse(l, Nil).contains(phys))

  /** Apply the ops log to the MERGED physical record set: a rename
    * whose old name still appears (pre-rename entries live) drops the
    * old field — its data serves through the alias chain — and keeps
    * (or creates) the new; a drop removes the field. Type agreement
    * between both sides of a live rename is required (the alias read
    * serves old files' values AS the new column). */
  private[sources] def applyColumnOps(root: String, schema: StructType,
      ops: Seq[EpochManifest.ColumnOp]): StructType =
    ops.foldLeft(schema) { (s, op) =>
      op match {
        case EpochManifest.ColumnOp.Rename(a, b) =>
          val fa = s.fields.find(_.name == a)
          val fb = s.fields.find(_.name == b)
          (fa, fb) match {
            case (Some(f), None) =>
              StructType(s.fields.map(x =>
                if (x.name == a) f.copy(name = b) else x))
            case (Some(f), Some(g)) =>
              require(f.dataType == g.dataType,
                s"rename $a -> $b on $root: pre-rename entries hold $a: " +
                  s"${f.dataType}, post-rename $b: ${g.dataType} — type " +
                  "evolution through rename is refused")
              StructType(s.fields.filterNot(_.name == a))
            case (None, _) => s
          }
        case EpochManifest.ColumnOp.Drop(c) =>
          StructType(s.fields.filterNot(_.name == c))
      }
    }

  /** Merge per-entry recorded (schema, partitionColumn) pairs by NAME —
    * first-appearance field order, later-added columns nullable,
    * same-name type conflicts and partition-column changes refused
    * loudly. Shared by [[evolvedSchema]] and the catalog's discovery
    * (which pre-reads the sidecars it existence-checked — one read per
    * entry, not two). */
  private[sources] def mergeRecorded(root: String,
      recs: Seq[(StructType, Option[String])],
      allowMixedPartitioning: Boolean = false)
      : (StructType, Option[String]) = {
    val parts0 = recs.map(_._2).distinct
    // a LAYOUT LOG makes mixed per-entry partitioning a declared state,
    // not corruption: the merged pc is meaningless then (each entry
    // serves under its own spec; the caller takes the CURRENT layout
    // from the log) — report None rather than refusing
    val parts = if (allowMixedPartitioning && parts0.size > 1)
      Seq(None) else parts0
    require(parts.size == 1,
      s"partitionColumn changed across epochs of $root: $parts")
    val merged = recs.map(_._1).reduceLeft { (a, b) =>
      val known = a.fields.map(f => f.name -> f).toMap
      b.fields.foreach(f => known.get(f.name).foreach(g =>
        require(g.dataType == f.dataType,
          s"column ${f.name} changed type across epochs of $root: " +
            s"${g.dataType} vs ${f.dataType} — type evolution is refused")))
      StructType(a.fields ++
        b.fields.filterNot(f => known.contains(f.name))
          .map(_.copy(nullable = true)))
    }
    (merged, parts.head)
  }

  /** [[read]] under the store's own evolved schema — no caller-supplied
    * schema; epochs written before a column existed serve it as null. */
  def readEvolved(spark: SparkSession, root: String,
                  asOfGeneration: Long = -1L): DataFrame = {
    // time travel composes: the PINNED generation's schemas merge, so
    // an as-of read predating an ADD COLUMN serves the old shape
    val (schema, part) = evolvedSchema(spark, root, asOfGeneration)
    read(spark, root, schema, part.orNull, asOfGeneration = asOfGeneration)
  }

  /** The engine's changefeed entry point — the rows committed AFTER a
    * retained manifest `sinceGeneration` (epochs whose whole span
    * postdates that generation's high-water mark), as one pinned batch
    * scan with the same pruning/pushdown as [[read]]. The incremental
    * reconciliation primitive: a consumer that remembers the generation
    * it last processed reads exactly the delta, never the history —
    * `q_table_diff`'s full-scan fingerprint compare, for the
    * append-only store case, at delta cost. Fails loudly when a
    * compaction folded across the boundary (the delta is gone) or the
    * base generation was gc'd. */
  /** `untilGeneration` BOUNDS the feed (Delta CDF's
    * startingVersion/endingVersion shape): the delta covers exactly the
    * epochs committed after `sinceGeneration` up to and including the
    * RETAINED generation `untilGeneration` (default -1 = the head) —
    * a consumer can page history windows deterministically. */
  def changes(spark: SparkSession, root: String, schema: StructType,
              sinceGeneration: Long,
              partitionColumn: String = null,
              untilGeneration: Long = -1L): DataFrame = {
    val gens = EpochManifest.generations(spark, root)
    require(gens.nonEmpty, s"no committed manifest under $root")
    if (untilGeneration >= 0L)
      require(gens.contains(untilGeneration),
        s"epochstore changefeed over $root: untilGeneration " +
          s"$untilGeneration is not a retained generation " +
          s"(${gens.mkString(", ")})")
    changesAt(spark, root, schema, sinceGeneration, partitionColumn,
      asOf = if (untilGeneration >= 0L) untilGeneration else gens.last,
      dvHandled = false)
  }

  /** The pinned raw feed [[changes]]/[[readChanges]] share. `dvHandled`
    * marks the caller as synthesizing position-delete events itself
    * ([[readChanges]]) — the raw feed otherwise refuses on in-window
    * DV journals rather than silently dropping their deletes. */
  private def changesAt(spark: SparkSession, root: String,
      schema: StructType, sinceGeneration: Long, partitionColumn: String,
      asOf: Long, dvHandled: Boolean): DataFrame = {
    var r = spark.read.format("epochstore").schema(schema)
      .option("path", root)
      .option("asOfGeneration", asOf.toString)
      .option("changesSinceGeneration", sinceGeneration.toString)
    if (dvHandled) r = r.option("dvChangefeedHandled", "true")
    if (partitionColumn != null) r = r.option("partitionColumn", partitionColumn)
    r.load()
  }

  /** [[changes]] as a full CDC FEED (the Delta CDF / Iceberg changelog
    * shape): every row carries `_change_type` and `_epoch`. On a
    * row-identity store, a MoR UPDATE/MERGE-update lands as a tombstone
    * + reinsert of the same key in ONE delta epoch — this feed PAIRS
    * them (X81, the Delta CDF contract): the reinsert arrives as
    * `update_postimage` (full new row) and the tombstone as
    * `update_preimage` carrying the key's FULL OLD ROW, resolved from
    * the pre-epoch snapshot (`maxEpoch = e-1`, merge-on-read applied) —
    * a MATCHED key's old row is live there by definition. Unpaired
    * events keep `insert` / `delete` (delete events: key columns set,
    * payload null). Selecting `_change_type` at the DSv2 layer remains
    * the RAW stream (tombstone resolution off by definition); this API
    * is the paired view over it.
    *
    * Scale shape: pairing is one shuffle keyed (epoch, key) over the
    * delta-sized feed; pre-image payloads cost one broadcast-keys join
    * against the pre-state PER UPDATING EPOCH, with the store's normal
    * dir/stats/bloom pruning on the probe side.
    *
    * FILTER the feed on KEY columns only: standard changelog semantics
    * — a predicate on a payload or partition column evaluates against
    * a delete event's nulls and drops it, so a filtered replica would
    * keep rows the source deleted. Filter the REPLAYED state instead,
    * or the feed by key. */
  def readChanges(spark: SparkSession, root: String, schema: StructType,
                  sinceGeneration: Long,
                  partitionColumn: String = null,
                  untilGeneration: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, sum, when}
    val gens = EpochManifest.generations(spark, root)
    require(gens.nonEmpty, s"no committed manifest under $root")
    if (untilGeneration >= 0L)
      require(gens.contains(untilGeneration),
        s"epochstore changefeed over $root: untilGeneration " +
          s"$untilGeneration is not a retained generation " +
          s"(${gens.mkString(", ")})")
    val upto = if (untilGeneration >= 0L) untilGeneration else gens.last
    val t = changesAt(spark, root, schema, sinceGeneration, partitionColumn,
      asOf = upto, dvHandled = true)
    val raw0 = t.select(schema.fieldNames.map(col).toSeq :+
      col(ChangeColName) :+ col(EpochColName): _*)
    // X94: position-delete journals committed since the base deleted
    // rows the consumer already ingested — synthesize their `delete`
    // events (full old payloads) from the targeted files' dead ordinals
    val dvDeletes: Option[DataFrame] =
      if (!EpochStoreDv.declared(spark, root)) None
      else {
        val head = EpochManifest.entriesAt(spark, root, upto)
        val baseMax = EpochManifest.entriesAt(spark, root, sinceGeneration)
          .foldLeft(-1L)((m, e) => math.max(m, e.epoch))
        val journals = EpochStoreDv.dvCarrying(spark, root,
          head.filter(_.minEpoch > baseMax))
        if (journals.isEmpty) None
        else EpochStoreDv.deleteEvents(spark, root, head, journals,
          baseMax, schema)
      }
    val raw = dvDeletes match {
      case None => raw0
      case Some(d) => raw0.unionByName(d)
    }
    val keys = EpochStoreDelta.declared(spark, root).getOrElse(Nil)
    if (keys.isEmpty) return raw
    // classify: a key with BOTH a tombstone and a reinsert in one epoch
    // is an update — per-key MERGE semantics write at most one of each
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((EpochColName +: keys).map(col): _*)
    val classified = raw
      .withColumn("__graft_ins", sum(when(col(ChangeColName) === "insert",
        1L).otherwise(0L)).over(w))
      .withColumn("__graft_del", sum(when(col(ChangeColName) === "delete",
        1L).otherwise(0L)).over(w))
      .withColumn(ChangeColName,
        when(col(ChangeColName) === "delete" && col("__graft_ins") > 0,
          "update_preimage")
          .when(col(ChangeColName) === "insert" && col("__graft_del") > 0,
            "update_postimage")
          .otherwise(col(ChangeColName)))
      .drop("__graft_ins", "__graft_del")
    val outCols = (schema.fieldNames.toSeq :+ ChangeColName :+ EpochColName)
      .map(col)
    // pre-image PAYLOADS: per updating epoch, the keys' old rows from
    // the pre-epoch merge-on-read state (the epochs are driver-collected
    // — one MERGE is one epoch, so this is statement-count-sized)
    val preEpochs = classified
      .filter(col(ChangeColName) === "update_preimage")
      .select(col(EpochColName)).distinct().collect().map(_.getLong(0))
    if (preEpochs.isEmpty) return classified.select(outCols: _*)
    val others = classified.filter(col(ChangeColName) =!= "update_preimage")
    val pres = preEpochs.toSeq.sorted.map { e =>
      val preKeys = classified
        .filter(col(ChangeColName) === "update_preimage" &&
          col(EpochColName) === e)
        .select(keys.map(col): _*)
      var r = spark.read.format("epochstore").schema(schema)
        .option("path", root).option("maxEpoch", (e - 1L).toString)
      if (partitionColumn != null)
        r = r.option("partitionColumn", partitionColumn)
      val oldState = r.load()
      val filled = oldState.join(broadcast(preKeys), keys.toSeq, "inner")
        .select(schema.fieldNames.map(col).toSeq: _*)
        .withColumn(ChangeColName, lit("update_preimage"))
        .withColumn(EpochColName, lit(e))
      // a MATCHED key's old row is live at e-1 by MERGE semantics; a
      // key that still resolves nothing (a racing physical purge) keeps
      // its key-only event shape rather than vanishing from the feed
      val missing = preKeys.join(
        oldState.select(keys.map(col): _*), keys.toSeq, "left_anti")
      val keyOnly = missing.select(schema.fieldNames.map(n =>
        (if (keys.contains(n)) col(n)
        else lit(null).cast(schema(n).dataType)).as(n)): _*)
        .withColumn(ChangeColName, lit("update_preimage"))
        .withColumn(EpochColName, lit(e))
      filled.unionByName(keyOnly)
    }
    pres.foldLeft(others.select(outCols: _*))(
      (acc, p) => acc.unionByName(p.select(outCols: _*)))
  }

  /** The engine's streaming-read entry point — a micro-batch tail of the
    * store's committed epochs ([[EpochStoreMicroBatchStream]]): the
    * initial batch is the current snapshot (or nothing, with
    * `startingAfterEpoch` at the current max), then each newly committed
    * epoch arrives as (part of) a trigger, exactly once across restarts.
    * `maxEpochsPerTrigger` bounds catch-up batch sizes. */
  def readStream(spark: SparkSession, root: String, schema: StructType,
                 partitionColumn: String = null,
                 startingAfterEpoch: Long = -1L,
                 maxEpochsPerTrigger: Long = -1L): DataFrame = {
    var r = spark.readStream.format("epochstore").schema(schema)
      .option("path", root)
    if (partitionColumn != null) r = r.option("partitionColumn", partitionColumn)
    if (startingAfterEpoch >= 0L)
      r = r.option("startingAfterEpoch", startingAfterEpoch.toString)
    if (maxEpochsPerTrigger > 0L)
      r = r.option("maxEpochsPerTrigger", maxEpochsPerTrigger.toString)
    r.load()
  }

  /** The engine's write entry point — `df` lands as `epoch`'s attempt
    * dir + one atomic manifest publish through the DSv2 sink
    * ([[EpochStoreWriteBuilder]]): [[EpochManifest.append]] semantics
    * (epoch replacement on retry, fold guard) with Spark writing the
    * parquet bytes. `partitionColumn` materializes the `col=value` dirs
    * the read side prunes. */
  def write(df: DataFrame, root: String, epoch: Long,
            partitionColumn: String = null,
            bloomColumn: String = null,
            statsColumns: Seq[String] = Nil,
            sortColumns: Seq[String] = Nil,
            writePartitions: Int = 0,
            branch: String = null): Unit = {
    var w = df.write.format("epochstore").mode("append")
      .option("path", root).option("epoch", epoch.toString)
    if (branch != null) w = w.option("branch", branch)
    if (partitionColumn != null) w = w.option("partitionColumn", partitionColumn)
    if (bloomColumn != null) w = w.option("bloomColumn", bloomColumn)
    if (statsColumns.nonEmpty)
      w = w.option("statsColumns", statsColumns.mkString(","))
    if (sortColumns.nonEmpty)
      w = w.option("sortColumns", sortColumns.mkString(","))
    if (writePartitions > 0)
      w = w.option("writePartitions", writePartitions.toString)
    w.save()
  }

  /** STORE-AWARE compaction — [[EpochManifest.compact]] upgraded to
    * keep the connector's whole metadata tier alive across the fold:
    *
    *  - evolution-aware: each covered entry is read under its OWN
    *    recorded `_schema.json` and unioned by name (missing columns
    *    null-filled), so compacting an evolved store neither drops the
    *    added column nor refuses; the fold records the MERGED schema,
    *    keeping [[readEvolved]] working afterwards;
    *  - optionally re-clustered: `sortColumns` range-distributes and
    *    sorts the fold (`parts` files), restoring disjoint per-file
    *    ranges exactly when history epochs had overlapping ones;
    *  - stats-preserving: per-file min / max / null counts are
    *    RE-DERIVED for every numeric column any covered epoch declared
    *    (one read-back pass grouped by file), so range skipping, LIMIT
    *    truncation, and row-count statistics survive the fold. String
    *    stats are dropped (Spark's binary UTF-8 min/max can disagree
    *    with the probe's java ordering on supplementary characters —
    *    a dropped stat only costs IO, a wrong one costs rows); bloom
    *    sidecars are dropped likewise (folded files always stay, the
    *    documented always-keep fallback).
    *
    * Same isolation contract as every compaction here: the swap is ONE
    * manifest commit, a reader pinned to the previous generation keeps
    * every dir through the gc lag. */
  def compactStore(spark: SparkSession, root: String,
                   uptoEpoch: Long = Long.MaxValue,
                   sortColumns: Seq[String] = Nil,
                   parts: Int = 8,
                   zorderColumns: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit,
      max, min, sum, when}
    require(sortColumns.isEmpty || zorderColumns.isEmpty,
      "compactStore: sortColumns and zorderColumns are exclusive layouts")
    require(zorderColumns.isEmpty || zorderColumns.length == 2,
      s"compactStore: zorderColumns takes exactly two columns, got " +
        zorderColumns.mkString(", "))
    val es = EpochManifest.entries(spark, root)
    val covered = es.filter(_.epoch < uptoEpoch)
    // a single already-current entry has nothing to fold — but a single
    // FOREIGN-layout entry (spec evolution) still rewrites, or the
    // normalizing compact the refusal messages promise would no-op
    val foreignCovered = EpochManifest.currentLayout(spark, root).exists {
      l =>
        val fs = new Path(root)
          .getFileSystem(GraftBridge.sessionHadoopConf(spark))
        covered.exists { e =>
          EpochStoreWrite.readSchemaSidecar(fs, root, e.dir).exists {
            case (_, pc) => splitPartCols(pc) != l.partCols
          } || EpochStoreWrite.readBucketSidecar(fs, root, e.dir) !=
            l.bucketCol.map(c => StoreBucket(c, l.bucketCount))
        }
    }
    // X94: live position deletes fold IN (the fold applies each
    // entry's dead ordinals distributed) — but only a FULL fold is
    // sound: a partial fold could rewrite targeted dirs while the DV
    // entry (or a target) stays outside, stranding positions
    if (EpochStoreDv.hasLiveDvs(spark, root, es))
      require(covered.size == es.size,
        s"compactStore on $root: live position deletes need a full " +
          "fold — drop uptoEpoch (a partial fold would strand file " +
          "positions)")
    if (covered.isEmpty || (covered.size == 1 && !foreignCovered)) return
    foldCovered(spark, root, es, covered, sortColumns, parts, zorderColumns)
  }

  /** LAYOUT MIGRATION (X89) — partition-spec evolution the PHYSICAL
    * way: fold the WHOLE store into one entry laid out under a NEW spec
    * (identity partition columns, hash buckets, sort order — any
    * combination the writers support), committed as ONE OCC fold. Since
    * X92 ([[evolveLayout]]) the metadata-only route exists too — mixed
    * specs CAN share a snapshot, each entry pruned/served under its own
    * — so this is the eager re-clustering option: one rewrite and every
    * skipping/SPJ/ordering tier serves the new layout immediately, with
    * the previous layout readable via time travel until gc. A racing
    * commit refuses loudly (the fold resolves against the pinned
    * snapshot). */
  /** PARTITION-SPEC evolution WITHOUT rewriting (X92 — Iceberg's
    * mixed-spec snapshots): publish the new table-level layout to the
    * versioned layout log ([[graft.core.EpochManifest.publishLayout]]).
    * Metadata-only — no entry moves. New writes land under the new
    * spec; every scan prunes and serves each pinned entry under its OWN
    * recorded spec (foreign-layout entries read through a re-split +
    * permuted reader profile). SPJ/sort-order reports and metadata-only
    * aggregation are withheld while specs are mixed; `CALL
    * migrate_layout` (or compaction) physically normalizes and restores
    * them. Returns a rendering of the PREVIOUS layout. */
  def evolveLayout(spark: SparkSession, root: String,
                   partitionColumns: Seq[String],
                   bucketColumn: Option[String],
                   bucketCount: Int,
                   transform: Option[String] = None): String = {
    val es = EpochManifest.entries(spark, root)
    require(es.nonEmpty, s"no committed manifest under $root")
    require(bucketColumn.isEmpty == (bucketCount <= 0),
      "bucket_column and a positive bucket_count come together")
    val fs0 = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // schema from the entry records, LAYOUT-TOLERANT: the very call that
    // declares a table-level layout must accept entries that already
    // record different specs (a store built by explicit per-epoch
    // layout options has no log yet — evolve_layout IS how it gets one)
    val recs0 = es.map(e => EpochStoreWrite.readSchemaSidecar(fs0, root, e.dir))
    require(recs0.forall(_.isDefined),
      s"evolve_layout on $root: entries " +
        s"${es.zip(recs0).collect { case (e, None) => e.dir }.mkString(", ")}" +
        " predate schema records — per-entry spec resolution needs them; " +
        "run CALL compact first")
    val (schemaPhys0, _) = mergeRecorded(root, recs0.map(_.get),
      allowMixedPartitioning = true)
    val ops0 = EpochManifest.columnOps(spark, root)
    val schema =
      if (ops0.isEmpty) schemaPhys0
      else applyColumnOps(root, schemaPhys0, ops0)
    (partitionColumns ++ bucketColumn).foreach { c =>
      require(schema.fieldNames.contains(c),
        s"evolve_layout on $root: column $c is not in the schema " +
          s"(${schema.fieldNames.mkString(", ")})")
    }
    require(partitionColumns.distinct.size == partitionColumns.size,
      s"evolve_layout on $root: duplicate partition column")
    bucketColumn.foreach { c =>
      val dt = schema(c).dataType
      import org.apache.spark.sql.types._
      require(Set[DataType](StringType, ByteType, ShortType, IntegerType,
        LongType).contains(dt),
        s"evolve_layout on $root: bucket column $c must be integral or " +
          s"string, got $dt")
      require(!partitionColumns.contains(c),
        s"evolve_layout on $root: $c cannot be both identity and bucket")
    }
    // a ROW-IDENTITY store refuses spec evolution outright: its delta
    // entries' tombstone-event files and merge-on-read resolution are
    // planned under ONE layout, and a pre-evolution delta entry under a
    // foreign spec would mis-serve CDC constants — migrate_layout (a
    // physical rewrite, tombstones folded first) is the supported move
    require(EpochStoreDelta.declared(spark, root).isEmpty,
      s"evolve_layout on $root: the store declares a row identity — " +
        "metadata-only spec evolution does not compose with " +
        "merge-on-read deltas; use CALL migrate_layout (compact folds " +
        "live tombstones first)")
    // TIME-UNIT/TRUNCATE transform target (X93 composing with X92):
    // the declared layout may carry one unit level — parsed, typed, and
    // collision-checked here. Entries recorded under OTHER transforms
    // (or none) stay readable the usual mixed-spec way: a probe prunes
    // unit dirs only where the entry records exactly the probed
    // transform, and degrades to unpruned-but-exact everywhere else.
    val transformSpec: Option[StoreTransform] =
      transform.map(StoreTransform.parse)
    transformSpec.foreach { t =>
      require(schema.fieldNames.contains(t.col),
        s"evolve_layout on $root: transform column ${t.col} is not in " +
          s"the schema (${schema.fieldNames.mkString(", ")})")
      StoreTransform.validate(t, schema(t.col).dataType)
      require(!partitionColumns.contains(t.col),
        s"evolve_layout on $root: ${t.col} cannot be both identity and " +
          "transform column")
      require(!bucketColumn.contains(t.col),
        s"evolve_layout on $root: ${t.col} cannot be both bucket and " +
          "transform column")
    }
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val prev = EpochManifest.currentLayout(spark, root) match {
      case Some(l) =>
        (l.partCols.map(c => s"identity($c)") ++
          l.transform.toSeq ++
          l.bucketCol.map(c => s"bucket(${l.bucketCount}, $c)"))
          .mkString(", ")
      case None =>
        // the pre-log layout: whatever the (uniform) entries record
        val pcs = es.flatMap(e =>
          EpochStoreWrite.readSchemaSidecar(fs, root, e.dir))
          .flatMap(r => splitPartCols(r._2)).distinct
        val bks = es.map(e =>
          EpochStoreWrite.readBucketSidecar(fs, root, e.dir)).distinct
        val tfs = es.map(e =>
          EpochStoreWrite.readTransformSidecar(fs, root, e.dir)).distinct
        (pcs.map(c => s"identity($c)") ++
          (tfs match {
            case Seq(Some(t)) => Seq(t.spelling)
            case _ => Nil
          }) ++
          (bks match {
            case Seq(Some(b)) => Seq(s"bucket(${b.n}, ${b.col})")
            case _ => Nil
          })).mkString(", ")
    }
    EpochManifest.publishLayout(spark, root,
      EpochManifest.LayoutSpec(partitionColumns, bucketColumn,
        math.max(bucketCount, 0), transformSpec.map(_.spelling)))
    if (prev.isEmpty) "(unpartitioned)" else prev
  }

  def migrateLayout(spark: SparkSession, root: String,
                    partitionColumns: Seq[String] = Nil,
                    bucketColumn: String = null, bucketCount: Int = 0,
                    sortColumns: Seq[String] = Nil,
                    parts: Int = 8,
                    transform: String = null): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val es = EpochManifest.entries(spark, root)
    require(es.nonEmpty, s"no committed manifest under $root")
    // live merge-on-read tombstones: the fold would strand them (rows
    // below would resurrect) — CALL compact applies them first
    EpochStoreWrite.guardNoLiveTombstones(spark, root, "migrate_layout")
    require((bucketColumn == null) == (bucketCount <= 0),
      "bucketColumn and bucketCount come together")
    val (schema, _) = evolvedSchema(spark, root)
    // TIME-UNIT/TRUNCATE target (X93): `transform => 'days(ts)'`
    // migrates an existing store ONTO the unit layout — the SQL
    // adoption path for the reference's own date-dir shape
    val timeT: Option[StoreTransform] = Option(transform).map { sp =>
      val t = StoreTransform.parse(sp)
      require(!partitionColumns.contains(t.col),
        s"migrate_layout on $root: ${t.col} cannot be both identity " +
          "and transform")
      require(bucketColumn == null || bucketColumn != t.col,
        s"migrate_layout on $root: ${t.col} cannot be both transform " +
          "and bucket")
      schema.fields.find(_.name == t.col).foreach(f =>
        StoreTransform.validate(t, f.dataType))
      t
    }
    (partitionColumns ++ Option(bucketColumn) ++ sortColumns ++
      timeT.map(_.col)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"migrate_layout on $root: column $c is not in the schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
    val df0 = readEvolved(spark, root)
      .select(schema.fieldNames.map(col): _*)
    val (df, tcols) = timeT match {
      case Some(t) =>
        val (d, c) = unitDirColumn(df0, t, schema, "migrate_layout")
        (d, Seq(c))
      case None => (df0, Nil)
    }
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val maxCov = es.map(_.epoch).max
    val foldDir = EpochManifest.newFoldDir(spark, root, maxCov)
    val bucket = Option(bucketColumn).map(c => StoreBucket(c, bucketCount))
    bucket match {
      case Some(b) =>
        val bcol = s"${b.col}_bucket"
        require(!schema.fieldNames.contains(bcol),
          s"migrate_layout: schema already has a '$bcol' column — it " +
            "collides with the bucket layout's dir encoding")
        val levels = (partitionColumns ++ tcols) :+ bcol
        val perBucket = df
          .withColumn(bcol, pmod(hash(col(b.col)), lit(b.n)))
          .repartitionByRange(b.n, col(bcol))
        (if (sortColumns.isEmpty) perBucket
         else perBucket.sortWithinPartitions(
           (levels ++ sortColumns).map(col): _*))
          .write.mode("overwrite").partitionBy(levels: _*)
          .parquet(s"$root/$foldDir")
      case None =>
        val levels = partitionColumns ++ tcols
        val shaped =
          if (sortColumns.nonEmpty)
            // partition columns lead the sort — the dynamic-partition
            // writer's ordering requirement must be satisfied up front
            // or Spark re-sorts by them alone, voiding the recorded
            // within-file order
            df.repartitionByRange(parts, sortColumns.map(col): _*)
              .sortWithinPartitions(
                (levels ++ sortColumns).map(col): _*)
          else if (levels.nonEmpty) df
          else df.coalesce(parts)
        val w = shaped.write.mode("overwrite")
        (if (levels.isEmpty) w
         else w.partitionBy(levels: _*))
          .parquet(s"$root/$foldDir")
    }
    EpochStoreWrite.writeSchemaSidecar(fs, root, foldDir, schema,
      partitionColumns, bucket, sortColumns, timeT)
    // keep skipping alive: every stat kind history declared that still
    // names a schema column, plus bounds on the new sort columns
    val aliasesNow = columnAliases(spark, root)
    def logicalOf(phys: String): Option[String] =
      logicalNameOf(aliasesNow, schema, phys)
    val sortKinds: Seq[(String, Char)] = sortColumns.flatMap(c =>
      schema.fields.find(_.name == c).map(_.dataType)
        .flatMap(statKindOf).map(c -> _))
    val statKinds = (es
      .flatMap(e => EpochStoreStats.read(fs, root, e.dir).valuesIterator
        .flatMap(_.cols.toSeq))
      .map { case (c, cs) => (c, if (cs.kind == 's') 'S' else cs.kind) }
      .flatMap { case (c, k) => logicalOf(c).map(_ -> k) }
      ++ sortKinds).distinct
      .filterNot { case (c, _) => partitionColumns.contains(c) }
    rederiveStats(spark, fs, root, foldDir, schema, statKinds)
    EpochManifest.commitIfUnchanged(spark, root, es,
      Seq(EpochManifest.Entry(maxCov, foldDir,
        lo = es.map(_.minEpoch).min)))
    EpochManifest.gc(spark, root)
  }

  /** ROLLBACK (X90) — Delta's RESTORE / Iceberg's rollback shape: make a
    * RETAINED older generation (or tag) the CURRENT head again with ONE
    * manifest commit — no data moves, the bad commits stay
    * time-travelable until gc ages them out, and a commit racing the
    * restore refuses loudly (the restore replaces exactly the snapshot
    * it saw). Restoring beyond the retention horizon fails loudly
    * ([[EpochManifest.entriesAt]]) — tag a generation to keep it
    * restorable forever. An engine-level `_deletes` sub-store (the
    * keyed-delete tier) keeps its own lineage: tombstones committed
    * after the restored generation still apply to latest-wins reads —
    * restore rolls back DATA commits, not the delete journal. */
  def restoreSnapshot(spark: SparkSession, root: String,
                      generation: Long): Long = {
    val target = EpochManifest.entriesAt(spark, root, generation)
    val cur = EpochManifest.entries(spark, root)
    val oldMax = cur.map(_.epoch).maxOption.getOrElse(-1L)
    val tgtMax = target.map(_.epoch).maxOption.getOrElse(-1L)
    if (oldMax <= tgtMax)
      return EpochManifest.commitIfUnchanged(spark, root, cur, target)
    // EPOCH HIGH-WATER MARKER: the restored snapshot's max epoch is
    // LOWER than the rolled-back head's, and the next append allocates
    // max+1 — without a marker it would REUSE the rolled-back commits'
    // epoch numbers, silently corrupting every epoch-ordered consumer
    // (a changefeed whose base generation predates the restore would
    // drop the re-used epochs forever; a _deletes tombstone at epoch T
    // would kill fresh post-restore rows landing at reused epochs ≤ T).
    // The marker is an EMPTY entry pinned at the old max, carrying the
    // restored snapshot's schema/bucket/sort records so evolution,
    // SPJ serving, and the ordering report see a uniform entry set,
    // plus an empty stats index so planning stays zero-listing.
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // the marker's schema/bucket/sort records come from the TARGET
    // snapshot; restoring to an EMPTY generation derives them from the
    // CURRENT entries instead (same logical schema by construction —
    // evolution only ever widens from the first commit), so the marker
    // never lands record-less and catalog loads never degrade to the
    // discovery path. A store whose entries predate schema records
    // cannot restore ACROSS the high-water edge at all — a record-less
    // marker would flip evolvedSchema from working to refusing — so
    // that refuses loudly rather than committing a degraded store.
    val recSource = if (target.nonEmpty) target else cur
    val recs = recSource.map(e =>
      EpochStoreWrite.readSchemaSidecar(fs, root, e.dir))
    require(recs.forall(_.isDefined),
      s"restore_snapshot on $root to generation $generation: entries " +
        s"${recSource.zip(recs).collect { case (e, None) => e.dir }
          .mkString(", ")} predate schema records, so the epoch " +
        "high-water marker the restore must commit would leave the " +
        "store unreadable through the catalog — run CALL compact first")
    val dir = EpochManifest.newDataDir(spark, root, oldMax)
    fs.mkdirs(new Path(s"$root/$dir"))
    locally {
      val (sch, pc) = mergeRecorded(root, recs.map(_.get),
        allowMixedPartitioning =
          EpochManifest.currentLayout(spark, root).nonEmpty)
      val buckets = recSource
        .map(e => EpochStoreWrite.readBucketSidecar(fs, root, e.dir))
        .distinct
      val sorts = recSource
        .map(e => EpochStoreWrite.readSortSidecar(fs, root, e.dir))
        .distinct
      EpochStoreWrite.writeSchemaSidecar(fs, root, dir, sch,
        splitPartCols(pc),
        bucket = buckets match { case Seq(b) => b; case _ => None },
        sortCols = sorts match { case Seq(s) => s; case _ => Nil })
    }
    EpochStoreStats.write(fs, root, dir, Seq.empty)
    EpochManifest.commitIfUnchanged(spark, root, cur,
      target :+ EpochManifest.Entry(oldMax, dir))
  }

  /** SELECTIVE small-file maintenance — Iceberg's `rewrite_data_files`
    * shape on the manifest store: bin-pack runs of SMALL entries (total
    * bytes below `targetBytes`, read from the file-level index — zero
    * listing) into one fold each, leaving every big entry's dirs
    * untouched. Candidates must be ADJACENT in epoch order (a fold's
    * span may not straddle a skipped entry — latest-wins would serve
    * stale rows) and carry NO merge-on-read tombstones (a mid-table
    * fold can neither drop them — rows below would resurrect — nor
    * carry them — their effective epoch would rise and kill the fold's
    * own reinserts; `CALL compact` folds the full prefix and applies
    * them instead). Pre-index entries have unknown size and are skipped
    * honestly. Each run commits as one OCC fold; returns the number of
    * runs folded.
    *
    * This is the streaming-ingest counterpart to [[compactStore]]: a
    * tail that lands thousands of small epochs folds them continuously
    * without ever rewriting the big history folds. */
  def rewriteDataFiles(spark: SparkSession, root: String,
                       targetBytes: Long = 128L * 1024 * 1024,
                       minEntries: Int = 2): Int = {
    require(targetBytes > 0 && minEntries >= 2,
      "rewriteDataFiles: targetBytes must be positive, minEntries >= 2")
    EpochStoreDv.guardNoLiveDvs(spark, root, "rewrite_data_files")
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    // committed entry dirs are immutable — memoize the per-dir size /
    // tombstone probe so the pass costs one sidecar read per entry
    // TOTAL, not per fold round
    val sizeByDir = scala.collection.mutable.HashMap.empty[String, Long]
    def bytesOf(e: EpochManifest.Entry): Long =
      sizeByDir.getOrElseUpdate(e.dir,
        EpochStoreStats.readIndexed(fs, root, e.dir) match {
          case Some(ix) if ix.valuesIterator.forall(_.len >= 0L) =>
            ix.valuesIterator.map(_.len).sum
          case _ => -1L // pre-index: unknown size, never a candidate
        })
    val smallByDir = scala.collection.mutable.HashMap.empty[String, Boolean]
    def small(e: EpochManifest.Entry): Boolean =
      smallByDir.getOrElseUpdate(e.dir, {
        val b = bytesOf(e)
        b >= 0L && b < targetBytes &&
          EpochStoreDelta.tombstoneStatuses(fs, root, e.dir).isEmpty &&
          // X94: never bin-pack a DV entry or re-home targeted files
          EpochStoreDv.dvFiles(fs, root, e.dir).isEmpty
      })
    // all maximal adjacent runs from ONE listing; each folds under its
    // own OCC against a fresh manifest read (one tiny file) — a racing
    // commit refuses loudly in rebaseFold rather than folding stale.
    // One more round picks up runs a fold newly made adjacent; fold
    // results are excluded as candidates (their dirs are fresh, but a
    // re-fold of a just-folded run would churn), so rounds converge.
    var folded = 0
    var progressed = true
    val foldedDirs = scala.collection.mutable.HashSet.empty[String]
    while (progressed) {
      progressed = false
      val es = EpochManifest.entries(spark, root).sortBy(_.epoch)
      val runs = {
        val out = Seq.newBuilder[Seq[EpochManifest.Entry]]
        var cur: Vector[EpochManifest.Entry] = Vector.empty
        (es :+ null).foreach { e =>
          if (e != null && small(e) && !foldedDirs(e.dir)) cur :+= e
          else { if (cur.size >= minEntries) out += cur; cur = Vector.empty }
        }
        out.result()
      }
      runs.foreach { run =>
        foldCovered(spark, root, EpochManifest.entries(spark, root), run,
          Nil, math.max(1,
            (run.iterator.map(e => bytesOf(e).max(0L)).sum
              / targetBytes).toInt), Nil)
        folded += 1
        progressed = true
      }
      runs.foreach(_.foreach(e => foldedDirs += e.dir))
    }
    if (folded > 0) EpochManifest.gc(spark, root)
    folded
  }

  /** One fold of a CONTIGUOUS covered-entry range into a single entry —
    * the shared core of [[compactStore]] (full prefix) and
    * [[rewriteDataFiles]] (selective small-entry runs). `es` must be
    * the pinned snapshot the commit rebases against. */
  /** A transform's DIR-VALUE column, rendered with the writer's own
    * UTC truncation (internal micros/days via `unix_micros` — session-
    * timezone independent), so rewrite dirs spell exactly like
    * appends'. String truncate is refused here — its %XX dir escaping
    * and hive's `partitionBy` escaping disagree on exotic characters. */
  private def unitDirColumn(df: DataFrame, t: StoreTransform,
                            schema: StructType, what: String)
      : (DataFrame, String) = {
    import org.apache.spark.sql.functions.{col, concat, date_add, expr,
      format_string, lit, lpad, to_date}
    val tcol = s"${t.col}_${t.kind}"
    require(!schema.fieldNames.contains(tcol),
      s"$what: schema already has a '$tcol' column — it collides with " +
        "the transform layout's dir encoding")
    val dt = schema(t.col).dataType
    val epochDay =
      if (dt == org.apache.spark.sql.types.DateType)
        expr(s"datediff(`${t.col}`, DATE '1970-01-01')")
      else expr(s"floor(unix_micros(`${t.col}`) / 86400000000)")
    val dayDate = date_add(to_date(lit("1970-01-01")), epochDay.cast("int"))
    val v = t.kind match {
      case "day" => dayDate.cast("string")
      case "hour" =>
        val h = expr(s"pmod(floor(unix_micros(`${t.col}`) / " +
          "3600000000), 24)")
        concat(dayDate.cast("string"), lit("-"),
          lpad(h.cast("string"), 2, "0"))
      case "month" => format_string("%04d-%02d",
        org.apache.spark.sql.functions.year(dayDate),
        org.apache.spark.sql.functions.month(dayDate))
      case "year" => format_string("%04d",
        org.apache.spark.sql.functions.year(dayDate))
      case "trunc" if dt == org.apache.spark.sql.types.StringType =>
        // callers admit this ONLY for dir-safe prefixes (see
        // [[foldCovered]]'s safety probe): there hive's partitionBy
        // and the connector's %XX escaping spell identically
        org.apache.spark.sql.functions.substring(col(t.col), 1, t.width)
      case "trunc" =>
        (col(t.col).cast("long") -
          org.apache.spark.sql.functions.pmod(col(t.col).cast("long"),
            lit(t.width.toLong))).cast("string")
    }
    (df.withColumn(tcol, v), tcol)
  }

  private def foldCovered(spark: SparkSession, root: String,
                          es: Seq[EpochManifest.Entry],
                          covered: Seq[EpochManifest.Entry],
                          sortColumns: Seq[String],
                          parts: Int,
                          zorderColumns: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val fs = new Path(root).getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val recs = covered.map(e =>
      e -> EpochStoreWrite.readSchemaSidecar(fs, root, e.dir))
    val missing = recs.collect { case (e, None) => e.dir }
    require(missing.isEmpty,
      s"compactStore on $root: entries without a _schema.json record: " +
        s"${missing.mkString(", ")} — use EpochManifest.compact with an " +
        "explicit schema for pre-evolution stores")
    // hash-bucket layouts fold PER BUCKET: the fold keeps the
    // `<col>_bucket=K` dirs (probe pruning, SPJ, streaming-tail
    // narrowing all survive), re-hashing any unbucketed DML-rewrite
    // entry's rows back into their buckets with the layout's own hash
    // PARTITION-SPEC evolution (X92): a layout log makes the fold a
    // LAYOUT NORMALIZER — covered entries may record different specs
    // (each is read under its own: partition discovery serves its dir
    // columns into the frame) and the fold lands under the CURRENT
    // logged layout, exactly like migrate_layout but tombstone-aware
    // and incremental. Without a log, covered specs must agree.
    val layoutLog = EpochManifest.currentLayout(spark, root)
    val bucketLayout = layoutLog match {
      case Some(l) => l.bucketCol.map(c => StoreBucket(c, l.bucketCount))
      case None =>
        val bucketLayouts = covered
          .flatMap(e => EpochStoreWrite.readBucketSidecar(fs, root, e.dir))
          .distinct
        require(bucketLayouts.size <= 1,
          s"compactStore on $root: covered epochs record different bucket " +
            s"layouts: ${bucketLayouts.mkString(", ")}")
        bucketLayouts.headOption
    }
    require(bucketLayout.isEmpty || zorderColumns.isEmpty,
      s"compactStore on $root: z-order re-clustering would scatter rows " +
        "across bucket dirs — a bucket layout folds per bucket (within-" +
        "bucket sortColumns are fine)")
    val partCol = layoutLog match {
      case Some(l) => Some(l.partCols.mkString(",")).filter(_.nonEmpty)
      case None =>
        val parts0 = recs.map(_._2.get._2).distinct
        require(parts0.size == 1,
          s"partitionColumn changed across epochs of $root: $parts0")
        parts0.head
    }
    // TIME-UNIT/TRUNCATE transforms (X93): a uniformly-recorded
    // transform is PRESERVED by the fold — the unit dirs are the
    // layout's pruning payoff. String-truncate folds transform-less
    // (its %XX dir escaping and hive's disagree on exotic chars —
    // exact, just unpruned); mixed histories normalize transform-less
    // too.
    val transformLayout: Option[StoreTransform] =
      if (layoutLog.nonEmpty) None
      else covered.map(e =>
        EpochStoreWrite.readTransformSidecar(fs, root, e.dir)).distinct match {
        case Seq(Some(t)) => Some(t)
        case _ => None
      }
    val mergedPhys = recs.map(_._2.get._1).reduceLeft { (a, b) =>
      val known = a.fields.map(f => f.name -> f).toMap
      b.fields.foreach(f => known.get(f.name).foreach(g =>
        require(g.dataType == f.dataType,
          s"column ${f.name} changed type across epochs of $root")))
      StructType(a.fields ++
        b.fields.filterNot(f => known.contains(f.name))
          .map(_.copy(nullable = true)))
    }
    // RENAME/DROP evolution: the fold lands under the CURRENT (logical)
    // names — each covered entry projects its physical spellings to
    // logical below, dropped columns' data folds away, and the fold's
    // record needs no aliasing ever after (compaction is how a renamed
    // store sheds its old spellings)
    val colOps = EpochManifest.columnOps(spark, root)
    val colAliases = columnAliases(spark, root)
    val merged =
      if (colOps.isEmpty) mergedPhys
      else applyColumnOps(root, mergedPhys, colOps)
    def logicalOf(phys: String): Option[String] =
      logicalNameOf(colAliases, merged, phys)
    // merge-on-read tombstones ([[EpochStoreDelta]]) fold PHYSICALLY:
    // covered rows whose key a strictly-later covered epoch tombstoned
    // are dropped here (an equality tombstone only ever reaches lower
    // epochs, and the fold covers a prefix — so applying the covered
    // tombstones inside the fold is complete and they are NOT carried);
    // tombstone entries above uptoEpoch still apply to the fold at read
    // time (its epoch is below theirs)
    val deltaEntries = covered.filter(e =>
      EpochStoreDelta.tombstoneFiles(fs, root, e.dir).nonEmpty)
    // X94: live position deletes apply INSIDE the fold (distributed
    // anti-join on file rel + row index) and are shed — their carrying
    // entries fold away as empty-data epochs
    val dvPaths: Seq[String] = EpochStoreDv.dvPathsFor(spark, root, covered)
    val folded0 = {
      val raw = recs.map { case (e, Some((s, _))) =>
        val r00 = spark.read.schema(s).parquet(s"$root/${e.dir}")
        val r0 =
          if (dvPaths.isEmpty) r00
          else EpochStoreDv.applyToFold(spark, root, e.dir, r00, dvPaths)
        // project this entry's physical spellings to the logical names
        // (identity for never-renamed stores); retired-only columns
        // fold away here
        val r1 =
          if (colAliases.isEmpty) r0
          else {
            val efs = s.fieldNames.toSet
            r0.select(merged.fieldNames.toSeq.flatMap { l =>
              val phys = colAliases.resolve(l, efs)
              if (efs.contains(phys)) Some(col(phys).as(l)) else None
            }: _*)
          }
        // a column this entry PREDATES that was added with a DEFAULT
        // serves its EXISTENCE default at read time — the fold must
        // materialize that value, not the null unionByName would fill
        // (compaction may never change what a query returns)
        val have = r1.columns.toSet
        val r = merged.fields.toSeq
          .filter(f => !have(f.name) && f.metadata.contains("EXISTS_DEFAULT"))
          .foldLeft(r1)((d, f) => d.withColumn(f.name,
            org.apache.spark.sql.functions
              .expr(f.metadata.getString("EXISTS_DEFAULT"))
              .cast(f.dataType)))
        if (deltaEntries.isEmpty) r
        else r.withColumn("__graft_e", lit(e.epoch))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      if (deltaEntries.isEmpty) raw.select(merged.fieldNames.map(col): _*)
      else {
        val keys = EpochStoreDelta.declared(spark, root).getOrElse(
          throw new IllegalStateException(
            s"compactStore on $root: covered entries carry _delta " +
              "tombstones but the store declares no rowid"))
        // keySchema in DECLARED key order — the tombstone tuples, the
        // frame schema, and the join condition must all agree on it
        val keySchema = StructType(keys.map(k =>
          merged.fields.find(_.name == k).getOrElse(
            throw new IllegalStateException(
              s"compactStore on $root: rowid column $k missing from the " +
                "merged schema"))))
        // DISTRIBUTED tombstone application: the journal reads as a
        // frame and anti-joins — nothing materializes on the driver, so
        // a GDPR-scale delete folds like any other data (this is the
        // remedy the read path's size-bound refusal names). Spark picks
        // broadcast vs shuffle from the journal's actual size.
        val tombDf = EpochStoreDelta.tombstoneFrame(spark, root,
          deltaEntries, keySchema)
        val cond = keys.map(k => raw(k) <=> tombDf(k))
          .reduce(_ && _) && raw("__graft_e") < tombDf("__graft_del")
        raw.join(tombDf, cond, "left_anti")
          .select(merged.fieldNames.map(col): _*)
      }
    }
    // z-order re-clustering (X59's layout as a MAINTENANCE move): the
    // fold is range-distributed along the Morton curve of the two
    // columns and stats are re-derived on BOTH, so a 2-D range probe
    // prunes fold files no linear sort order could serve
    val folded =
      if (zorderColumns.nonEmpty) {
        require(!folded0.columns.contains("__z"),
          "compactStore: input already has a '__z' column — rename it first")
        folded0
          .withColumn("__z", graft.core.Layout.zvalue(
            col(zorderColumns.head), col(zorderColumns(1)), 16))
          .repartitionByRange(parts, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      }
      else if (sortColumns.isEmpty) folded0.coalesce(parts)
      else {
        // partitioned folds lead the sort with the partition columns:
        // the dynamic-partition writer REQUIRES its ordering to start
        // there — an unsatisfied requirement makes Spark re-sort by the
        // partition columns alone, voiding the within-file sortColumns
        // order the sidecar records (a FALSE order report elides
        // load-bearing SMJ sorts)
        val lead = splitPartCols(partCol)
        folded0.repartitionByRange(parts, sortColumns.map(col): _*)
          .sortWithinPartitions((lead ++ sortColumns).map(col): _*)
      }
    val maxCov = covered.map(_.epoch).max
    val foldDir = EpochManifest.newFoldDir(spark, root, maxCov)
    val pcs = splitPartCols(partCol)
    def withUnitCol(df: DataFrame, t: StoreTransform)
        : (DataFrame, String) = unitDirColumn(df, t, merged, "compactStore")
    // STRING truncate: the fold keeps the unit level exactly when every
    // covered unit value is DIR-SAFE ([A-Za-z0-9._-], or the null dir)
    // — on that alphabet hive's partitionBy and the connector's %XX
    // escaping spell identically (and input_file_name's URL encoding is
    // the identity), so the fold's dirs, sidecar rel keys, and overwrite
    // prefix comparisons all stay canonical. Exotic prefixes (the
    // documented %XX/hive disagreement) and empty-string values (hive
    // conflates them with null) degrade transform-less — exact, just
    // unpruned.
    val foldTransform = transformLayout.filter { t =>
      t.kind != "trunc" ||
        merged(t.col).dataType != org.apache.spark.sql.types.StringType || {
          val safe = "[A-Za-z0-9._\\-]+".r
          def unitDirsSafe(p: Path): Boolean =
            !fs.exists(p) || fs.listStatus(p).forall { st =>
              if (!st.isDirectory) true
              else if (st.getPath.getName.startsWith(t.dirPrefix)) {
                val raw = st.getPath.getName.stripPrefix(t.dirPrefix)
                raw == "__HIVE_DEFAULT_PARTITION__" ||
                  safe.matches(raw)
              } else unitDirsSafe(st.getPath) // identity levels above
            }
          covered.forall(e => unitDirsSafe(new Path(s"$root/${e.dir}")))
        }
    }
    bucketLayout match {
      case Some(b) =>
        // per-bucket fold: recompute each row's bucket with the
        // layout's own hash (`pmod(hash(col), n)` — the exact writer
        // function, [[bucketIdOf]]; unbucketed DML-rewrite rows re-home
        // deterministically), range-partition 1:1 on it, and land the
        // standard `<col>_bucket=K` dirs via partitionBy. One shuffle
        // whose width is the bucket count — never a cross-bucket sort.
        val bcol = s"${b.col}_bucket"
        require(!merged.fieldNames.contains(bcol),
          s"compactStore: schema already has a '$bcol' column — it " +
            "collides with the bucket layout's dir encoding")
        val (withT, tcols) = foldTransform match {
          case Some(t) =>
            val (d, c) = withUnitCol(folded0, t); (d, Seq(c))
          case None => (folded0, Nil)
        }
        val perBucket = withT
          .withColumn(bcol, org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.hash(col(b.col)), lit(b.n)))
          .repartitionByRange(b.n, col(bcol))
        // dir levels: identity partCols (composite layouts), the
        // time-unit level, bucket innermost. The sort leads with those
        // levels: the dynamic-partition writer requires its ordering to
        // start there — satisfying it up front keeps the within-bucket
        // sortColumns order through the write
        val levels = (pcs ++ tcols) :+ bcol
        (if (sortColumns.isEmpty) perBucket
         else perBucket.sortWithinPartitions(
           (levels ++ sortColumns).map(col): _*))
          .write.mode("overwrite").partitionBy(levels: _*)
          .parquet(s"$root/$foldDir")
        EpochStoreWrite.writeSchemaSidecar(fs, root, foldDir, merged, pcs,
          bucketLayout, sortCols = sortColumns,
          transform = foldTransform)
      case None =>
        val (withT, tcols) = foldTransform match {
          case Some(t) =>
            val (d, c) = withUnitCol(folded, t); (d, Seq(c))
          case None => (folded, Nil)
        }
        val w = withT.write.mode("overwrite")
        val levels = pcs ++ tcols
        (if (levels.isEmpty) w else w.partitionBy(levels: _*))
          .parquet(s"$root/$foldDir")
        // a sorted fold's files are each internally ordered (the range
        // repartition + sortWithinPartitions above) — record the layout
        // so the scan can report it; z-order is NOT a linear order
        EpochStoreWrite.writeSchemaSidecar(fs, root, foldDir, merged, pcs,
          sortCols = sortColumns, transform = foldTransform)
    }
    // re-derive the numeric stats any covered epoch declared — plus the
    // z-order dimensions (their per-file rectangles ARE the layout's
    // pruning payoff, whether or not history declared them)
    val zKinds: Seq[(String, Char)] = zorderColumns.map { c =>
      val f = merged.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"compactStore: zorderColumns column $c is not in the schema"))
      c -> statKindOf(f.dataType).filter(_ != 'S').getOrElse(
        throw new IllegalArgumentException(
          s"compactStore: zorderColumns column $c has type ${f.dataType} " +
            "— z-order needs a numeric dimension"))
    }
    // a SORTED fold always records bounds on its sort columns (where
    // the type supports them): range skipping AND the scan's sort-order
    // report ([[EpochStoreScan.outputOrdering]]) both plan from them —
    // they ARE the layout's payoff, whether or not history declared them
    val sortKinds: Seq[(String, Char)] = sortColumns.flatMap(c =>
      merged.fields.find(_.name == c).map(_.dataType)
        .flatMap(statKindOf).map(c -> _))
    val statKinds: Seq[(String, Char)] = (covered
      .flatMap(e => EpochStoreStats.read(fs, root, e.dir).valuesIterator
        .flatMap(_.cols.toSeq))
      // legacy 's' (pre-r13 UTF-16-ordered string bounds) re-derives as
      // 'S' — Spark's min/max compares UTF8String bytes, so the fold's
      // recorded bounds are exact under the new order
      .map { case (c, cs) => (c, if (cs.kind == 's') 'S' else cs.kind) }
      // a stat column recorded under a pre-rename spelling re-derives
      // on the LOGICAL column it now serves
      .flatMap { case (c, k) => logicalOf(c).map(_ -> k) }
      ++ zKinds ++ sortKinds).distinct
      .filter { case (c, _) => merged.fieldNames.contains(c) }
    rederiveStats(spark, fs, root, foldDir, merged, statKinds)
    // OCC fold commit: appends above the fold span rebase in, touched
    // covered entries / in-span appends refuse ([[EpochManifest.rebaseFold]])
    EpochManifest.commitWith(spark, root)(EpochManifest.rebaseFold(
      es, covered,
      EpochManifest.Entry(maxCov, foldDir, lo = covered.map(_.minEpoch).min)))
    EpochManifest.gc(spark, root)
  }

  /** RE-DERIVE an entry dir's per-file stats sidecar from its data: row
    * counts always (LIMIT truncation + metadata rows), min / max / null
    * counts for `statKinds` — one read-back pass grouped by file.
    * Shared by [[compactStore]] folds and the DML rewrites
    * ([[EpochStoreDml.resolveDelete]]), so file skipping survives every
    * data-rewriting maintenance move. */
  private[sources] def rederiveStats(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: String, dir: String,
      schema: StructType, statKinds: Seq[(String, Char)]): Unit = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit,
      max, min, sum, when}
    val statsCols = statKinds.map(_._1)
    val back = spark.read.schema(schema).parquet(s"$root/$dir")
      .withColumn("__f", input_file_name())
    val kindOf = statKinds.toMap
    val aggs = count(lit(1)).as("__rows") +: statsCols.flatMap(c => Seq(
      min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      // NDV registers re-derived with the writer's exact hash, so the
      // rewritten entry's sketches keep merging with original ones
      org.apache.spark.sql.GraftBridge.column(
        NdvRegistersAgg(org.apache.spark.sql.GraftBridge.expression(col(c)),
          kindOf(c)).toAggregateExpression()).as(s"__ndv_$c")))
    val perFile = back.groupBy(col("__f")).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.map { r =>
        // input_file_name's URI spelling (file:///… vs file:/…) varies —
        // strip the scheme/authority, then the ANCHORED absolute dir
        // prefix (a first-occurrence dir-name match would split at the
        // wrong point when the store root itself contains a same-named
        // segment)
        val uri = r.getString(0)
          .replaceFirst("^[A-Za-z][A-Za-z0-9+.\\-]*:(//[^/]*)?", "")
        val dirPath = fs.makeQualified(
          new org.apache.hadoop.fs.Path(s"$root/$dir")).toUri.getPath
        require(uri.startsWith(dirPath + "/"),
          s"rewritten file outside $dir: $uri")
        val rel = uri.substring(dirPath.length + 1)
        val cols = statKinds.map { case (c, kind) =>
          // Spark's min/max on StringType compares UTF8String bytes —
          // the same UTF-8 binary order the skip probe uses, so the
          // re-derived string bounds are exact
          def num(v: Any): Any = (kind, v) match {
            case (_, null) => null
            case ('S', s: String) => s
            case ('d', n: Number) => n.doubleValue()
            case (_, n: Number) => n.longValue()
            case _ => null
          }
          c -> EpochStoreStats.ColStats(kind, r.getAs[Long](s"__nulls_$c"),
            Option(num(r.getAs[Any](s"__min_$c"))),
            Option(num(r.getAs[Any](s"__max_$c"))),
            Option(r.getAs[Array[Byte]](s"__ndv_$c")))
        }.toMap
        rel -> EpochStoreStats.FileStats(r.getAs[Long]("__rows"), cols)
      }
    // ONE listing at commit completes the file-level index: lengths +
    // mtimes for the rows above, plus any row-LESS parquet files the
    // groupBy never saw (the index must name every data file — scan
    // planning reads it instead of listing)
    val byRel = perFile.toMap
    val entryPath = new org.apache.hadoop.fs.Path(s"$root/$dir")
    def walk(p: org.apache.hadoop.fs.Path)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s))
    val qdir = fs.makeQualified(entryPath).toString
    val indexed = walk(entryPath).map { st =>
      val rel = fs.makeQualified(st.getPath).toString
        .stripPrefix(qdir).stripPrefix("/")
      rel -> byRel.getOrElse(rel,
          EpochStoreStats.FileStats(0L, Map.empty))
        .copy(len = st.getLen, mtime = st.getModificationTime)
    }
    EpochStoreStats.write(fs, root, dir, indexed)
  }

  /** Z-ORDERED epoch write: cluster `df` along the Morton curve of
    * (`xCol`, `yCol`) ([[graft.core.Layout.zvalue]] — one codegen'd
    * expression), range-distribute into `parts` contiguous curve
    * segments, sort within each, and land through the sink with
    * min/max stats on BOTH dimensions — each file's recorded
    * [min, max] × [min, max] is then a tight curve-segment rectangle,
    * so a 2-D range predicate skips every file whose rectangle misses
    * it ([[EpochStoreScan]]'s stats skip; no single-column sort can
    * serve both dimensions at once). The curve helper column never
    * lands; the clustering survives purely as row order + sidecar
    * stats. */
  def writeZOrdered(df: DataFrame, root: String, epoch: Long,
                    xCol: String, yCol: String, bits: Int = 16,
                    parts: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    require(!df.columns.contains("__z"),
      "writeZOrdered: input already has a '__z' column — rename it first")
    val clustered = df
      .withColumn("__z", graft.core.Layout.zvalue(col(xCol), col(yCol), bits))
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    write(clustered, root, epoch, statsColumns = Seq(xCol, yCol))
  }

  /** Parse one `col=value` dir-name value to the column's external type.
    * Stores partition by small integer hash buckets / cells or short
    * string labels; the hive null sentinel maps to null. */
  private[sources] def parsePartitionValue(raw: String, dt: DataType): Any = {
    if (raw == "__HIVE_DEFAULT_PARTITION__") return null
    dt match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case ShortType => raw.toShort
      case StringType => unescape(raw)
      case other => throw new IllegalArgumentException(
        s"unsupported partition column type $other for epochstore")
    }
  }

  private[sources] def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  /** Spark escapes special chars in partition dir names as %XX; a `%`
    * not followed by two hex digits is literal. */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val escaped = c == '%' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 &&
        Character.digit(s.charAt(i + 2), 16) >= 0
      if (escaped) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Can the dir-pruning answer `f` EXACTLY (so it needn't be
    * re-evaluated)? True only when every leaf references some column of
    * `cols` (any subset, any mix — the composite-key layout answers all
    * of them from dir names) with a supported comparison. */
  private[sources] def exactPartitionFilter(f: Filter,
                                            cols: Set[String]): Boolean =
    f match {
      case sources.EqualTo(a, _) => cols(a)
      case sources.EqualNullSafe(a, _) => cols(a)
      case sources.In(a, _) => cols(a)
      case sources.GreaterThan(a, _) => cols(a)
      case sources.GreaterThanOrEqual(a, _) => cols(a)
      case sources.LessThan(a, _) => cols(a)
      case sources.LessThanOrEqual(a, _) => cols(a)
      case sources.IsNull(a) => cols(a)
      case sources.IsNotNull(a) => cols(a)
      case sources.And(l, r) =>
        exactPartitionFilter(l, cols) && exactPartitionFilter(r, cols)
      case sources.Or(l, r) =>
        exactPartitionFilter(l, cols) && exactPartitionFilter(r, cols)
      case sources.Not(c) => exactPartitionFilter(c, cols)
      case _ => false
    }

  /** SQL three-valued evaluation of `f` against one partition value.
    * Outer None = not decidable from the partition column alone (keep
    * the dir). Some(inner) = the predicate evaluates to the SAME SQL
    * value for every row of the dir: Some(Some(b)) a definite boolean,
    * Some(None) SQL NULL — a null partition value under a non-null-safe
    * comparison (`col = v`, ranges, IN) is NULL, which the top level
    * treats as prune (a WHERE drops NULL rows) but which composes as
    * NULL through And/Or/Not first, so `NOT (col = v)` over a
    * `__HIVE_DEFAULT_PARTITION__` dir stays NULL (pruned) instead of
    * flipping to "keep everything". This is what makes
    * [[exactPartitionFilter]]'s fully-handled claim self-sufficiently
    * exact even with `spark.sql.constraintPropagation.enabled=false`
    * (no inferred IsNotNull companion to mask a kept null dir). */
  private[sources] def eval3OnPartitions(f: Filter,
                                         bound: Map[String, Any])
      : Option[Option[Boolean]] = {
    def cmp(v: Any, x: Any): Option[Int] = (v, x) match {
      case (a: Number, b: Number) =>
        Some(new java.math.BigDecimal(a.toString)
          .compareTo(new java.math.BigDecimal(b.toString)))
      case (a: String, b: String) => Some(EpochStoreStats.utf8Cmp(a, b))
      case _ => None
    }
    // non-null-safe comparison on a BOUND column: either side null =>
    // SQL NULL; otherwise the definite comparison (None from cmp = type
    // confusion = keep). An UNBOUND column (a deeper nesting level not
    // yet descended into) is undecidable — outer None.
    def threeVal(a: String, x: Any)(p: Any => Option[Boolean])
        : Option[Option[Boolean]] =
      bound.get(a) match {
        case None => None
        case Some(v) =>
          if (v == null || x == null) Some(None) else p(v).map(Some(_))
      }
    f match {
      case sources.EqualTo(a, x) =>
        threeVal(a, x)(v => cmp(v, x).map(_ == 0))
      case sources.EqualNullSafe(a, x) =>
        // null-safe: a definite boolean even when either side is null —
        // the form static partition overwrite pushes
        bound.get(a) match {
          case None => None
          case Some(v) =>
            if (x == null || v == null) Some(Some(x == null && v == null))
            else cmp(v, x).map(c => Some(c == 0))
        }
      case sources.In(a, xs) =>
        bound.get(a) match {
          case None => None
          case Some(null) => Some(None)
          case Some(v) =>
            val hits = xs.toSeq.filter(_ != null).map(cmp(v, _))
            if (hits.exists(_.contains(0))) Some(Some(true))
            else if (hits.forall(_.isDefined))
              // no match: IN (…, null) is NULL, a null-free list is false
              Some(if (xs.contains(null)) None else Some(false))
            else None
        }
      case sources.GreaterThan(a, x) =>
        threeVal(a, x)(v => cmp(v, x).map(_ > 0))
      case sources.GreaterThanOrEqual(a, x) =>
        threeVal(a, x)(v => cmp(v, x).map(_ >= 0))
      case sources.LessThan(a, x) =>
        threeVal(a, x)(v => cmp(v, x).map(_ < 0))
      case sources.LessThanOrEqual(a, x) =>
        threeVal(a, x)(v => cmp(v, x).map(_ <= 0))
      case sources.IsNull(a) => bound.get(a).map(v => Some(v == null))
      case sources.IsNotNull(a) => bound.get(a).map(v => Some(v != null))
      case sources.And(l, r) =>
        // Kleene AND: false dominates even an undecidable side
        (eval3OnPartitions(l, bound), eval3OnPartitions(r, bound)) match {
          case (Some(Some(false)), _) | (_, Some(Some(false))) =>
            Some(Some(false))
          case (Some(a), Some(b)) =>
            Some(if (a.contains(true) && b.contains(true)) Some(true)
            else None) // true AND null / null AND null => NULL
          case _ => None
        }
      case sources.Or(l, r) =>
        (eval3OnPartitions(l, bound), eval3OnPartitions(r, bound)) match {
          case (Some(Some(true)), _) | (_, Some(Some(true))) =>
            Some(Some(true))
          case (Some(a), Some(b)) =>
            Some(if (a.contains(false) && b.contains(false)) Some(false)
            else None) // false OR null / null OR null => NULL
          case _ => None
        }
      case sources.Not(c) =>
        eval3OnPartitions(c, bound).map(_.map(!_)) // NOT NULL stays NULL
      case _ => None
    }
  }

  /** Pruning view of [[eval3OnPartitions]]: Some(definite keep/prune)
    * when decidable from the columns bound so far, None (keep / descend)
    * otherwise. A predicate that is SQL NULL for the whole dir prunes it
    * — but only AFTER full Kleene composition above, so NOT over a null
    * partition value stays NULL. Partial binding makes PREFIX pruning
    * free: at nesting level i only columns 0..i are bound, a filter on
    * a deeper column is undecidable there and the walk descends. */
  private[sources] def evalOnPartitions(f: Filter,
                                        bound: Map[String, Any])
      : Option[Boolean] =
    eval3OnPartitions(f, bound).map(_.getOrElse(false))

  /** Single-column view (the one-level layouts and the DML entry
    * classifier). */
  private[sources] def evalOnPartition(f: Filter, col: String,
                                       v: Any): Option[Boolean] =
    evalOnPartitions(f, Map(col -> v))
}
