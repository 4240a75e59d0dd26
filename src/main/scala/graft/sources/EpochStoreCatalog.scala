package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{
  Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog,
  TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.EpochManifest

/** Catalog-plugin surface over a warehouse of EpochManifest stores — the
  * third Spark integration tier after the DSv2 read/write connector:
  *
  *   spark.sql.catalog.graft           = graft.sources.EpochStoreCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  * makes every store directory under the warehouse a SQL-addressable
  * table — `SELECT ... FROM graft.mystore WHERE bucket = 3` resolves
  * through [[EpochStoreTable]], so manifest pinning, bucket-dir pruning,
  * filter/column pushdown, and the write-side epoch protocol all apply
  * to plain SQL. Snapshot time travel is SQL-native via
  * `FOR VERSION AS OF <generation>` (`loadTable(ident, version)` maps
  * the version string to a retained manifest generation).
  *
  * Table layout = directory layout: `warehouse/<ns...>/<name>` is a
  * table iff it holds a committed `_manifests` dir; the schema and the
  * partition-dir column are DISCOVERED from a committed entry dir (the
  * parquet footers + the `col=value` layout), so ad-hoc SQL needs no
  * declared schema. Engine serving paths keep passing explicit schemas
  * through [[EpochStore.read]] — discovery is the exploration surface,
  * with its normal inference caveats (an integer-valued partition dir
  * infers INT regardless of the writer's wider type).
  *
  * DDL posture: `CREATE TABLE` publishes an empty epoch-0 store whose
  * `_schema.json` carries the declared schema; `CREATE TABLE … AS
  * SELECT` / `REPLACE TABLE … AS SELECT` stage through
  * [[StagedEpochStoreTable]] (the first manifest publish IS the commit,
  * so a failing SELECT leaves nothing); the sink write path
  * (`df.write.format("epochstore")...`) remains the engine-side
  * creation route. `dropTable` deletes the store dir; rename is refused
  * (a manifest store's identity is its path); alter supports nullable
  * ADD COLUMNS. */
class EpochStoreCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  /** The V2 FUNCTION face — what lets Spark resolve a bucketed table's
    * `bucket(n, col)` KeyGroupedPartitioning to a catalyst transform:
    * storage-partitioned joins of two same-bucketed stores need the
    * catalog to expose the bucket function (the Iceberg SPJ pattern).
    * `produceResult` computes the SAME pmod(murmur3) the writer laid
    * dirs out with, so Spark-side evaluations agree with storage. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") EpochStoreBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      Array(Identifier.of(namespace, "bucket"))
    else Array.empty

  /** SQL `CALL <cat>.system.<proc>(…)` — the maintenance tier
    * ([[EpochStoreProcedures]]): snapshots / compact / gc /
    * purge_deletes drive the same engine entry points the Scala APIs
    * expose, each returning a small observable result row. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    EpochStoreProcedures.load(warehouse, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      EpochStoreProcedures.names
        .map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"epochstore catalog '$name' requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catName

  /** DEFAULT values on columns (X86): `CREATE TABLE (… c INT DEFAULT 7)`
    * and `ALTER TABLE ADD COLUMNS (c INT DEFAULT 7)` — the default
    * rides as the standard CURRENT_DEFAULT / EXISTS_DEFAULT field
    * metadata inside the recorded `_schema.json`, so INSERTs fill it
    * (Spark's own default resolution reads the table schema) and files
    * written BEFORE the column existed serve the EXISTENCE default
    * instead of null (Spark's parquet readers fill missing requested
    * columns from that metadata — zero rewrite, vectorized). */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def spark = SparkSession.active

  private def fs = new Path(warehouse).getFileSystem(
    GraftBridge.sessionHadoopConf(spark))

  private def rootOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  private def isStore(root: String): Boolean =
    EpochManifest.generations(spark, root).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsPath = new Path((warehouse +: namespace.toSeq).mkString("/"))
    // a warehouse that has not seen its first store yet is a valid,
    // EMPTY root namespace — only a named sub-namespace can be missing
    if (!fs.exists(nsPath)) {
      if (namespace.isEmpty) return Array.empty
      throw new NoSuchNamespaceException(namespace)
    }
    fs.listStatus(nsPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      // internal sub-stores (a store's `_deletes` tombstones) are part
      // of their parent's read path, not tables of their own
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .filter(n => isStore(s"$nsPath/$n"))
      .map(n => Identifier.of(namespace, n))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean = isStore(rootOf(ident))

  override def loadTable(ident: Identifier): Table =
    metaTableOf(ident, b => tableAt(b, -1L))
      .getOrElse(tableAt(ident, -1L))

  /** Resolve a metadata-table identifier against `loadBase` (the plain,
    * version-, or timestamp-pinned base loader); None when `ident` is
    * not a metadata spelling. */
  private def metaTableOf(ident: Identifier,
                          loadBase: Identifier => Table): Option[Table] =
    metaKindOf(ident).map { case (baseIdent, kind) =>
      val base = loadBase(baseIdent) match {
        case t: EpochStoreTable => t
        case other => throw new IllegalStateException(
          s"metadata table over non-store table ${other.name()}")
      }
      EpochStoreMetadata.table(spark, rootOf(baseIdent), kind,
        base.schema(), base.storeOptions)
    }

  /** Metadata-table resolution ([[EpochStoreMetadata]]): either the
    * Hive-style suffix `` `store$files` `` or the Iceberg-style nested
    * `cat.store.files` (recognized only when `store` IS a store and no
    * real store shadows the nested name — a table literally named
    * `files` always wins). */
  private def metaKindOf(ident: Identifier)
      : Option[(Identifier, String)] = {
    val n = ident.name()
    val dollar = n.lastIndexOf('$')
    // a real store whose directory is literally named `docs$files`
    // always wins over the metadata spelling — same rule as the nested
    // form below (the metadata table stays reachable by first renaming
    // the clashing store away)
    if (dollar > 0 && !isStore(rootOf(ident))) {
      val (b, k) = (n.substring(0, dollar), n.substring(dollar + 1))
      val baseIdent = Identifier.of(ident.namespace(), b)
      if (EpochStoreMetadata.Kinds(k.toLowerCase) && isStore(rootOf(baseIdent)))
        return Some((baseIdent, k.toLowerCase))
    }
    if (ident.namespace().nonEmpty && EpochStoreMetadata.Kinds(n.toLowerCase)
      && !isStore(rootOf(ident))) {
      val baseIdent = Identifier.of(ident.namespace().dropRight(1),
        ident.namespace().last)
      if (isStore(rootOf(baseIdent)))
        return Some((baseIdent, n.toLowerCase))
    }
    None
  }

  /** SQL `FOR VERSION AS OF v` — a retained manifest generation number,
    * or a named tag ([[EpochManifest.tag]] — a gc retention anchor, so
    * `VERSION AS OF 'v1'` stays answerable through any number of later
    * commits and compactions until untagged). */
  override def loadTable(ident: Identifier, version: String): Table = {
    // metadata tables compose with time travel: `files`/`partitions`
    // describe the pinned snapshot (history/refs are timeless)
    metaTableOf(ident, b => loadTable(b, version)).foreach(t => return t)
    version.toLongOption match {
      case Some(g) => tableAt(ident, g)
      case None =>
        val root = rootOf(ident)
        EpochManifest.tags(spark, root).get(version) match {
          case Some(g) => tableAt(ident, g)
          case None if EpochManifest.branches(spark, root)
            .contains(version) =>
            // write-audit-publish audit read: the branch head's snapshot
            tableAt(ident, -1L, branch = Some(version))
          case None => throw new IllegalArgumentException(
            s"epochstore VERSION AS OF takes a manifest generation " +
              s"number, a tag, or a branch name, got '$version' — " +
              "retained generations: " +
              EpochManifest.generations(spark, root)
                .mkString("[", ", ", "]") +
              s", tags: ${EpochManifest.tags(spark, root).keys.toSeq.sorted}" +
              s", branches: ${EpochManifest.branches(spark, root)}")
        }
    }
  }

  /** SQL `FOR TIMESTAMP AS OF ts` — Spark hands micros since the epoch;
    * resolves to the newest retained generation whose manifest landed
    * at or before it ([[EpochManifest.generationAsOf]]), refusing
    * beyond the retention horizon rather than answering from a newer
    * snapshot. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    metaTableOf(ident, b => loadTable(b, timestamp)).foreach(t => return t)
    val root = rootOf(ident)
    if (!isStore(root)) throw new NoSuchTableException(ident)
    tableAt(ident, EpochManifest.generationAsOf(spark, root,
      Math.floorDiv(timestamp, 1000L)))
  }

  /** A declared row identity ([[EpochStoreDelta]]) is a non-null,
    * unique-key contract — serve its columns non-nullable so Spark's
    * row-level rewrites accept them as row IDs. */
  private def withRowIdNullability(root: String,
                                   schema: StructType): StructType =
    EpochStoreDelta.declared(spark, root) match {
      case Some(keys) => StructType(schema.map(f =>
        if (keys.contains(f.name)) f.copy(nullable = false) else f))
      case None => schema
    }

  private def tableAt(ident: Identifier, asOfGeneration: Long,
                      branch: Option[String] = None): Table = {
    val root = rootOf(ident)
    val gens = EpochManifest.generations(spark, root)
    if (gens.isEmpty) throw new NoSuchTableException(ident)
    val entries = branch match {
      case Some(b) => EpochManifest.branchEntries(spark, root, b)
      case None =>
        if (asOfGeneration < 0L) EpochManifest.entries(spark, root)
        else EpochManifest.entriesAt(spark, root, asOfGeneration)
    }
    // EVOLVED schema first: when every pinned entry carries a
    // _schema.json record, the table serves the merged (add-column
    // aware) schema — epochs written before a column existed serve it
    // as null, and ALTER TABLE ADD COLUMNS is visible immediately.
    // Only MISSING records fall back to footer discovery below; a
    // recorded type conflict or partition-column change refuses loudly
    // (a silent footer fallback would serve one epoch's arbitrary shape)
    val recs = entries.map(e =>
      EpochStoreWrite.readSchemaSidecar(fs, root, e.dir))
    // a LAYOUT LOG (partition-spec evolution, X92) owns the table-level
    // partitioning: new writes land under it, the scan prunes each
    // entry under its own recorded spec
    val layoutLog = EpochManifest.currentLayout(spark, root)
    if (entries.nonEmpty && recs.forall(_.isDefined)) {
      val (schemaPhys, partCol0) =
        EpochStore.mergeRecorded(root, recs.map(_.get),
          allowMixedPartitioning = layoutLog.nonEmpty)
      val partCol = layoutLog match {
        case Some(l) => Some(l.partCols.mkString(",")).filter(_.nonEmpty)
        case None => partCol0
      }
      // RENAME/DROP ops apply to EVERY snapshot (time travel included) —
      // the table-level schema is current, the data is time-traveled,
      // the Iceberg semantics
      val colOps = EpochManifest.columnOps(spark, root)
      val schema =
        if (colOps.isEmpty) schemaPhys
        else EpochStore.applyColumnOps(root, schemaPhys, colOps)
      // the hash-bucket layout is served only when EVERY pinned entry
      // records the same spec (a DML-rewritten or pre-bucket entry
      // degrades the table to an unbucketed scan — correct, unpruned) —
      // unless the layout log declares one (the scan handles foreign
      // entries itself)
      val buckets = entries
        .map(e => EpochStoreWrite.readBucketSidecar(fs, root, e.dir))
        .distinct
      val bucket = layoutLog match {
        case Some(l) => l.bucketCol.map(c =>
          EpochStore.StoreBucket(c, l.bucketCount))
        case None => buckets match {
          case Seq(Some(b)) => Some(b)
          case _ => None
        }
      }
      // the time-unit/truncate level: a layout log's declared transform
      // wins (X92 ∘ X93 — probes prune matching entries, foreign ones
      // degrade to unpruned exact); otherwise served only when EVERY
      // pinned entry records the same spelling
      val transform = layoutLog match {
        case Some(l) => l.transform.map(StoreTransform.parse)
        case None => entries.map(e =>
          EpochStoreWrite.readTransformSidecar(fs, root, e.dir))
          .distinct match {
          case Seq(Some(t)) => Some(t)
          case _ => None
        }
      }
      val opts = Map("path" -> root) ++
        partCol.map("partitionColumn" -> _) ++
        bucket.map(b => "bucketColumn" -> b.col) ++
        bucket.map(b => "bucketCount" -> b.n.toString) ++
        transform.map(t => "transform" -> t.spelling) ++
        branch.map("branch" -> _) ++
        (if (asOfGeneration >= 0L)
          Map("asOfGeneration" -> asOfGeneration.toString)
        else Map.empty)
      return new EpochStoreTable(withRowIdNullability(root, schema),
        new CaseInsensitiveStringMap(opts.asJava))
    }
    // discover schema (+ the partition-dir column, from col=value
    // subdirs) off the first committed entry dir that holds files
    require(entries.isEmpty || EpochManifest.columnOps(spark, root).isEmpty,
      s"store $root has RENAME/DROP column ops but entries without " +
        "_schema.json records — alias resolution needs the per-entry " +
        "records; ALTER is refused on pre-evolution stores")
    // an EMPTY snapshot (TRUNCATE, delete-all): serve the RECORDED
    // schema/layout from the newest retained generation whose entries
    // all carry records — exact and zero file IO, and it keeps a
    // CREATE TABLE-origin store (whose entries may hold only sidecars,
    // never inferable parquet) loadable and insertable after TRUNCATE
    if (entries.isEmpty) {
      gens.reverse.iterator
        .map(g => EpochManifest.entriesAt(spark, root, g))
        .find(es => es.nonEmpty && es.forall(e =>
          EpochStoreWrite.readSchemaSidecar(fs, root, e.dir).isDefined))
        .foreach { es =>
          val recs = es.map(e =>
            EpochStoreWrite.readSchemaSidecar(fs, root, e.dir).get)
          val layoutLog2 = EpochManifest.currentLayout(spark, root)
          val (schemaPhys, partCol0) = EpochStore.mergeRecorded(root, recs,
            allowMixedPartitioning = layoutLog2.nonEmpty)
          // a layout log owns the table-level partitioning here too —
          // the record generation may predate the evolution
          val partCol = layoutLog2 match {
            case Some(l) => Some(l.partCols.mkString(",")).filter(_.nonEmpty)
            case None => partCol0
          }
          val colOps = EpochManifest.columnOps(spark, root)
          val schema =
            if (colOps.isEmpty) schemaPhys
            else EpochStore.applyColumnOps(root, schemaPhys, colOps)
          val buckets = es
            .map(e => EpochStoreWrite.readBucketSidecar(fs, root, e.dir))
            .distinct
          val bucket = layoutLog2 match {
            case Some(l) => l.bucketCol.map(c =>
              EpochStore.StoreBucket(c, l.bucketCount))
            case None => buckets match {
              case Seq(Some(b)) => Some(b)
              case _ => None
            }
          }
          val transform = layoutLog2 match {
            case Some(l) => l.transform.map(StoreTransform.parse)
            case None => es.map(e =>
              EpochStoreWrite.readTransformSidecar(fs, root, e.dir))
              .distinct match {
              case Seq(Some(t)) => Some(t)
              case _ => None
            }
          }
          val opts = Map("path" -> root) ++
            partCol.map("partitionColumn" -> _) ++
            bucket.map(b => "bucketColumn" -> b.col) ++
            bucket.map(b => "bucketCount" -> b.n.toString) ++
            transform.map(t => "transform" -> t.spelling) ++
            branch.map("branch" -> _) ++
            (if (asOfGeneration >= 0L)
              Map("asOfGeneration" -> asOfGeneration.toString)
            else Map.empty)
          return new EpochStoreTable(withRowIdNullability(root, schema),
            new CaseInsensitiveStringMap(opts.asJava))
        }
    }
    // DATA files only: sidecars (_schema.json, _skip/…) don't make an
    // entry inferable — parquet inference over a sidecar-only dir fails
    def hasFiles(p: Path): Boolean =
      fs.exists(p) && fs.listStatus(p).exists(s =>
        (s.isFile && s.getLen > 0 &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".")) ||
          (s.isDirectory && !s.getPath.getName.startsWith("_") &&
            hasFiles(s.getPath)))
    val dataEntry = entries.find(e => hasFiles(new Path(s"$root/${e.dir}")))
      // a just-TRUNCATEd (or all-empty) store: discover the schema from
      // any RETAINED generation's entry — truncate is one manifest
      // commit, the previous snapshot's dirs live until the next gc
      .orElse(gens.reverse.iterator
        .flatMap(g => EpochManifest.entriesAt(spark, root, g))
        .find(e => hasFiles(new Path(s"$root/${e.dir}"))))
      .getOrElse(throw new IllegalArgumentException(
        s"store $root has only empty epochs — read it through " +
          "graft.sources.EpochStore.read with an explicit schema"))
    val entryDir = new Path(s"$root/${dataEntry.dir}")
    val schema = spark.read.parquet(entryDir.toString).schema
    // chase the nested col1=v/col2=v/… chain for the partition columns
    // in nesting order (pre-sidecar stores only; recorded stores take
    // the evolved path above)
    def chase(p: Path, acc: Seq[String]): Seq[String] =
      fs.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .collectFirst { case d if d.getName.contains("=") => d } match {
        case Some(d) => chase(d, acc :+ d.getName.takeWhile(_ != '='))
        case None => acc
      }
    val partCol = Some(chase(entryDir, Nil)).filter(_.nonEmpty)
      .map(_.mkString(","))
    val opts = Map("path" -> root) ++
      partCol.map("partitionColumn" -> _) ++
      branch.map("branch" -> _) ++
      (if (asOfGeneration >= 0L) Map("asOfGeneration" -> asOfGeneration.toString)
       else Map.empty)
    new EpochStoreTable(schema, new CaseInsensitiveStringMap(opts.asJava))
  }

  /** Declared transforms → (identity partition columns in nesting
    * order, optional hash-bucket spec). `PARTITIONED BY (date, lang)`
    * gives the nested `col=value` layout; `PARTITIONED BY
    * (bucket(16, id))` the `id_bucket=K` hash layout; `PARTITIONED BY
    * (date, bucket(16, id))` composes them with the bucket as the
    * INNERMOST level (`date=v/id_bucket=K` — the canonical 100 TB fact
    * layout), so the bucket transform must come last. */
  private def partitioningOf(schema: StructType,
                             partitions: Array[Transform])
      : (Seq[String], Option[EpochStore.StoreBucket],
         Option[StoreTransform]) = {
    var bucket: Option[EpochStore.StoreBucket] = None
    var timeT: Option[StoreTransform] = None
    val cols = partitions.toSeq.zipWithIndex.flatMap { case (t, i) =>
      val refs = t.references()
      t.name() match {
        case "identity" if refs.length == 1 &&
          refs.head.fieldNames().length == 1 =>
          require(timeT.isEmpty && bucket.isEmpty,
            "identity partition levels come before time-unit/bucket " +
              "transforms: PARTITIONED BY (cols…, days(ts), " +
              "bucket(n, col))")
          Some(refs.head.fieldNames().head)
        case "bucket" if refs.length == 1 &&
          refs.head.fieldNames().length == 1 =>
          require(bucket.isEmpty, "one bucket transform only")
          require(i == partitions.length - 1,
            "bucket(n, col) is the INNERMOST level of a composite " +
              "layout — declare it last: PARTITIONED BY (cols…, " +
              "bucket(n, col))")
          val n = t.arguments().collectFirst {
            case lv: org.apache.spark.sql.connector.expressions.Literal[_] =>
              lv.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            s"bucket transform without a count: $t"))
          bucket = Some(EpochStore.StoreBucket(
            refs.head.fieldNames().head, n))
          None
        // time-unit / truncate level (X93): `PARTITIONED BY (days(ts))`
        // — the reference's date-dir layout generalized; sits between
        // the identity levels and the bucket
        case k @ ("years" | "months" | "days" | "hours")
          if refs.length == 1 && refs.head.fieldNames().length == 1 =>
          require(timeT.isEmpty && bucket.isEmpty,
            "one time-unit transform, before the bucket level")
          timeT = Some(StoreTransform(refs.head.fieldNames().head,
            k.stripSuffix("s")))
          None
        case "truncate" if refs.length == 1 &&
          refs.head.fieldNames().length == 1 =>
          require(timeT.isEmpty && bucket.isEmpty,
            "one truncate transform, before the bucket level")
          val w = t.arguments().collectFirst {
            case lv: org.apache.spark.sql.connector.expressions.Literal[_]
              if lv.value().isInstanceOf[Number] =>
              lv.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            s"truncate transform without a width: $t"))
          timeT = Some(StoreTransform(refs.head.fieldNames().head,
            "trunc", w))
          None
        case _ => throw new UnsupportedOperationException(
          s"epochstore supports PARTITIONED BY (columns…) identity " +
            "partitioning, ONE time-unit transform (years/months/days/" +
            "hours/truncate), and ONE bucket(n, col), got " + t)
      }
    }
    bucket.foreach(b => require(!cols.contains(b.col),
      s"bucket column ${b.col} is already an identity partition column"))
    timeT.foreach { tt =>
      require(!cols.contains(tt.col),
        s"transform column ${tt.col} is already an identity partition " +
          "column")
      require(!bucket.exists(_.col == tt.col),
        s"transform column ${tt.col} is already the bucket column")
      schema.fields.find(_.name == tt.col).foreach(f =>
        StoreTransform.validate(tt, f.dataType))
    }
    (cols ++ bucket.map(_.col) ++ timeT.map(_.col)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"partition column $c is not in the table schema"))
    (cols, bucket, timeT)
  }

  private def partColsOf(schema: StructType,
                         partitions: Array[Transform]): Seq[String] =
    partitioningOf(schema, partitions)._1

  /** Write-tuning options carried as table properties (`OPTIONS(...)`
    * lands them plain AND `option.`-prefixed; accept either). */
  private def propOpt(properties: util.Map[String, String],
                      key: String): Option[String] =
    Option(properties.get(key)).orElse(Option(properties.get(s"option.$key")))

  private def statsColsOf(schema: StructType,
                          properties: util.Map[String, String])
      : Seq[(String, Char)] =
    propOpt(properties, "statsColumns").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)).map { c =>
        val f = schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"statsColumns column $c is not in the table schema"))
        import org.apache.spark.sql.types._
        val kind = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => 'l'
          case FloatType | DoubleType => 'd'
          case StringType => 'S'
          case other => throw new IllegalArgumentException(
            s"statsColumns column $c has type $other")
        }
        c -> kind
      }

  /** Plain `CREATE TABLE t (cols…)` — an EMPTY store: one committed
    * epoch-0 dir with no files and a `_schema.json` record, so the
    * declared schema (and partition column) serve discovery exactly
    * like an evolved store's. The commit is the CTAS CAS (`cur` must
    * be empty), so two racing CREATEs get exactly one winner. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val root = rootOf(ident)
    if (isStore(root))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val (partCols, bucket, timeT) = partitioningOf(schema, partitions)
    val dir = EpochManifest.newDataDir(spark, root, 0L)
    fs.mkdirs(new Path(s"$root/$dir"))
    EpochStoreWrite.writeSchemaSidecar(fs, root, dir, schema, partCols,
      bucket, transform = timeT)
    // OPTIONS('rowid'='k1,k2') declares a row identity: UPDATE/MERGE/
    // DELETE run merge-on-read ([[EpochStoreDelta]])
    propOpt(properties, "rowid").foreach { cols =>
      val keys = cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      keys.foreach { k =>
        require(schema.fieldNames.contains(k),
          s"rowid column $k is not in the table schema")
        // the bucket column lives IN the data files, so it can key;
        // identity partition levels don't
        require(!partCols.contains(k),
          s"rowid column $k is a partition-dir level — equality " +
            "tombstones need the key in the data files")
      }
      EpochStoreDelta.declare(spark, root, keys)
    }
    EpochManifest.commitWith(spark, root) { cur =>
      require(cur.isEmpty,
        s"CREATE TABLE: a table appeared at $root concurrently — " +
          "exactly one creator wins")
      Seq(EpochManifest.Entry(0L, dir))
    }
    loadTable(ident)
  }

  // ---------------------------------------------- CTAS / RTAS staging
  // `CREATE TABLE … AS SELECT` and `REPLACE TABLE … AS SELECT` stage
  // their write into a claimed-but-unreferenced dir; the staged table's
  // commit IS the first manifest publish, so a failing SELECT (or a
  // lost commit race) leaves nothing visible ([[StagedEpochStoreTable]]).

  override def stageCreate(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val root = rootOf(ident)
    if (isStore(root))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val (pcs, bkt, tt) = partitioningOf(info.schema(), info.partitions())
    new StagedEpochStoreTable(root, info.schema(), pcs,
      statsColsOf(info.schema(), info.properties()), replaceBase = None,
      bucketSpec = bkt, transformSpec = tt)
  }

  override def stageReplace(ident: Identifier,
                            info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val root = rootOf(ident)
    if (!isStore(root)) throw new NoSuchTableException(ident)
    val (pcs, bkt, tt) = partitioningOf(info.schema(), info.partitions())
    new StagedEpochStoreTable(root, info.schema(), pcs,
      statsColsOf(info.schema(), info.properties()),
      replaceBase = Some(EpochManifest.entries(spark, root)),
      bucketSpec = bkt, transformSpec = tt)
  }

  override def stageCreateOrReplace(ident: Identifier,
                                    info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val root = rootOf(ident)
    val (pcs, bkt, tt) = partitioningOf(info.schema(), info.partitions())
    new StagedEpochStoreTable(root, info.schema(), pcs,
      statsColsOf(info.schema(), info.properties()),
      replaceBase = Some(EpochManifest.entries(spark, root)),
      bucketSpec = bkt, transformSpec = tt)
  }

  /** `ALTER TABLE … ADD COLUMNS (…)` — the SQL face of the store's
    * add-column evolution: the widened schema lands as one EMPTY epoch
    * whose `_schema.json` records it, so [[EpochStore.evolvedSchema]]
    * (and [[tableAt]]'s evolved discovery) serve the new column from
    * the next resolution on, with every older file serving null — a
    * pure metadata operation, zero data rewritten. Nullable top-level
    * columns only (old files cannot serve a non-null default); every
    * other change keeps refusing. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val root = rootOf(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    require(adds.size + renames.size + drops.size == changes.size,
      "epochstore tables support ALTER TABLE ADD COLUMNS (nullable), " +
        s"RENAME COLUMN, and DROP COLUMN; got ${changes.mkString(", ")}")
    require(adds.isEmpty || (renames.isEmpty && drops.isEmpty),
      "mixing ADD with RENAME/DROP in one ALTER is not supported")

    if (renames.nonEmpty || drops.nonEmpty) {
      (renames ++ drops).foreach(c => require(c.fieldNames().length == 1,
        s"epochstore ALTER supports top-level columns only, got " +
          c.fieldNames().mkString(".")))
      val ops = renames.map(r => EpochManifest.ColumnOp.Rename(
        r.fieldNames().head, r.newName()): EpochManifest.ColumnOp) ++
        drops.map(d => EpochManifest.ColumnOp.Drop(d.fieldNames().head))
      // the guards re-run inside the CAS loop against the log the ops
      // actually land on — two racing ALTERs are both validated
      EpochManifest.appendColumnOps(spark, root, ops, cur => {
        val (merged, partCol) = EpochStore.evolvedSchema(spark, root)
        // evolvedSchema already applied `cur`; re-derive the retired set
        var retired = Set.empty[String]
        var chains = Map.empty[String, List[String]]
        cur.foreach {
          case EpochManifest.ColumnOp.Rename(a, b) =>
            chains = chains - a + (b -> (a :: chains.getOrElse(a, Nil)))
            retired += a
          case EpochManifest.ColumnOp.Drop(c) =>
            retired ++= (c :: chains.getOrElse(c, Nil)); retired += c
            chains -= c
        }
        // SPEC-EVOLVED stores: live foreign-layout entries still WALK
        // their recorded identity partition columns (layoutResolver
        // binds each entry's dir fields by name) — renaming/dropping
        // one would make every scan throw "records partition column …
        // missing from the schema". Union the entries' recorded
        // partition columns and the CURRENT layout's into the guard,
        // exactly like the bucket columns below.
        val liveEntries = EpochManifest.entries(spark, root)
        val partCols = EpochStore.splitPartCols(partCol).toSet ++
          liveEntries.flatMap(e =>
            EpochStoreWrite.readSchemaSidecar(fs, root, e.dir)
              .map(r => EpochStore.splitPartCols(r._2)).getOrElse(Nil)) ++
          EpochManifest.currentLayout(spark, root).toSeq.flatMap(_.partCols)
        val bucketCols = liveEntries
          .flatMap(e => EpochStoreWrite.readBucketSidecar(fs, root, e.dir))
          .map(_.col).toSet ++
          EpochManifest.currentLayout(spark, root).toSeq
            .flatMap(_.bucketCol)
        val rowIds = EpochStoreDelta.declared(spark, root)
          .getOrElse(Nil).toSet
        val bloomCol = BloomSpec.declared(spark, root).toSet
        val constraints = EpochStoreConstraints.list(spark, root)
        def guardSource(n: String): Unit = {
          require(!partCols(n), s"column $n partitions $root's dir " +
            "layout — partition columns cannot be renamed or dropped")
          require(!bucketCols(n), s"column $n is $root's bucket column " +
            "— bucket columns cannot be renamed or dropped")
          require(!rowIds(n), s"column $n is $root's declared row " +
            "identity — rowid columns cannot be renamed or dropped")
          require(!bloomCol(n), s"column $n carries $root's bloom " +
            "sidecars — drop them first")
          constraints.foreach { case (cn, expr) =>
            require(!s"\\b${java.util.regex.Pattern.quote(n)}\\b".r
              .findFirstIn(expr).isDefined,
              s"column $n is referenced by CHECK constraint $cn ($expr) " +
                "— drop the constraint first")
          }
        }
        // validate the batch SEQUENTIALLY against the evolving state —
        // two renames to one target, a rename chained onto a drop, or a
        // batch that drops every column must refuse even though each op
        // passes against the pre-batch schema alone
        var live = merged.fieldNames.toSet
        var retiredNow = retired
        ops.foreach {
          case EpochManifest.ColumnOp.Rename(from, to) =>
            require(live(from),
              s"rename $from -> $to on $root: no column $from — " +
                s"columns: ${live.toSeq.sorted.mkString(", ")}")
            guardSource(from)
            require(!live(to),
              s"rename $from -> $to on $root: $to already exists")
            require(!retiredNow(to),
              s"rename $from -> $to on $root: $to is a RETIRED name " +
                "(an old entry may still hold it physically — reusing " +
                "it would leak that entry's values into the new column)")
            live = live - from + to
            retiredNow += from
          case EpochManifest.ColumnOp.Drop(name) =>
            require(live(name),
              s"drop $name on $root: no column $name — columns: " +
                live.toSeq.sorted.mkString(", "))
            guardSource(name)
            require(live.size > 1,
              s"cannot drop the last column of $root")
            live -= name
            retiredNow += name
        }
      })
      return loadTable(ident)
    }

    adds.foreach { a =>
      require(a.fieldNames().length == 1,
        s"epochstore ALTER supports top-level columns only, got " +
          a.fieldNames().mkString("."))
      require(a.isNullable,
        s"epochstore ALTER ADD COLUMNS must be nullable — files written " +
          s"before ${a.fieldNames().head} existed serve it as null")
    }
    val (schema, partCol) = EpochStore.evolvedSchema(spark, root)
    val partColsSeq = EpochStore.splitPartCols(partCol)
    val retired = EpochStore.columnAliases(spark, root).retired
    adds.foreach { a =>
      val n = a.fieldNames().head
      require(!schema.fieldNames.contains(n), s"column $n already exists")
      require(!retired(n),
        s"column name $n was renamed away or dropped on $root — an old " +
          "entry may still hold it physically; re-adding it would leak " +
          "that entry's values into the new column")
    }
    val widened = StructType(schema.fields ++ adds.map { a =>
      // a DEFAULT rides as the standard field metadata: CURRENT_DEFAULT
      // fills future INSERTs, EXISTS_DEFAULT (the constant-folded form,
      // validated foldable here) fills the column for every file written
      // before it existed — the readers consume it, no data rewrite
      val meta = Option(a.defaultValue()) match {
        case Some(d) =>
          val sql = d.getSql
          require(sql != null && sql.nonEmpty,
            s"DEFAULT for ${a.fieldNames().head} has no SQL form")
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString("CURRENT_DEFAULT", sql)
            .putString("EXISTS_DEFAULT", sql)
            .build()
        case None => org.apache.spark.sql.types.Metadata.empty
      }
      org.apache.spark.sql.types.StructField(a.fieldNames().head,
        a.dataType(), nullable = true, metadata = meta)
    })
    // constant-fold EXISTS_DEFAULT (and refuse a non-foldable DEFAULT):
    // the existence default must be a fixed literal — it is what every
    // pre-existing file serves forever, not re-evaluated per read
    val widenedFolded = org.apache.spark.sql.catalyst.util
      .ResolveDefaultColumns.constantFoldCurrentDefaultsToExistDefaults(
        widened, "ALTER TABLE ADD COLUMNS")
    val epoch = EpochManifest.entries(spark, root)
      .map(_.epoch).maxOption.getOrElse(-1L) + 1L
    val dir = EpochManifest.newDataDir(spark, root, epoch)
    fs.mkdirs(new Path(s"$root/$dir"))
    EpochStoreWrite.writeSchemaSidecar(fs, root, dir, widenedFolded,
      partColsSeq)
    EpochManifest.commitEpochDir(spark, root, epoch, dir)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!isStore(root)) false
    else {
      // a re-created store at this path can reuse attempt-dir names
      // (the _claims markers die with the root) — stale cached
      // tombstone views must die with it
      EpochStoreDelta.invalidate(root)
      fs.delete(new Path(root), true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "an epochstore's identity is its path; copy by re-writing epochs")

  // ------------------------------------------------------- namespaces
  // Namespaces are plain subdirectories of the warehouse that are not
  // themselves stores — just enough surface for SHOW TABLES / SHOW
  // NAMESPACES / CREATE NAMESPACE to work against the layout.

  private def nsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.toSeq).mkString("/"))

  private def isNamespaceDir(p: Path): Boolean =
    fs.getFileStatus(p).isDirectory && !isStore(p.toString)

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(new Path(warehouse))) Array.empty
    else fs.listStatus(new Path(warehouse)).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
        !isStore(s.getPath.toString))
      .map(s => Array(s.getPath.getName))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
      fs.listStatus(nsPath(namespace)).toSeq
        .filter(s => s.isDirectory && !isStore(s.getPath.toString))
        .map(s => namespace :+ s.getPath.getName)
        .toArray
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsPath(namespace)) && isNamespaceDir(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Map.of("location", nsPath(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(namespace)): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "epochstore namespaces are directories; nothing to alter")

  /** Drops an EMPTY namespace; `cascade` deletes its stores too. */
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) false
    else {
      val p = nsPath(namespace)
      if (!cascade && fs.listStatus(p).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty — use CASCADE")
      fs.delete(p, true)
    }
  }
}


/** The epochstore bucket function as a Spark V2 function — bound per
  * value type, result = the bucket id [[EpochStore.bucketIdOf]] lays
  * dirs out with. Its canonical name is what KeyGroupedPartitioning
  * compatibility compares across the two sides of a
  * storage-partitioned join. */
private[sources] object EpochStoreBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "epochstore hash bucket: pmod(murmur3(value, seed 42), n)"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, col) takes two arguments, got $inputType")
    val dt = inputType.fields(1).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType,
      StringType)(dt),
      s"bucket over $dt — only integral and string columns bucket")
    new org.apache.spark.sql.connector.catalog.functions.ScalarFunction[
      java.lang.Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.epochstore.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): java.lang.Integer = {
        val n = input.getInt(0)
        val v = if (input.isNullAt(1)) null else input.get(1, dt)
        EpochStore.bucketIdOf(v, dt, n)
      }
    }
  }
}
