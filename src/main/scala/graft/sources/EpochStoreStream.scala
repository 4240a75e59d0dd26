package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}

import graft.core.EpochManifest

/** One stream position: every manifest epoch ≤ `epoch` has been
  * delivered. Serialized into Spark's offset WAL, so the shape is the
  * exactly-once contract across restarts. */
final case class EpochStreamOffset(epoch: Long) extends Offset {
  override def json(): String = s"""{"epoch":$epoch}"""
}

/** The streaming READ half of the epochstore connector —
  *
  *   spark.readStream.format("epochstore")
  *     .schema(s).option("path", root)
  *     [.option("partitionColumn", c)]
  *     [.option("startingAfterEpoch", n)]   // skip the initial snapshot
  *     [.option("maxEpochsPerTrigger", k)]  // admission control
  *     .load()
  *
  * tails the manifest: each micro-batch is a committed EPOCH RANGE
  * `(start, end]`, read through the same pruned file listing + Spark
  * vectorized parquet path as the batch scan, so the store's write →
  * stream → serve loop closes entirely inside the connector (the
  * foreachBatch ingest flows' manual manifest polling, as a source).
  *
  * Delivery contract (all loud, none silent):
  *   - An epoch is delivered EXACTLY ONCE: offsets are the manifest
  *     epochs themselves, checkpointed in Spark's WAL; a replayed batch
  *     re-resolves the same epoch range. A RETRIED epoch (replaced
  *     attempt dir, same epoch id) re-reads the replacement — the
  *     committed truth, the same idempotence the write side proves.
  *   - The initial batch is the store's current visible snapshot
  *     (folds included); `startingAfterEpoch` starts the tail above a
  *     known epoch instead (the "changes only" form).
  *   - COMPACTION must stay behind the slowest stream reader: a fold
  *     whose span straddles the stream offset (minEpoch ≤ start <
  *     epoch) would re-deliver already-delivered rows, and a fold that
  *     swallowed undelivered epochs into an entry above the batch end
  *     would silently drop them — both are detected per batch and fail
  *     the query with the boundary in the message. Fold up to the
  *     stream's committed offset and the tail never notices (same rows,
  *     new dirs — delivered spans are whole either way).
  *
  * Scale shape: `latestOffset` is one manifest read (a driver-side
  * file listing + one small JSON); each batch lists only ITS epoch
  * dirs; file splitting and packing match the native source, so a
  * 1000-executor cluster sees normal task geometry per trigger.
  * `maxEpochsPerTrigger` bounds a catch-up restart (a reader resuming
  * behind a large backlog processes it as several normal-sized batches
  * instead of one giant one). */
final class EpochStoreMicroBatchStream(
    fullSchema: StructType, required: StructType, partCols: Seq[String],
    root: String, partFilters: Array[Filter], dataFilters: Array[Filter],
    streamOptions: Map[String, String],
    bloomCol: Option[String] = None,
    bucket: Option[EpochStore.StoreBucket] = None)
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val partFields: Seq[StructField] =
    partCols.map(c => fullSchema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"partitionColumn $c is not in the schema")))

  private val dataSchema: StructType =
    StructType(fullSchema.filterNot(f => partCols.contains(f.name)))
  /** `_epoch` / `_change_type` metadata columns on the TAIL: the epoch
    * provenance and — for a row-identity store — the CDC change type
    * ("insert" data rows, "delete" tombstone events), both served as
    * per-file constants so a streaming consumer gets the same
    * changefeed shape as the batch [[EpochStore.readChanges]], one
    * committed epoch range per trigger. */
  private val epochRequested: Boolean =
    required.fieldNames.contains(EpochStore.EpochColName)
  private val changeRequested: Boolean =
    required.fieldNames.contains(EpochStore.ChangeColName)
  private val readDataSchema: StructType =
    StructType(required.filterNot(f => partCols.contains(f.name) ||
      f.name == EpochStore.EpochColName ||
      f.name == EpochStore.ChangeColName)
      // re-attach the TABLE's field metadata (EXISTS_DEFAULT et al.) so
      // a tailed epoch that predates an ADD COLUMN … DEFAULT serves the
      // default exactly like the batch scan — pruning hands back bare
      // fields (same fix as [[EpochStoreScan.readDataSchema]])
      .map(f => fullSchema.fields.find(_.name == f.name)
        .filter(_.metadata != org.apache.spark.sql.types.Metadata.empty)
        .map(g => f.copy(metadata = g.metadata)).getOrElse(f)))
  private val readPartSchema: StructType =
    StructType(partFields.filter(f => required.fieldNames.contains(f.name)))
  private val constSchema: StructType =
    StructType(readPartSchema ++
      (if (epochRequested)
        Seq(org.apache.spark.sql.types.StructField(EpochStore.EpochColName,
          org.apache.spark.sql.types.LongType, nullable = false))
      else Nil) ++
      (if (changeRequested)
        Seq(org.apache.spark.sql.types.StructField(EpochStore.ChangeColName,
          org.apache.spark.sql.types.StringType, nullable = false))
      else Nil))
  private def constantsOf(lf: EpochStore.ListedFile): Array[Any] = {
    val b = Array.newBuilder[Any]
    requestedPartIdx.foreach(i => b += lf.values(i))
    if (epochRequested) b += lf.epoch
    if (changeRequested) b += (if (lf.isDelete) "delete" else "insert")
    b.result()
  }
  private val requestedPartIdx: Seq[Int] = partFields.zipWithIndex
    .filter { case (f, _) => required.fieldNames.contains(f.name) }
    .map(_._2)

  private val startingAfter: Long =
    streamOptions.get("startingafterepoch").map(_.toLong).getOrElse(-1L)
  private val maxPerTrigger: Option[Long] =
    streamOptions.get("maxepochspertrigger").map(_.toLong)
  maxPerTrigger.foreach(m => require(m > 0,
    s"maxEpochsPerTrigger must be positive, got $m"))

  // the stream runs on the driver's stream-execution thread; the session
  // is captured at stream construction (scan planning)
  private val spark: SparkSession = SparkSession.active

  /** RENAME/DROP evolution (X85) on the TAIL: alias chains and the
    * per-entry NAME PROFILES are pinned at stream construction — every
    * entry live then resolves its spelling here, and entries appended
    * while the stream runs are written under the CURRENT names (the
    * identity profile, index 0). A rename landing MID-stream changes
    * the mapping this running query was planned under, so each batch
    * re-reads the (tiny) ops log and refuses loudly on drift — restart
    * the query and the new mapping pins. */
  private val opsAtStart = EpochManifest.columnOps(spark, root)
  private val aliases: EpochStore.ColumnAliases = {
    var chains = Map.empty[String, List[String]]
    var retired = Set.empty[String]
    opsAtStart.foreach {
      case EpochManifest.ColumnOp.Rename(a, b) =>
        chains = chains - a + (b -> (a :: chains.getOrElse(a, Nil)))
        retired += a
      case EpochManifest.ColumnOp.Drop(c) =>
        retired ++= (c :: chains.getOrElse(c, Nil))
        chains -= c
    }
    EpochStore.ColumnAliases(chains, retired)
  }
  /** Distinct per-entry physical-name profiles at start (identity is
    * always index 0) and each entry dir's index. */
  private val profiles: (IndexedSeq[Seq[String]], Map[String, Int]) = {
    val identity = dataSchema.fieldNames.toSeq
    if (aliases.isEmpty) (IndexedSeq(identity), Map.empty)
    else {
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
      val byDir = EpochManifest.entries(spark, root).map(_.dir).map { d =>
        val efs = EpochStoreWrite.readSchemaSidecar(fs, root, d)
          .map(_._1.fieldNames.toSet).getOrElse(Set.empty[String])
        d -> identity.map(n => aliases.resolve(n, efs))
      }.toMap
      val distinct = (identity +:
        byDir.values.toSeq.distinct.filterNot(_ == identity)).toIndexedSeq
      (distinct, byDir.map { case (d, p) => d -> distinct.indexOf(p) })
    }
  }
  private def profileIdxOf(dir: String): Int =
    if (aliases.isEmpty) 0 else profiles._2.getOrElse(dir, 0)

  /** Highest committed epoch right now (startingAfter when the store has
    * none yet — the tail starts empty instead of failing). */
  private def visibleMax(): Long = {
    val es = EpochManifest.entries(spark, root)
    if (es.isEmpty) startingAfter
    else math.max(startingAfter, es.map(_.epoch).max)
  }

  /** Trigger.AvailableNow pins the catch-up target HERE (query start):
    * the query drains up to this epoch — in maxEpochsPerTrigger-sized
    * batches — and terminates, even while a concurrent writer keeps
    * committing later epochs. */
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(visibleMax())
  }

  override def initialOffset(): Offset = EpochStreamOffset(startingAfter)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset = EpochStreamOffset(visibleMax())

  /** The next batch end: everything visible (or the AvailableNow pin),
    * capped to `start + maxEpochsPerTrigger`. Epoch ids need not be
    * dense — the cap bounds the id RANGE per trigger, which for the
    * engine's batch-id/epoch-keyed writers is the batch count too. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EpochStreamOffset].epoch
    var end = availableNowCap.getOrElse(visibleMax())
    maxPerTrigger.foreach(m => end = math.min(end, s + m))
    EpochStreamOffset(math.max(s, end))
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[EpochStreamOffset].epoch
    val e = end.asInstanceOf[EpochStreamOffset].epoch
    if (e <= s) return Array.empty
    // a RENAME/DROP landing mid-stream would change the alias mapping
    // this query's reader profiles were pinned under — refuse loudly
    if (EpochManifest.columnOps(spark, root) != opsAtStart)
      throw new IllegalStateException(
        s"epochstore stream over $root: a RENAME/DROP COLUMN landed " +
          "while this query was running — restart the stream; the new " +
          "name mapping pins at start")
    val all = EpochManifest.entries(spark, root)
    // a fold above the batch end that swallowed epochs inside it would
    // make those rows silently undeliverable — refuse
    all.find(en => en.epoch > e && en.minEpoch <= e).foreach(en =>
      throw new IllegalStateException(
        s"epochstore stream over $root: fold ${en.dir} covers epochs " +
          s"[${en.minEpoch}, ${en.epoch}] across this batch's end $e — " +
          "compaction overtook the stream reader; compact only up to the " +
          "stream's committed offset"))
    val batch = all.filter(en => en.epoch > s && en.epoch <= e)
    // partition-SPEC drift: an entry recorded under a layout other than
    // this stream's pinned one would walk the wrong dir prefixes and
    // serve its dir columns as null — refuse loudly (an evolve_layout
    // landed mid-stream; after migrate/compact a restarted tail pins
    // the new layout)
    if (EpochManifest.currentLayout(spark, root).nonEmpty) {
      val fs0 = new org.apache.hadoop.fs.Path(root).getFileSystem(
        org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
      val foreign = batch.filter { en =>
        EpochStoreWrite.readSchemaSidecar(fs0, root, en.dir).exists {
          case (_, pc) => EpochStore.splitPartCols(pc) != partCols
        } || EpochStoreWrite.readBucketSidecar(fs0, root, en.dir) != bucket
      }
      if (foreign.nonEmpty) throw new IllegalStateException(
        s"epochstore stream over $root: entries " +
          s"${foreign.map(_.dir).mkString(", ")} were written under a " +
          "different partition spec than this stream pinned — an " +
          "evolve_layout landed mid-stream; normalize (CALL " +
          "migrate_layout or compact) and restart the tail")
    }
    // a fold straddling the start would re-deliver epochs ≤ s — refuse
    batch.find(_.minEpoch <= s).foreach(en =>
      throw new IllegalStateException(
        s"epochstore stream over $root: fold ${en.dir} covers epochs " +
          s"[${en.minEpoch}, ${en.epoch}] across this stream's offset $s — " +
          "compaction overtook the stream reader; compact only up to the " +
          "stream's committed offset"))
    val (files, _, _) =
      EpochStore.listEntryFiles(spark, root, batch, partFields, partFilters,
        bucket = bucket,
        // a filtered bucket-store tail pays only the probed buckets per
        // trigger, same as the batch scan
        bucketKeep = bucket.flatMap(b => EpochStore.bucketProbes(
          dataFilters, b, fullSchema(b.col).dataType)))
    // the tail skips files exactly like the batch scan: a filtered
    // stream consumer pays only for the epochs' matching files
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
    val statsBy = batch.map(en =>
      en.dir -> EpochStoreStats.read(fs, root, en.dir)).toMap
    val kept = EpochStore.bloomSkipFiles(fs, root,
      EpochStore.statsSkipFiles(fs, root, statsBy, files, dataFilters),
      EpochStore.bloomProbes(dataFilters, bloomCol),
      bloomCol.exists(c => fullSchema(c).dataType ==
        org.apache.spark.sql.types.StringType))
    // CDC tail: the batch's tombstone files join the trigger as DELETE
    // events, outside the skipping tiers — a changefeed must deliver
    // every delete
    val withDeletes =
      if (!changeRequested) kept
      else kept ++ EpochStoreDelta.deleteEventFiles(fs, root, batch,
        partFields)
    if (aliases.isEmpty)
      EpochStore.planFilePartitions(spark, withDeletes, constSchema,
        constantsOf)
    else
      // per-entry NAME profiles: pack each profile's files separately
      // and route to its translated reader — pre-rename epochs tail
      // with no compaction prerequisite, exactly like the batch scan
      withDeletes.map(f => profileIdxOf(f.entryDir)).distinct.sorted
        .flatMap { pid =>
          EpochStore.planFilePartitions(spark,
            withDeletes.filter(f => profileIdxOf(f.entryDir) == pid),
            constSchema, constantsOf)
            .map {
              case fp: org.apache.spark.sql.execution.datasources
                .FilePartition if pid != 0 =>
                ProfiledFilePartition(fp, pid): InputPartition
              case other => other
            }
        }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    def factoryFor(profile: Seq[String]): PartitionReaderFactory = {
      val m = dataSchema.fieldNames.zip(profile).toMap
      if (m.forall { case (k, v) => k == v })
        EpochStore.parquetReaderFactory(spark, dataSchema, readDataSchema,
          constSchema, dataFilters)
      else
        EpochStore.parquetReaderFactory(spark,
          StructType(dataSchema.fields.map(f => f.copy(name = m(f.name)))),
          StructType(readDataSchema.fields.map(f =>
            f.copy(name = m.getOrElse(f.name, f.name)))),
          constSchema,
          // untranslatable filter shapes drop from the parquet push —
          // data filters are residual, Spark re-evaluates them
          dataFilters.flatMap(EpochStore.renameFilter(_, m)))
    }
    if (aliases.isEmpty) factoryFor(dataSchema.fieldNames.toSeq)
    else new KeyedDelegatingReaderFactory(profiles._1.map(factoryFor))
  }

  override def deserializeOffset(json: String): Offset =
    EpochStreamOffset(json.split("\"epoch\":")(1)
      .takeWhile(c => c.isDigit || c == '-').toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
