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
    bucket: Option[EpochStore.StoreBucket] = None,
    transform: Option[StoreTransform] = None)
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val partFields: Seq[StructField] =
    partCols.map(c => fullSchema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"partitionColumn $c is not in the schema")))

  /** `_change_type` on the TAIL (row-identity stores): the trigger's
    * tombstone files join as DELETE events — the same changefeed shape
    * as the batch [[EpochStore.readChanges]]. Schema splitting, the
    * `_epoch`/`_change_type` constants, EXISTS_DEFAULT metadata, and
    * every per-entry read profile all live in the pinned TEMPLATE scan
    * ([[EpochStoreScan.packFiles]]) — one code path for batch and tail. */
  private val changeRequested: Boolean =
    required.fieldNames.contains(EpochStore.ChangeColName)

  private val startingAfter: Long =
    streamOptions.get("startingafterepoch").map(_.toLong).getOrElse(-1L)
  private val maxPerTrigger: Option[Long] =
    streamOptions.get("maxepochspertrigger").map(_.toLong)
  maxPerTrigger.foreach(m => require(m > 0,
    s"maxEpochsPerTrigger must be positive, got $m"))

  // the stream runs on the driver's stream-execution thread; the session
  // is captured at stream construction (scan planning)
  private val spark: SparkSession = SparkSession.active

  /** RENAME/DROP and PARTITION-SPEC evolution on the TAIL: the tail
    * delegates its routing to a pinned TEMPLATE batch scan over the
    * stream-start snapshot — its per-entry READ PROFILES (physical
    * name spellings × foreign layouts) pack and read every trigger's
    * files exactly like the batch read, so neither a rename history
    * nor a mixed partition spec is a tail prerequisite. Entries
    * appended while the stream runs must be IDENTITY (current names,
    * current layout at start): the per-batch drift gates refuse a
    * mid-stream RENAME/DROP or evolve_layout loudly — restart the
    * query and the new mapping pins. */
  private val opsAtStart = EpochManifest.columnOps(spark, root)
  private val layoutAtStart = EpochManifest.currentLayout(spark, root)
  private val template: EpochStoreScan =
    EpochStoreScan(fullSchema, required, partCols, root, -1L,
      EpochManifest.entries(spark, root), partFilters, dataFilters,
      bucket = bucket, transform = transform, bloomCol = bloomCol,
      runtimeFilterable = false)

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
    // a RENAME/DROP or evolve_layout landing mid-stream would change
    // the mapping this query's reader profiles were pinned under —
    // refuse loudly
    if (EpochManifest.columnOps(spark, root) != opsAtStart)
      throw new IllegalStateException(
        s"epochstore stream over $root: a RENAME/DROP COLUMN landed " +
          "while this query was running — restart the stream; the new " +
          "name mapping pins at start")
    if (EpochManifest.currentLayout(spark, root) != layoutAtStart)
      throw new IllegalStateException(
        s"epochstore stream over $root: an evolve_layout landed while " +
          "this query was running — restart the stream; the new layout " +
          "mapping pins at start")
    val all = EpochManifest.entries(spark, root)
    // X94/X97: a position-delete journal retro-filters rows already
    // emitted, which a RESOLVED tail cannot replay — refuse loudly.
    // The CDC tail (`_change_type` selected) DELIVERS the journals
    // instead: synthesized full-payload delete events per trigger,
    // the batch readChanges contract (below).
    val liveJournals = EpochStoreDv.dvCarrying(spark, root, all)
    if (liveJournals.nonEmpty && !changeRequested)
      throw new IllegalStateException(
        s"epochstore stream over $root: the store carries live " +
          "position deletes (deletion vectors) a resolved tail cannot " +
          "replay — read the CDC tail (select _change_type; delete " +
          "events synthesize per trigger) or run CALL compact to fold " +
          "them in first")
    // a fold above the batch end that swallowed epochs inside it would
    // make those rows silently undeliverable — refuse
    all.find(en => en.epoch > e && en.minEpoch <= e).foreach(en =>
      throw new IllegalStateException(
        s"epochstore stream over $root: fold ${en.dir} covers epochs " +
          s"[${en.minEpoch}, ${en.epoch}] across this batch's end $e — " +
          "compaction overtook the stream reader; compact only up to the " +
          "stream's committed offset"))
    val batch = all.filter(en => en.epoch > s && en.epoch <= e)
    // entries OUTSIDE the template's profile registry (appended after
    // the stream started) must sit on the IDENTITY profile — current
    // layout, current names; a foreign-layout late arrival would walk
    // the wrong dir prefixes and serve its dir columns as null
    if (layoutAtStart.nonEmpty) {
      val fs0 = new org.apache.hadoop.fs.Path(root).getFileSystem(
        org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
      val foreign = batch.filter { en =>
        !template.profileKnown(en.dir) &&
          (EpochStoreWrite.readSchemaSidecar(fs0, root, en.dir).exists {
            case (_, pc) => EpochStore.splitPartCols(pc) != partCols
          } || EpochStoreWrite.readBucketSidecar(fs0, root, en.dir) != bucket)
      }
      if (foreign.nonEmpty) throw new IllegalStateException(
        s"epochstore stream over $root: entries " +
          s"${foreign.map(_.dir).mkString(", ")} landed mid-stream under " +
          "a partition spec this tail did not pin — normalize (CALL " +
          "migrate_layout or compact) or restart the tail")
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
          dataFilters, b, fullSchema(b.col).dataType)),
        // time-unit pruning per trigger, same as the batch scan
        transform = transform,
        unitKeep = transform.flatMap(t => TimeTransforms.unitKeep(
          dataFilters, t, fullSchema(t.col).dataType)),
        // spec-evolved stores: each trigger's entries walk under their
        // OWN recorded layouts (the template's resolver — its dir
        // values feed the per-profile constants in packFiles)
        layoutOf = template.layoutResolver)
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
    // X97 — position-delete journals committed IN THIS WINDOW deliver
    // their delete events with the trigger (the batch readChanges
    // contract on the tail). Per journal: targets still in EARLIER
    // batches (epoch ≤ the stream offset — their inserts already went
    // out) re-read at their dead ordinals only, as full-payload
    // `delete` events stamped with the journal's commit epoch;
    // IN-WINDOW targets net instead — their inserts deliver already
    // DV-filtered, so the pair never reaches the consumer (net-change
    // semantics, identical to the batch feed's in-window netting).
    // Journals ≤ the offset delivered their events in their own
    // trigger; journals above the batch end wait for theirs. Every
    // piece replans deterministically from the immutable manifest, so
    // a restarted batch re-delivers the identical event set.
    val windowJournals = liveJournals.filter(j => j.epoch > s && j.epoch <= e)
    lastBatchDv = windowJournals.nonEmpty
    if (windowJournals.isEmpty)
      // the template's profile routing packs the trigger exactly like
      // the batch scan reads it — rename spellings AND foreign layouts
      return template.packFiles(spark, withDeletes)
    val byDirAll = all.map(en => en.dir -> en).toMap
    val nettedPos = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.ArrayBuffer[Long]]
    val eventPos = scala.collection.mutable.ArrayBuffer
      .empty[(EpochManifest.Entry, String, Array[Long], Long)]
    windowJournals.sortBy(_.epoch).foreach { j =>
      EpochStoreDv.load(spark, root, Seq(j)).toSeq
        .sortBy { case ((d, r), _) => (d, r) }
        .foreach { case ((tdir, trel), ps) =>
          byDirAll.get(tdir) match {
            case None => throw new IllegalStateException(
              s"epochstore stream over $root: journal ${j.dir} targets " +
                s"entry $tdir which left the manifest — its delete " +
                "events are not reconstructible; re-seed the consumer " +
                "from a full snapshot")
            case Some(t) if t.minEpoch > s =>
              nettedPos.getOrElseUpdate((tdir, trel),
                scala.collection.mutable.ArrayBuffer.empty[Long]) ++= ps
            case Some(t) => eventPos += ((t, trel, ps, j.epoch))
          }
        }
    }
    // pre-window targets: one unfiltered listing per target entry (a
    // changefeed must deliver every delete — no skipping tiers, no
    // partition pruning), keyed by the same rel the journal records
    val eventFiles: Seq[(EpochStore.ListedFile, Array[Long])] =
      eventPos.groupBy(_._1.dir).toSeq.sortBy(_._1).flatMap {
        case (_, evs) =>
          val t = evs.head._1
          val (tFiles, _, _) = EpochStore.listEntryFiles(spark, root,
            Seq(t), partFields, Array.empty, bucket = bucket,
            transform = transform, layoutOf = template.layoutResolver)
          val byRel = tFiles.map(f =>
            EpochStore.relOf(fs, root, f) -> f).toMap
          evs.toSeq.map { case (_, trel, ps, jEpoch) =>
            val lf = byRel.getOrElse(trel, throw new IllegalStateException(
              s"epochstore stream over $root: journal positions target " +
                s"${t.dir}/$trel which no longer exists — the delete " +
                "events are not reconstructible"))
            (lf.copy(epoch = jEpoch, isDelete = true), ps)
          }
      }
    val netted: Map[(String, String), Array[Long]] = nettedPos.map {
      case (k, b) => k -> b.toArray.distinct.sorted
    }.toMap
    val (nettedFiles, plainFiles) =
      if (netted.isEmpty) (Nil, withDeletes)
      else withDeletes.partition(f =>
        netted.contains((f.entryDir, EpochStore.relOf(fs, root, f))))
    template.packFilesDv(spark, plainFiles,
      nettedFiles.map(f =>
        f -> netted((f.entryDir, EpochStore.relOf(fs, root, f)))),
      eventFiles)
  }

  /** Whether the LAST-planned batch carries window journals — decides
    * the trigger's reader factory below. planInputPartitions runs
    * before createReaderFactory inside each trigger's physical plan;
    * micro-batches execute serially, so the handshake is race-free. A
    * clean trigger keeps the plain (columnar) factory even on a store
    * with DV history. */
  @volatile private var lastBatchDv: Boolean = false

  override def createReaderFactory(): PartitionReaderFactory =
    if (lastBatchDv) template.streamingReaderFactory()
    else template.createReaderFactory()

  override def deserializeOffset(json: String): Offset =
    EpochStreamOffset(json.split("\"epoch\":")(1)
      .takeWhile(c => c.isDigit || c == '-').toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
