package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.connector.catalog.{
  StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

import graft.core.EpochManifest

/** The staged table behind `CREATE TABLE … AS SELECT` / `REPLACE TABLE
  * … AS SELECT` on the epochstore catalog ([[EpochStoreCatalog]]'s
  * `StagingTableCatalog` face).
  *
  * The whole point of staging is that the FIRST MANIFEST PUBLISH is the
  * commit: the SELECT's rows land in a claimed-but-unreferenced attempt
  * dir (plus sidecars) while the query runs, and only
  * [[commitStagedChanges]] — called by Spark after the write succeeded —
  * publishes the manifest that makes the table exist. A failing SELECT
  * (or a lost commit race) aborts with NOTHING visible: no manifest,
  * no half-table, just an unreferenced dir the next gc ages out (and
  * [[abortStagedChanges]] deletes eagerly).
  *
  * Concurrency is the manifest CAS ([[EpochManifest.commitWith]]):
  *  - CTAS refuses if a table appeared at the root while the query ran
  *    (the `cur.isEmpty` rebase check — exactly-one-creator);
  *  - RTAS pins the snapshot it is replacing and refuses if anything
  *    committed since ([[EpochManifest.commitIfUnchanged]]), the same
  *    posture as overwrite/truncate.
  *
  * The data path is the connector's own writer factory
  * ([[EpochStoreWriterFactory]]) — partition-dir layout, per-file stats
  * accumulation, and task-abort cleanup behave exactly like a sink
  * write, so a CTAS'd table is indistinguishable from one built by
  * epoch appends. */
final class StagedEpochStoreTable(
    root: String, tableSchema: StructType, partCols: Seq[String],
    statsCols: Seq[(String, Char)],
    // None = CREATE (the root must still be table-free at commit);
    // Some(base) = REPLACE (the head must still equal `base` at commit)
    replaceBase: Option[Seq[EpochManifest.Entry]],
    bucketSpec: Option[EpochStore.StoreBucket] = None,
    transformSpec: Option[StoreTransform] = None)
    extends StagedTable with SupportsWrite {

  partCols.foreach(c => require(tableSchema.fieldNames.contains(c),
    s"partition column $c is not in the CTAS schema"))
  statsCols.foreach { case (c, _) =>
    require(tableSchema.fieldNames.contains(c),
      s"stats column $c is not in the CTAS schema")
  }

  override def name(): String = s"epochstore-staged($root)"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE) // RTAS plans a truncate-style write

  /** Set by the batch write's commit; read by [[commitStagedChanges]].
    * Both run on the driver, in order, within one CTAS execution. */
  @volatile private var stagedDir: Option[String] = None

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS arrives as a truncate+append; the truncation IS the
      // replace semantics commitStagedChanges publishes — nothing to do
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new StagedEpochBatchWrite()
      }
    }

  private def spark = SparkSession.active
  private def fs = new Path(root).getFileSystem(
    GraftBridge.sessionHadoopConf(spark))

  private final class StagedEpochBatchWrite extends BatchWrite {
    // epoch 0 for CREATE; above every replaced epoch for REPLACE (so a
    // later readLatest never resurrects replaced history if the old
    // dirs are still gc-retained under a pinned generation)
    private val epoch: Long =
      replaceBase.flatMap(_.map(_.epoch).maxOption).fold(0L)(_ + 1L)
    private val dir: String =
      EpochManifest.newDataDir(spark, root, epoch)

    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DataWriterFactory =
      new EpochStoreWriterFactory(s"$root/$dir", tableSchema, partCols,
        EpochStoreBatchWrite.primedConf(spark, tableSchema, partCols),
        None, statsCols, bucketSpec, transformSpec)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      // everything EXCEPT the manifest publish — that is
      // commitStagedChanges' job, so a failure anywhere up to there
      // leaves no visible table
      EpochStoreWrite.pruneToCommitted(fs, new Path(s"$root/$dir"), messages)
      val files = messages
        .collect { case m: EpochFilesWritten => m.files.size }.sum
      if (files == 0) fs.mkdirs(new Path(s"$root/$dir")): Unit
      EpochStoreStats.write(fs, root, dir,
        messages.collect { case m: EpochFilesWritten => m.fileStats }
          .flatten.toSeq)
      EpochStoreWrite.writeSchemaSidecar(fs, root, dir, tableSchema,
        partCols, bucketSpec, transform = transformSpec)
      stagedEpoch = epoch
      stagedDir = Some(dir)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      fs.delete(new Path(s"$root/$dir"), true): Unit
    }
  }

  @volatile private var stagedEpoch: Long = 0L

  override def commitStagedChanges(): Unit = {
    val dir = stagedDir.getOrElse(throw new IllegalStateException(
      s"commitStagedChanges at $root before the staged write committed"))
    replaceBase match {
      case None =>
        EpochManifest.commitWith(spark, root) { cur =>
          require(cur.isEmpty,
            s"CREATE TABLE AS SELECT: a table appeared at $root while " +
              "the CTAS ran — exactly one creator wins; re-run as " +
              "REPLACE TABLE if the overwrite is intended")
          Seq(EpochManifest.Entry(stagedEpoch, dir))
        }
        ()
      case Some(base) =>
        EpochManifest.commitIfUnchanged(spark, root, base,
          Seq(EpochManifest.Entry(stagedEpoch, dir)))
        ()
    }
  }

  override def abortStagedChanges(): Unit = {
    stagedDir.foreach(d => fs.delete(new Path(s"$root/$d"), true))
    ()
  }
}
