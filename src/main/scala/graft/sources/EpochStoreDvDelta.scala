package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.core.EpochManifest

/** POSITION-delta merge-on-read row-level operations for IDENTITY-LESS
  * stores (X99 — the Iceberg `_file`/`_pos` position-delta shape):
  * under `spark.graft.deleteVectors.enabled=true`, SQL UPDATE / MERGE /
  * row-level DELETE on a store WITHOUT a declared rowid run
  * merge-on-read instead of the group copy-on-write rewrite. The row
  * identity is the scan-served ROW LINEAGE ([[EpochStore.RowFileColName]]
  * / [[EpochStore.RowPosColName]]): Spark's delta planner hands each
  * matched row back as delete(file, pos) [+ insert(new row) for
  * updates], tasks journal the positions under `_dv/` and write
  * reinserted rows through the store's normal partition/bucket-routing
  * writer, and commit publishes ONE entry carrying both — O(matched
  * rows) write cost, history dirs byte-untouched, exactly the DELETE
  * path's posture ([[EpochStoreDv]]) extended to updates.
  *
  * Isolation: STRICT snapshot — the positions were computed against the
  * pinned entry list, so ANY commit that landed since refuses loudly
  * (an append's rows were never seen by the WHERE/ON; a racing journal
  * or rewrite could interleave non-serializably). The journal composes
  * with prior DV deletes; `CALL compact` applies and sheds everything.
  *
  * Mutually exclusive with a declared row identity by construction
  * (rowid stores route through [[EpochStoreDelta]]'s equality deltas).
  */
final class EpochStoreDvOperationBuilder(
    tableSchema: StructType,
    tableOptions: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new EpochStoreDvOperation(tableSchema, tableOptions, info.command())
}

final class EpochStoreDvOperation(
    tableSchema: StructType,
    tableOptions: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  require(tableOptions.get("asOfGeneration") == null,
    "cannot UPDATE/MERGE/DELETE a time-traveled epochstore table — " +
      "drop VERSION/TIMESTAMP AS OF")
  require(tableOptions.get("branch") == null,
    "cannot UPDATE/MERGE/DELETE a branch-pinned epochstore table — " +
      "branches take epoch appends; publish, then mutate main")

  private[sources] val root: String = EpochStore.rootOf(tableOptions)
  private[sources] val partCols: Seq[String] =
    EpochStore.partColsOf(tableOptions)
  private[sources] val bucketSpec: Option[EpochStore.StoreBucket] =
    EpochStore.bucketOf(tableOptions)

  require(EpochStoreDelta.declared(SparkSession.active, root).isEmpty,
    s"position-delta operation on $root: the store declares a row " +
      "identity — UPDATE/MERGE route through equality deltas there")

  private[sources] def declaredSchema: StructType = tableSchema

  private[sources] val pinned: Seq[EpochManifest.Entry] = {
    val spark = SparkSession.active
    require(EpochManifest.generations(spark, root).nonEmpty,
      s"no committed manifest under $root")
    EpochManifest.entries(spark, root)
  }

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"epochstore position-delta $cmd ($root)"

  /** The POSITION identity: the scan-served row lineage. */
  override def rowId()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(
      org.apache.spark.sql.connector.expressions.Expressions
        .column(EpochStore.RowFileColName),
      org.apache.spark.sql.connector.expressions.Expressions
        .column(EpochStore.RowPosColName))

  /** Updates land as delete(position) + insert(new row) — the new row
    * may move partition/bucket dirs freely. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array.empty

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder =
    new EpochStoreScanBuilder(tableSchema, tableOptions)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    val op = this
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new EpochStoreDvBatchWrite(op, info.schema(),
            info.rowIdSchema().orElseThrow(() =>
              new IllegalStateException("position-delta write without " +
                "a rowId schema")))
      }
    }
  }
}

/** The position-delta write: tasks journal deleted positions under
  * `_dv/` and write reinserted rows through the store's normal writer;
  * commit publishes ONE entry holding both, refusing on ANY racing
  * commit (strict snapshot — positions bind the pinned files). */
final class EpochStoreDvBatchWrite(op: EpochStoreDvOperation,
                                   schema: StructType,
                                   idSchema: StructType)
    extends DeltaBatchWrite {

  private val epoch: Long =
    op.pinned.map(_.epoch).maxOption.getOrElse(-1L) + 1L

  private val dir: String =
    EpochManifest.newDataDir(SparkSession.active, op.root, epoch)

  /** rowId slot order as Spark delivers it (resolved by name — the
    * planner may reorder). */
  private val fileIdx = idSchema.fieldNames.indexOf(EpochStore.RowFileColName)
  private val posIdx = idSchema.fieldNames.indexOf(EpochStore.RowPosColName)
  require(fileIdx >= 0 && posIdx >= 0,
    s"position-delta rowId schema must carry " +
      s"${EpochStore.RowFileColName} and ${EpochStore.RowPosColName}, " +
      s"got ${idSchema.fieldNames.mkString(", ")}")

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory = {
    val spark = SparkSession.active
    new EpochStoreDvDeltaWriterFactory(s"${op.root}/$dir", schema,
      op.partCols,
      EpochStoreBatchWrite.primedConf(spark, schema, op.partCols),
      EpochStoreBatchWrite.primedConf(spark, EpochStoreDv.dvSchema, Nil),
      fileIdx, posIdx, op.bucketSpec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new Path(op.root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    val deltas = messages.collect { case m: EpochDeltaWritten => m }
    val claims: Array[WriterCommitMessage] = deltas.map(m =>
      m.data.copy(files = m.data.files ++ m.delRels): WriterCommitMessage)
    EpochStoreWrite.pruneToCommitted(fs, new Path(s"${op.root}/$dir"),
      claims)
    if (!fs.exists(new Path(s"${op.root}/$dir")))
      fs.mkdirs(new Path(s"${op.root}/$dir")): Unit
    // quality gate: reinserted rows must satisfy declared CHECKs
    EpochStoreConstraints.enforce(spark, op.root, s"${op.root}/$dir",
      op.declaredSchema)
    EpochStoreStats.write(fs, op.root, dir,
      deltas.flatMap(_.data.fileStats))
    EpochStoreWrite.writeSchemaSidecar(fs, op.root, dir, op.declaredSchema,
      op.partCols, op.bucketSpec)
    val dvNames = EpochStoreDv.dvFiles(fs, op.root, dir)
      .map(_.getName).sorted
    if (dvNames.nonEmpty) EpochStoreDv.publishMarker(spark, op.root)
    // STRICT snapshot commit: the journal's positions bind the PINNED
    // files — a racing append's rows were never matched (the serial
    // order would have), a racing journal could interleave
    // non-serializably, a rewrite moves targets. All refuse.
    EpochManifest.commitIfUnchanged(spark, op.root, op.pinned,
      op.pinned :+ EpochManifest.Entry(epoch, dir, dv = dvNames))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new Path(op.root)
      .getFileSystem(GraftBridge.sessionHadoopConf(spark))
    fs.delete(new Path(s"${op.root}/$dir"), true): Unit
  }
}

final class EpochStoreDvDeltaWriterFactory(
    dirPath: String, schema: StructType, partCols: Seq[String],
    dataBc: Broadcast[SerializableConfiguration],
    dvBc: Broadcast[SerializableConfiguration],
    fileIdx: Int, posIdx: Int,
    bucketSpec: Option[EpochStore.StoreBucket])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] =
    new EpochStoreDvDeltaWriter(dirPath, schema, partCols, dataBc, dvBc,
      fileIdx, posIdx, bucketSpec, partitionId, taskId)
}

/** Task-side position-delta writer: inserts delegate to the store's
  * normal [[EpochStoreDataWriter]]; deletes split the row-lineage file
  * path (`<entryDir>/<rel>`) at its FIRST segment and append a
  * `(target_dir, target_rel, pos)` row to this task's `_dv` parquet —
  * exactly the journal shape [[EpochStoreDv.load]] reads back. */
final class EpochStoreDvDeltaWriter(
    dirPath: String, schema: StructType, partCols: Seq[String],
    dataBc: Broadcast[SerializableConfiguration],
    dvBc: Broadcast[SerializableConfiguration],
    fileIdx: Int, posIdx: Int,
    bucketSpec: Option[EpochStore.StoreBucket],
    partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private var inner: EpochStoreDataWriter = null
  private def dataWriter: EpochStoreDataWriter = {
    if (inner == null)
      inner = new EpochStoreDataWriter(dirPath, schema, partCols,
        dataBc, partitionId, taskId, None, Nil, bucketSpec)
    inner
  }

  private val delRel =
    s"${EpochStoreDv.DvDirName}/del-p$partitionId-t$taskId.parquet"
  private var dels = 0L
  private var delWriter: (InternalRow => Unit, () => Unit) = null
  private def journal: InternalRow => Unit = {
    if (delWriter == null) {
      val p = new Path(s"$dirPath/$delRel")
      val fs = p.getFileSystem(dvBc.value.value)
      fs.mkdirs(p.getParent)
      val ctx = new TaskAttemptContextImpl(dvBc.value.value,
        new TaskAttemptID(new TaskID(new JobID("graft-epochstore-dvd", 0),
          TaskType.MAP, partitionId), taskId.toInt & Int.MaxValue))
      delWriter = GraftBridge.parquetRowWriter(p.toString, ctx)
    }
    delWriter._1
  }

  override def insert(row: InternalRow): Unit = dataWriter.write(row)

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val lineage = id.getUTF8String(fileIdx).toString
    val slash = lineage.indexOf('/')
    require(slash > 0,
      s"position-delta rowId carries a non-lineage file path: $lineage")
    val out = new GenericInternalRow(3)
    out.update(0, UTF8String.fromString(lineage.substring(0, slash)))
    out.update(1, UTF8String.fromString(lineage.substring(slash + 1)))
    out.update(2, id.getLong(posIdx))
    journal(out)
    dels += 1
  }

  /** Not reached with representUpdateAsDeleteAndInsert = true. */
  override def update(metadata: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (delWriter != null) delWriter._2()
    val data =
      if (inner == null) EpochFilesWritten(Nil, 0L)
      else inner.commit().asInstanceOf[EpochFilesWritten]
    EpochDeltaWritten(data, if (dels > 0) Seq(delRel) else Nil, dels)
  }

  override def abort(): Unit = {
    if (delWriter != null) delWriter._2()
    if (inner != null) inner.abort()
  }

  override def close(): Unit = if (inner != null) inner.close()
}
