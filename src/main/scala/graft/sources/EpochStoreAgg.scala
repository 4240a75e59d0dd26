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
    fullSchema: StructType, partCol: Option[String],
    root: String, generation: Long, entries: Seq[EpochManifest.Entry],
    partFilters: Array[Filter], aggregation: Aggregation,
    aggSchema: StructType)
    extends Scan with Batch {

  private val partField: Option[StructField] =
    partCol.flatMap(c => fullSchema.fields.find(_.name == c))

  private val dataSchema: StructType =
    StructType(fullSchema.filterNot(f => partCol.contains(f.name)))

  /** Grouping carries the partition column into the output; an ungrouped
    * aggregation reads no partition values at all. */
  private val groupSchema: StructType =
    if (aggregation.groupByExpressions.isEmpty) new StructType()
    else StructType(partField.toSeq)

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

  private lazy val listing =
    EpochStore.listEntryFiles(SparkSession.active, root, entries,
      partField, partFilters)

  def selectedPartitionDirs: (Int, Int) = (listing._2, listing._3)

  override def planInputPartitions(): Array[InputPartition] = {
    val files = listing._1
    if (files.isEmpty) {
      if (aggregation.groupByExpressions.isEmpty)
        Array(EpochAggPartition(null, 0L, null)) // the zero row
      else Array.empty // zero files → zero groups
    } else files.map(lf =>
      EpochAggPartition(lf.status.getPath.toString, lf.status.getLen, lf.value)
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new EpochAggReaderFactory(
      GraftBridge.broadcastHadoopConf(spark,
        GraftBridge.sessionHadoopConf(spark)),
      dataSchema, groupSchema, aggregation, aggSchema)
  }
}

/** One footer to fold; `filePath == null` is the empty-store zero row. */
final case class EpochAggPartition(filePath: String, fileLen: Long,
                                   partValue: Any) extends InputPartition

final class EpochAggReaderFactory(
    bc: Broadcast[SerializableConfiguration], dataSchema: StructType,
    groupSchema: StructType, aggregation: Aggregation,
    aggSchema: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
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
              Array[Any](EpochStore.toCatalyst(part.partValue)))
          GraftBridge.aggRowFromFooter(footer, part.filePath, dataSchema,
            groupSchema, aggregation, aggSchema, pv)
        }

      override def next(): Boolean = if (emitted) false else {
        emitted = true; true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
