package graft.sources

import java.util

import graft.osm.pbf.PbfSource
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** OSM PBF as a first-class DataSource V2 table:
  * `spark.read.format("graft.sources.PbfDataSource").load(path)` (or
  * the `osmpbf` short name when registered). The connector surface the
  * function-style reader ([[PbfSource.elements]]) lacks:
  *
  *  - **Planning integration.** `planInputPartitions` exposes the
  *    metadata-only blob index to Spark's scheduler — one
  *    InputPartition per blob, so locality, task retry, and speculative
  *    execution work like any file source, and the scan appears as
  *    `BatchScan` with its own row-count metrics in the SQL UI.
  *  - **Column pruning.** `SupportsPushDownRequiredColumns` receives
  *    the query's required schema; each task projects decoded rows to
  *    those fields BEFORE they enter the columnar pipeline — a
  *    `select(_id)` over a planet file never materializes tag arrays
  *    into Tungsten rows (the decode itself still parses the blob —
  *    the format is not columnar — so pruning saves row width, not
  *    parse time).
  *
  * At 100 TB the planner sees N_blobs independent partitions; a bigger
  * file is a longer partition list, identical code.
  */
class PbfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmpbf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PbfSource.elementSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PbfTable(properties.get("path"))
}

final class PbfTable(path: String) extends Table with SupportsRead {
  require(path != null, "osmpbf requires .load(path)")
  override def name(): String = s"osmpbf($path)"
  override def schema(): StructType = PbfSource.elementSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PbfScanBuilder(path)
}

final class PbfScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PbfSource.elementSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark passes the pruned subset of our schema (possibly empty for
    // bare counts — zero-width rows are valid)
    required = requiredSchema
  override def build(): Scan = new PbfScan(path, required)
}

final class PbfScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    PbfSource.blobIndex(path).filter(_.blobType == "OSMData")
      .map(br => PbfInputPartition(path, br.offset, br.length): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PbfReaderFactory(required)
  override def description(): String = s"osmpbf $path (${required.size} cols)"
}

final case class PbfInputPartition(path: String, offset: Long, length: Int)
    extends InputPartition

final class PbfReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ip = p.asInstanceOf[PbfInputPartition]
    new PartitionReader[InternalRow] {
      private val fieldIdx =
        required.fieldNames.map(PbfSource.elementSchema.fieldIndex)
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(required)
      private val rows =
        PbfSource.decodeRange(ip.path, ip.offset, ip.length).iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val r = rows.next()
        val pruned = org.apache.spark.sql.Row.fromSeq(
          fieldIdx.toIndexedSeq.map(r.get))
        current = toCatalyst(pruned).asInstanceOf[InternalRow]
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
