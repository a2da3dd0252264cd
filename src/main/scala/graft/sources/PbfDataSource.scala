package graft.sources

import java.util

import graft.osm.pbf.PbfSource
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** OSM PBF as a first-class DataSource V2 table:
  * `spark.read.format("graft.sources.PbfDataSource").load(path)` (or
  * the `osmpbf` short name when registered). The connector surface the
  * function-style reader ([[PbfSource.elements]]) lacks:
  *
  *  - **Planning integration.** `planInputPartitions` exposes the
  *    metadata-only blob index to Spark's scheduler, bin-packed into
  *    file-source-sized splits (the FilePartition formula:
  *    min(maxPartitionBytes, max(openCost, total/parallelism))) — so
  *    locality, task retry, and speculative execution work like any
  *    file source without one task per 8 MB blob, and the scan appears
  *    as `BatchScan` with its own row-count metrics in the SQL UI.
  *  - **Column pruning.** `SupportsPushDownRequiredColumns` receives
  *    the query's required schema; each task projects decoded rows to
  *    those fields BEFORE they enter the columnar pipeline — a
  *    `select(_id)` over a planet file never materializes tag arrays
  *    into Tungsten rows (the decode itself still parses the blob —
  *    the format is not columnar — so pruning saves row width, not
  *    parse time).
  *
  * At 100 TB the planner sees total/maxSplitBytes independent
  * partitions; a bigger file is a longer partition list, identical
  * code.
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

  /** Blob ranges bin-packed into file-source-sized splits. One task
    * per blob was the round-8 DSv2 penalty's larger half: a ~100 MB
    * extract has hundreds of blobs, and per-task scheduling overhead
    * dwarfed the decode. The split size follows Spark's own
    * FilePartition maxSplitBytes formula so a planet file still fans
    * out to thousands of partitions while a test extract packs into
    * the session's parallelism. */
  override def planInputPartitions(): Array[InputPartition] = {
    val ranges = PbfSource.blobIndex(path).filter(_.blobType == "OSMData")
    val conf = SparkSession.active.sessionState.conf
    val maxPartitionBytes = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val parallelism = SparkSession.active.sparkContext.defaultParallelism
    val totalBytes = ranges.map(_.length.toLong + openCost).sum
    val maxSplit = math.min(maxPartitionBytes,
      math.max(openCost, totalBytes / math.max(parallelism, 1)))
    val parts = Array.newBuilder[InputPartition]
    var cur = List.empty[PbfSource.BlobRange]
    var curBytes = 0L
    ranges.foreach { br =>
      if (cur.nonEmpty && curBytes + br.length + openCost > maxSplit) {
        parts += PbfInputPartition(path,
          cur.reverse.map(r => (r.offset, r.length)).toArray)
        cur = Nil
        curBytes = 0L
      }
      cur ::= br
      curBytes += br.length.toLong + openCost
    }
    if (cur.nonEmpty)
      parts += PbfInputPartition(path,
        cur.reverse.map(r => (r.offset, r.length)).toArray)
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PbfReaderFactory(required)
  override def description(): String = s"osmpbf $path (${required.size} cols)"
}

final case class PbfInputPartition(path: String,
                                   ranges: Array[(Long, Int)])
    extends InputPartition

final class PbfReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ip = p.asInstanceOf[PbfInputPartition]
    new PartitionReader[InternalRow] {
      private val fieldIdx =
        required.fieldNames.map(PbfSource.elementSchema.fieldIndex)
      private val convs: Array[Any => Any] =
        required.fields.map(f => PbfReaderFactory.converter(f.dataType))
      // flatten through ONE codegen'd projection into a reused
      // UnsafeRow buffer (the parquet-reader convention); the old
      // per-row Row.fromSeq + reflective CatalystTypeConverters pass
      // was the other half of the round-8 9.5x penalty
      private val buf = new Array[Any](fieldIdx.length)
      private val generic = new GenericInternalRow(buf)
      private val proj = UnsafeProjection.create(required)
      private val rows: Iterator[Row] = ip.ranges.iterator.flatMap {
        case (off, len) => PbfSource.decodeRange(ip.path, off, len)
      }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val r = rows.next()
        var i = 0
        while (i < buf.length) {
          buf(i) = convs(i)(r.get(fieldIdx(i)))
          i += 1
        }
        current = proj(generic)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

object PbfReaderFactory {
  /** Direct-to-catalyst converter specialized at reader construction
    * for the PBF schema's types (strings + arrays of string structs) —
    * no per-row reflective dispatch, no intermediate external Row. */
  private def converter(dt: DataType): Any => Any = dt match {
    case StringType =>
      v => if (v == null) null
        else UTF8String.fromString(v.asInstanceOf[String])
    case ArrayType(st: StructType, _) =>
      val fcs = st.fields.map(f => converter(f.dataType))
      v => if (v == null) null
      else {
        val rs = v.asInstanceOf[Seq[Row]]
        val out = new Array[Any](rs.length)
        var i = 0
        rs.foreach { row =>
          val cells = new Array[Any](fcs.length)
          var j = 0
          while (j < fcs.length) { cells(j) = fcs(j)(row.get(j)); j += 1 }
          out(i) = new GenericInternalRow(cells)
          i += 1
        }
        new GenericArrayData(out)
      }
    case other => // not reached by the PBF schema; correctness fallback
      val c = CatalystTypeConverters.createToCatalystConverter(other)
      v => c(v)
  }
}
