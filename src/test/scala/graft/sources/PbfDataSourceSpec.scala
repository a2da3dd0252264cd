package graft.sources

import java.math.BigDecimal
import java.time.Instant

import graft.SparkSpec
import graft.osm.{OsmEngine, OsmSynth}
import graft.osm.pbf.{PbfSource, PbfWriter}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The DataSource V2 face of the PBF reader: planning through Spark's
  * connector API, row-identical to the RDD-path reader, with column
  * pruning visible in the scan.
  */
class PbfDataSourceSpec extends SparkSpec {

  private lazy val pbfPath: String = {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val xml = new java.io.File(dir, "dsv2_fixture.osm")
    if (!xml.exists()) OsmSynth.generate(xml.getPath, 1200, 120)
    val pbf = new java.io.File(dir, "dsv2_fixture.osm.pbf")
    if (!pbf.exists()) {
      val rows = OsmEngine.elements(spark, xml.getPath).collect()
      def tagsOf(r: Row) = Option(r.getAs[collection.Seq[Row]]("tag"))
        .map(_.map(x => (x.getAs[String]("_k"), x.getAs[String]("_v"))).toSeq)
        .getOrElse(Seq.empty)
      val nodes = rows.filter(_.getAs[String]("type") == "node").map { r =>
        PbfWriter.PbfNode(
          id = r.getAs[String]("_id").toLong,
          latNano = new BigDecimal(r.getAs[String]("_lat"))
            .movePointRight(9).longValueExact(),
          lonNano = new BigDecimal(r.getAs[String]("_lon"))
            .movePointRight(9).longValueExact(),
          tags = tagsOf(r),
          version = r.getAs[String]("_version").toInt,
          tsMillis = Instant.parse(r.getAs[String]("_timestamp")).toEpochMilli,
          changeset = r.getAs[String]("_changeset").toLong,
          uid = r.getAs[String]("_uid").toLong,
          user = r.getAs[String]("_user"),
          visible = r.getAs[String]("_visible").toBoolean)
      }.toSeq
      val ways = rows.filter(_.getAs[String]("type") == "way").map { r =>
        PbfWriter.PbfWay(
          id = r.getAs[String]("_id").toLong,
          refs = Option(r.getAs[collection.Seq[Row]]("nd"))
            .map(_.map(_.getAs[String]("_ref").toLong).toSeq).getOrElse(Seq.empty),
          tags = tagsOf(r),
          version = r.getAs[String]("_version").toInt,
          tsMillis = Instant.parse(r.getAs[String]("_timestamp")).toEpochMilli,
          changeset = r.getAs[String]("_changeset").toLong,
          uid = r.getAs[String]("_uid").toLong,
          user = r.getAs[String]("_user"),
          visible = r.getAs[String]("_visible").toBoolean)
      }.toSeq
      PbfWriter.write(pbf.getPath, nodes, ways, perBlob = 400)
    }
    pbf.getPath
  }

  private def readV2 = spark.read
    .format("graft.sources.PbfDataSource").load(pbfPath)

  test("DSv2 scan is row-identical to the RDD-path reader") {
    val v2 = readV2.collect().map(_.toString).sorted.toSeq
    val rdd = PbfSource.elements(spark, pbfPath)
      .collect().map(_.toString).sorted.toSeq
    assert(v2.nonEmpty && v2 === rdd)
  }

  test("blob ranges bin-pack into bounded InputPartitions, BatchScan " +
    "in the plan") {
    val df = readV2
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), s"expected a V2 scan:\n$p")
    val nBlobs = PbfSource.blobIndex(pbfPath).count(_.blobType == "OSMData")
    // the FilePartition-style packing never exceeds one task per blob
    // (tiny blobs are open-cost-dominated) and never collapses to a
    // serial scan when there are multiple blobs to parallelize over
    val nParts = df.rdd.getNumPartitions
    assert(nParts >= 1 && nParts <= nBlobs,
      s"expected 1..$nBlobs partitions, got $nParts")
  }

  test("required-column pushdown prunes the read schema") {
    val df = readV2.select(col("_id"), col("type"))
    assert(df.queryExecution.executedPlan.toString.contains("BatchScan"))
    val counts = df.groupBy(col("type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("node") === 1200 && counts("way") === 120)
    // the scan's declared read schema is the pruned one
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).get
    assert(!scanLine.contains("tag"), s"tag column should be pruned: $scanLine")
  }
}
