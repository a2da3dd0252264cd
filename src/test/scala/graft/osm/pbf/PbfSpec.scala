package graft.osm.pbf

import java.math.BigDecimal
import java.time.Instant

import graft.SparkSpec
import graft.osm.{OsmEngine, OsmSynth}
import org.apache.spark.sql.Row

/** PBF ↔ XML equivalence: the same synthetic extract, written as a
  * spec-conformant PBF (DenseNodes + DenseInfo, delta/zigzag coding,
  * string tables, zlib blobs), must shape into EXACTLY the rows the XML
  * path produces — proving the whole decode chain (framing index,
  * inflate, varint/delta integration, string-table resolution,
  * coordinate/timestamp formatting) end to end.
  */
class PbfSpec extends SparkSpec {

  private lazy val xmlPath: String = {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val f = new java.io.File(dir, "pbf_roundtrip.osm")
    if (!f.exists()) OsmSynth.generate(f.getPath, 3000, 300)
    f.getPath
  }

  private def tagsOf(r: Row): Seq[(String, String)] = {
    val t = r.getAs[collection.Seq[Row]]("tag")
    if (t == null) Seq.empty
    else t.map(x => (x.getAs[String]("_k"), x.getAs[String]("_v"))).toSeq
  }

  private def refsOf(r: Row): Seq[Long] = {
    val n = r.getAs[collection.Seq[Row]]("nd")
    if (n == null) Seq.empty
    else n.map(_.getAs[String]("_ref").toLong).toSeq
  }

  test("PBF round-trip: shaped output identical to the XML path") {
    val xmlElems = OsmEngine.elements(spark, xmlPath)
    val rows = xmlElems.collect()

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
        refs = refsOf(r),
        tags = tagsOf(r),
        version = r.getAs[String]("_version").toInt,
        tsMillis = Instant.parse(r.getAs[String]("_timestamp")).toEpochMilli,
        changeset = r.getAs[String]("_changeset").toLong,
        uid = r.getAs[String]("_uid").toLong,
        user = r.getAs[String]("_user"),
        visible = r.getAs[String]("_visible").toBoolean)
    }.toSeq
    assert(nodes.size === 3000 && ways.size === 300)

    val pbfPath = xmlPath + ".pbf"
    PbfWriter.write(pbfPath, nodes, ways, perBlob = 1000)

    // metadata-only index: 1 header + 3 node blobs + 1 way blob
    val idx = PbfSource.blobIndex(pbfPath)
    assert(idx.count(_.blobType == "OSMHeader") === 1)
    assert(idx.count(_.blobType == "OSMData") === 4)

    val pbfElems = PbfSource.elements(spark, pbfPath)
    val a = OsmEngine.shape(xmlElems).toJSON.collect().sorted
    val b = OsmEngine.shape(pbfElems).toJSON.collect().sorted
    assert(a.length === b.length)
    assert(a.sameElements(b))
  }

  test("OsmSynth.generatePbf mirrors generate(): identical shaped rows") {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val synthPbf = new java.io.File(dir, "synth_direct.osm.pbf").getPath
    OsmSynth.generatePbf(synthPbf, 3000, 300)
    val a = OsmEngine.shape(OsmEngine.elements(spark, xmlPath))
      .toJSON.collect().sorted
    val b = OsmEngine.shape(PbfSource.elements(spark, synthPbf))
      .toJSON.collect().sorted
    assert(a.length === b.length)
    assert(a.sameElements(b))
  }

  test("PBF relations decode: members, roles, delta refs") {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val p = new java.io.File(dir, "rels.osm.pbf").getPath
    import PbfWriter._
    val ts = 1488326400000L // 2017-03-01T00:00:00Z
    val rels = Seq(
      PbfRelation(900L, Seq(PbfMember(0, 17L, "stop"),
        PbfMember(1, 42L, "path"), PbfMember(2, 7L, "")),
        Seq("type" -> "route", "route" -> "bus"), 2, ts, 55L, 9L,
        "user_9", visible = true),
      PbfRelation(901L, Seq(PbfMember(1, 42L, "outer")),
        Seq("type" -> "multipolygon"), 1, ts, 56L, 9L, "user_9",
        visible = true))
    PbfWriter.write(p, Seq.empty, Seq.empty, 4000, rels)
    val rows = PbfSource.relations(spark, p).collect().sortBy(_.getString(0))
    assert(rows.length === 2)
    val r0 = rows.head
    assert(r0.getString(0) === "900")
    assert(r0.getAs[String]("_timestamp") === "2017-03-01T00:00:00Z")
    val members = r0.getAs[collection.Seq[Row]]("member")
      .map(m => (m.getString(0), m.getString(1), m.getString(2))).toSeq
    assert(members ===
      Seq(("node", "17", "stop"), ("way", "42", "path"), ("relation", "7", "")))
    // the node/way reader ignores relation-only files
    assert(PbfSource.elements(spark, p).count() === 0)
  }

  test("PBF audits: A4 user counts match the XML path") {
    val pbfElems = PbfSource.elements(spark, xmlPath + ".pbf")
    val xmlCounts = OsmEngine.auditUsers(OsmEngine.elements(spark, xmlPath))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pbfCounts = OsmEngine.auditUsers(pbfElems)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pbfCounts === xmlCounts)
  }
}
