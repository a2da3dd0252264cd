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

  test("R5 relationMembers: typed resolution over a mixed PBF fixture " +
    "(way ref only matches a way, relation members resolve against " +
    "relations, unresolved members counted)") {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val p = new java.io.File(dir, "relmembers.osm.pbf").getPath
    import PbfWriter._
    val ts = 1488326400000L
    // node 17 and way 42 exist; way 42 also CONTAINS node 17. Member
    // refs: node 17 (hit), way 42 (hit), relation 7 (miss — no such
    // relation), and for rel 901 way 42 again. Crucially there is NO
    // node 42 and NO way 17 — a type-blind join would still resolve
    // them, so the expected counts below pin the type scoping.
    val nodes = Seq(PbfNode(17L, 1000000000L, 2000000000L,
      Seq("amenity" -> "school"), 1, ts, 5L, 9L, "user_9",
      visible = true))
    val ways = Seq(PbfWay(42L, Seq(17L), Seq("highway" -> "primary"),
      1, ts, 6L, 9L, "user_9", visible = true))
    val rels = Seq(
      PbfRelation(900L, Seq(PbfMember(0, 17L, "stop"),
        PbfMember(1, 42L, "path"), PbfMember(2, 7L, "")),
        Seq("type" -> "route"), 1, ts, 7L, 9L, "user_9", visible = true),
      PbfRelation(901L, Seq(PbfMember(1, 42L, "outer"),
        PbfMember(2, 900L, "subarea")),
        Seq("type" -> "multipolygon"), 1, ts, 8L, 9L, "user_9",
        visible = true))
    PbfWriter.write(p, nodes, ways, 4000, rels)
    val shaped = OsmEngine.shape(PbfSource.elements(spark, p))
    val out = OsmEngine
      .relationMembers(PbfSource.relations(spark, p), shaped)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))).toMap
    // rel 900: 3 members, 2 resolved (node 17, way 42; relation 7
    // unresolved), roles sorted with the empty role first
    assert(out("900") === ((3L, 2L, 1L, 1L, 1L, ",path,stop")))
    // rel 901: way 42 resolves; relation member 900 resolves against
    // the RELATIONS frame (super-relation), not the shaped elements
    assert(out("901") === ((2L, 2L, 1L, 0L, 1L, "outer,subarea")))
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
