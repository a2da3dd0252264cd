package graft.osm

import graft.SparkSpec

/** The range-parallel XML reader must be indistinguishable from the
  * built-in (serial) xml source: same rows, same shaped output. */
class OsmXmlSplitSpec extends SparkSpec {

  private lazy val path: String = {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val f = new java.io.File(dir, "xmlsplit.osm")
    if (!f.exists()) OsmSynth.generate(f.getPath, 3000, 300)
    f.getPath
  }

  test("split ranges land on top-level element starts and tile the file") {
    val ranges = OsmXmlSplit.splitRanges(path, targetSplitBytes = 64 << 10)
    assert(ranges.size >= 4, s"expected several splits, got ${ranges.size}")
    assert(ranges.sliding(2).forall {
      case Seq(a, b) => a._2 == b._1
      case _ => true
    }, "ranges must tile without gaps")
  }

  test("range-parallel parse is row-identical to the builtin xml source") {
    val split = OsmXmlSplit.elements(spark, path, targetSplitBytes = 64 << 10)
    assert(split.rdd.getNumPartitions > 1, "must actually parallelize")
    val a = OsmEngine.shape(OsmEngine.builtinElements(spark, path))
      .toJSON.collect().sorted
    val b = OsmEngine.shape(split).toJSON.collect().sorted
    assert(a.length === b.length)
    assert(a.sameElements(b))
  }

  test("relations are skipped and entities decoded, same as the builtin source") {
    val doc =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6" generator="hand">
        |  <node id="1" visible="true" version="1" changeset="9" timestamp="2017-01-01T00:00:00Z" user="A &amp; B" uid="3" lat="10.5" lon="20.25">
        |    <tag k="name" v="Caf&#233; &quot;X&quot; &lt;east&gt;"/>
        |  </node>
        |  <node id="2" visible="true" version="1" changeset="9" timestamp="2017-01-01T00:00:00Z" user="plain" uid="4" lat="11.0" lon="21.0"/>
        |  <relation id="77" visible="true" version="1" changeset="9" timestamp="2017-01-01T00:00:00Z" user="plain" uid="4">
        |    <member type="node" ref="1" role="stop"/>
        |    <tag k="type" v="route"/>
        |  </relation>
        |  <way id="50" visible="true" version="1" changeset="9" timestamp="2017-01-01T00:00:00Z" user="plain" uid="4">
        |    <nd ref="1"/>
        |    <nd ref="2"/>
        |    <tag k="highway" v="path/steps"/>
        |  </way>
        |  <way id="51" visible="true" version="1" changeset="9" timestamp="2017-01-02T00:00:00Z" user="plain" uid="4">
        |    <tag k="highway" v="road"/>
        |  </way>
        |</osm>
        |""".stripMargin
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val f = new java.io.File(dir, "handmade.osm")
    java.nio.file.Files.writeString(f.toPath, doc)
    val a = OsmEngine.shape(OsmEngine.builtinElements(spark, f.getPath))
      .toJSON.collect().sorted
    val b = OsmEngine.shape(OsmXmlSplit.elements(spark, f.getPath))
      .toJSON.collect().sorted
    assert(a.length === 4, a.mkString("\n")) // 2 nodes + 2 ways, no relation
    assert(a.sameElements(b),
      s"builtin:\n${a.mkString("\n")}\nsplit:\n${b.mkString("\n")}")
  }

  test("XML relations parse in the PBF relationSchema and feed " +
    "relationMembers identically to the PBF path") {
    import org.apache.spark.sql.Row
    val doc =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6" generator="hand">
        |  <node id="17" visible="true" version="1" changeset="9" timestamp="2017-03-01T00:00:00Z" user="user_9" uid="9" lat="1.0" lon="2.0">
        |    <tag k="amenity" v="school"/>
        |  </node>
        |  <way id="42" visible="true" version="1" changeset="9" timestamp="2017-03-01T00:00:00Z" user="user_9" uid="9">
        |    <nd ref="17"/>
        |    <tag k="highway" v="primary"/>
        |  </way>
        |  <relation id="900" visible="true" version="1" changeset="55" timestamp="2017-03-01T00:00:00Z" user="user_9" uid="9">
        |    <member type="node" ref="17" role="stop"/>
        |    <member type="way" ref="42" role="path"/>
        |    <member type="relation" ref="7" role=""/>
        |    <tag k="type" v="route"/>
        |  </relation>
        |  <relation id="901" visible="true" version="1" changeset="56" timestamp="2017-03-01T00:00:00Z" user="user_9" uid="9">
        |    <member type="way" ref="42" role="outer"/>
        |    <member type="relation" ref="900" role="subarea"/>
        |    <tag k="type" v="multipolygon"/>
        |  </relation>
        |</osm>
        |""".stripMargin
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val f = new java.io.File(dir, "handmade_rels.osm")
    java.nio.file.Files.writeString(f.toPath, doc)
    val rels = OsmXmlSplit.relations(spark, f.getPath)
    assert(rels.schema === graft.osm.pbf.PbfSource.relationSchema)
    val r900 = rels.filter("_id = '900'").collect()(0)
    assert(r900.getAs[String]("_user") === "user_9")
    assert(r900.getAs[String]("_timestamp") === "2017-03-01T00:00:00Z")
    assert(r900.getAs[collection.Seq[Row]]("member")
      .map(m => (m.getString(0), m.getString(1), m.getString(2))) ===
      Seq(("node", "17", "stop"), ("way", "42", "path"),
        ("relation", "7", "")))
    // the assembly operator gives the same readout whichever path fed
    // it — XML relations here, the PBF fixture in PbfSpec
    val shaped = OsmEngine.shape(OsmXmlSplit.elements(spark, f.getPath))
    val out = OsmEngine.relationMembers(rels, shaped)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(6))).toMap
    assert(out("900") === ((3L, 2L, ",path,stop")))
    assert(out("901") === ((2L, 2L, "outer,subarea")))
  }

  test("XML entity unescape matches the builtin parser's semantics") {
    assert(OsmXmlSplit.unescape(
      "a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; &#65;") ===
      "a & b <c> \"d\" 'e' A")
    assert(OsmXmlSplit.unescape("&amp;lt;") === "&lt;")
    assert(OsmXmlSplit.unescape("plain") === "plain")
  }
}
