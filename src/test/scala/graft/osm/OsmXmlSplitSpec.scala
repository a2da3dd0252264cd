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

  test("XML entity unescape matches the builtin parser's semantics") {
    assert(OsmXmlSplit.unescape(
      "a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; &#65;") ===
      "a & b <c> \"d\" 'e' A")
    assert(OsmXmlSplit.unescape("&amp;lt;") === "&lt;")
    assert(OsmXmlSplit.unescape("plain") === "plain")
  }
}
