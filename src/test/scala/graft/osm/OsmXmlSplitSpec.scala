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
    val a = OsmEngine.shape(OsmEngine.elements(spark, path))
      .toJSON.collect().sorted
    val b = OsmEngine.shape(split).toJSON.collect().sorted
    assert(a.length === b.length)
    assert(a.sameElements(b))
  }

  test("XML entity unescape matches the builtin parser's semantics") {
    assert(OsmXmlSplit.unescape(
      "a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; &#65;") ===
      "a & b <c> \"d\" 'e' A")
    assert(OsmXmlSplit.unescape("&amp;lt;") === "&lt;")
    assert(OsmXmlSplit.unescape("plain") === "plain")
  }
}
