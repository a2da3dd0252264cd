package graft.osm

import java.io.{BufferedWriter, FileWriter}

/** Deterministic synthetic OSM XML generator, sized to mirror the
  * reference's real workload: a ~106 MB Kolkata extract with 227
  * contributors, ~507k nodes and ~60k ways (reference README.md:118-138).
  * Every distribution is a simple modular rule, so tests and benches can
  * predict EXACT query results (top-k shop counts, user counts, tag
  * censuses) for any requested size.
  *
  * The writer emits one XML line per element/child — the layout the A1
  * text-scan census assumes and real planet dumps follow.
  */
object OsmSynth {

  /** Fixed contributor pool — 227, the reference extract's user count. */
  val Users = 227
  val Shops: Vector[String] = Vector("bakery", "books", "clothes",
    "convenience", "electronics", "furniture", "greengrocer", "hardware",
    "jewelry", "mobile_phone", "shoes", "supermarket")
  val Highways: Vector[String] = Vector("living_street", "motorway", "path",
    "primary", "residential", "secondary", "service", "tertiary",
    "unclassified")
  val Suffixes: Vector[String] = Vector("Road", "Street", "Sarani", "Avenue",
    "rd", "st", "Raod")
  val Cities: Vector[String] = Vector("Kolkata", "kolkata", "saltlake",
    "Howrah")

  // modular tag rules (shared with the expected-count helpers below)
  private def hasShop(i: Int) = i % 10 == 0
  private def hasAddr(i: Int) = i % 10 == 3
  private def hasPost(i: Int) = i % 100 == 7
  private def ndLess(j: Int) = j % 50 == 0

  /** Writes nNodes nodes + nWays ways (~170 bytes/element). */
  def generate(path: String, nNodes: Int, nWays: Int): String = {
    val w = new BufferedWriter(new FileWriter(path), 1 << 20)
    w.write("<?xml version='1.0' encoding='UTF-8'?>\n")
    w.write("<osm version=\"0.6\" generator=\"graft-synth\">\n")
    var i = 1
    while (i <= nNodes) {
      val open = s"""  <node id="$i" visible="true" version="${i % 5 + 1}" """ +
        s"""changeset="${i % 1000}" timestamp="2017-0${i % 9 + 1}-01T00:00:00Z" """ +
        s"""user="user_${i % Users}" uid="${i % Users}" """ +
        "lat=\"%.5f\" lon=\"%.5f\"".formatLocal(java.util.Locale.ROOT,
          22.0 + (i % 10000) * 1e-5, 88.0 + (i % 9999) * 1e-5)
      if (!hasShop(i) && !hasAddr(i) && !hasPost(i)) w.write(open + "/>\n")
      else {
        w.write(open + ">\n")
        if (hasShop(i))
          w.write(s"""    <tag k="shop" v="${Shops((i / 10) % Shops.length)}"/>\n""")
        if (hasAddr(i)) {
          w.write(s"""    <tag k="addr:street" v="${i % 50} Example ${Suffixes((i / 10) % Suffixes.length)}"/>\n""")
          w.write(s"""    <tag k="addr:city" v="${Cities((i / 10) % Cities.length)}"/>\n""")
        }
        if (hasPost(i))
          w.write(s"""    <tag k="addr:postcode" v="${700000 + i % 100}"/>\n""")
        w.write("  </node>\n")
      }
      i += 1
    }
    var j = 1
    while (j <= nWays) {
      w.write(s"""  <way id="${nNodes + j}" visible="true" version="${j % 3 + 1}" """ +
        s"""changeset="${j % 1000}" timestamp="2017-0${j % 9 + 1}-02T00:00:00Z" """ +
        s"""user="user_${j % Users}" uid="${j % Users}">\n""")
      if (!ndLess(j)) { // 1 way in 50 has no <nd> children (null node_refs)
        var k = 0
        while (k < 4) {
          w.write(s"""    <nd ref="${(j * 7 + k) % nNodes + 1}"/>\n""")
          k += 1
        }
      }
      w.write(s"""    <tag k="highway" v="${Highways(j % Highways.length)}"/>\n""")
      w.write("  </way>\n")
      j += 1
    }
    w.write("</osm>\n")
    w.close()
    path
  }

  /** The SAME synthetic extract as [[generate]], written as PBF via
    * graft.osm.pbf.PbfWriter — integer nanodegree/epoch arithmetic
    * mirrors the XML string formatting exactly, so the two files decode
    * to identical element rows (asserted in PbfSpec). */
  def generatePbf(path: String, nNodes: Int, nWays: Int): String = {
    import graft.osm.pbf.PbfWriter
    import graft.osm.pbf.PbfWriter.{PbfNode, PbfWay}
    def tsMillis(month: Int, day: Int): Long =
      java.time.Instant.parse(f"2017-$month%02d-$day%02dT00:00:00Z")
        .toEpochMilli
    val nodes = (1 to nNodes).map { i =>
      val tags = Seq.newBuilder[(String, String)]
      if (hasShop(i)) tags += ("shop" -> Shops((i / 10) % Shops.length))
      if (hasAddr(i)) {
        tags += ("addr:street" ->
          s"${i % 50} Example ${Suffixes((i / 10) % Suffixes.length)}")
        tags += ("addr:city" -> Cities((i / 10) % Cities.length))
      }
      if (hasPost(i)) tags += ("addr:postcode" -> s"${700000 + i % 100}")
      PbfNode(id = i,
        // "%.5f" of 22.0 + k·1e-5 is exactly 22.xxxxx ⇒ k·10⁴ nanodeg
        latNano = 22000000000L + (i % 10000) * 10000L,
        lonNano = 88000000000L + (i % 9999) * 10000L,
        tags = tags.result(), version = i % 5 + 1,
        tsMillis = tsMillis(i % 9 + 1, 1), changeset = i % 1000,
        uid = i % Users, user = s"user_${i % Users}", visible = true)
    }
    val ways = (1 to nWays).map { j =>
      PbfWay(id = nNodes + j,
        refs = if (ndLess(j)) Seq.empty
               else (0 until 4).map(k => ((j * 7 + k) % nNodes + 1).toLong),
        tags = Seq("highway" -> Highways(j % Highways.length)),
        version = j % 3 + 1, tsMillis = tsMillis(j % 9 + 1, 2),
        changeset = j % 1000, uid = j % Users, user = s"user_${j % Users}",
        visible = true)
    }
    PbfWriter.write(path, nodes, ways)
    path
  }

  // ---- exact expected values, derived from the same modular rules ----

  /** count of m in [1, max] with m % mod == rem */
  private def modCount(max: Int, mod: Int, rem: Int): Int =
    (0 to max).count(m => m > 0 && m % mod == rem) // small mod, exact

  def expectedShopCounts(nNodes: Int): Map[String, Long] = {
    val m = nNodes / 10 // shop nodes are i = 10·m, shop index m % |Shops|
    Shops.zipWithIndex.map { case (s, idx) =>
      s -> modCount(m, Shops.length, idx).toLong
    }.toMap
  }

  def expectedHighwayCounts(nWays: Int): Map[String, Long] =
    Highways.zipWithIndex.map { case (h, idx) =>
      h -> modCount(nWays, Highways.length, idx).toLong
    }.toMap

  def expectedTagCensus(nNodes: Int, nWays: Int): Map[String, Long] = {
    val shopTags = nNodes / 10
    val addrTags = 2L * (1 to nNodes).count(hasAddr)
    val postTags = (1 to nNodes).count(hasPost)
    val ndLines = 4L * (nWays - nWays / 50)
    Map(
      "osm" -> 1L,
      "node" -> nNodes.toLong,
      "way" -> nWays.toLong,
      "nd" -> ndLines,
      "tag" -> (shopTags + addrTags + postTags + nWays))
  }

  def expectedNdLessWays(nWays: Int): Long = (nWays / 50).toLong
}
