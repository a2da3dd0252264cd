package graft.osm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end run over a generated multi-MB OSM document — the shape of
  * the reference's real 106 MB workload (506,727 nodes / 59,642 ways /
  * 227 users, reference README.md:118-138), scaled down ~4× to keep CI
  * fast. Every asserted number is DERIVED from the generator's modular
  * rules, so this validates the XML source, the shape pipeline, and
  * Q1–Q5 on a document three orders of magnitude larger than the
  * 12-element golden fixture. graft.osm.OsmBench runs the full ~100 MB
  * variant.
  */
class OsmScaleSpec extends SparkSpec {

  private val nNodes = 120000
  private val nWays = 12000

  private lazy val path: String = {
    val dir = new java.io.File("target/tmp")
    dir.mkdirs()
    val f = new java.io.File(dir, s"osm_synth_${nNodes}_$nWays.osm")
    if (!f.exists()) OsmSynth.generate(f.getPath, nNodes, nWays)
    f.getPath
  }

  private lazy val shaped = {
    val s = OsmEngine.shape(OsmEngine.elements(spark, path)).cache()
    s.count() // materialize once for all tests
    s
  }

  test("scale: A1 text-scan census matches the generated element counts") {
    val counts = OsmEngine.auditTags(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === OsmSynth.expectedTagCensus(nNodes, nWays))
  }

  test("scale: shape emits every element; Q2 splits nodes/ways exactly") {
    assert(shaped.count() === (nNodes + nWays).toLong)
    val q2 = OsmEngine.q2TypeCounts(shaped).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q2 === Map("node" -> nNodes.toLong, "way" -> nWays.toLong))
  }

  test("scale: Q1 sees the full 227-user pool") {
    val q1 = OsmEngine.q1UniqueUsers(shaped).collect().head.getLong(0)
    assert(q1 === OsmSynth.Users.toLong)
  }

  test("scale: Q4 top-10 shops match the modular distribution") {
    val got = OsmEngine.q4TopShops(shaped).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val exp = OsmSynth.expectedShopCounts(nNodes).toSeq
      .sortBy { case (s, n) => (-n, s) }.take(10)
    assert(got.toSeq === exp)
  }

  test("scale: Q5 top-10 highways match the modular distribution") {
    val got = OsmEngine.q5TopHighways(shaped).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val exp = OsmSynth.expectedHighwayCounts(nWays).toSeq
      .sortBy { case (h, n) => (-n, h) }.take(10)
    assert(got.toSeq === exp)
  }

  test("scale: nd-less ways emit null node_refs (reference omits the key)") {
    val nulls = shaped.filter(col("type") === "way" &&
      col("node_refs").isNull).count()
    assert(nulls === OsmSynth.expectedNdLessWays(nWays))
    val withRefs = shaped.filter(col("type") === "way" &&
      col("node_refs").isNotNull).count()
    assert(withRefs === (nWays - OsmSynth.expectedNdLessWays(nWays)))
  }
}
