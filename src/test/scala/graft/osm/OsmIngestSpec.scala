package graft.osm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Compressed-input ingest (the reference's find_file,
  * openstreet_kolkata.py:15-35, transparently reads `.zip` and `.bz2`
  * Mapzen downloads): the committed `example.osm.bz2` / `example.osm
  * .zip` fixtures are byte-for-byte compressions of `example.osm`, so
  * every ingest path must produce IDENTICAL rows to the plain read. */
class OsmIngestSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions._
    df.select(to_json(struct(df.columns.map(col): _*)))
      .collect().map(_.getString(0)).sorted.toSeq
  }

  test(".osm.bz2 reads natively through the Hadoop codec, " +
    "row-identical to the plain XML read") {
    val plain = canon(OsmEngine.elements(spark, fixture("example.osm")))
    val bz2 = canon(OsmEngine.elements(spark, fixture("example.osm.bz2")))
    assert(plain.nonEmpty)
    assert(bz2 === plain)
  }

  test(".osm.zip unpacks once per archive fingerprint, " +
    "row-identical to the plain XML read") {
    val plain = canon(OsmEngine.elements(spark, fixture("example.osm")))
    val zip = canon(OsmEngine.elements(spark, fixture("example.osm.zip")))
    assert(zip === plain)
    // idempotent: the second call serves the already-unpacked copy
    val p1 = OsmEngine.unpackIfArchive(fixture("example.osm.zip"))
    val p2 = OsmEngine.unpackIfArchive(fixture("example.osm.zip"))
    assert(p1 === p2)
    assert(p1.toLowerCase.endsWith(".osm"))
  }

  test("non-archive paths pass through unpackIfArchive untouched") {
    val p = fixture("example.osm")
    assert(OsmEngine.unpackIfArchive(p) === p)
  }
}
