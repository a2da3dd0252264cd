package graft.osm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audit-surface tests (SURVEY.md §2b) on the example.osm fixture. */
class OsmAuditSpec extends SparkSpec {

  private lazy val elems = OsmEngine.elements(spark, fixture("example.osm")).cache()

  test("A4: exactly 8 distinct users incl. the null bucket (:165-166)") {
    assert(OsmEngine.distinctUsers(elems) === 8)
  }

  test("A4: per-user contribution counts keep the null group (:156-159)") {
    val counts = OsmEngine.auditUsers(elems).collect()
      .map(r => Option(r.getAs[String]("user")) -> r.getAs[Long]("n")).toMap
    assert(counts(Some("bbmiller")) === 2)
    assert(counts(Some("chicago-buildings")) === 3)
    assert(counts(Some("wayfarer")) === 2)
    assert(counts(None) === 1)
  }

  test("A1: tag census sees every element name (:87-95)") {
    val tags = OsmEngine.auditTags(spark, fixture("example.osm")).collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[Long]("n")).toMap
    assert(tags("node") === 9)
    assert(tags("way") === 3)
    assert(tags("relation") === 1)
    assert(tags("bounds") === 1)
    assert(tags("member") === 1)
    assert(tags("nd") === 11)
    assert(tags("tag") > 10)
    assert(tags("osm") === 1)
  }

  test("A2: key-type buckets with reference priority (:114-128)") {
    val buckets = OsmEngine.auditKeys(elems).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n")).toMap
    // 'bad key' has a space -> problemchars wins over everything
    assert(buckets("problemchars") === 1)
    // addr:street (x5), addr:city (x2), addr:postcode (x2), tiger:county,
    // addr:housenumber -> lower_colon... addr:street:type has 2 colons -> other
    assert(buckets("other") === 1)
    assert(buckets("lower_colon") === 11)
    assert(buckets("lower") === 10)
  }

  test("A5: rare street types collect full names (:180-190)") {
    val m = OsmEngine.auditStreetTypes(elems).collect()
      .map(r => r.getAs[String]("street_type") -> r.getAs[Seq[String]]("names")).toMap
    assert(m("St") === Seq("College St"))
    assert(m("St.") === Seq("West Lexington St."))
    assert(m("raod") === Seq("Jessore raod"))
    assert(m("pally") === Seq("24/j, shyamsundar pally"))
    assert(!m.contains("Street")) // whitelisted types excluded
  }

  test("A7: distinct city set (:250-251)") {
    val cities = OsmEngine.auditCityNames(elems).collect()
      .map(_.getAs[String]("city")).toSet
    assert(cities === Set("kolkata", "saltlake"))
  }

  test("A10: postcode buckets by key+length with 6-digit validity (:270-289)") {
    val rows = OsmEngine.auditPostcodes(elems).collect()
      .map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Seq[String]]("codes"), r.getAs[Boolean]("has_valid")))).toMap
    assert(rows("addr:postcode6") === ((Seq("700073"), true)))
    assert(rows("addr:postcode4") === ((Seq("7000"), false)))
    assert(rows("addr:postal_code6") === ((Seq("700091"), true)))
  }

  test("S6: systematic sampling on the stable key (:54-77)") {
    val n = OsmEngine.sample(elems, 10).count()
    assert(n === elems.filter(pmod(col("_id").cast("long"), lit(10)) === 0).count())
  }

  test("queries over the shaped view (Q1-Q5, :596-655)") {
    val shaped = OsmEngine.shape(elems).cache()
    assert(OsmEngine.q1UniqueUsers(shaped).collect().head.getLong(0) === 7)
    val types = OsmEngine.q2TypeCounts(shaped).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("node" -> 8, "way" -> 3))
    val am = OsmEngine.q3Amenities(shaped).collect().head
    assert(am.getAs[Long]("n_cafe") === 1)
    assert(am.getAs[Long]("n_restaurant") === 1)
    assert(am.getAs[Long]("n_shop") === 2)
    val shops = OsmEngine.q4TopShops(shaped).collect()
    assert(shops.head.getAs[String]("shop") === "supermarket")
    assert(shops.head.getAs[Long]("n") === 2)
    val hw = OsmEngine.q5TopHighways(shaped).collect()
      .map(r => r.getAs[String]("highway") -> r.getAs[Long]("n")).toMap
    assert(hw === Map("residential" -> 1, "service" -> 1))
  }
}
