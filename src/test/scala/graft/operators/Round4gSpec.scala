package graft

import graft.operators._
import graft.osm.OsmEngine
import org.apache.spark.sql.functions._

/** Round-4g operators: KS drift test, TPC-H Q22 shape, OSM way→node
  * resolution. Values are pinned by DuckDB oracles (stat9/sql10) and
  * the example.osm goldens (way-node join).
  */
class Round4gSpec extends SparkSpec {

  test("ks: statistic bounded, critical value and reject flag consistent") {
    // the oracle pins the real value; this pins the statistic's contract
    val row = Relational.stat9KsTest(spark, sf).collect().head
    val ksD = row.getAs[Double]("ks_d")
    assert(ksD >= 0.0 && ksD <= 1.0)
    // critical value formula: 1.358*sqrt((na+nb)/(na*nb))
    val na = row.getAs[Long]("na"); val nb = row.getAs[Long]("nb")
    val crit = 1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb))
    assert(math.abs(row.getAs[Double]("crit_05") - crit) < 1e-6)
    assert(row.getAs[Boolean]("reject") === (ksD > row.getAs[Double]("crit_05")))
  }

  test("ks: one events scan, one hash exchange; prefix sums over the domain") {
    val p = Relational.stat9KsTest(spark, sf)
      .queryExecution.executedPlan.toString
    // cumulative window runs over the distinct-value domain in a single
    // partition — acceptable because the domain is bounded; the events
    // themselves are scanned once and cross one hash exchange (value)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"events must be scanned exactly once:\n$p")
    assert(!p.contains("Join"))
  }

  test("sql10: anti-join + filtered scalar subquery select the inactive wealthy") {
    val rows = Relational.sql10GlobalSales(spark, sf).collect()
    assert(rows.nonEmpty)
    val codes = rows.map(_.getAs[Number]("cntrycode").longValue).toSet
    assert(codes.subsetOf(Set(0L, 1L, 2L, 3L)))
    rows.foreach(r => assert(r.getAs[Long]("numcust") > 0))
  }

  test("osm: way→node join resolves the golden way's refs to its centroid") {
    val shaped = OsmEngine.shape(
      OsmEngine.elements(spark, fixture("example.osm")), clean = false)
    val rows = OsmEngine.wayNodeJoin(shaped).collect()
      .map(r => r.getAs[String]("way_id") -> r).toMap
    // golden way 209809850 has 7 refs (one node repeated — closed way)
    val w = rows("209809850")
    assert(w.getAs[Long]("n_refs") === 7)
    // resolution count equals refs present as nodes in the fixture;
    // unresolved refs (nodes outside the extract) keep the row alive
    assert(w.getAs[Long]("n_resolved") <= 7)
    if (w.getAs[Long]("n_resolved") > 0) {
      assert(w.getAs[Double]("centroid_lat") > -90 &&
        w.getAs[Double]("centroid_lat") < 90)
    }
  }
}
