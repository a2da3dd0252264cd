package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4n operators: disjunctive-predicate pushdown, value windows,
  * deterministic array aggregation. Values are pinned by the DuckDB
  * oracles; these tests pin plans and invariants.
  */
class Round4nSpec extends SparkSpec {

  test("sql17: the OR-of-ANDs predicate is pushed to the scans") {
    val df = Relational.sql17Disjunctive(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // Spark pushes Or filters into parquet: both scans carry filters
    assert(p.contains("PushedFilters") &&
      (p.contains("Or(") || p.contains("In(p_brand")),
      s"disjunction should reach the scan:\n$p")
    val row = df.collect().head
    assert(row.getAs[Long]("n_items") > 0)
  }

  test("w7: first/last/nth are partition constants under the total order") {
    val rows = Relational.w7ValueBattery(spark, sf).collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("first_order")).distinct.length === 1)
      assert(rs.map(_.getAs[Long]("last_order")).distinct.length === 1)
      // nth(2) exists for every customer with >= 2 orders
      if (rs.length >= 2)
        assert(rs.head.getAs[Any]("second_order") != null)
    }
  }

  test("ev8: stickiness bounded by 1, DAU never exceeds its week's WAU") {
    val rows = EventAnalytics.dauWau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
    // every event day appears exactly once
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
  }

  test("sql18: distribution conserves customers, zero-order bucket kept") {
    val rows = Relational.sql18CustDistribution(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total === Tables.customer(spark, sf).count(),
      "every customer lands in exactly one order-count bucket")
  }

  test("mix3: JSD symmetric-bounded, all domain pairs present") {
    val rows = TextAnalysis.jsDivergence(spark, sf).collect()
    val nDoms = Tables.documents(spark, sf)
      .select("lang").distinct().count().toInt
    assert(rows.length === nDoms * (nDoms - 1) / 2)
    rows.foreach { r =>
      val jsd = r.getAs[Double]("jsd")
      // bounded by ln 2 for natural-log JSD
      assert(jsd >= 0.0 && jsd <= 0.6931472 + 1e-6)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("sql19: every kept price equals its part's true minimum") {
    val df = Relational.sql19MinCostSupplier(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("scalar-subquery"), s"min must decorrelate:\n$p")
    val mins = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") < 200)
      .groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    df.collect().foreach { r =>
      assert(r.getAs[Double]("price") === mins(r.getLong(0)))
    }
  }

  test("gini: bounded in [0,1), uniform data would be ~0, rerun-stable") {
    val row = Relational.stat12Gini(spark, sf).collect().head
    val g = row.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val again = Relational.stat12Gini(spark, sf).collect().head
    assert(again.getAs[Double]("gini") === g,
      "entity-ranked prefix math must be partition-invariant")
  }

  test("mann-whitney: U bounded by na*nb, self-comparison gives z=0") {
    val row = Relational.stat13MannWhitney(spark, sf).collect().head
    val (na, nb) = (row.getAs[Long]("na"), row.getAs[Long]("nb"))
    val u = row.getAs[Double]("u")
    assert(u >= 0.0 && u <= na.toDouble * nb)
    assert(row.getAs[Boolean]("significant") ===
      (math.abs(row.getAs[Double]("z")) > 1.96))
    val self = Relational.stat13MannWhitney(spark, sf,
      typeA = "view", typeB = "view").collect().head
    // identical samples: midranks make U exactly na*nb/2 ⇒ z = 0
    assert(self.getAs[Double]("z") === 0.0)
  }

  test("agg2: collected arrays are order-normalized — rerun-identical") {
    val a = Relational.agg2CollectBattery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Relational.agg2CollectBattery(
      spark, sf).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // keys inside each array are ascending
    a.values.foreach { s =>
      val ks = s.split(",").map(_.toLong)
      assert(ks.sorted.sameElements(ks))
    }
  }
}
