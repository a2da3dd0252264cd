package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4k operators: TPC-H Q10/Q16 faces and event-transition
  * mining. Values are pinned by the DuckDB oracles; these tests pin
  * plans and semantic invariants.
  */
class Round4kSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sql13: heap top-k, dims broadcast, filters pushed to both scans") {
    val df = Relational.sql13ReturnedRevenue(spark, sf)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be heap-based:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"customer and nation should broadcast:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"))
    assert(df.count() <= 20)
  }

  test("sql14: distinct-agg expands once — (group, suppkey) pairs, not rows") {
    val df = Relational.sql14SupplierVariety(spark, sf)
    val p = plan(df)
    // Spark's two-phase distinct rewrite: at least two HashAggregates
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // the exclusion list prunes brands
    val brands = df.collect().map(_.getString(0)).toSet
    assert(brands.intersect(Set("Brand#1", "Brand#2", "Brand#3")).isEmpty)
  }

  test("ev6: transition probabilities row-normalize to 1") {
    val rows = EventAnalytics.transitionMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = Tables.events(spark, sf).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(types.contains(r.getString(0)) && types.contains(r.getString(1)))
    }
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-4, s"$from row sums to $total")
    }
    // transition count conservation: every non-final event transitions
    val nTransitions = rows.map(_.getAs[Long]("n")).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(nTransitions === nEvents - nUsers)
  }
}
