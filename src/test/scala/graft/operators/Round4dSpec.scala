package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4d operators: TPC-H Q17/Q11 subquery shapes, the SCD Type-2
  * dimension build, and the equi-width histogram profile pass. Values
  * are pinned by the DuckDB oracles; these tests pin the physical plans
  * and the semantic invariants.
  */
class Round4dSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sql7: correlated AVG subquery decorrelates to an aggregate + join") {
    val df = Relational.sql7AvgYearly(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    // decorrelation rewrites the per-row scalar subquery into a
    // per-partkey Aggregate joined back — no subquery survives
    assert(!p.contains("scalar-subquery"), s"subquery not decorrelated:\n$p")
    assert(p.contains("Join"), s"expected the decorrelated join:\n$p")
    // the gate really filters: strictly fewer small-quantity items than rows
    val nSmall = df.agg(sum(col("n_small"))).collect().head.getLong(0)
    val nAll = Tables.lineitem(spark, sf).count()
    assert(nSmall > 0 && nSmall < nAll)
  }

  test("sql8: HAVING-vs-global-total keeps exactly the heavy groups") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        col("l_extendedprice").cast("decimal(12,2)").as("p"))
    val stats = li.agg(sum(col("p")).cast("double"),
      countDistinct(col("l_partkey"))).collect().head
    val threshold = 1.25 * stats.getDouble(0) / stats.getLong(1)
    val expected = li.groupBy("l_partkey").agg(sum(col("p")).as("v"))
      .filter(col("v").cast("double") > threshold).count()
    val df = Relational.sql8ValueShare(spark, sf)
    assert(expected > 0 && df.count() === expected)
    val minV = df.agg(min(col("part_value"))).collect().head.getDouble(0)
    assert(minV > threshold)
  }

  test("scd2: intervals chain, states compress, one current row per key") {
    val rows = Relational.scd2Dimension(spark, sf)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (user, rs) =>
      val ordered = rs.sortBy(_.getAs[String]("valid_from"))
      // exactly one open-ended current row, and it is the last one
      assert(ordered.count(_.getAs[Boolean]("is_current")) === 1,
        s"user $user: expected one current row")
      assert(ordered.last.getAs[Boolean]("is_current"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          // consecutive states differ (change compression) and the
          // validity intervals chain without gaps or overlaps
          assert(a.getAs[Long]("tier") !== b.getAs[Long]("tier"))
          assert(a.getAs[String]("valid_to") === b.getAs[String]("valid_from"))
        case _ => ()
      }
    }
  }

  test("scd2: both windows reuse ONE user_id exchange") {
    val p = plan(Relational.scd2Dimension(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n === 1, s"expected a single hash exchange:\n$p")
  }

  test("stat7: buckets cover all rows and respect their bounds") {
    val df = Relational.stat7Histogram(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(df.map(_.getAs[Long]("n")).sum === total)
    df.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 1 && b <= 20)
      val width = 500000.0 / 20
      assert(r.getAs[Double]("lo_seen") >= (b - 1) * width)
      if (b < 20) assert(r.getAs[Double]("hi_seen") < b * width)
    }
  }

  test("stat7: the histogram is one narrow projection + one aggregate") {
    val p = plan(Relational.stat7Histogram(spark, sf))
    assert("Exchange".r.findAllIn(p).size === 1, s"one exchange expected:\n$p")
    assert(!p.contains("Join"))
  }
}
