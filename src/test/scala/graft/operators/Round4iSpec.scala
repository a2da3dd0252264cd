package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4i: dynamic partition pruning and the Profile metrics reader. */
class Round4iSpec extends SparkSpec {

  test("j6: the fact scan carries a dynamic pruning partition filter") {
    val df = Relational.j6DynamicPruning(spark, sf)
    // DPP is injected at planning; visible in the initial physical plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"expected PartitionFilters: [dynamicpruningexpression(...)]:\n$p")
    // semantics: only tier-0 langs survive, counts match a direct query
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.keySet.subsetOf(direct.keySet))
    got.foreach { case (lang, n) => assert(n === direct(lang)) }
  }

  test("func1: try_ forms null out faults instead of throwing under ANSI") {
    val df = Relational.func1TryBattery(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"scalar battery must not shuffle:\n$p")
    val rows = df.collect()
    assert(rows.length === Tables.events(spark, sf).count().toInt)
    rows.foreach { r =>
      // divisor is user_id % 4: null exactly when it is 0
      assert(r.isNullAt(r.fieldIndex("type_num")), "enum string never parses")
      assert(r.isNullAt(r.fieldIndex("missing")), "out-of-bounds probe is null")
      assert(!r.isNullAt(r.fieldIndex("k_val")), "JSON numeric always parses")
    }
    val nullDivs = rows.count(_.isNullAt(1))
    assert(nullDivs > 0 && nullDivs < rows.length,
      "divide-by-zero rows are null, the rest compute")
  }

  test("sql11/sql12: date windows are pushed into the lineitem scan") {
    Seq(Relational.sql11ShipMode(spark, sf),
      Relational.sql12PromoShare(spark, sf)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
        s"shipdate window must reach the parquet scan:\n$p")
    }
  }

  test("profile: executed metrics expose scan rows and shuffle volume") {
    val df = Relational.q1PricingSummary(spark, sf)
    df.collect()
    val scanRows = Profile.total(df, "Scan", "numOutputRows")
    assert(scanRows === Tables.lineitem(spark, sf).count(),
      "scan metric should count every lineitem row")
    val shuffleRecords = Profile.total(df, "Exchange", "shuffleRecordsWritten")
    // partial aggregation: far fewer records cross than rows scanned
    assert(shuffleRecords > 0 && shuffleRecords < scanRows / 10,
      s"expected map-side combine: $shuffleRecords vs $scanRows")
  }
}
