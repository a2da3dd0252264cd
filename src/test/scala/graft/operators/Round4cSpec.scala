package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4c operators: grouping sets, lateral top-n, regex/map
  * batteries, and event analytics (funnel / cohort / gap-fill).
  * Values are pinned by the DuckDB oracles; these tests pin the
  * physical plans and the semantic invariants.
  */
class Round4cSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("g5: all four grouping sets come from ONE Expand + one aggregation pass") {
    val df = Relational.g5GroupingSets(spark, sf)
    val p = plan(df)
    assert("Expand".r.findAllIn(p).size === 1, s"expected a single Expand:\n$p")
    // grand-total row present exactly once
    val total = df.filter(col("g_status") === 1 && col("g_priority") === 1).collect()
    assert(total.length === 1)
    assert(total.head.getAs[Long]("n") === Tables.orders(spark, sf).count())
  }

  test("sql5: correlated LATERAL LIMIT decorrelates — no per-outer-row rescan") {
    val df = Relational.sql5LateralTopN(spark, sf)
    val p = plan(df)
    // the rewrite is a window (rank/row_number) over the inner side +
    // one join; a non-decorrelated plan would show a nested subquery
    assert(p.contains("Window") || p.contains("TakeOrdered"),
      s"expected the LIMIT-per-group rewrite:\n$p")
    // at most 2 rows per order, top prices first
    val byOrder = df.collect().groupBy(_.getLong(0))
    assert(byOrder.nonEmpty && byOrder.values.forall(_.length <= 2))
  }

  test("ev1: funnel stages are monotonically non-increasing") {
    val rows = EventAnalytics.funnel(spark, sf).orderBy(col("stage")).collect()
    assert(rows.length === 3)
    val ns = rows.map(_.getLong(1))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel must narrow: ${ns.toSeq}")
    assert(rows.head.getDouble(2) === 1.0, "stage 1 conversion is 1.0 by definition")
  }

  test("ev1: stage joins reuse the user_id partitioning — one exchange per side") {
    val p = plan(EventAnalytics.funnel(spark, sf))
    // every exchange is on user_id (stage aggs + co-partitioned joins)
    // or a single-partition collect for the scalar base; none re-keys
    val exchanges = "Exchange [a-z]+partitioning\\(([a-z_#0-9L]+)"
      .r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(k => k.startsWith("user_id")),
      s"unexpected exchange keys: $exchanges\n$p")
  }

  test("ev3: grid is dense (types × minutes), gaps are LOCF-filled") {
    val df = EventAnalytics.gapFill(spark, sf, minutes = 60)
    val rows = df.collect()
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length === nTypes * 60, "grid must be dense")
    // every gap minute after the first observation carries a value
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getString(1))
      val firstObs = sorted.indexWhere(!_.getBoolean(3))
      if (firstObs >= 0) { // a type may have no observation in the grid
        assert(sorted.drop(firstObs).forall(!_.isNullAt(4)),
          "LOCF left a hole after the first observation")
        assert(sorted.take(firstObs).forall(_.isNullAt(4)),
          "LOCF invented a value before the first observation")
      }
    }
  }

  test("ev2: cohort week 0 diagonal equals each cohort's user count") {
    val rows = EventAnalytics.cohortRetention(spark, sf).collect()
    // offset-0 row exists for every cohort and dominates its later weeks
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.values.foreach { rs =>
      val base = rs.find(_.getLong(2) === 0L)
      assert(base.isDefined, "every cohort has a week-0 row")
      assert(rs.forall(_.getLong(3) <= base.get.getLong(3)),
        "retention cannot exceed the cohort size")
    }
  }

  test("str3/map1: batteries stay narrow — zero exchanges") {
    assert(!plan(Relational.str3Regex(spark, sf)).contains("Exchange"))
    assert(!plan(Relational.map1Functions(spark, sf)).contains("Exchange"))
  }

  test("stat6: merged HLL estimate honors the 5% contract; merge never rescans events") {
    val df = Relational.stat6SketchUnion(spark, sf)
    assert(df.collect().head.getLong(2) === 1L, "estimate out of bound")
    // events is scanned twice total (sketch build + exact side), not
    // per merge step: the union aggregates sketch ROWS. Count relations
    // in the logical plan — the AQE physical string duplicates scans.
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size
    assert(scans <= 2, s"sketch union must not rescan the base table ($scans scans)")
  }

  test("sql6: both nation legs and supplier/customer broadcast; one fact-fact shuffle") {
    val p = plan(Relational.sql6NationVolume(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, s"dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("samp4: weighted sample is a stateless narrow filter with E[kept]≈Σw") {
    val df = Sampling.weightedSample(Tables.documents(spark, sf))
    assert(!plan(df).contains("Exchange"), "sampling must not shuffle")
    val rows = df.collect()
    val kept = rows.count(_.getBoolean(4)).toDouble
    val expected = rows.map(_.getDouble(3)).sum
    // binomial concentration: |kept - Σw| within 4σ (σ² ≤ Σw)
    assert(math.abs(kept - expected) <= 4 * math.sqrt(expected) + 1,
      s"kept=$kept expected≈$expected")
    // determinism: a re-run keeps exactly the same documents
    val again = Sampling.weightedSample(Tables.documents(spark, sf)).collect()
    assert(rows.map(r => (r.getLong(0), r.getBoolean(4))).toSet ===
      again.map(r => (r.getLong(0), r.getBoolean(4))).toSet)
  }
}
