package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4b operators: subquery battery, multiset ops, null-safe join,
  * moment statistics, HOF vector battery, BPE pair counting, domain
  * mixing, duplicated-span detection. Values are pinned by the DuckDB
  * oracles; these tests pin the invariants and the physical plans.
  */
class Round4bSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sub1: every subquery decorrelates to a join — no per-row re-execution") {
    val df = Relational.sub1Subqueries(spark, sf)
    val p = plan(df)
    // EXISTS / NOT EXISTS / IN all lower to hash joins; the scalar
    // subquery runs once (Subquery node), not per row
    assert("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size >= 3,
      s"expected the three predicate subqueries as joins:\n$p")
    assert(df.count() > 0)
  }

  test("sql4: lineitem aggregates BEFORE the join; top-k never global-sorts") {
    val df = Relational.sql4BigOrders(spark, sf, minQty = 100)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), s"customer should broadcast:\n$p")
    // the HAVING-filtered aggregate must sit below the orders join:
    // the join input is one row per qualifying order, not raw lineitem
    val joinIdx = p.indexOf("Join")
    assert(p.indexOf("HashAggregate", joinIdx) > 0,
      s"pre-join aggregate missing below the join:\n$p")
  }

  test("set2: bag identities — |A∩B| + |A\\B| = |A|, |A∪B| = |A|+|B|") {
    val rows = Relational.set2Multiset(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = Tables.events(spark, sf)
    val nClicks = e.filter(col("event_type") === "click").count()
    val nViews = e.filter(col("event_type") === "view").count()
    assert(rows("intersect_all") + rows("except_all") === nClicks)
    assert(rows("union_all") === nClicks + nViews)
  }

  test("j5: null buckets match each other under <=>") {
    val rows = Relational.j5NullSafeJoin(spark, sf).collect()
    assert(rows.length === 10, "expected buckets null + 1..9")
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length === 1, "the null bucket must join, not vanish")
    assert(nullRow.head.getLong(1) > 0 && nullRow.head.getLong(2) > 0)
  }

  test("stat5: moments are internally consistent") {
    val rows = Relational.stat5Moments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getDouble(1)
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
      val sd = r.getDouble(3); val variance = r.getDouble(4)
      // sd² ≈ var (both independently rounded, so compare loosely)
      assert(math.abs(sd * sd - variance) < math.max(1.0, variance) * 0.01)
    }
  }

  test("arr1: HOF battery matches a driver-side recomputation, plan is narrow") {
    val df = Similarity.hofBattery(spark, sf)
    assert(!plan(df).contains("Exchange"),
      "vector arithmetic must not shuffle")
    val row = df.filter(col("vec_id") === 1).collect().head
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>")).collect()
      .head.getSeq[Double](0)
    assert(row.getDouble(1) === math.rint(emb.map(math.abs).foldLeft(0.0)(_ + _) * 1e5) / 1e5)
    assert(row.getLong(2) === emb.count(_ > 0).toLong)
    val revDot = emb.zip(emb.reverse).map { case (a, b) => a * b }.foldLeft(0.0)(_ + _)
    assert(row.getDouble(4) === math.rint(revDot * 1e5) / 1e5)
  }

  test("bpe: pair counts partial-aggregate before the exchange; total pairs conserved") {
    val df = TextAnalysis.bpePairs(spark, sf, k = 5)
    val p = plan(df)
    // partial HashAggregate below the exchange: the shuffle carries
    // (pair, partial count), not one row per corpus token
    assert(p.indexOf("HashAggregate", p.indexOf("Exchange")) > 0 &&
      p.lastIndexOf("HashAggregate") > p.indexOf("HashAggregate"),
      s"expected partial+final aggregation:\n$p")
    val rows = df.collect()
    assert(rows.length === 5)
    // pinned descending order
    assert(rows.map(_.getLong(1)).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("mix1: shares sum to 1; weight is target/actual") {
    val rows = TextAnalysis.domainMix(spark, sf).collect()
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    rows.foreach { r =>
      val share = r.getDouble(3); val target = r.getDouble(4)
      val weight = r.getDouble(5)
      assert(math.abs(weight - target / share) < 0.01,
        s"weight $weight != $target/$share")
    }
  }

  test("dedup_spans: an exact duplicate pair has dup_frac 1 on both sides") {
    val docs = Tables.documents(spark, sf)
    val dup = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(999999L))
    val out = Dedup.dupSpans(docs.unionByName(dup))
      .filter(col("doc_id").isin(0L, 999999L)).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getDouble(3) === 1.0, s"expected full overlap: $r")
      assert(!r.getBoolean(4), "a fully duplicated doc must not be kept")
    }
  }
}
