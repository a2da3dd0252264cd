package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4m operators: Welch's t-test and the calendar-dimension build.
  * Values are pinned by the DuckDB oracles; these tests pin the
  * statistical contracts and the spine properties.
  */
class Round4mSpec extends SparkSpec {

  test("ttest: self-comparison gives t=0, df and flag are consistent") {
    val row = Relational.stat11TTest(spark, sf).collect().head
    val t = row.getAs[Double]("t_stat")
    assert(row.getAs[Boolean]("significant") === (math.abs(t) > 1.96)
      || math.abs(math.abs(t) - 1.96) < 1e-6)
    // df is bounded by the Welch inequality: min(na,nb)-1 <= df <= na+nb-2
    val (na, nb) = (row.getAs[Long]("na"), row.getAs[Long]("nb"))
    val df = row.getAs[Double]("df")
    assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2)
    val self = Relational.stat11TTest(spark, sf, typeA = "click",
      typeB = "click").collect().head
    assert(self.getAs[Double]("t_stat") === 0.0)
    assert(!self.getAs[Boolean]("significant"))
  }

  test("eval1: verified LSH has precision 1.0; truth counts conserve") {
    val rows = Dedup.dedupEval(spark,
      Fixtures.mutantSlice(spark, sf)).collect()
      .map(r => r.getString(0) -> r).toMap
    val mh = rows("minhash_lsh")
    // minhash pairs are exact-verified ⇒ no false positives, ever
    assert(mh.getAs[Long]("fp") === 0L)
    assert(mh.getAs[Double]("prec") === 1.0)
    // tp + fn = |ground truth| for every method (the truth is shared)
    val truthSize = Dedup.ngramJaccardPairs(
      Fixtures.mutantSlice(spark, sf)).count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === truthSize)
    }
  }

  test("entropy: degenerate and natural texts separate, plan is narrow") {
    import spark.implicits._
    val probe = Seq(
      (1L, "aaaa aaaa aaaa aaaa"),                    // ~0 bits
      (2L, "the quick brown fox jumps over lazy dog") // natural-ish
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.charEntropy(probe).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Double]("entropy_bits") === 0.0)
    assert(!rows(1L).getAs[Boolean]("natural_text"))
    assert(rows(2L).getAs[Double]("entropy_bits") > 3.5)
    val p = TextAnalysis.charEntropy(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"entropy must not shuffle:\n$p")
  }

  test("ev7: the baseline frame never includes the judged observation") {
    val rows = EventAnalytics.anomalyScores(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // z finite and the flag consistent with |z| > 3
      val z = r.getAs[Double]("z_score")
      assert(!z.isNaN && !z.isInfinite)
      assert(r.getAs[Boolean]("anomaly") === (math.abs(z) > 3.0) ||
        math.abs(math.abs(z) - 3.0) < 1e-9)
    }
  }

  test("sql16: numerator and denominator share ONE aggregation pass") {
    val df = Relational.sql16MarketShare(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // one lineitem scan: the conditional sum rides the same aggregate
    val liScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans === 1, s"denominator must not rescan lineitem:\n$p")
    val rows = df.collect()
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("calendar: spine is gapless, weekend flags match dow") {
    val rows = Relational.time1Calendar(spark, sf)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    // gapless: consecutive days differ by exactly one calendar day
    val days = rows.map(r => java.time.LocalDate.parse(r.getString(0)))
    days.sliding(2).foreach {
      case Array(a, b) => assert(a.plusDays(1) === b, s"gap between $a and $b")
      case _ => ()
    }
    rows.foreach { r =>
      val dow = r.getAs[Long]("dow")
      assert(r.getAs[Boolean]("is_weekend") === (dow == 1L || dow == 7L))
    }
    // conservation: daily order counts sum to the table total
    assert(rows.map(_.getAs[Long]("n_orders")).sum ===
      Tables.orders(spark, sf).count())
  }
}
