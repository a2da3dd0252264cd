package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 eighth batch: cohort retention, Holt level+trend, Cramér's
  * V, BPE fertility, NDCG@10. Driver-side replays per the RoundNSpec
  * convention.
  */
class Round6kSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("retention: offset-0 cells cover every user; rates replay") {
    val cells = EventAnalytics.retention(spark, sf).collect()
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    // every user appears in exactly one cohort's offset-0 cell
    assert(cells.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum === nUsers)
    // offset-0 retention is exactly 100%
    assert(cells.filter(_.getLong(1) == 0L).forall(_.getLong(4) == 1000000L))
    // every rate replays from its own counts
    assert(cells.forall(r => r.getLong(4) ===
      rnd(1e6 * r.getLong(2).toDouble / r.getLong(3))))
    // a cohort is never larger at a later offset than at birth
    assert(cells.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("holt replays from the collected daily series") {
    val got = EventAnalytics.holt(spark, sf).collect()
      .sortBy(_.getString(0))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .select(date_format(col("d"), "yyyy-MM-dd"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var l = 0L; var b = 0L
    val expect = daily.zipWithIndex.map { case ((d, x), i) =>
      val xm = x * 1000000L
      if (i == 0) { l = xm; b = daily(1)._2 * 1000000L - xm }
      else {
        val lp = l
        l = (xm + lp + b) / 2L
        b = (3L * b + (l - lp)) / 4L
      }
      (d, x, l, b)
    }
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === expect.toSeq)
    val fc = expect.last._3 + 7L * expect.last._4
    assert(got.forall(_.getLong(4) === fc))
  }

  test("lifecycle labels correctly across a corpus-wide inactive week") {
    import spark.implicits._
    // user 10 active W1+W3, user 20 active W1 only; NO user active in
    // W2 — the gap week the observed-weeks axis used to skip
    val w1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val w3 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val active = Seq((10L, w1), (10L, w3), (20L, w1)).toDF("user_id", "wk")
    val got = EventAnalytics.lifecycleFrom(active).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", "new") -> 2L,        // both users born in W1
      ("2024-01-08", "churned") -> 2L,    // both inactive in the gap week
      ("2024-01-15", "resurrected") -> 1L, // user 10 returns after a gap
      ("2024-01-15", "dormant") -> 1L))   // user 20 stays gone
  }

  test("cramersV: zero cells present, chi2 sums terms, V in [0,1]") {
    val rows = Profiling.cramersV(spark, sf).collect()
    val nLang = Tables.documents(spark, sf)
      .select(col("lang")).distinct().count()
    val nSrc = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    // COMPLETED grid: r x c cells even where n_xy = 0
    assert(rows.length.toLong === nLang * nSrc)
    val chi2 = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) === chi2))
    assert(chi2 === rows.map(_.getLong(3)).sum)
    val v = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) === v))
    assert(v >= 0L && v <= 1000000L)
  }

  test("bpeFertility: lang rollup conserves tok3's per-doc totals") {
    val byLang = Training.bpeFertility(spark, sf).collect()
    val perDoc = Training.bpeDocTokens(spark, sf).collect()
    assert(byLang.map(_.getLong(2)).sum === perDoc.map(_.getLong(1)).sum)
    assert(byLang.map(_.getLong(3)).sum === perDoc.map(_.getLong(2)).sum)
    // BPE can only merge: fertility is at most chars-per-word, at
    // least 1 token per word
    assert(byLang.forall(_.getLong(4) >= 1000000L))
    assert(byLang.forall(r => r.getLong(4) ===
      rnd(1e6 * r.getLong(3).toDouble / r.getLong(2))))
  }

  test("ndcgBm25: discounts match the closed form; NDCG replays; ideal bounds DCG") {
    // the literal table IS round(1e6 / log2(i+1))
    TextAnalysis.NdcgDiscMicros.zipWithIndex.foreach { case (d, i) =>
      assert(d === rnd(1e6 / (math.log(i + 2.0) / math.log(2.0))))
    }
    val rows = TextAnalysis.ndcgBm25(spark, sf).collect()
    assert(rows.length === 10)
    val dcg = rows.head.getLong(5)
    val idcg = rows.head.getLong(6)
    assert(dcg === rows.map(r => r.getLong(3) * r.getLong(4)).sum)
    assert(dcg <= idcg) // the ideal ranking upper-bounds any ranking
    assert(rows.forall(_.getLong(7) === rnd(1e6 * dcg.toDouble / idcg)))
    // gains encode 2^rel - 1
    assert(rows.forall(r => r.getLong(3) === (1L << r.getLong(2)) - 1L))
  }
}
