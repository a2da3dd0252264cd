package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 16: cohort LTV curve, restated driver-side. */
class Round7pSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("LTV curve equals an independent cohort replay and is " +
    "non-decreasing cumulatively") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
          .as("wk"),
        col("event_type"), round(col("value") * 100).cast("long")
          .as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val cohort = ev.groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
    val sizes = cohort.values.groupBy(identity)
      .map { case (c, v) => c -> v.size.toLong }
    def weeksBetween(a: String, b: String): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a), java.time.LocalDate.parse(b)) / 7
    val cells = ev.filter(_._3 == "purchase")
      .map { case (u, wk, _, cents) =>
        ((cohort(u), weeksBetween(cohort(u), wk)), cents) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val want = cells.groupBy(_._1._1).flatMap { case (c, m) =>
      val sorted = m.toSeq.sortBy(_._1._2)
      var cum = 0L
      sorted.map { case ((_, off), spend) =>
        cum += spend
        (c, off, spend, sizes(c),
          rnd(1e6 * cum.toDouble / sizes(c).toDouble))
      }
    }.toSet
    val got = EventAnalytics.ltvCurve(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    // per cohort, cumulative LTV never decreases across offsets
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 <= b._5, s"LTV fell: $a -> $b")
        case _ =>
      }
    }
    // non-purchasing users hold the denominator down: cohort sizes
    // cover at least the purchasing-user count (every user on this
    // tiny fixture happens to purchase, so equality is legitimate)
    val purchasers = ev.filter(_._3 == "purchase").map(_._1).toSet.size
    assert(sizes.values.sum >= purchasers)
  }
}
