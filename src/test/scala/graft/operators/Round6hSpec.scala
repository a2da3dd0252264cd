package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 fourth-session, fifth batch: CUSUM change-point scan,
  * frequent-items profile, per-dimension PSI drift. Independent
  * driver-side replays from the raw fixtures. */
class Round6hSpec extends SparkSpec {

  test("cusum: recursion replay; nonnegative; peak marks the max") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val n = daily.length.toLong
    val sx = daily.map(_._2).sum
    val expected = daily.scanLeft(("", 0L, 0L)) {
      case ((_, _, acc), (d, x)) =>
        (d, x, math.max(0L, acc + n * x - sx))
    }.drop(1)
    val mx = expected.map(_._3).max
    val got = EventAnalytics.cusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)) === expected)
    got.foreach { case (_, _, c, peak) =>
      assert(c >= 0L)
      assert(peak === (if (c == mx) 1L else 0L))
    }
  }

  test("freqItems: exact counts; every emitted value clears 1% support") {
    val langs = Tables.documents(spark, sf).select(col("lang")).collect()
      .map(_.getString(0))
    val expLang = langs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, n) => n * 100 >= langs.length }.toMap
    val rows = Profiling.freqItems(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gotLang = rows.filter(_._1 == "documents.lang")
      .map(r => r._2 -> r._3).toMap
    assert(gotLang === expLang)
    rows.foreach { case (_, _, n, support) =>
      assert(support >= 10000L) // 1% in micros
      assert(support <= 1000000L)
    }
    assert(rows.map(_._1).distinct.sorted ===
      Array("documents.lang", "documents.source", "events.event_type"))
  }

  test("dimDrift: dim-0 PSI replays from raw embeddings") {
    val cells = Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect()
      .map { r =>
        val x = r.getSeq[Float](0).head.toDouble
        val bin = math.min(math.max(math.floor((x + 0.5) * 10).toLong, 0L), 9L)
        (bin, r.getInt(1) % 2 == 0)
      }
    val byBin = cells.groupBy(_._1).view.mapValues { cs =>
      (cs.count(_._2).toLong, cs.count(!_._2).toLong)
    }.toMap
    val k = byBin.size.toDouble
    val totRef = byBin.values.map(_._1).sum.toDouble
    val totCur = byBin.values.map(_._2).sum.toDouble
    val psi = byBin.values.map { case (a, b) =>
      val p = (a + 0.5) / (totRef + 0.5 * k)
      val q = (b + 0.5) / (totCur + 0.5 * k)
      math.floor(1e6 * (p - q) * math.log(p / q) + 0.5).toLong
    }.sum
    val row = Profiling.dimDrift(spark, sf).collect()
      .find(_.getLong(0) == 0L).get
    assert(row.getLong(1) === byBin.values.map(_._1).sum)
    assert(row.getLong(2) === byBin.values.map(_._2).sum)
    assert(row.getLong(3) === psi)
  }
}
