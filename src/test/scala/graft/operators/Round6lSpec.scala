package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 ninth batch: STL decomposition, per-user entropy, pairwise
  * source JSD. Driver-side replays per the RoundNSpec convention.
  */
class Round6lSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("stl: components reassemble the series exactly; replay from daily counts") {
    val rows = EventAnalytics.stlDecompose(spark, sf).collect()
      .sortBy(_.getString(0))
    // x*1e6 == trend + seasonal + residual by construction — exact
    rows.foreach { r =>
      assert(r.getLong(1) * 1000000L ===
        r.getLong(2) + r.getLong(3) + r.getLong(4), r.toString)
    }
    // trend replays from the collected daily series
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      .select(date_format(col("d"), "yyyy-MM-dd"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val xs = daily.map(_._2)
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 3); val hi = math.min(xs.length - 1, i + 3)
      val win = xs.slice(lo, hi + 1)
      assert(r.getLong(2) === rnd(1e6 * win.sum.toDouble / win.length),
        s"trend at ${r.getString(0)}")
    }
    // seasonal: exactly one value per epoch-day-mod-7 class
    val byDow = rows.groupBy(r =>
      java.time.LocalDate.parse(r.getString(0)).toEpochDay % 7)
    byDow.values.foreach(g => assert(g.map(_.getLong(3)).toSet.size === 1))
  }

  test("userEntropy: H >= 0, zero iff single-type user, replay") {
    val got = EventAnalytics.userEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val cells = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = cells.groupBy(_._1).map { case (u, cs) =>
      val n = cs.map(_._3).sum
      val h = cs.map { case (_, _, c) =>
        rnd(-1e6 * (c.toDouble / n) * math.log(c.toDouble / n)) }.sum
      u -> (n, cs.length.toLong, h)
    }
    assert(got === expect)
    got.values.foreach { case (_, k, h) =>
      assert(h >= 0L)
      assert((k == 1L) == (h == 0L))
    }
  }

  test("jsdSources: symmetric-by-construction pairs, bounded by ln 2, replay") {
    val rows = TextAnalysis.jsdSources(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length.toLong === nSrc * (nSrc - 1) / 2)
    val ln2micro = rnd(1e6 * math.log(2.0))
    rows.foreach { r =>
      val jsd = r.getLong(3)
      assert(jsd >= 0L && jsd <= ln2micro + 2L, r.toString)
    }
    // replay one pair end-to-end from collected token counts
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    val toks = Tables.documents(spark, sf)
      .filter(col("source").isin(sa, sb))
      .select(col("source"),
        explode(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ca = toks.filter(_._1 == sa).map(t => t._2 -> t._3).toMap
    val cb = toks.filter(_._1 == sb).map(t => t._2 -> t._3).toMap
    val (na, nb) = (ca.values.sum, cb.values.sum)
    val shared = ca.keySet & cb.keySet
    val interTerm = shared.toSeq.map { t =>
      val p = ca(t).toDouble / na; val q = cb(t).toDouble / nb
      rnd(1e6 * (p / 2 * math.log(2 * p / (p + q)) +
        q / 2 * math.log(2 * q / (p + q))))
    }.sum
    val rem = rnd(1e6 * (math.log(2.0) / 2.0) *
      ((na - shared.toSeq.map(ca).sum).toDouble / na +
       (nb - shared.toSeq.map(cb).sum).toDouble / nb))
    assert(rows.head.getLong(2) === shared.size.toLong)
    assert(rows.head.getLong(3) === interTerm + rem)
  }
}
