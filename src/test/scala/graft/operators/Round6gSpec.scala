package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 fourth-session, fourth batch: hour-of-week χ² profile,
  * inter-event gap quantiles, token burstiness, interval-overlap join.
  * Driver-side replays; the overlap test replays the DIRECT predicate
  * join, proving the hour-bucket expansion lossless. */
class Round6gSpec extends SparkSpec {

  private lazy val events: Array[(Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id")).collect()
      .sortBy(r => (r.getLong(2), r.getLong(3)))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("seasonality: full 168-cell grid; chi2 replay") {
    val rows = EventAnalytics.seasonality(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.length === 168)
    val n = rows.map(_._2._1).sum
    assert(n === events.length.toLong)
    val obs = events.groupBy { case (_, _, us) =>
      val ins = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC)
      // java DayOfWeek: Mon=1..Sun=7; Spark dayofweek: Sun=1..Sat=7
      (ins.getDayOfWeek.getValue % 7 + 1L, ins.getHour.toLong)
    }.view.mapValues(_.size.toLong).toMap
    rows.foreach { case (cell, (o, _)) =>
      assert(o === obs.getOrElse(cell, 0L), s"cell $cell")
    }
    val devsq = rows.map { case (_, (o, _)) =>
      val d = 168L * o - n; d * d }.sum
    val chi2 = math.floor(1e6 * devsq.toDouble / (168.0 * n) + 0.5).toLong
    rows.foreach { case (_, (_, c)) => assert(c === chi2) }
  }

  test("interEventGaps: gap counts and interpolated quantiles replay") {
    val gaps = events.groupBy(e => (e._1, e._2)).values.flatMap { es =>
      val ts = es.map(_._3).sorted
      ts.zip(ts.drop(1)).map { case (a, b) => (es.head._2, b - a) }
    }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def interp(xs: Seq[Long], q: Double): Double = {
      val pos = (xs.length - 1) * q
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo).toDouble
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    val rows = EventAnalytics.interEventGaps(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4)))
      .toMap
    gaps.foreach { case (tpe, xs) =>
      val (n, p50, mx) = rows(tpe)
      assert(n === xs.length.toLong)
      assert(math.abs(p50 - interp(xs, 0.5) / 1e6) < 1e-3)
      assert(mx === math.floor(xs.max.toDouble / 1e6 * 1e4 + 0.5) / 1e4)
    }
  }

  test("burstiness: VMR replay; function-word spread vs topical burst") {
    val perDoc = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().flatMap { r =>
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
          .groupBy(identity).map { case (t, o) => (t, r.getLong(0), o.length.toLong) }
      }
    val nDocs = Tables.documents(spark, sf).count()
    val perTok = perDoc.groupBy(_._1).map { case (t, cs) =>
      val c = cs.map(_._3)
      (t, cs.length.toLong, c.sum, c.map(x => x * x).sum)
    }.toSeq
    val top = perTok.sortBy { case (t, _, total, _) => (-total, t) }.take(20)
    val rows = TextAnalysis.burstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet === top.map(_._1).toSet)
    val byTok = rows.map(r => r._1 -> r).toMap
    top.foreach { case (t, df, total, sumsq) =>
      val (_, gdf, gtot, vmr) = byTok(t)
      assert(gdf === df); assert(gtot === total)
      val exp = math.floor(1e6 * (nDocs * sumsq - total * total).toDouble /
        (nDocs * total).toDouble + 0.5).toLong
      assert(vmr === exp)
    }
  }

  test("interval overlap: bucketed plan equals the direct predicate join") {
    val gap = 30L * 60L * 1000000L
    val sessions = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.map(_._3).sorted
      val bounds = ts.foldLeft(List.empty[(Long, Long)]) {
        case ((lo, hi) :: rest, t) if t - hi < gap => (lo, t) :: rest
        case (acc, t) => (t, t) :: acc
      }
      bounds.map { case (lo, hi) => (u, lo, hi) }
    }
    val hourUs = 3600L * 1000000L
    val days = events.map(_._3 / (86400L * 1000000L)).distinct
    val promos = days.map(d =>
      (d, d * 86400L * 1000000L + 9L * hourUs, d * 86400L * 1000000L + 15L * hourUs))
    val direct = (for {
      (u, lo, hi) <- sessions
      (pid, plo, phi) <- promos
      if lo < phi && plo <= hi
    } yield (pid, u)).groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).distinct.size.toLong))
      .toMap
    val got = Relational.j7IntervalOverlap(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === direct)
  }
}
