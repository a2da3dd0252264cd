package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-6 fourth-session, second batch: time-bounded funnel,
  * Theil–Sen daily trend, median/MAD outlier screen, degree
  * assortativity, binary confusion metrics, dedup-aware mixture
  * weights. Each restated independently driver-side from the raw
  * fixture. */
class Round6eSpec extends SparkSpec {

  private lazy val events: Array[(Long, String, Timestamp)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))

  test("windowedFunnel: stage sets replay; never exceeds the unbounded funnel") {
    val hourMs = 3600 * 1000L
    val v = events.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => (u, es.map(_._3.getTime).min) }
    val c = events.filter(_._2 == "click")
      .flatMap { case (u, _, ts) => v.get(u).collect {
        case tv if ts.getTime > tv && ts.getTime <= tv + hourMs =>
          (u, ts.getTime) } }
      .groupBy(_._1).map { case (u, es) => (u, es.map(_._2).min) }
    val p = events.filter(_._2 == "purchase")
      .flatMap { case (u, _, ts) => c.get(u).collect {
        case tc if ts.getTime > tc && ts.getTime <= tc + hourMs =>
          (u, ts.getTime) } }
      .groupBy(_._1).map { case (u, es) => (u, es.map(_._2).min) }
    val got = EventAnalytics.windowedFunnel(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("1_view") === v.size.toLong)
    assert(got("2_click") === c.size.toLong)
    assert(got("3_purchase") === p.size.toLong)
    val unbounded = EventAnalytics.funnel(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    got.foreach { case (stage, n) => assert(n <= unbounded(stage)) }
  }

  private lazy val daily: Seq[Long] = {
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    events.groupBy(e => java.time.Instant.ofEpochMilli(e._3.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.format(fmt))
      .toSeq.sortBy(_._1).map(_._2.length.toLong)
  }

  test("theilSen: lower median of integer pairwise slopes") {
    val slopes = (for {
      i <- daily.indices; j <- daily.indices if j > i
    } yield {
      val num = (daily(j) - daily(i)) * 1000000L
      val den = (j - i).toLong
      num / den // both operands controlled: / truncates toward zero
    }).sorted
    val m = slopes.length
    val row = EventAnalytics.theilSen(spark, sf).collect().head
    assert(row.getLong(0) === daily.length.toLong)
    assert(row.getLong(1) === m.toLong)
    assert(row.getLong(2) === slopes((m + 1) / 2 - 1))
  }

  test("madOutliers: cents histogram medians and fence replay") {
    val vc = Tables.events(spark, sf).select(col("value")).collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong).sorted
    val n = vc.length
    val med = vc((n + 1) / 2 - 1)
    val ad = vc.map(v => math.abs(v - med)).sorted
    val mad = ad((n + 1) / 2 - 1)
    val nOut = vc.count(v => math.abs(v - med) * 10000 > mad * 44478)
    val row = Relational.stat22MadOutliers(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === med)
    assert(row.getLong(2) === mad)
    assert(row.getLong(3) === nOut.toLong)
  }

  test("assortativity: exact moment sums over a driver-built edge list") {
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val n = ids.length.toLong
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    for (id <- ids; d <- Seq((id + 1) % n, (id + 2) % n,
        (id * id + 3) % n) if d != id)
      und += ((math.min(id, d), math.max(id, d)))
    val ends = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ends.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (m2, pts) = (ends.size.toLong, ends.map { case (x, y) => (deg(x), deg(y)) })
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val row = Graphs.assortativity(spark, sf).collect().head
    assert(row.getLong(0) === m2)
    assert(row.getLong(1) === m2 * sxy - sx * sy)
    assert(row.getLong(2) === m2 * sxx - sx * sx)
    assert(row.getLong(3) === m2 * syy - sy * sy)
    // both orientations present ⇒ symmetric moments
    assert(row.getLong(2) === row.getLong(3))
  }

  test("confusion: cells replay; F1 is the harmonic mean") {
    val cells = Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect()
      .map { r =>
        val e = r.getSeq[Float](0)
        val s = (0 until 8)
          .map(k => math.floor(e(k).toDouble * 1e6 + 0.5).toLong).sum
        (s > 0, r.getInt(1) % 2 == 1)
      }
    val tp = cells.count(c => c._1 && c._2).toLong
    val fp = cells.count(c => c._1 && !c._2).toLong
    val fn = cells.count(c => !c._1 && c._2).toLong
    val tn = cells.count(c => !c._1 && !c._2).toLong
    val row = Profiling.confusion(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((tp, fp, fn, tn)))
    val (p, r) = (tp.toDouble / (tp + fp), tp.toDouble / (tp + fn))
    assert(math.abs(row.getDouble(6) - 2 * p * r / (p + r)) < 1e-6)
    assert(math.abs(row.getDouble(7) -
      (tp + tn).toDouble / cells.length) < 1e-6)
  }

  test("dedupAwareMix: canonical counts replay per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val canonIds = docs.groupBy(_._3).values.map(_.map(_._1).min).toSet
    def nTok(t: String): Long =
      t.split("\\s+").count(_.nonEmpty).toLong
    val bySrc = docs.groupBy(_._2)
    val got = TextAnalysis.dedupAwareMix(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    bySrc.foreach { case (src, ds) =>
      val canon = ds.filter(d => canonIds(d._1))
      assert(got(src) === ((ds.length.toLong, canon.length.toLong,
        ds.map(d => nTok(d._3)).sum, canon.map(d => nTok(d._3)).sum)))
    }
  }
}
