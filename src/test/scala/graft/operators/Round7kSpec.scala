package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 11: Holt–Winters and the k-truss peel, restated
  * driver-side.
  */
class Round7kSpec extends SparkSpec {

  test("holt-winters equals an independent seasonal-recursion replay") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    assert(daily.length >= 14, "fixture must span two weeks")
    val xs = daily.map(_._2 * 1000000L)
    var l = xs.take(7).sum / 7
    var b = (xs.slice(7, 14).sum - xs.take(7).sum) / 49
    var sl = xs.take(7).map(_ - l).toVector
    val want = (7 until daily.length).map { t =>
      val sm = sl.head
      val lP = l
      l = (xs(t) - sm + l + b) / 2
      b = (3 * b + (l - lP)) / 4
      val sn = (3 * sm + (xs(t) - l)) / 4
      sl = sl.tail :+ sn
      (daily(t)._1, daily(t)._2, l, b, sn)
    }
    val fc = l + 7 * b + sl.last
    val got = EventAnalytics.holtWinters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSeq
      === want.toSeq)
    got.foreach { g => assert(g._6 === fc) }
    // the seasonal component must actually carry signal: some index
    // is materially nonzero (ev14 says day-of-week matters here)
    assert(want.map(_._5).exists(s => math.abs(s) > 100000L),
      "all seasonal indices ~0 — the seasonal term learned nothing")
  }

  test("k-truss equals an independent peel replay and shrinks " +
    "monotonically") {
    val n = Tables.documents(spark, sf).count()
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val denom = math.max(n / 8, 1L)
    var edges: Set[(Long, Long)] = ids.flatMap { i =>
      val outdeg = 3 + md5_60(s"kt:$i") % 6
      (0L until outdeg).map { j =>
        val dst = md5_60(s"kt:$i:$j") % denom
        (math.min(i, dst), math.max(i, dst))
      }.filter(e => e._1 != e._2)
    }.toSet
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.toSeq.flatMap { case (a, b) =>
        Seq(a -> b, b -> a) }.groupBy(_._1)
        .map { case (u, vs) => u -> vs.map(_._2).toSet }
      es.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
    }
    val counts = scala.collection.mutable.ArrayBuffer(edges.size)
    for (_ <- 1 to 6) {
      edges = support(edges).filter(_._2 >= 2).keySet
      counts += edges.size
    }
    val supF = support(edges)
    val want = edges.map { case (a, b) => (a, b, supF((a, b))) }
    val got = Graphs.ktruss(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // the peel genuinely cascades on this fixture: strictly shrinking
    // for at least the first three rounds
    assert(counts(0) > counts(1) && counts(1) > counts(2) &&
      counts(2) > counts(3), counts.mkString(","))
  }
}
