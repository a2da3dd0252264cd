package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 8: MaxScore-pruned BM25 and the Kaplan–Meier
  * survival curve, each restated driver-side.
  */
class Round7hSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val queryTerms = Seq("spark", "query", "filter")

  /** Driver-side BM25 postings: (doc_id, term) -> micro contribution. */
  private def microContribs: Map[(Long, String), Long] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tks = docs.map { case (id, t) =>
      (id, t.split("\\s+").filter(_.nonEmpty)) }
    val n = tks.length.toLong
    val total = tks.map(_._2.length.toLong).sum
    val avgdl = total.toDouble / n.toDouble
    val tf = tks.flatMap { case (id, tk) =>
      tk.filter(queryTerms.contains).map(term => (id, term)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val df = tf.keys.toSeq.groupBy(_._2).map { case (t, v) => t -> v.size }
    val idf = df.map { case (t, d) =>
      t -> r6(math.log((n - d + 0.5) / (d + 0.5) + 1.0)) }
    tf.map { case ((id, t), f) =>
      val dl = tks.find(_._1 == id).get._2.length.toLong
      val c = r6(idf(t) * (f.toDouble * 2.2) /
        (f.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
      (id, t) -> rnd(c * 1e6)
    }
  }

  test("maxscore top-k is bit-identical to full-scoring BM25") {
    val full = TextAnalysis.bm25(
        Tables.documents(spark, sf), queryTerms).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val pruned = TextAnalysis.bm25MaxScore(
        Tables.documents(spark, sf), queryTerms).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(pruned === full)
    // and both equal the driver-side replay of the scoring kernel
    val cm = microContribs
    val want = cm.groupBy(_._1._1)
      .map { case (id, m) => (id, m.values.sum.toDouble / 1e6,
        m.size.toLong) }
      .toSeq.sortBy { case (id, s, _) => (-s, id) }.take(10)
    assert(full.toList === want.toList)
  }

  test("maxscore pruning rule is sound AND actually prunes here") {
    val cm = microContribs
    val k = 10
    val ub = cm.groupBy(_._1._2).map { case (t, m) => t -> m.values.max }
    val kth = cm.groupBy(_._1._2).values
      .flatMap { m =>
        val sorted = m.toSeq
          .sortBy { case ((id, _), c) => (-c, id) }.map(_._2)
        if (sorted.length >= k) Some(sorted(k - 1)) else None
      }
    val theta =
      if (kth.isEmpty) Long.MinValue else kth.max
    val byDoc = cm.groupBy(_._1._1)
    val scores = byDoc.map { case (id, m) => id -> m.values.sum }
    val survivors = byDoc.filter { case (_, m) =>
      m.keys.map(t => ub(t._2)).sum >= theta }.keySet
    // soundness: θ lower-bounds the k-th best full score, so every
    // pruned doc scores strictly below the k-th
    val kthBest = scores.values.toSeq.sortBy(-_).take(k).last
    assert(theta <= kthBest)
    byDoc.keys.filterNot(survivors).foreach { id =>
      assert(scores(id) < theta)
    }
    // and on this corpus the bound has teeth — some docs are pruned
    assert(survivors.size < byDoc.size,
      s"pruning removed nothing: ${byDoc.size} docs all survived")
  }

  test("KM curve equals an independent product-limit replay") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val maxUs = ev.map(_._2).max
    val signups = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
    val firstConv = signups.flatMap { case (u, sUs) =>
      val ps = ev.filter(e => e._1 == u && e._3 == "purchase" &&
        e._2 >= sUs).map(_._2)
      if (ps.isEmpty) None else Some(u -> ps.min)
    }
    val subjects = signups.toSeq.map { case (u, sUs) =>
      firstConv.get(u) match {
        case Some(p) => ((p - sUs) / 86400000000L, true)
        case None    => ((maxUs - sUs) / 86400000000L, false)
      }
    }
    val cells = subjects.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (day, xs) =>
        (day, xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    var atRisk = subjects.size.toLong
    var cumLf = 0L
    val want = cells.flatMap { case (day, d, c) =>
      val nRisk = atRisk
      atRisk -= d + c
      val lf =
        if (d == 0) 0L
        else if (d == nRisk) -1000000000L
        else rnd(1e6 * math.log(1.0 - d.toDouble / nRisk.toDouble))
      cumLf += lf
      if (d > 0)
        Some((day, nRisk, d, c, rnd(1e6 * math.exp(cumLf / 1e6))))
      else None
    }
    val got = EventAnalytics.kmSurvival(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === want)
    // the estimator's defining shape: survival is non-increasing and
    // the risk set strictly shrinks across event days
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._5 <= a._5, s"survival increased: $a -> $b")
        assert(b._2 < a._2, s"risk set grew: $a -> $b")
      case _ =>
    }
  }
}
