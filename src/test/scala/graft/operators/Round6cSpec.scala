package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 third-session operators: exact binned ROC AUC, the ROC
  * curve, HITS hubs/authorities, and Kneser–Ney bigram smoothing.
  * Values are pinned by the DuckDB oracle; these tests restate the
  * math independently — the AUC against the O(n²) pairwise definition
  * it must equal, HITS against a driver-side iteration replay, KN
  * against per-row formula recomputation from raw token counts.
  */
class Round6cSpec extends SparkSpec {

  private def rnd6(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** The binned (score, label) pairs exactly as Profiling.scoreBins
    * derives them, restated driver-side from the raw fixture. */
  private lazy val binsAndLabels: Seq[(Long, Long)] =
    Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect()
      .map { r =>
        val e = r.getSeq[Float](0)
        val s = (0 until 8).map(k => rnd6(e(k).toDouble * 1e6)).sum
        (math.floor(s.toDouble / 1000.0).toLong, (r.getInt(1) % 2).toLong)
      }.toSeq

  test("rocAuc equals the O(n²) pairwise Mann-Whitney definition") {
    val row = Profiling.rocAuc(spark, sf).collect().head
    val (np, nn, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val pos = binsAndLabels.filter(_._2 == 1L).map(_._1)
    val neg = binsAndLabels.filter(_._2 == 0L).map(_._1)
    assert(np === pos.size.toLong && nn === neg.size.toLong)
    // doubled pairwise wins: 2 per strict win, 1 per tie
    val u2Brute = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(u2 === u2Brute)
    assert(auc === rnd6(1e6 * u2Brute.toDouble / (2.0 * np * nn)))
  }

  test("rocPoints: cumulative curve is monotone and ends at (all pos, all neg)") {
    val rows = Profiling.rocPoints(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1) // threshold descending = accumulation order
    val pos = binsAndLabels.count(_._2 == 1L).toLong
    val neg = binsAndLabels.count(_._2 == 0L).toLong
    assert(rows.last._2 === pos && rows.last._3 === neg)
    rows.sliding(2).foreach {
      case Array((_, tp1, fp1), (_, tp2, fp2)) =>
        assert(tp2 >= tp1 && fp2 >= fp1, "cumulative counts never decrease")
      case _ => ()
    }
    // each point matches a direct recount at its threshold
    rows.foreach { case (t, tp, fp) =>
      assert(tp === binsAndLabels.count(b => b._1 >= t && b._2 == 1L).toLong)
      assert(fp === binsAndLabels.count(b => b._1 >= t && b._2 == 0L).toLong)
    }
  }

  test("hits matches a driver-side replay of 4 integer double-steps") {
    val out = Graphs.hits(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val edges = Graphs.linkEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var hub = nodes.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 4) {
      auth = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub.getOrElse(e._1, 0L)).sum
      }.withDefaultValue(0L)
      hub = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum
      }
    }
    val maxH = hub.values.max
    val maxA = auth.values.max
    assert(out.size === nodes.size)
    out.foreach { case (node, (hm, am)) =>
      assert(hm === rnd6(1e6 * hub.getOrElse(node, 0L).toDouble / maxH),
        s"hub $node")
      assert(am === rnd6(1e6 * auth(node).toDouble / maxA), s"auth $node")
    }
    assert(out.values.map(_._1).max === 1000000L, "hub max normalizes to 1e6")
    assert(out.values.map(_._2).max === 1000000L, "auth max normalizes to 1e6")
  }

  test("knBigrams: every row replays from raw counts; discounting caps below add-k") {
    val out = TextAnalysis.knBigrams(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val pairs = docs.flatMap { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).collect { case Array(a, b) => (a, b) }
    }
    val c12 = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val fw = c12.keys.toSeq.groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val bw = c12.keys.toSeq.groupBy(_._2)
      .map { case (k, v) => k -> v.size.toLong }
    val t = c12.size.toLong
    assert(out.length === math.min(200, t).toInt)
    out.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c12") === c12((w1, w2)))
      assert(r.getAs[Long]("c1") === c1(w1))
      assert(r.getAs[Long]("fw_types") === fw(w1))
      assert(r.getAs[Long]("bw_types") === bw(w2))
      assert(r.getAs[Long]("t_types") === t)
      val pkn = (c12((w1, w2)).toDouble - 0.75) / c1(w1) +
        0.75 * fw(w1).toDouble / c1(w1) * (bw(w2).toDouble / t)
      assert(r.getAs[Long]("pkn_micros") === rnd6(1e6 * pkn), s"$w1 $w2")
    }
    // the discounted estimate stays a probability
    out.foreach(r => assert(r.getAs[Long]("pkn_micros") > 0L &&
      r.getAs[Long]("pkn_micros") <= 1000000L))
  }
}
