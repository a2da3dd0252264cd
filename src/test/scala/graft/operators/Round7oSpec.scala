package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 15: 5-fold stump cross-validation, restated
  * driver-side.
  */
class Round7oSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("cv stump equals a leave-one-fold-out replay") {
    val lc = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority")).collect()
      .map { r =>
        val ok = r.getLong(0)
        (ok, math.floor(r.getDouble(1) / 10000).toLong, lc.get(ok),
          if (r.getString(2) == "1-URGENT") 1L else 0L,
          md5_60(s"cv:$ok") % 5)
      }
    // (fold, feature, bin) -> (n, pos)
    val cells = orders.flatMap { case (_, tpBin, nl, y, f) =>
      Seq(Some((f, "totalprice_k10", tpBin, y)),
        nl.map(b => (f, "linecount", b, y))).flatten
    }.groupBy(t => (t._1, t._2, t._3))
      .map { case (k, v) =>
        k -> (v.size.toLong, v.map(_._4).sum) }
    def gini(p: Long, n: Long): Double = {
      val q = p.toDouble / n
      1.0 - q * q - (1.0 - q) * (1.0 - q)
    }
    val totals = cells.groupBy { case ((_, ft, b), _) => (ft, b) }
      .map { case (k, v) =>
        k -> (v.values.map(_._1).sum, v.values.map(_._2).sum) }
    val want = (0L until 5L).map { f =>
      // training histogram = totals − fold cells
      val train = totals.map { case ((ft, b), (nT, pT)) =>
        val (nF, pF) = cells.getOrElse((f, ft, b), (0L, 0L))
        (ft, b, nT - nF, pT - pF)
      }.filter(_._3 > 0).toSeq
      val candidates = train.groupBy(_._1).flatMap { case (ft, rows) =>
        val sorted = rows.sortBy(_._2)
        val n = sorted.map(_._3).sum
        val pos = sorted.map(_._4).sum
        var nL = 0L; var pL = 0L
        sorted.init.map { case (_, b, nb, pb) =>
          nL += nb; pL += pb
          val gain = rnd(1e6 * (gini(pos, n) -
            (nL.toDouble / n) * gini(pL, nL) -
            ((n - nL).toDouble / n) * gini(pos - pL, n - nL)))
          (ft, b, nL, pL, n - nL, pos - pL, gain)
        }
      }
      val best = candidates.toSeq
        .sortBy { case (ft, b, _, _, _, _, g) => (-g, ft, b) }.head
      val (bft, thr, nL, pL, nR, pR, gain) = best
      val predL = if (pL * 2 > nL) 1L else 0L
      val predR = if (pR * 2 > nR) 1L else 0L
      // held-out eval on the fold's own cells of the winning feature
      val held = cells.collect { case ((`f`, ft, b), (nc, pc))
        if ft == bft => (b, nc, pc) }
      val nTest = held.map(_._2).sum
      val nErr = held.map { case (b, nc, pc) =>
        val pred = if (b <= thr) predL else predR
        if (pred == 1L) nc - pc else pc
      }.sum
      (f, bft, thr, gain, nTest, nErr,
        rnd(1e6 * nErr.toDouble / nTest.toDouble))
    }.toSet
    val got = Training.ml24CvStump(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === want)
    // every fold appears exactly once; the held-out counts cover the
    // population up to orders absent from the winning feature (an
    // order with no lineitems has no linecount bin — same domain rule
    // as ml21's histogram)
    assert(got.map(_._1) === (0L until 5L).toSet)
    val evaluated = got.toSeq.map(_._5).sum
    assert(evaluated <= orders.length.toLong)
    assert(evaluated >= (orders.length * 9L) / 10L,
      s"only $evaluated of ${orders.length} orders evaluated")
  }
}
