package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 12: Horvitz–Thompson PPS sampling, CUPED variance
  * reduction, and McNemar's paired test, restated driver-side.
  */
class Round7lSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("HT estimator equals a driver-side PPS replay and lands near " +
    "the true total") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nPop = docs.length.toLong
    val trueTotal = docs.map(_._2).sum
    val nTarget = rnd(nPop.toDouble * 50 / 1000.0)
    val sampled = docs.flatMap { case (id, sz) =>
      val pm = math.min(1000000L,
        rnd(1e6 * nTarget.toDouble * sz.toDouble / trueTotal.toDouble))
      if (md5_60(s"ht:$id") % 1000000L < pm)
        Some(rnd(1e6 * sz.toDouble / pm.toDouble))
      else None
    }
    val ht = sampled.sum
    val row = Sampling.horvitzThompson(spark, sf).collect().head
    assert(row.getLong(0) === nPop)
    assert(row.getLong(1) === sampled.length.toLong)
    assert(row.getLong(2) === trueTotal)
    assert(row.getLong(3) === ht)
    assert(row.getLong(4) ===
      rnd(1e6 * math.abs(ht - trueTotal).toDouble / trueTotal.toDouble))
    // unbiasedness sanity on this tiny fixture: ~30 sampled docs give
    // a ~18% relative SE, so bound at 3σ-ish — the point is "right
    // order of magnitude without any variance correction", the exact
    // replay above is the real contract
    assert(math.abs(ht - trueTotal).toDouble / trueTotal < 0.55,
      s"ht=$ht true=$trueTotal")
  }

  test("CUPED moments replay and the reduction equals rho-squared") {
    val xy = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), dayofmonth(col("ts")).as("dom"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).values.map { g =>
        (g.filter(_._2 <= 15).map(_._3).sum,
         g.filter(_._2 > 15).map(_._3).sum)
      }.toSeq
    val n = xy.size.toLong
    val sx = xy.map(_._1).sum
    val sy = xy.map(_._2).sum
    val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = xy.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val covxy = sxy.toDouble - sx.toDouble * sy.toDouble / n.toDouble
    val varx = sxx.toDouble - sx.toDouble * sx.toDouble / n.toDouble
    val vary = syy.toDouble - sy.toDouble * sy.toDouble / n.toDouble
    val row = EventAnalytics.cuped(spark, sf).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === rnd(1e6 * covxy / varx))
    assert(row.getLong(4) ===
      rnd(1e6 * covxy * covxy / (varx * vary)))
    // the identity: adjusted variance = (1 − ρ²) · var(Y), and it can
    // never exceed the unadjusted variance
    assert(row.getDouble(3) <= row.getDouble(2))
    val rho2 = covxy * covxy / (varx * vary)
    val expectAdj = (vary - covxy * covxy / varx) / n.toDouble
    assert(math.abs(row.getDouble(3) - expectAdj) < 0.01 +
      math.abs(expectAdj) * 1e-9)
    assert(rho2 >= 0 && rho2 <= 1)
  }

  test("McNemar counts replay and only discordant pairs drive the " +
    "statistic") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("embedding"), (col("label") % 2).cast("long").as("y"))
      .collect()
      .map { r =>
        val e = r.getSeq[Float](0)
        val sa = (0 until 8).map(i => rnd(e(i).toDouble * 1e6)).sum
        val sb = (8 until 16).map(i => rnd(e(i).toDouble * 1e6)).sum
        val y = r.getLong(1)
        val pa = if (sa > 0) 1L else 0L
        val pb = if (sb > 0) 1L else 0L
        (if (pa == y) 1L else 0L, if (pb == y) 1L else 0L)
      }
    val n = rows.length.toLong
    val b = rows.count { case (ra, rb) => ra == 1 && rb == 0 }.toLong
    val c = rows.count { case (ra, rb) => ra == 0 && rb == 1 }.toLong
    val chi2 =
      if (b + c > 0)
        rnd(1e6 * (math.abs(b - c) - 1).toDouble *
          (math.abs(b - c) - 1).toDouble / (b + c).toDouble)
      else 0L
    val row = Profiling.mcnemar(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === ((n, b, c, chi2)))
    // the pairing matters on this fixture: discordant cells exist
    assert(b + c > 0)
  }
}
