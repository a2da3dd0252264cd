package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 18: priority sampling and Yule-Walker AR(2) —
  * driver-side replays plus the estimator/model properties. */
class Round7rSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("priority sample equals the replay and is a plausible " +
    "subset-sum estimate") {
    val k = 64
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val trueTotal = docs.map(_._2).sum
    val pr = docs.map { case (id, w) =>
      (id, w, w.toDouble * 1152921504606846976L.toDouble /
        (md5_60(s"ps:$id") + 1).toDouble)
    }.sortBy(t => (-t._3, t._1))
    val tau = pr(k)._3
    val estTotal = pr.take(k)
      .map(t => rnd(1e6 * math.max(t._2.toDouble, tau))).sum
    val r = Sampling.prioritySample(spark, sf).collect().head
    assert(r.getLong(0) === docs.length.toLong)
    assert(r.getLong(1) === trueTotal)
    assert(r.getLong(2) === k.toLong)
    assert(r.getLong(3) === rnd(1e6 * tau))
    assert(r.getLong(4) === estTotal)
    // unbiased-estimator sanity: within 50% of truth on this fixture
    assert(math.abs(estTotal / 1e6 - trueTotal) < 0.5 * trueTotal)
    // every sampled weight's estimate is >= the raw weight (max(w,tau))
    assert(estTotal >= pr.take(k).map(t => 1000000L * t._2).sum / 1000000)
  }

  test("Yule-Walker AR(2) equals the replay and beats the mean-only " +
    "model in-sample") {
    val daily = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length.toLong
    val mu = daily.sum.toDouble / n
    def lagSum(lag: Int): Double = (lag until daily.length).map { t =>
      rnd((daily(t) - mu) * (daily(t - lag) - mu))
    }.map(BigInt(_)).sum.toDouble
    val (s0, s1, s2) = (lagSum(0), lagSum(1), lagSum(2))
    val den = s0 * s0 - s1 * s1
    val phi1 = s1 * (s0 - s2) / den
    val phi2 = (s2 * s0 - s1 * s1) / den
    val fc = mu + phi1 * (daily(daily.length - 1) - mu) +
      phi2 * (daily(daily.length - 2) - mu)
    val r = EventAnalytics.yuleWalkerAr2(spark, sf).collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === rnd(1e6 * phi1))
    assert(r.getLong(2) === rnd(1e6 * phi2))
    assert(r.getLong(3) === rnd(fc))
    // the fitted AR(2) strictly improves in-sample one-step SSE over
    // the mean-only predictor (phi = 0) — the model actually learns
    val (sseAr, sseMu) = (2 until daily.length).foldLeft((0.0, 0.0)) {
      case ((a, m), t) =>
        val pred = mu + phi1 * (daily(t - 1) - mu) +
          phi2 * (daily(t - 2) - mu)
        val e = daily(t) - pred
        val e0 = daily(t) - mu
        (a + e * e, m + e0 * e0)
    }
    assert(sseAr < sseMu)
  }
}
