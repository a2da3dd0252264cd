package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 4: Dirichlet query likelihood, closed-form ALS user
  * step, one-way ANOVA, Kendall τ-b, t-closeness, decision-stump
  * split search — each restated driver-side from first principles.
  */
class Round7dSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("Dirichlet QL ranking equals a plain-Scala replay") {
    val terms = Seq("spark", "query", "filter")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+")
        .filter(_.nonEmpty).toSeq).toMap
    val cTotal = docs.values.map(_.size.toLong).sum
    val cf = terms.map(t =>
      t -> docs.values.map(_.count(_ == t).toLong).sum).toMap
      .filter(_._2 > 0)
    val cand = docs.filter(_._2.exists(cf.keySet)).keys
    val want = cand.map { id =>
      val tk = docs(id)
      val contribs = cf.toSeq.map { case (t, c) =>
        val tf = tk.count(_ == t).toLong
        (tf, r6(math.log((tf.toDouble + 2000.0 * c.toDouble /
          cTotal.toDouble) / (tk.size.toDouble + 2000.0))))
      }
      (id, contribs.map(c => rnd(c._2 * 1e6)).sum.toDouble / 1e6,
        contribs.count(_._1 > 0).toLong)
    }.toSeq.sortBy(x => (-x._2, x._1)).take(10)
    val got = Retrieval.qlDirichlet(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === want)
    // smoothing really engaged: some top doc misses at least one term
    assert(got.nonEmpty && got.map(_._2).forall(_ < 0.0))
  }

  test("ALS user half-step solves the per-user 2x2 normal equations") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).round))
    val ok2cust = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ratings = li.groupBy(x => (ok2cust(x._1), x._2))
      .map { case ((c, p), xs) => (c, p, xs.map(_._3).sum) }
    def q(comp: Int, part: Long): Long =
      md5_60(s"alsq$comp:$part") % 2001L - 1000L
    val want = ratings.groupBy(_._1).map { case (cust, xs) =>
      val s11 = xs.map(x => q(1, x._2) * q(1, x._2)).sum
      val s12 = xs.map(x => q(1, x._2) * q(2, x._2)).sum
      val s22 = xs.map(x => q(2, x._2) * q(2, x._2)).sum
      val t1 = xs.map(x => x._3 * q(1, x._2)).sum
      val t2 = xs.map(x => x._3 * q(2, x._2)).sum
      val n = xs.size
      val (a11, a12, a22) = (s11 / 1e6 + 0.1 * n, s12 / 1e6,
        s22 / 1e6 + 0.1 * n)
      val (b1, b2) = (t1 / 1e3, t2 / 1e3)
      val det = a11 * a22 - a12 * a12
      (cust, n.toLong, rnd(1e6 * (a22 * b1 - a12 * b2) / det),
        rnd(1e6 * (a11 * b2 - a12 * b1) / det))
    }.toSet
    val got = Recommend.alsUserStep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty && got.exists(r => r._3 != 0L || r._4 != 0L))
  }

  test("ANOVA F equals the sufficient-statistics replay") {
    val xs = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => r.getString(0) -> (r.getDouble(1) * 100).round)
    val g = xs.groupBy(_._1).map { case (_, v) =>
      val q = v.map(_._2)
      (q.size.toLong, q.sum, q.map(x => x * x).sum)
    }
    val (k, n) = (g.size.toLong, g.map(_._1).sum)
    val (s, ss) = (g.map(_._2).sum, g.map(_._3).sum)
    val bsum = g.map(t => rnd(t._2.toDouble * t._2.toDouble /
      t._1.toDouble)).sum
    val ssb = bsum.toDouble - s.toDouble * s.toDouble / n.toDouble
    val ssw = ss.toDouble - bsum.toDouble
    val fM = rnd(1e6 * (ssb / (k - 1).toDouble) /
      (ssw / (n - k).toDouble))
    val row = Relational.stat29Anova(spark, sf).collect().head
    assert(row.getLong(0) === k)
    assert(row.getLong(1) === n)
    assert(row.getLong(4) === fM)
    // return flag should NOT predict quantity: F near 1, not huge
    assert(fM > 0L && fM < 10000000L)
  }

  test("Kendall tau-b equals the pair-count replay over 1995 days") {
    val daily = Tables.orders(spark, sf)
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate,
        (r.getDouble(1) * 100).round))
      .filter(_._1.getYear == 1995)
      .groupBy(_._1).map { case (d, v) =>
        (d, v.size.toLong, v.map(_._2).sum) }.toSeq
    val pairs = for {
      a <- daily; b <- daily if a._1.isBefore(b._1)
    } yield (java.lang.Long.compare(a._2, b._2).sign,
      java.lang.Long.compare(a._3, b._3).sign)
    val n0 = pairs.size.toLong
    val c = pairs.count(p => p._1 * p._2 == 1).toLong
    val d = pairs.count(p => p._1 * p._2 == -1).toLong
    val tx = pairs.count(_._1 == 0).toLong
    val ty = pairs.count(_._2 == 0).toLong
    val tau = rnd(1e6 * (c - d).toDouble /
      math.sqrt(((n0 - tx) * (n0 - ty)).toDouble))
    val row = Relational.stat30Kendall(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4), row.getLong(5)) ===
      ((n0, c, d, tx, ty, tau)))
    // daily volume and revenue must correlate strongly positively
    assert(tau > 500000L)
  }

  test("t-closeness EMD equals the cumulative-gap replay") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDate,
        r.getString(2), r.getDouble(3)))
    val prof = ev.groupBy(_._1).map { case (u, xs) =>
      val firstDay = xs.map(_._2).min(
        Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      val cents = math.max(xs.map(x => rnd(x._4 * 100)).sum, 0L)
      val tier = math.floor(math.log10(1.0 + cents.toDouble)).toLong
      val modal = xs.groupBy(_._3).toSeq
        .map { case (t, v) => (t, v.size) }
        .sortBy { case (t, n) => (-n, t) }.head._1
      (u, firstDay, modal, tier)
    }.toSeq
    val tiers = prof.map(_._4).distinct.sorted
    val m = tiers.size
    val n = prof.size.toLong
    val gcum = tiers.map(t => t -> prof.count(_._4 <= t).toLong).toMap
    val emds = prof.groupBy(p => (p._2, p._3)).toSeq.map { case (_, xs) =>
      val sz = xs.size.toLong
      val gapSum = tiers.map { t =>
        val ccum = xs.count(_._4 <= t).toLong
        rnd(r6(math.abs(ccum.toDouble / sz.toDouble -
          gcum(t).toDouble / n.toDouble)) * 1e6)
      }.sum
      (sz, if (m > 1) rnd(gapSum.toDouble / (m - 1).toDouble) else 0L)
    }
    val want = (emds.size.toLong, m.toLong, emds.map(_._2).max,
      emds.count(_._2 > 200000L).toLong,
      emds.filter(_._2 > 200000L).map(_._1).sum)
    val row = Privacy.tCloseness(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) === want)
    // EMD is a [0, 1e6] share; with >1 tier, tiny classes drift
    // visibly (at sf0.001 all users land in one tier, so t = 0 —
    // the m > 1 regime is covered by the sf0.01/sf0.1 driver oracle)
    assert(row.getLong(2) >= 0L && row.getLong(2) <= 1000000L)
    if (m > 1) assert(row.getLong(2) > 0L)
  }

  test("best stump equals an exhaustive split search per feature") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.getString(2) == "1-URGENT") 1L else 0L))
    val lc = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.size.toLong }
    val feats: Seq[(String, Seq[(Long, Long)])] = Seq(
      "totalprice_k10" -> orders.map(o =>
        (math.floor(o._2 / 10000).toLong, o._3)).toSeq,
      "linecount" -> orders.filter(o => lc.contains(o._1))
        .map(o => (lc(o._1), o._3)).toSeq)
    def gini(p: Long, n: Long): Double =
      1.0 - (p.toDouble / n) * (p.toDouble / n) -
        ((n - p).toDouble / n) * ((n - p).toDouble / n)
    val want = feats.map { case (f, rows) =>
      val n = rows.size.toLong
      val pos = rows.map(_._2).sum
      val bins = rows.groupBy(_._1).toSeq.sortBy(_._1)
      val splits = bins.indices.dropRight(1).map { i =>
        val left = bins.take(i + 1).flatMap(_._2)
        val (nl, pl) = (left.size.toLong, left.map(_._2).sum)
        (bins(i)._1, nl, n - nl,
          rnd(1e6 * (gini(pos, n) -
            (nl.toDouble / n) * gini(pl, nl) -
            ((n - nl).toDouble / n) * gini(pos - pl, n - nl))))
      }
      val best = splits.sortBy(x => (-x._4, x._1)).head
      (f, best._1, best._2, best._3, best._4)
    }.toSet
    val got = Training.ml21Stump(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    // split gain can never be negative at the argmax: the sweep
    // includes near-degenerate boundaries whose gain tends to 0
    assert(got.forall(_._5 >= 0L))
  }
}
