package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 9: BH-FDR over per-type permutation tests and the
  * Brown–Forsythe spread test, restated driver-side.
  */
class Round7iSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("BH-FDR equals an independent permutation + step-up replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    def gap(xs: Seq[(Long, Long)]): Long = {
      val (ones, zeros) = xs.partition(_._2 == 1L)
      rnd(1e6 * (ones.map(_._1).sum.toDouble / ones.size -
        zeros.map(_._1).sum.toDouble / zeros.size))
    }
    val types = ev.map(_._2).distinct.sorted
    val pvals = types.map { t =>
      val rows = ev.filter(_._2 == t)
      val obs = gap(rows.map(r => (r._3, r._4)))
      val extreme = (0 until 100).count { b =>
        val g = gap(rows.map(r =>
          (r._3, md5_60(s"bhf:$b:${r._1}") % 2)))
        math.abs(g) >= math.abs(obs)
      }
      (t, obs, rnd(1e6 * (extreme + 1).toDouble / 101.0))
    }
    val m = pvals.size
    val ranked = pvals.sortBy { case (t, _, p) => (p, t) }.zipWithIndex
      .map { case ((t, obs, p), i) =>
        (t, obs, p, (i + 1).toLong,
          rnd((i + 1).toDouble * 50000 / m)) }
    val kstar = ranked.filter { case (_, _, p, _, th) => p <= th }
      .map(_._4).sorted.lastOption.getOrElse(0L)
    val want = ranked.map { case (t, obs, p, r, th) =>
      (t, obs, p, r, th, if (r <= kstar) 1L else 0L) }.toSet
    val got = Relational.stat32BhFdr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === want)
    // step-up coherence: every rejected rank sits at or below every
    // non-rejected rank
    val rej = got.filter(_._6 == 1L).map(_._4)
    val acc = got.filter(_._6 == 0L).map(_._4)
    if (rej.nonEmpty && acc.nonEmpty) assert(rej.max < acc.min)
  }

  test("Brown–Forsythe equals a driver-side median-ANOVA replay") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice")).cast("long").as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val z = o.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(r => (r._3, r._2))
      val med = sorted((g.size + 1) / 2 - 1)._3
      g.map(r => (r._1, math.abs(r._3 - med)))
    }.toSeq
    val cells = z.groupBy(_._1).values.map { g =>
      val n = g.size.toLong
      val sS = g.map(_._2).sum
      val ss = g.map(v => BigInt(v._2) * BigInt(v._2)).sum
      (n, sS, ss, rnd(sS.toDouble * sS.toDouble / n.toDouble))
    }.toSeq
    val k = cells.size.toLong
    val n = cells.map(_._1).sum
    val sTot = cells.map(_._2).sum
    val ssTot = cells.map(_._3).sum
    val bsum = cells.map(_._4).sum
    val ssb = bsum.toDouble - sTot.toDouble * sTot.toDouble / n.toDouble
    val ssw = ssTot.toDouble - bsum.toDouble
    val f = rnd(1e6 * (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble))
    val row = Relational.stat33Levene(spark, sf).collect().head
    assert(row.getLong(0) === k)
    assert(row.getLong(1) === n)
    assert(row.getLong(4) === f)
    // spreads genuinely differ little across priorities on TPC-H-ish
    // uniform prices — but the statistic must at least be positive
    // and finite
    assert(f >= 0L)
  }
}
