package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 17: DiD, Wilcoxon signed-rank, closed-form ridge —
  * each restated driver-side from first principles. */
class Round7qSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** (user, pre-cents, post-cents) for purchases, plus the full user
    * set — the shared fixture for DiD/Wilcoxon replays. */
  private lazy val events: Array[(Long, Int, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), dayofmonth(col("ts")).as("dom"),
        col("event_type"), round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.getString(2) == "purchase") r.getLong(3) else Long.MinValue))

  test("DiD equals the four-cell replay and the identity holds") {
    val perUser = events.groupBy(_._1).map { case (u, xs) =>
      val pre = xs.filter(e => e._3 != Long.MinValue && e._2 <= 15)
        .map(_._3).sum
      val post = xs.filter(e => e._3 != Long.MinValue && e._2 > 15)
        .map(_._3).sum
      (md5_60(s"did:$u") % 2 == 1, pre, post)
    }.toSeq
    def cell(treat: Boolean): (Long, Long, Long) = {
      val g = perUser.filter(_._1 == treat)
      (g.size.toLong,
        rnd(1e6 * g.map(_._2).sum.toDouble / g.size),
        rnd(1e6 * g.map(_._3).sum.toDouble / g.size))
    }
    val (nt, tp, tq) = cell(true)
    val (nc, cp, cq) = cell(false)
    val r = EventAnalytics.diffInDiff(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1)) === (nt, nc))
    assert((r.getLong(2), r.getLong(3)) === (tp, tq))
    assert((r.getLong(4), r.getLong(5)) === (cp, cq))
    assert(r.getLong(6) === (tq - tp) - (cq - cp))
    // both arms populated: the md5 coin actually splits the base
    assert(nt > 0 && nc > 0)
  }

  test("Wilcoxon doubled-rank algebra equals classic average ranks") {
    val ds = events.filter(_._3 != Long.MinValue).groupBy(_._1)
      .map { case (_, xs) =>
        xs.filter(_._2 > 15).map(_._3).sum -
          xs.filter(_._2 <= 15).map(_._3).sum
      }.filter(_ != 0L).toSeq
    val n = ds.size.toLong
    // classic fractional average ranks over |d|
    val sorted = ds.map(math.abs).sorted
    val avgRank: Map[Long, Double] = sorted.zipWithIndex
      .groupBy(_._1)
      .map { case (v, xs) =>
        v -> (xs.map(_._2 + 1).sum.toDouble / xs.size) }
    val wPlus = ds.filter(_ > 0).map(d => avgRank(math.abs(d))).sum
    val tsum = sorted.groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * t * t - t).sum
    val z = 1e6 * (2 * wPlus - n * (n + 1) / 2) /
      (2.0 * math.sqrt((2 * n * (n + 1) * (2 * n + 1) - tsum) / 48.0))
    val r = Relational.stat37Wilcoxon(spark, sf).collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === math.round(2 * wPlus)) // 2*W+ is integer
    assert(r.getLong(2) === tsum)
    assert(math.abs(r.getLong(3) - z) <= 1) // quantization-edge slack
  }

  test("ridge equals the normal-equations replay and shrinks with " +
    "lambda") {
    val rows = Tables.embeddings(spark, sf)
      .select(element_at(col("embedding"), 1).cast("double"),
        element_at(col("embedding"), 2).cast("double"),
        col("label").cast("long"))
      .collect()
      .map(r => (rnd(1e6 * r.getDouble(0)), rnd(1e6 * r.getDouble(1)),
        r.getLong(2) * 1000000L))
    val n = rows.length.toLong
    def s(f: ((Long, Long, Long)) => BigInt): BigInt = rows.map(f).sum
    val (sx1, sx2, sy) = (s(r => BigInt(r._1)), s(r => BigInt(r._2)),
      s(r => BigInt(r._3)))
    def ctr(sab: BigInt, a: BigInt, b: BigInt): Double =
      sab.toDouble - a.toDouble * b.toDouble / n.toDouble
    def solve(lam: Double): (Double, Double) = {
      val c11 = ctr(s(r => BigInt(r._1) * r._1), sx1, sx1)
      val c22 = ctr(s(r => BigInt(r._2) * r._2), sx2, sx2)
      val c12 = ctr(s(r => BigInt(r._1) * r._2), sx1, sx2)
      val c1y = ctr(s(r => BigInt(r._1) * r._3), sx1, sy)
      val c2y = ctr(s(r => BigInt(r._2) * r._3), sx2, sy)
      val det = (c11 + lam) * (c22 + lam) - c12 * c12
      ((c1y * (c22 + lam) - c12 * c2y) / det,
        ((c11 + lam) * c2y - c12 * c1y) / det)
    }
    val lam = n.toDouble * 1e9
    val (b1, b2) = solve(lam)
    val b0 = sy.toDouble / n - b1 * (sx1.toDouble / n) -
      b2 * (sx2.toDouble / n)
    val r = Training.ml25Ridge(spark, sf).collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === rnd(1e6 * b1))
    assert(r.getLong(2) === rnd(1e6 * b2))
    assert(r.getLong(3) === rnd(b0))
    // ridge property: a 100x-larger penalty strictly shrinks ||beta||
    val (h1, h2) = solve(100 * lam)
    assert(h1 * h1 + h2 * h2 < b1 * b1 + b2 * b2)
  }
}
