package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 13: Cohen's kappa and the Theil decomposition,
  * restated driver-side.
  */
class Round7mSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("Cohen's kappa equals a contingency replay and sits below " +
    "raw agreement") {
    val preds = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](0)
        val sa = (0 until 8).map(i => rnd(e(i).toDouble * 1e6)).sum
        val sb = (8 until 16).map(i => rnd(e(i).toDouble * 1e6)).sum
        (if (sa > 0) 1L else 0L, if (sb > 0) 1L else 0L)
      }
    val n = preds.length.toLong
    val agree = preds.count(p => p._1 == p._2).toLong
    val a1 = preds.map(_._1).sum
    val b1 = preds.map(_._2).sum
    val po = agree.toDouble / n
    val pe = (a1.toDouble * b1 + (n - a1).toDouble * (n - b1)) /
      (n.toDouble * n)
    val row = Profiling.cohensKappa(spark, sf).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === agree)
    assert(row.getLong(2) === rnd(1e6 * po))
    assert(row.getLong(3) === rnd(1e6 * pe))
    assert(row.getLong(4) === rnd(1e6 * (po - pe) / (1 - pe)))
    // chance correction bites: kappa strictly below raw agreement
    assert(row.getLong(4) < row.getLong(2))
  }

  test("Theil decomposition replays and within+between ≈ the direct " +
    "total index") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    val n = docs.length.toLong
    val xt = docs.map(_._2).sum
    val want = bySrc.map { case (src, g) =>
      val nG = g.size.toLong
      val xG = g.map(_._2).sum
      val sumTerm = g.map { case (_, x) =>
        val ratio = x.toDouble * nG / xG
        rnd(1e6 * ratio * math.log(ratio))
      }.sum
      val share = xG.toDouble / xt
      (src, nG, rnd(1e6 * share), rnd(sumTerm.toDouble / nG),
        rnd(share * sumTerm.toDouble / nG),
        rnd(1e6 * share * math.log(share * n / nG)))
    }.toSet
    val got = Relational.stat36Theil(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSet === want)
    // decomposition identity: within + between equals the direct
    // whole-corpus Theil up to per-row quantization slack
    val mu = xt.toDouble / n
    val directT = docs.map { case (_, x) =>
      (x / mu) * math.log(x / mu) }.sum / n
    val totalRow = Relational.stat36Theil(spark, sf).collect().head
    val decomposed = totalRow.getLong(8)
    assert(math.abs(decomposed - rnd(1e6 * directT)) < 1000,
      s"decomposed=$decomposed direct=${rnd(1e6 * directT)}")
    // and the index is nonnegative with a nonzero between part
    // (sources differ in mean length on this corpus) — at minimum
    // the total is positive
    assert(decomposed > 0)
  }
}
