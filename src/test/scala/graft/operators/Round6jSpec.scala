package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 seventh batch: PR/AP curve, RFM quintiles, Gini
  * concentration, naive-Bayes confusion, bounded k-core peel. Each
  * test restates the operator's math independently driver-side (the
  * RoundNSpec convention) so a regression can't hide behind the
  * DuckDB oracle sharing the same plan shape.
  */
class Round6jSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("prAuc: precision/recall monotone bookends + AP from the curve") {
    val rows = Profiling.prAuc(spark, sf).collect()
    assert(rows.nonEmpty)
    val byBinDesc = rows.sortBy(r => -r.getLong(0))
    // cum_tp / cum_fp are cumulative from the high-score end
    assert(byBinDesc.map(_.getLong(1)).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true })
    // final recall = 1e6 (the last threshold accepts everything)
    assert(byBinDesc.last.getLong(4) === 1000000L)
    // AP is constant across rows and replays from the curve itself:
    // AP = sum(np_b * prec_b) / n_pos with np_b = delta cum_tp
    val nPos = byBinDesc.last.getLong(1)
    val terms = byBinDesc.zipWithIndex.map { case (r, i) =>
      val npB = r.getLong(1) - (if (i == 0) 0L else byBinDesc(i - 1).getLong(1))
      npB * r.getLong(3)
    }
    assert(rows.map(_.getLong(5)).toSet.size === 1)
    assert(rows.head.getLong(5) === rnd(terms.sum.toDouble / nPos))
  }

  test("rfm: quintile grid covers every user exactly once") {
    val cells = EventAnalytics.rfm(spark, sf).collect()
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(cells.map(_.getLong(3)).sum === nUsers)
    // quintile labels live in 1..5
    assert(cells.forall(r => (1L to 5L).contains(r.getLong(0)) &&
      (1L to 5L).contains(r.getLong(1)) && (1L to 5L).contains(r.getLong(2))))
    // total monetary cents across cells == purchase cents in the data
    val totalCents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(cells.map(_.getLong(4)).sum === totalCents)
  }

  test("stat24Gini replays from the collected per-user cents") {
    val row = Relational.stat24Gini(spark, sf).collect()(0)
    val cents = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = cents.length.toLong
    val tot = cents.sum
    val rw = cents.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === tot)
    assert(row.getLong(2) ===
      rnd(1e6 * (2L * rw - (n + 1L) * tot).toDouble / (n * tot).toDouble))
    // Gini of a non-degenerate positive distribution sits in (0, 1)
    assert(row.getLong(2) > 0L && row.getLong(2) < 1000000L)
  }

  test("naiveBayes: confusion matrix replays from the collected corpus") {
    val conf = Training.naiveBayes(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // independent driver-side replay of the whole pipeline: md5 split,
    // Laplace-smoothed multinomial model, micro-nat scoring, argmax.
    // (No accuracy assertion — the fixture text is English word-salad,
    // so the lang label carries little text signal; what this pins is
    // the MODEL MATH, not the corpus's separability.)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    def b100(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      var v = 0L
      for (i <- 0 until 7) v = (v << 8) | (d(i) & 0xFFL)
      (((v << 4) | ((d(7) & 0xF0L) >> 4)) % 100 + 100) % 100
    }
    val (train, test) = docs.partition(d => b100(d._1) < 50)
    val model = train.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nL = model.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = train.flatMap(_._3).distinct.length.toLong
    val nTr = train.length.toLong
    val priors = train.groupBy(_._2).view.mapValues { ds =>
      rnd(1e6 * math.log(ds.length.toDouble / nTr)) }.toMap
    val pens = nL.map { case (l, n) => l -> rnd(1e6 * math.log((n + v).toDouble)) }
    // argmax with score desc, lang asc tiebreak
    val expect = test.map { case (_, langTrue, toks) =>
      val best = priors.keys.toSeq.sorted.map { l =>
        val s1 = toks.map(t => model.get((l, t))
          .map(c => rnd(1e6 * math.log(c.toDouble + 1.0))).getOrElse(0L)).sum
        (l, s1 - toks.length * pens(l) + priors(l))
      }.sortBy { case (l, sc) => (-sc, l) }.head._1
      (langTrue, best)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(conf === expect)
  }

  test("kcore: every surviving node keeps degree >= k, peel is a fixpoint") {
    val core = Graphs.kcore(spark, sf).collect()
    assert(core.nonEmpty)
    assert(core.forall(_.getLong(1) >= 4L))
    // driver-side replay: derive the same md5 graph, peel to fixpoint,
    // compare the surviving node set AND per-node core degree
    val n = Tables.documents(spark, sf).count()
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var v = 0L
      for (i <- 0 until 7) v = (v << 8) | (d(i) & 0xFFL)
      (v << 4) | ((d(7) & 0xF0L) >> 4)
    }
    val edges = scala.collection.mutable.Set.empty[(Long, Long)]
    for (i <- 0L until n) {
      val deg = 1 + (h60(s"kc:$i") % 5)
      for (j <- 0L until deg) {
        val dst = h60(s"kc:$i:$j") % n
        if (dst != i) edges += ((math.min(i, dst), math.max(i, dst)))
      }
    }
    val adj = scala.collection.mutable.Map.empty[Long,
      scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    var changed = true
    while (changed) {
      val rm = adj.collect { case (x, s2) if s2.size < 4 => x }.toSeq
      changed = rm.nonEmpty
      rm.foreach { x =>
        adj(x).foreach(m => adj(m) -= x)
        adj -= x
      }
    }
    val expect = adj.map { case (x, s2) => (x, s2.size.toLong) }.toMap
    assert(core.map(r => (r.getLong(0), r.getLong(1))).toMap === expect)
  }
}
