package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 ninth batch: STL decomposition, per-user entropy, pairwise
  * source JSD. Driver-side replays per the RoundNSpec convention.
  */
class Round6lSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("stl: components reassemble the series exactly; replay from daily counts") {
    val rows = EventAnalytics.stlDecompose(spark, sf).collect()
      .sortBy(_.getString(0))
    // x*1e6 == trend + seasonal + residual by construction — exact
    rows.foreach { r =>
      assert(r.getLong(1) * 1000000L ===
        r.getLong(2) + r.getLong(3) + r.getLong(4), r.toString)
    }
    // trend replays from the collected daily series
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      .select(date_format(col("d"), "yyyy-MM-dd"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val xs = daily.map(_._2)
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 3); val hi = math.min(xs.length - 1, i + 3)
      val win = xs.slice(lo, hi + 1)
      assert(r.getLong(2) === rnd(1e6 * win.sum.toDouble / win.length),
        s"trend at ${r.getString(0)}")
    }
    // seasonal: exactly one value per epoch-day-mod-7 class
    val byDow = rows.groupBy(r =>
      java.time.LocalDate.parse(r.getString(0)).toEpochDay % 7)
    byDow.values.foreach(g => assert(g.map(_.getLong(3)).toSet.size === 1))
  }

  test("userEntropy: H >= 0, zero iff single-type user, replay") {
    val got = EventAnalytics.userEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val cells = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = cells.groupBy(_._1).map { case (u, cs) =>
      val n = cs.map(_._3).sum
      val h = cs.map { case (_, _, c) =>
        rnd(-1e6 * (c.toDouble / n) * math.log(c.toDouble / n)) }.sum
      u -> (n, cs.length.toLong, h)
    }
    assert(got === expect)
    got.values.foreach { case (_, k, h) =>
      assert(h >= 0L)
      assert((k == 1L) == (h == 0L))
    }
  }

  test("collocations: PMI replays from collected counts; min-count holds") {
    val rows = TextAnalysis.collocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val toks = Tables.documents(spark, sf).select(col("text")).collect()
      .map(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong)
    val pairsAll = toks.flatMap(t => t.zip(t.drop(1)))
    val big = pairsAll.groupBy(identity).view.mapValues(_.length.toLong)
    val n = toks.map(_.length.toLong).sum
    val b = pairsAll.length.toLong
    rows.foreach { r =>
      val (w1, w2, c12) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(c12 >= 5L && big((w1, w2)) === c12)
      assert(r.getLong(3) === uni(w1) && r.getLong(4) === uni(w2))
      assert(r.getLong(5) === rnd(1e6 * math.log(
        (c12.toDouble * n.toDouble * n.toDouble) /
        (b.toDouble * uni(w1).toDouble * uni(w2).toDouble))))
    }
    // descending with full tie-break
    assert(rows.map(r => (-r.getLong(5), r.getString(0), r.getString(1)))
      .toSeq === rows.map(r => (-r.getLong(5), r.getString(0),
        r.getString(1))).sortBy(identity).toSeq)
  }

  test("keyness: top-k per source, G2 replays, zero-b guarded") {
    val rows = TextAnalysis.keyness(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.values.foreach { g =>
      assert(g.length <= 5)
      assert(g.map(_.getLong(1)).sorted.toSeq ===
        (1L to g.length.toLong).toSeq)
    }
    // replay one source's top token from collected counts
    val r0 = rows.minBy(r => (r.getString(0), r.getLong(1)))
    val cells = Tables.documents(spark, sf)
      .select(col("source"),
        explode(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("a"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val a = cells.filter(c => c._1 == r0.getString(0) &&
      c._2 == r0.getString(2)).map(_._3).sum
    val ct = cells.filter(_._2 == r0.getString(2)).map(_._3).sum
    val ns = cells.filter(_._1 == r0.getString(0)).map(_._3).sum
    val n = cells.map(_._3).sum
    val bb = ct - a
    val ea = ns.toDouble * ct.toDouble / n.toDouble
    val eb = (n - ns).toDouble * ct.toDouble / n.toDouble
    val g2 = rnd(2e6 * (a.toDouble * math.log(a.toDouble / ea) +
      (if (bb > 0) bb.toDouble * math.log(bb.toDouble / eb) else 0.0)))
    assert(r0.getLong(3) === a && r0.getLong(4) === bb)
    assert(r0.getLong(5) === g2)
  }

  test("heapsGrowth: curve monotone, endpoint = full vocab, slope replays") {
    val rows = TextAnalysis.heapsGrowth(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L).toSeq)
    // vocabulary can only grow with the prefix
    assert(rows.map(_.getLong(2)).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true })
    // the last checkpoint covers every doc => the full corpus vocab
    val fullVocab = Tables.documents(spark, sf)
      .select(explode(filter(split(lower(col("text")), "\\s+"),
        t => length(t) > 0)).as("t"))
      .select(col("t")).distinct().count()
    assert(rows.last.getLong(2) === fullVocab)
    // slope replays from the micro-quantized points
    val pts = rows.map(r => (rnd(1e6 * math.log(r.getLong(1).toDouble)),
      rnd(1e6 * math.log(r.getLong(2).toDouble))))
    val k = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = rnd(1e6 * (k * sxy - sx * sy).toDouble /
      (k * sxx - sx * sx).toDouble)
    assert(rows.forall(_.getLong(3) === beta))
    // β ∈ [0, 1): the fixture's ~31-token vocab saturates inside the
    // first decile, so β = 0 here is the CORRECT reading (a natural
    // corpus sits around 0.4-0.6); sublinearity is the invariant
    assert(beta >= 0L && beta < 1000000L)
  }

  test("aspectProfile: decoded headers match the synthesis rule exactly") {
    val prof = Multimodal.aspectProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => ((id % 8) * 64 + 64, (id % 5) * 64 + 64))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(prof === expect)
  }

  test("reciprocity: bounded ratio replays from the collected edge set") {
    val r = Graphs.reciprocity(spark, sf).collect()(0)
    val edges = Graphs.linkEdges(spark, sf).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val mutual = edges.count { case (a, b) => edges.contains((b, a)) }
    assert(r.getLong(0) === edges.size.toLong)
    assert(r.getLong(1) === mutual.toLong)
    assert(r.getLong(2) === rnd(1e6 * mutual.toDouble / edges.size))
  }

  test("neymanAllocation: weights replay; allocation tracks the budget") {
    val rows = Sampling.neymanAllocation(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val xs = docs.filter(_._1 == r.getString(0)).map(_._2)
      val n = xs.length.toLong
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === rnd(math.sqrt((n * sxx - sx * sx).toDouble)))
    }
    // rounding drift only: total allocation within ±|strata|/2 of 100
    assert(math.abs(rows.map(_.getLong(3)).sum - 100L) <=
      rows.length.toLong / 2 + 1)
  }

  test("lexicalDiversity: ratios replay, hapax bounded by types") {
    val rows = TextAnalysis.lexicalDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, ty, hx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ty <= nt && hx <= ty, r.toString)
      assert(r.getLong(4) === rnd(1e6 * ty.toDouble / nt))
      assert(r.getLong(5) === rnd(1e6 * hx.toDouble / ty))
    }
  }

  test("stat27Spearman: replays from collected per-user ranks") {
    val r = Relational.stat27Spearman(spark, sf).collect()(0)
    val pu = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val ra = pu.sortBy(u => (u._2, u._1)).zipWithIndex
      .map { case (u, i) => u._1 -> (i + 1L) }.toMap
    val rb = pu.sortBy(u => (u._3, u._1)).zipWithIndex
      .map { case (u, i) => u._1 -> (i + 1L) }.toMap
    val n = pu.length.toLong
    val d2 = pu.map(u => { val d = ra(u._1) - rb(u._1); d * d }).sum
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === d2)
    assert(r.getLong(2) ===
      rnd(1e6 * (1.0 - (6L * d2).toDouble / (n * (n * n - 1L)))))
    // event count and spend are positively associated by construction
    assert(r.getLong(2) > 0L)
  }

  test("chao1: estimate >= observed vocab, replays from counts") {
    val r = TextAnalysis.chao1(spark, sf).collect()(0)
    val (v, f1, f2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val est =
      if (f2 > 0) rnd(1e6 * (v.toDouble + (f1 * f1).toDouble / (2 * f2)))
      else rnd(1e6 * (v.toDouble + (f1 * (f1 - 1)).toDouble / 2.0))
    assert(r.getLong(3) === est)
    assert(r.getLong(3) >= v * 1000000L) // the estimator only adds
  }

  test("timeToConvert: replays from collected events, rate consistent") {
    val r = EventAnalytics.timeToConvert(spark, sf).collect()
    assert(r.length === 1)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val su = evs.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val deltas = su.flatMap { case (u, s) =>
      val ps = evs.filter(e => e._1 == u && e._2 == "purchase" &&
        e._3 >= s).map(_._3)
      if (ps.isEmpty) None else Some(ps.min - s)
    }.toSeq
    assert(r(0).getLong(0) === su.size.toLong)
    assert(r(0).getLong(1) === deltas.length.toLong)
    assert(r(0).getLong(2) ===
      rnd(1e6 * deltas.length.toDouble / su.size))
    // max latency replays exactly
    assert(r(0).getDouble(5) ===
      BigDecimal(deltas.max.toDouble / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("clusterSizes: histogram conserves docs and clusters") {
    val labels = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(Fixtures.mutantSlice(spark, sf)))
    val hist = Dedup.clusterSizes(labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = labels.collect()
    // Σ size·count == total labeled docs; Σ count == distinct components
    assert(hist.map { case (sz, n) => sz * n }.sum === rows.length.toLong)
    assert(hist.values.sum ===
      rows.map(_.getLong(1)).distinct.length.toLong)
    // no singleton "clusters": every component came from a pair
    assert(hist.keys.forall(_ >= 2L))
  }

  test("dedupThresholdCurve: monotone nonincreasing, anchored to minhashLsh") {
    val docs = Fixtures.mutantDocs(spark, sf)
    val curve = Dedup.dedupThresholdCurve(spark, docs).collect()
      .sortBy(_.getLong(0))
    assert(curve.map(_.getLong(0)).toSeq === Seq(50L, 60L, 70L, 80L, 90L))
    // a higher cutoff can only drop pairs
    assert(curve.map(_.getLong(1)).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true })
    // the 0.5 point equals the standalone operator's default output
    assert(curve.head.getLong(1) ===
      Dedup.minhashLsh(spark, docs).count())
  }

  test("pixelHistogram: bins partition every byte; replay one doc") {
    val hist = Multimodal.pixelHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hist.keys.forall { case (_, b) => b >= 0L && b <= 15L })
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // total binned bytes == total payload bytes
    assert(hist.values.sum === docs.map(_._2.length.toLong).sum)
    // full replay of the first doc's histogram
    val (d0, t0) = docs.minBy(_._1)
    val expect = t0.map(c => (c.toInt / 16).toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    expect.foreach { case (b, n) => assert(hist((d0, b)) === n) }
  }

  test("thresholdOpt: F1 replays and is the max over the full sweep") {
    val r = Profiling.thresholdOpt(spark, sf).collect()
    assert(r.length === 1)
    val (tp, fp, fn) = (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(r(0).getLong(6) ===
      rnd(1e6 * (2.0 * tp) / (2.0 * tp + fp + fn)))
    assert(r(0).getLong(4) === rnd(1e6 * tp.toDouble / (tp + fp)))
    assert(r(0).getLong(5) === rnd(1e6 * tp.toDouble / (tp + fn)))
    // no other operating point on the curve beats it
    val pts = Profiling.prAuc(spark, sf).collect()
    val best = pts.map { p =>
      val (ctp, cfp) = (p.getLong(1), p.getLong(2))
      val nPos = math.round(ctp / (p.getLong(4) / 1e6)) // recall = tp/n_pos
      rnd(1e6 * (2.0 * ctp) / (2.0 * ctp + cfp + (nPos - ctp)))
    }.max
    assert(r(0).getLong(6) === best)
  }

  test("minhashErrorProfile: histogram covers all candidates, head-heavy") {
    val docs = Fixtures.mutantDocs(spark, sf)
    val hist = Dedup.minhashErrorProfile(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.keys.forall(k => k >= 0L && k <= 9L))
    // bucket mass equals the banded candidate-pair count (nothing lost)
    val nCands = Dedup.minhashLsh(spark, docs, threshold = 0.0).count()
    assert(hist.values.sum === nCands)
    // k=16 sketch: more mass within |err| < 0.2 than outside (the
    // sketch would be useless otherwise)
    val head = hist.getOrElse(0L, 0L) + hist.getOrElse(1L, 0L)
    assert(head > hist.values.sum - head,
      s"estimator errors must concentrate near zero: $hist")
  }

  test("ivfRecallCurve: monotone nondecreasing in nprobe, full grid") {
    val rows = Similarity.ivfRecallCurve(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    // more probes can only add candidates: recall is nondecreasing
    assert(rows.map(_.getLong(1)).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true })
    // nprobe=3 must agree with the standalone sim_ann_ivf recall
    val ivf3 = Similarity.annIvf(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val truth = Similarity.annBruteForce(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(rows(2).getLong(1) === (ivf3 & truth).size.toLong)
  }

  test("epochAlloc: caps bind, shares conserve, epochs replay") {
    val rows = TextAnalysis.dataConstrainedEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, share, alloc, em, unfilled) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(alloc === math.min(4L * t, share))
      assert(unfilled === share - alloc)
      assert(em <= 4000000L) // the repeat cap is the ceiling
      assert(em === rnd(1e6 * alloc.toDouble / t))
    }
    // every source gets the same share (equal-voice split)
    assert(rows.map(_.getLong(2)).toSet.size === 1)
  }

  test("conversionCi: bounds bracket p_hat inside [0,1]; replay one day") {
    val rows = EventAnalytics.conversionCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, r.toString)
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9, r.toString)
    }
    // replay the Wilson math for the first day from its own counts
    val r0 = rows.minBy(_.getString(0))
    val (n, k) = (r0.getLong(1).toDouble, r0.getLong(2).toDouble)
    val z = 1.96; val z2 = z * z
    val p = k / n
    val center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
    val half = (z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) /
      (1.0 + z2 / n)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getDouble(4) === r6(center - half))
    assert(r0.getDouble(5) === r6(center + half))
  }

  test("negativeSampling: weights normalize, dampening flattens the head") {
    val rows = Training.negativeSampling(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // weights sum to 1e6 within per-row rounding drift
    assert(math.abs(rows.map(_.getLong(4)).sum - 1000000L) <=
      rows.length.toLong)
    // dampened: the head token's weight share is LESS than its raw
    // count share (that's what the 3/4 power is for)
    val cTot = rows.map(_.getLong(2)).sum.toDouble
    val head = rows.head
    assert(head.getLong(4).toDouble / 1e6 < head.getLong(2) / cTot)
    // s_micros replays exp(0.75 ln c)
    rows.foreach { r =>
      assert(r.getLong(3) ===
        rnd(1e6 * math.exp(0.75 * math.log(r.getLong(2).toDouble))))
    }
  }

  test("markovStationary: mass conserved to rounding, fixpoint of P") {
    val pi = EventAnalytics.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pi.nonEmpty)
    // total mass within k/2 micros of 1e6 (rounding drift only)
    assert(math.abs(pi.values.sum - 1000000L) <= pi.size.toLong)
    // one more integer-micro power step is a no-op (converged)
    val trans = EventAnalytics.markovTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val states = pi.keys.toSeq.sorted
    val next = states.map { j =>
      val acc = states.map(i => pi(i) * trans.getOrElse((i, j), 0L)).sum
      j -> rnd(acc.toDouble / 1e6)
    }.toMap
    assert(next === pi, "20 rounds must reach the integer fixpoint")
  }

  test("bpeMergeImpact: totals chain, savings positive and rank-plausible") {
    val rows = Training.bpeMergeImpact(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length === 10)
    // consecutive rules chain: after(r) == before(r+1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(5) === b.getLong(4))
      case _ =>
    }
    // every learned rule saves at least one token, never more than its
    // training-time pair count (overlaps can only reduce application)
    rows.foreach { r =>
      assert(r.getLong(6) >= 1L, r.toString)
      assert(r.getLong(6) <= r.getLong(3), r.toString)
    }
    // before-totals replay against tok3's whole-corpus token count at
    // iter 0: chars of the filtered vocab, cnt-weighted
    val t0 = rows.head.getLong(4)
    val charTotal = Tables.documents(spark, sf)
      .select(explode(filter(split(lower(col("text")), "\\s+"),
        t => t.rlike("^[a-z]+$"))).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    assert(t0 === charTotal, "iter-0 segmentation is one token per char")
  }

  test("jsdSources: symmetric-by-construction pairs, bounded by ln 2, replay") {
    val rows = TextAnalysis.jsdSources(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length.toLong === nSrc * (nSrc - 1) / 2)
    val ln2micro = rnd(1e6 * math.log(2.0))
    rows.foreach { r =>
      val jsd = r.getLong(3)
      assert(jsd >= 0L && jsd <= ln2micro + 2L, r.toString)
    }
    // replay one pair end-to-end from collected token counts
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    val toks = Tables.documents(spark, sf)
      .filter(col("source").isin(sa, sb))
      .select(col("source"),
        explode(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ca = toks.filter(_._1 == sa).map(t => t._2 -> t._3).toMap
    val cb = toks.filter(_._1 == sb).map(t => t._2 -> t._3).toMap
    val (na, nb) = (ca.values.sum, cb.values.sum)
    val shared = ca.keySet & cb.keySet
    val interTerm = shared.toSeq.map { t =>
      val p = ca(t).toDouble / na; val q = cb(t).toDouble / nb
      rnd(1e6 * (p / 2 * math.log(2 * p / (p + q)) +
        q / 2 * math.log(2 * q / (p + q))))
    }.sum
    val rem = rnd(1e6 * (math.log(2.0) / 2.0) *
      ((na - shared.toSeq.map(ca).sum).toDouble / na +
       (nb - shared.toSeq.map(cb).sum).toDouble / nb))
    assert(rows.head.getLong(2) === shared.size.toLong)
    assert(rows.head.getLong(3) === interTerm + rem)
  }
}
