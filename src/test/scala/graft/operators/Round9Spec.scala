package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-9 batch 1: first-principles replays for the sketch-median
  * Levene face and the repaired CDC streaming state. */
class Round9Spec extends SparkSpec {

  test("stat42 sketch-median contract: every group's GK center sits " +
    "within the rank window the exact order statistics define") {
    val groups = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice")).cast("long").as("x"))
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val got = Relational.stat42LeveneSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got.keySet === groups.keySet)
    groups.foreach { case (g, xs) =>
      assert(got(g)._1 === xs.length.toLong, s"n_g mismatch for $g")
      // the operator's claim is the CONTRACT, so the spec replays the
      // bound itself: the flag must be true because |rank(amed) - n/2|
      // <= n/accuracy holds for a correct GK sketch at accuracy=1000
      assert(got(g)._2, s"rank contract violated for $g")
    }
  }

  test("sim_ann_bq replays from first principles: sign codes, Hamming " +
    "shortlist, exact cosine rerank") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val qv = rows.find(_._1 == 0L).get._2
    def code(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach { i =>
        if (v(i) > 0) lo |= (1L << i)
        if (v(i + 32) > 0) hi |= (1L << i)
      }
      (lo, hi)
    }
    val (qlo, qhi) = code(qv)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v) =>
        val (lo, hi) = code(v)
        (id, v, java.lang.Long.bitCount(lo ^ qlo) +
          java.lang.Long.bitCount(hi ^ qhi))
      }
      .sortBy { case (id, _, h) => (h, id) }.take(50)
      .map { case (id, v, _) =>
        (id, BigDecimal(cos(v, qv)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(10).toSeq
    val got = Similarity.annBinaryQuant(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  private def viterbi(word: String): (Long, Seq[String]) = {
    val n = word.length
    // dp(p) = (best score of word[0,p), piece length chosen at p)
    val dp = Array.fill(n + 1)((Long.MinValue / 4, 0))
    dp(0) = (0L, 0)
    (1 to n).foreach { i =>
      var best = (dp(i - 1)._1 + Training.ugCharMicros, 1)
      if (i >= 2 && Training.wpBi.contains(word.substring(i - 2, i))) {
        val c = (dp(i - 2)._1 + Training.ugBiMicros, 2)
        if (c._1 > best._1 || (c._1 == best._1 && c._2 > best._2))
          best = c
      }
      if (i >= 3 && Training.wpTri.contains(word.substring(i - 3, i))) {
        val c = (dp(i - 3)._1 + Training.ugTriMicros, 3)
        if (c._1 > best._1 || (c._1 == best._1 && c._2 > best._2))
          best = c
      }
      dp(i) = best
    }
    var pos = n
    var toks = List.empty[String]
    while (pos > 0) {
      val pl = dp(pos)._2
      toks ::= word.substring(pos - pl, pos)
      pos -= pl
    }
    (dp(n)._1, toks)
  }

  test("tok11 unigram: Viterbi DP replay reproduces top-10 pieces, " +
    "totals and corpus log-likelihood") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(regexp_replace(lower(col("text")),
        "[^a-z]+", " "), " ")).as("w"))
      .filter(length(col("w")).between(1, Training.ugMaxLen))
      .groupBy(col("w")).agg(count(lit(1)).as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val segs = words.map { case (w, m) =>
      val (sc, toks) = viterbi(w); (w, m, sc, toks)
    }
    val nWords = words.map(_._2).sum
    val nTokens = segs.map { case (_, m, _, t) => m * t.length }.sum
    val ll = segs.map { case (_, m, sc, _) => m * sc }.sum
    val top = segs.flatMap { case (_, m, _, t) => t.map(_ -> m) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(10)
    val got = Training.tok11Unigram(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === top)
    val h = got.head
    assert(h.getLong(2) === nWords)
    assert(h.getLong(3) === nTokens)
    assert(h.getLong(4) === 1000000L * top.head._2 / nTokens)
    assert(h.getLong(5) === 1000000L * nTokens / nWords)
    assert(h.getLong(6) === ll)
  }

  test("tok11 diverges from tok10's greedy where the global optimum " +
    "needs a shorter first piece (the 'ther' case)") {
    // greedy longest-match takes the+r; Viterbi's equal-score
    // longer-last-piece tie-break lands on t+her
    assert(viterbi("ther")._2 === Seq("t", "her"))
  }

  test("dedup_cross_near_indexed: the staged-history index classifies " +
    "bit-identically to the in-session form") {
    val docs = Tables.documents(spark, sf)
    val batch = Fixtures.crawlBatch(docs)
    val want = Dedup.nearDupCross(spark, docs, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.nearDupCrossIndexed(spark, docs, batch, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("sim_ann_bq_indexed: the persisted code table answers " +
    "bit-identically to the in-session BQ") {
    val want = Similarity.annBinaryQuant(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Similarity.annBinaryQuantIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("ret7 MRR replays from first principles: first strict-coverage " +
    "hit per query, integer reciprocal ranks, integer mean") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).filter(_.nonEmpty).toSet).toMap
    val expected = Retrieval.MrrQueries.map { case (qid, qts) =>
      val ranked = TextAnalysis.bm25(
        Tables.documents(spark, sf), qts, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, sc) => (-sc, id) }
      val firstRel = ranked.zipWithIndex.collectFirst {
        case ((id, _), i) if qts.forall(toks(id).contains) => i + 1L
      }.getOrElse(0L)
      (qid, ranked.length.toLong, firstRel,
        if (firstRel > 0) 1000000L / firstRel else 0L)
    }
    val mrrExp = expected.map(_._4).sum / Retrieval.MrrQueries.size
    val got = Retrieval.mrr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq === expected)
    assert(got.forall(_._5 == mrrExp))
  }

  test("priv8 DP top-k replays from first principles: Gumbel-noised " +
    "distinct-doc utilities, k winners in key order") {
    val dfs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .collect()
      .flatMap(r => r.getSeq[String](1).filter(_.nonEmpty).distinct
        .map(t => (r.getLong(0), t)))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def md60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = dfs.toSeq.map { case (tok, df) =>
      val u = (math.floorMod(md60("dpt:" + tok), 1000000L) + 0.5) / 1e6
      val key = math.round(1e6 *
        (r6(0.5 * df) + r6(-math.log(-math.log(u)))))
      (tok, df, key)
    }.sortBy { case (tok, _, key) => (-key, tok) }.take(10)
      .zipWithIndex
      .map { case ((tok, df, key), i) => (i + 1L, tok, df, key) }
    val got = Privacy.dpTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("zorder2 Hilbert keys replay the reflection/rotation recurrence " +
    "and block boxes restate from the key groups") {
    val keys = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (xm, ym) = (keys.map(_._1).max, keys.map(_._2).max)
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var i = 15
      while (i >= 0) {
        val sb = 1L << i
        val rx = if ((x & sb) != 0) 1L else 0L
        val ry = if ((y & sb) != 0) 1L else 0L
        d += sb * sb * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 65535L - x; y = 65535L - y }
          val t = x; x = y; y = t
        }
        i -= 1
      }
      d
    }
    val expected = keys.map { case (kx, ky) =>
      val x = math.floor(kx.toDouble * 65535 / xm).toLong
      val y = math.floor(ky.toDouble * 65535 / ym).toLong
      (xy2d(x, y) >> 26, x, y)
    }.groupBy(_._1).map { case (b, g) =>
      (b, (g.length.toLong, g.map(_._2).min, g.map(_._2).max,
        g.map(_._3).min, g.map(_._3).max))
    }
    val got = Packing.hilbertBlocks(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
  }

  test("ev31 DiD replays from first principles: integer midpoint " +
    "split, exact cell means, mirrored estimate") {
    val rows = Tables.events(spark, sf)
      .select((col("user_id") % 2 === 0).cast("long"),
        col("ts").cast("long"),
        round(col("value") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val cells = rows.groupBy(r => (r._1, if (r._2 >= mid) 1L else 0L))
      .map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum) }
    def mean(t: Long, p: Long) = {
      val (n, sv) = cells((t, p)); sv.toDouble / n
    }
    val did = math.round(1e6 *
      ((mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))))
    val out = EventAnalytics.ev31Did(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.keySet === cells.keySet)
    cells.foreach { case (k, (n, sv)) =>
      val (gn, gs, gm, gd) = out(k)
      assert(gn === n && gs === sv)
      assert(gm === math.round(100.0 * sv.toDouble / n))
      assert(gd === did)
    }
  }

  test("geo7 Gi* replays from first principles over the sparse cell " +
    "grid") {
    val cells = Spatial.points(spark, sf)
      .select(floor(col("x") / 2000000L).cast("long"),
        floor(col("y") / 2000000L).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nc = cells.size.toLong
    val sn = cells.values.sum
    val sn2 = cells.values.map(n => n * n).sum
    val mean = sn.toDouble / nc
    val sd = math.sqrt(sn2.toDouble / nc - mean * mean)
    val expected = cells.keys.map { case (cx, cy) =>
      val nbrs = for {
        dx <- -1 to 1; dy <- -1 to 1
        n <- cells.get((cx + dx, cy + dy))
      } yield n
      val w = nbrs.length.toDouble
      val sSum = nbrs.sum
      val den = sd * math.sqrt((nc * w - w * w) / (nc - 1.0))
      val gi = math.round(1e6 * ((sSum - w * mean) / den))
      ((cx, cy), (nbrs.length.toLong, sSum, gi))
    }.toSeq
      .sortBy { case ((cx, cy), (_, _, gi)) => (-gi, cx, cy) }.take(10)
    val got = Spatial.giStar(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5)))).toSeq
    assert(got === expected)
  }
}
