package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-8 batch 1: driver-side replays from first principles for the
  * changepoint locator, the normality/outlier tests, the FD audit, the
  * closed-form LDA, the centroid silhouette, greedy k-center and the
  * 3-way brand lift. */
class Round8Spec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("ts12 changepoint maximizes between-segment SSE reduction " +
    "over all splits") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val n = daily.length
    val tot = daily.map(_._2).map(BigInt(_)).sum
    // brute-force every split at the CONTRACT precision (the µ-floored
    // score the operator documents), earlier day wins ties
    val scores = (1 until n).map { i =>
      val s1 = daily.take(i).map(_._2).map(BigInt(_)).sum
      val d = s1 * (n - i) - (tot - s1) * i
      (i, d * d * 1000000 / (BigInt(i) * (n - i)))
    }
    val bestI = scores.maxBy(t => (t._2, -t._1))._1
    val r = EventAnalytics.ts12Changepoint(spark, sf).collect().head
    assert(r.getString(0) === daily(bestI - 1)._1)
    assert(r.getLong(1) === bestI.toLong)
    assert(r.getLong(2) === (n - bestI).toLong)
    // means restate exactly
    val s1 = daily.take(bestI).map(_._2).map(BigInt(_)).sum
    assert(r.getLong(3) === (s1 * 1000000 / bestI).toLong)
    assert(r.getLong(4) === ((tot - s1) * 1000000 / (n - bestI)).toLong)
  }

  test("stat39 JB statistic matches the classic two-pass " +
    "central-moment computation") {
    val xs = Tables.documents(spark, sf).select(col("n_chars"))
      .collect().map(_.getLong(0).toDouble)
    val n = xs.length
    val mu = xs.sum / n
    def cm(k: Int): Double = xs.map(x => math.pow(x - mu, k)).sum / n
    val g1 = cm(3) / math.pow(cm(2), 1.5)
    val g2 = cm(4) / (cm(2) * cm(2))
    val jb = n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4.0)
    val r = Profiling.stat39JarqueBera(spark, sf).collect().head
    assert(r.getLong(0) === n.toLong)
    // two-pass vs sufficient-statistics agree to micro tolerance
    assert(math.abs(r.getLong(3) - 1e6 * g1) <= 2)
    assert(math.abs(r.getLong(4) - 1e6 * g2) <= 2)
    assert(math.abs(r.getLong(5) - 1e6 * jb) <= 5)
  }

  test("stat40 Grubbs picks the max-deviation doc and matches the " +
    "classic statistic") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    val mean = rows.map(_._2).sum.toDouble / n
    val sd = math.sqrt(
      rows.map(r => (r._2 - mean) * (r._2 - mean)).sum / (n - 1))
    val cand = rows.maxBy(r => (math.abs(r._2 - mean), -r._1))
    val r = Profiling.stat40Grubbs(spark, sf).collect().head
    assert(r.getLong(0) === cand._1)
    assert(math.abs(r.getLong(3) -
      1e6 * math.abs(cand._2 - mean) / sd) <= 2)
  }

  test("prof6 FD verdicts: join-functional dependencies hold, " +
    "cross-column ones fail") {
    val m = Profiling.prof6FdDiscovery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(m("nationkey->n_name") ===(0L, 1L))
    assert(m("n_name->nationkey") ===(0L, 1L))
    assert(m("nationkey->regionkey") ===(0L, 1L))
    assert(m("custkey->mktsegment") ===(0L, 1L))
    // dense categorical pairs collide at any realistic SF
    assert(m("mktsegment->nationkey")._2 === 0L)
    assert(m("priority->status")._2 === 0L)
    // violations is the exact Σ(distinct−1) mass, restated for one fd
    val base = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viol = base.groupBy(_._1).map(_._2.map(_._2).distinct.size - 1)
      .sum.toLong
    assert(m("mktsegment->nationkey")._1 === viol)
  }

  test("ml26 LDA direction solves Sw w = (mu1 - mu0) and separates " +
    "the class means") {
    val r = Training.ml26Lda(spark, sf).collect().head
    val rows = Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect().map { row =>
        val e = row.getSeq[Float](0)
        (rnd(1e6 * e(0).toDouble).toDouble,
          rnd(1e6 * e(1).toDouble).toDouble, row.getInt(1) % 2)
      }
    val (c0, c1) = (rows.filter(_._3 == 0), rows.filter(_._3 == 1))
    def mean(v: Array[(Double, Double, Int)]) =
      (v.map(_._1).sum / v.length, v.map(_._2).sum / v.length)
    val (m0, m1) = (mean(c0), mean(c1))
    def scat(v: Array[(Double, Double, Int)], m: (Double, Double)) =
      (v.map(p => (p._1 - m._1) * (p._1 - m._1)).sum,
        v.map(p => (p._2 - m._2) * (p._2 - m._2)).sum,
        v.map(p => (p._1 - m._1) * (p._2 - m._2)).sum)
    val (a11, a22, a12) = scat(c0, m0)
    val (b11, b22, b12) = scat(c1, m1)
    val (w11, w22, w12) = (a11 + b11, a22 + b22, a12 + b12)
    val (d1, d2) = (m1._1 - m0._1, m1._2 - m0._2)
    val det = w11 * w22 - w12 * w12
    val wv1 = (w22 * d1 - w12 * d2) / det
    val wv2 = (w11 * d2 - w12 * d1) / det
    assert(r.getLong(0) === c0.length.toLong)
    assert(r.getLong(1) === c1.length.toLong)
    assert(math.abs(r.getLong(2) - 1e12 * wv1) <= 2)
    assert(math.abs(r.getLong(3) - 1e12 * wv2) <= 2)
    // Fisher criterion is positive whenever the means differ
    assert(r.getLong(4) > 0L)
    // and the projection genuinely separates: wᵀμ₁ > wᵀμ₀
    assert(wv1 * d1 + wv2 * d2 > 0)
  }

  test("ml27 silhouette: own-centroid distance below cross-centroid " +
    "distance on average, scores within [-1e6, 1e6]") {
    val out = Training.ml27Silhouette(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= -1000000L && r.getLong(2) <= 1000000L)
    }
    // labels partition the corpus
    assert(out.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sf).count())
  }

  test("samp14 k-center: radii are non-increasing and every pick is " +
    "the exact farthest point") {
    val out = Sampling.kcenterGreedy(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(out.length === 8)
    val radii = out.drop(1).map(_.getLong(2))
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a })
    // brute-force replay of round 1: farthest point from the seed
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => rnd(1e6 * v.toDouble)).toArray))
    val seed = pts.minBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val far = pts.maxBy(p => (d2(p._2, seed._2), -p._1))
    assert(out(0).getLong(1) === seed._1)
    assert(out(1).getLong(1) === far._1)
    assert(out(1).getLong(2) === d2(far._2, seed._2))
  }

  test("inc2 CDC collapse conserves keys and log rows, and the net " +
    "image matches a sequential replay") {
    val out = Relational.inc2CdcCollapse(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // replay the log per key sequentially (the semantics CDC collapse
    // must preserve): apply ops in seq order, keep the final image
    val keys = Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100)
        .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var (nKeys, nLog, sumPrice) =
      (Map.empty[String, Long], Map.empty[String, Long],
        Map.empty[String, Long])
    keys.foreach { case (k, p0) =>
      val hasIns = md5_60(s"cdc:i:$k") % 1000000 % 2 == 0
      val nUpd = (md5_60(s"cdc:u:$k") % 1000000 % 3).toInt
      val hasDel = md5_60(s"cdc:d:$k") % 1000000 % 10 == 0
      val ops = (if (hasIns) Seq(("insert", Some(p0))) else Nil) ++
        (1 to nUpd).map(i => ("update", Some(p0 + i))) ++
        (if (hasDel) Seq(("delete", None)) else Nil)
      if (ops.nonEmpty) {
        val net =
          if (ops.head._1 == "insert" && ops.last._1 == "delete") "none"
          else if (ops.head._1 == "insert") "insert"
          else if (ops.last._1 == "delete") "delete"
          else "update"
        val img = if (ops.last._1 == "delete") 0L
          else ops.flatMap(_._2).last
        nKeys = nKeys.updated(net, nKeys.getOrElse(net, 0L) + 1)
        nLog = nLog.updated(net, nLog.getOrElse(net, 0L) + ops.length)
        sumPrice =
          sumPrice.updated(net, sumPrice.getOrElse(net, 0L) + img)
      }
    }
    nKeys.keys.foreach { op =>
      assert(out(op) ===(nKeys(op), nLog(op), sumPrice(op)), op)
    }
    assert(out.keySet === nKeys.keySet)
  }

  test("stat41 Kruskal-Wallis equals the classic fractional-rank H " +
    "with tie correction") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length
    // classic: fractional average ranks over the whole sample
    val byV = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val below = byV.keys.toSeq.sorted
      .scanLeft((0L, 0L)) { case ((_, acc), v) => (v, acc + byV(v)) }
    val cumBelow = below.sliding(2).map { case Seq((_, a), (v, _)) =>
      v -> a }.toMap
    def rank(v: Long): Double = cumBelow(v) + (byV(v) + 1) / 2.0
    val groups = rows.groupBy(_._1)
    val h = 12.0 / (n.toDouble * (n + 1)) * groups.values.map { g =>
      val rbar = g.map(x => rank(x._2)).sum / g.length
      g.length * (rbar - (n + 1) / 2.0) * (rbar - (n + 1) / 2.0)
    }.sum
    val c = 1.0 - byV.values.map(t => t.toDouble * t * t - t).sum /
      (n.toDouble * n * n - n)
    val r = Profiling.stat41Kruskal(spark, sf).collect().head
    assert(r.getLong(0) === groups.size.toLong)
    assert(r.getLong(1) === n.toLong)
    // per-group micro-quantization introduces ≤ k/2 micros of drift
    assert(math.abs(r.getLong(2) - 1e6 * h) <= groups.size)
    assert(math.abs(r.getLong(4) - 1e6 * h / c) <= 2 * groups.size)
  }

  test("graph_scc labels agree with a driver Tarjan-free double-DFS " +
    "on the same digraph") {
    val cap = 240L
    val nodes = Tables.documents(spark, sf).select(col("doc_id"))
      .filter(col("doc_id") < cap).collect().map(_.getLong(0))
    val edges = nodes.flatMap { u =>
      val deg = 1 + (md5_60(s"scc:$u") % 2).toInt
      (0 until deg).map(j => (u, (md5_60(s"scc:$u:$j") % cap).toLong))
    }.filter(p => p._1 != p._2).distinct
    val fwd = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bwd = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def reach(seed: Long, adj: Map[Long, Array[Long]]): Set[Long] = {
      var seen = Set(seed); var frontier = List(seed)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(u =>
          adj.getOrElse(u, Array.empty[Long])).filterNot(seen)
        seen ++= next; frontier = next.distinct
      }
      seen
    }
    val labels = nodes.map { u =>
      u -> (reach(u, fwd) intersect reach(u, bwd)).min
    }
    val expected = labels.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val got = Graphs.scc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("mm9 silence: frame energies, mean threshold and islands " +
    "replay for every doc") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val nf = text.length / 64
      if (nf == 0) None else {
        val energies = (0 until nf).map { i =>
          text.substring(i * 64, i * 64 + 64)
            .map(c => math.abs(c.toInt - 32).toLong).sum
        }
        val total = energies.sum
        val silent = energies.map(e => e * nf < total)
        val runs = scala.collection.mutable.ArrayBuffer.empty[Long]
        var cur = 0L
        silent.foreach { s =>
          if (s) cur += 1
          else { if (cur > 0) runs += cur; cur = 0 }
        }
        if (cur > 0) runs += cur
        Some(id -> (nf.toLong, silent.count(identity).toLong, total,
          if (runs.isEmpty) 0L else runs.max))
      }
    }.toMap
    val got = Multimodal.mm9Silence(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
  }

  test("graph_condense: depth-0 components are DAG sources and the " +
    "component sizes partition graph_scc's") {
    val cond = Graphs.condense(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sccSizes = Graphs.scc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cond.map(c => c._1 -> c._2).toMap === sccSizes)
    // a depth-d component must have an in-neighbor at depth d−1
    // (longest-path recurrence), and depth 0 must exist
    val depths = cond.map(c => c._1 -> c._3).toMap
    assert(depths.values.min === 0L)
    val dvals = depths.values.toSet
    (1L to depths.values.max).foreach(d => assert(dvals.contains(d)))
  }

  test("prof7 key verdicts: orderkey is a key, date columns are not, " +
    "dup mass restates") {
    val m = Profiling.prof7PkDiscovery(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val n = Tables.orders(spark, sf).count()
    assert(m("orderkey") ===(n, n, 0L, 1L))
    assert(m("orderdate")._4 === 0L) // dates repeat at any real volume
    m.values.foreach { case (rows, distinct, dup, _) =>
      assert(rows === n)
      assert(dup === rows - distinct) // conservation
    }
  }

  test("ml28 Brier decomposition restates from collected (p, y) rows") {
    val r = Profiling.ml28Brier(spark, sf).collect().head
    val rows = Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect().map { row =>
        val e = row.getSeq[Float](0)
        val score = (0 until 8).map(k => rnd(1e6 * e(k).toDouble)).sum
        val p = rnd(1e6 / (1.0 + math.exp(-(score.toDouble / 1e6))))
        (p, (row.getInt(1) % 2).toLong)
      }
    val n = rows.length
    val brier = rows.map { case (p, y) =>
      (p - y * 1000000L) * (p - y * 1000000L) }.sum.toDouble / (n * 1e6)
    assert(math.abs(r.getLong(2) - brier) <= 1)
    // classic unbinned Murphy terms vs the 32-bin report: reliability
    // and resolution must be close (same bins), uncertainty exact
    val yBar = rows.map(_._2).sum.toDouble / n
    assert(r.getLong(5) === rnd(1e6 * yBar * (1 - yBar)))
    val byBin = rows.groupBy { case (p, _) => p * 32 / 1000001 }
    val rel = byBin.values.map { g =>
      val pBar = g.map(_._1).sum.toDouble / 1e6 / g.length
      val yB = g.map(_._2).sum.toDouble / g.length
      g.length * (pBar - yB) * (pBar - yB)
    }.sum / n * 1e6
    assert(math.abs(r.getLong(3) - rel) <= byBin.size)
  }

  test("tok10 WordPiece totals and top tokens restate from a driver " +
    "greedy tokenizer") {
    val triS = Training.wpTri.toSet
    val biS = Training.wpBi.toSet
    def greedy(w: String): Seq[String] = {
      var i = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (i < w.length) {
        if (w.length - i >= 3 && triS(w.substring(i, i + 3))) {
          out += w.substring(i, i + 3); i += 3
        } else if (w.length - i >= 2 && biS(w.substring(i, i + 2))) {
          out += w.substring(i, i + 2); i += 2
        } else { out += w.substring(i, i + 1); i += 1 }
      }
      out.toSeq
    }
    val words = Tables.documents(spark, sf).select(col("text"))
      .collect().flatMap(r =>
        r.getString(0).toLowerCase.replaceAll("[^a-z]+", " ")
          .split(" ").filter(_.nonEmpty))
    val allToks = words.flatMap(greedy)
    val counts = allToks.groupBy(identity).view.mapValues(_.length.toLong)
    val top = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(10)
    val out = Training.tok10WordPiece(spark, sf).collect()
    assert(out.length === 10)
    out.zip(top).foreach { case (r, (t, n)) =>
      assert(r.getString(0) === t)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === words.length.toLong)
      assert(r.getLong(3) === allToks.length.toLong)
    }
  }

  test("ml29 KS equals the brute max CDF gap and sits at the exact " +
    "argmax threshold") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect().map { r =>
        val e = r.getSeq[Float](0)
        ((0 until 8).map(k => rnd(1e6 * e(k).toDouble)).sum,
          r.getInt(1) % 2)
      }
    val n1 = rows.count(_._2 == 1).toLong
    val n0 = rows.length - n1
    val gaps = rows.map(_._1).distinct.sorted.map { t =>
      val c1 = rows.count(r => r._1 <= t && r._2 == 1).toLong
      val c0 = rows.count(r => r._1 <= t && r._2 == 0).toLong
      (t, math.abs(c1 * n0 - c0 * n1))
    }
    val (bestT, bestD) = gaps.maxBy(g => (g._2, -g._1))
    val r = Profiling.ml29Ks(spark, sf).collect().head
    assert(r.getLong(0) === n0)
    assert(r.getLong(1) === n1)
    assert(r.getLong(2) === bestT)
    assert(r.getLong(3) === (BigInt(1000000) * bestD / (BigInt(n0) * n1))
      .toLong)
  }

  test("geo6 Ripley pair counts restate from the brute quadratic " +
    "scan and CSR holds for the uniform cloud") {
    val pts = Spatial.points(spark, sf)
      .filter(col("id") <= 2000L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val rs = Seq(1000000L, 2000000L, 4000000L)
    val brute = rs.map { r =>
      var c = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        val dx = pts(i)._1 - pts(j)._1
        val dy = pts(i)._2 - pts(j)._2
        if (dx * dx + dy * dy <= r * r) c += 1
      }
      r -> c
    }.toMap
    val out = Spatial.ripleyK(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { row =>
      assert(row.getLong(2) === brute(row.getLong(0)))
      assert(row.getLong(1) === pts.length.toLong)
      // uniform md5 cloud: the K/CSR ratio sits near 1 — but only
      // where counts carry signal (at sf0.001's 150 points the 1e6
      // radius sees single-digit pairs and the ratio is pure noise)
      if (row.getLong(2) >= 100L)
        assert(row.getLong(5) > 600000L && row.getLong(5) < 1500000L)
    }
  }

  test("ts14 strengths restate from the STL components and sit in " +
    "[0, 1e6]") {
    val comps = EventAnalytics.stlDecompose(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    def popVar(v: Seq[Double]): Double = {
      val m = v.sum / v.length
      v.map(x => x * x).sum / v.length - m * m
    }
    val r = comps.map(_._3.toDouble)
    val sr = comps.map(c => (c._2 + c._3).toDouble)
    val tr = comps.map(c => (c._1 + c._3).toDouble)
    val fs = math.max(0.0, 1.0 - popVar(r) / popVar(sr))
    val ft = math.max(0.0, 1.0 - popVar(r) / popVar(tr))
    val out = EventAnalytics.ts14SeasonalStrength(spark, sf)
      .collect().head
    assert(out.getLong(0) === comps.length.toLong)
    assert(math.abs(out.getLong(1) - 1e6 * fs) <= 2)
    assert(math.abs(out.getLong(2) - 1e6 * ft) <= 2)
    assert(out.getLong(1) >= 0L && out.getLong(1) <= 1000000L)
    assert(out.getLong(2) >= 0L && out.getLong(2) <= 1000000L)
  }

  test("rec6 3-way lift: every reported triple's support and lift " +
    "restate from the raw baskets") {
    val baskets = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byOrder = baskets.groupBy(_._1).map { case (o, xs) =>
      o -> xs.map(_._2).toSet }
    val n = byOrder.size
    val sup = baskets.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val out = Recommend.rec6Lift3(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (b1, b2, b3) = (r.getString(0), r.getString(1), r.getString(2))
      assert(b1 < b2 && b2 < b3)
      val nAbc = byOrder.values
        .count(s => s(b1) && s(b2) && s(b3)).toLong
      assert(r.getLong(3) === nAbc)
      val lift = BigInt(nAbc) * n * n * 1000000 /
        (BigInt(sup(b1)) * sup(b2) * sup(b3))
      assert(r.getLong(4) === lift.toLong)
    }
  }
}
