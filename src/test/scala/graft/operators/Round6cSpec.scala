package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 third-session operators: exact binned ROC AUC, the ROC
  * curve, HITS hubs/authorities, and Kneser–Ney bigram smoothing.
  * Values are pinned by the DuckDB oracle; these tests restate the
  * math independently — the AUC against the O(n²) pairwise definition
  * it must equal, HITS against a driver-side iteration replay, KN
  * against per-row formula recomputation from raw token counts.
  */
class Round6cSpec extends SparkSpec {

  private def rnd6(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** The binned (score, label) pairs exactly as Profiling.scoreBins
    * derives them, restated driver-side from the raw fixture. */
  private lazy val binsAndLabels: Seq[(Long, Long)] =
    Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect()
      .map { r =>
        val e = r.getSeq[Float](0)
        val s = (0 until 8).map(k => rnd6(e(k).toDouble * 1e6)).sum
        (math.floor(s.toDouble / 1000.0).toLong, (r.getInt(1) % 2).toLong)
      }.toSeq

  test("rocAuc equals the O(n²) pairwise Mann-Whitney definition") {
    val row = Profiling.rocAuc(spark, sf).collect().head
    val (np, nn, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val pos = binsAndLabels.filter(_._2 == 1L).map(_._1)
    val neg = binsAndLabels.filter(_._2 == 0L).map(_._1)
    assert(np === pos.size.toLong && nn === neg.size.toLong)
    // doubled pairwise wins: 2 per strict win, 1 per tie
    val u2Brute = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(u2 === u2Brute)
    assert(auc === rnd6(1e6 * u2Brute.toDouble / (2.0 * np * nn)))
  }

  test("rocPoints: cumulative curve is monotone and ends at (all pos, all neg)") {
    val rows = Profiling.rocPoints(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1) // threshold descending = accumulation order
    val pos = binsAndLabels.count(_._2 == 1L).toLong
    val neg = binsAndLabels.count(_._2 == 0L).toLong
    assert(rows.last._2 === pos && rows.last._3 === neg)
    rows.sliding(2).foreach {
      case Array((_, tp1, fp1), (_, tp2, fp2)) =>
        assert(tp2 >= tp1 && fp2 >= fp1, "cumulative counts never decrease")
      case _ => ()
    }
    // each point matches a direct recount at its threshold
    rows.foreach { case (t, tp, fp) =>
      assert(tp === binsAndLabels.count(b => b._1 >= t && b._2 == 1L).toLong)
      assert(fp === binsAndLabels.count(b => b._1 >= t && b._2 == 0L).toLong)
    }
  }

  test("hits matches a driver-side replay of 4 integer double-steps") {
    val out = Graphs.hits(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val edges = Graphs.linkEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var hub = nodes.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 4) {
      auth = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub.getOrElse(e._1, 0L)).sum
      }.withDefaultValue(0L)
      hub = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum
      }
    }
    val maxH = hub.values.max
    val maxA = auth.values.max
    assert(out.size === nodes.size)
    out.foreach { case (node, (hm, am)) =>
      assert(hm === rnd6(1e6 * hub.getOrElse(node, 0L).toDouble / maxH),
        s"hub $node")
      assert(am === rnd6(1e6 * auth(node).toDouble / maxA), s"auth $node")
    }
    assert(out.values.map(_._1).max === 1000000L, "hub max normalizes to 1e6")
    assert(out.values.map(_._2).max === 1000000L, "auth max normalizes to 1e6")
  }

  test("knBigrams: every row replays from raw counts; discounting caps below add-k") {
    val out = TextAnalysis.knBigrams(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val pairs = docs.flatMap { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).collect { case Array(a, b) => (a, b) }
    }
    val c12 = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val fw = c12.keys.toSeq.groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val bw = c12.keys.toSeq.groupBy(_._2)
      .map { case (k, v) => k -> v.size.toLong }
    val t = c12.size.toLong
    assert(out.length === math.min(200, t).toInt)
    out.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c12") === c12((w1, w2)))
      assert(r.getAs[Long]("c1") === c1(w1))
      assert(r.getAs[Long]("fw_types") === fw(w1))
      assert(r.getAs[Long]("bw_types") === bw(w2))
      assert(r.getAs[Long]("t_types") === t)
      val pkn = (c12((w1, w2)).toDouble - 0.75) / c1(w1) +
        0.75 * fw(w1).toDouble / c1(w1) * (bw(w2).toDouble / t)
      assert(r.getAs[Long]("pkn_micros") === rnd6(1e6 * pkn), s"$w1 $w2")
    }
    // the discounted estimate stays a probability
    out.foreach(r => assert(r.getAs[Long]("pkn_micros") > 0L &&
      r.getAs[Long]("pkn_micros") <= 1000000L))
  }

  test("cdcChunks: chunks tile each document exactly") {
    val chunks = Packing.cdcChunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("start_pos"), r.getAs[Long]("end_pos")))
      .groupBy(_._1)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet === lens.keySet.filter(lens(_) > 0))
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 0L, "first chunk starts at 0")
      assert(sorted.last._4 === lens(doc), "last chunk ends at len")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 === b._3, s"contiguous spans in doc $doc")
        case _ => ()
      }
    }
  }

  test("cdcChunks: a prefix insertion only disturbs chunks up to the next boundary") {
    import spark.implicits._
    val baseText = Tables.documents(spark, sf)
      .orderBy(col("doc_id")).select(col("text")).head.getString(0)
    val edited = "XYZ-INSERTED-" + baseText
    val two = Seq((0L, baseText), (1L, edited)).toDF("doc_id", "text")
    val out = Packing.cdcChunksOf(two).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_md5")))
    val a = out.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    val b = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // all chunks after the first boundary past the edit are untouched:
    // the two digest sequences share their entire tail
    val shared = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(shared.nonEmpty,
      "content-defined boundaries must re-synchronize after an edit")
    assert(shared.length >= a.length - 2,
      s"only the head chunk(s) may differ (shared ${shared.length} of ${a.length})")
  }

  test("stat21HllOverlap: exact overlaps replay; every estimate is in bounds") {
    val out = Relational.stat21HllOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val du = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = du.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val types = byType.keys.toSeq.sorted
    val expectPairs = (for {
      a <- types; b <- types if a < b
    } yield (a, b)).toSet
    assert(out.map(t => (t._1, t._2)).toSet === expectPairs)
    out.foreach { case (a, b, na, nb, ov, within) =>
      assert(na === byType(a).size.toLong)
      assert(nb === byType(b).size.toLong)
      assert(ov === (byType(a) & byType(b)).size.toLong, s"$a x $b")
      assert(within === 1L, s"estimate out of bounds for $a x $b")
    }
  }

  test("curriculumOrder: balanced stages, easy-to-hard, position follows (stage, key)") {
    val out = Sampling.curriculumOrder(spark,
      Tables.documents(spark, sf)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("stage"), r.getAs[Long]("shuffle_key"),
        r.getAs[Long]("position")))
    val n = out.length
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, "ntile balance")
    assert(sizes.values.sum === n)
    // stage ordering respects the (n_chars, doc_id) total order
    val byStage = out.groupBy(_._3)
    (1L until 5L).foreach { k =>
      val maxK = byStage(k).map(t => (t._2, t._1)).max
      val minK1 = byStage(k + 1).map(t => (t._2, t._1)).min
      assert(Ordering[(Long, Long)].lt(maxK, minK1), s"stage $k boundary")
    }
    val expected = out.sortBy(t => (t._3, t._4, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1).toLong }.toMap
    out.foreach(t => assert(t._5 === expected(t._1), s"position of ${t._1}"))
  }

  test("sessionPaths: top paths replay from a driver-side sessionization") {
    val out = EventAnalytics.sessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._2, e._3))
      // gaps-and-islands: split where gap >= 30 min
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) => acc match {
          case (cur @ (last :: _)) :: rest
              if e._2 - last._2 < 30L * 60 * 1000000 =>
            (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }
      sessions.map(_.reverse.map(_._4).mkString(">"))
    }.toSeq
    val counts = paths.groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(out.toSeq === expect)
  }

  test("calibrationBins: bins partition the corpus; ECE replays exactly") {
    val out = Profiling.calibrationBins(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("mean_p_micros"),
        r.getAs[Long]("frac_pos_micros"), r.getAs[Long]("gap_micros"),
        r.getAs[Long]("ece_micros")))
    val pms = Tables.embeddings(spark, sf)
      .select(col("embedding"), col("label")).collect()
      .map { r =>
        val e = r.getSeq[Float](0)
        val s = (0 until 8).map(k => rnd6(e(k).toDouble * 1e6)).sum
        val p = 1.0 / (1.0 + math.exp(-(s.toDouble / 1e6)))
        (rnd6(1e6 * p), (r.getInt(1) % 2).toLong)
      }
    assert(out.map(_._2).sum === pms.length.toLong, "bins partition rows")
    out.foreach { case (bin, n, nPos, meanP, fracPos, gap, _) =>
      val inBin = pms.filter(t =>
        math.min(math.floor(t._1.toDouble / 100000.0).toLong, 9L) == bin)
      assert(n === inBin.length.toLong, s"bin $bin size")
      assert(nPos === inBin.map(_._2).sum, s"bin $bin positives")
      assert(meanP === rnd6(inBin.map(_._1).sum.toDouble / n))
      assert(fracPos === rnd6(1e6 * nPos.toDouble / n))
      assert(gap === math.abs(meanP - fracPos))
    }
    val eceExpect = rnd6(
      out.map(t => t._2 * t._6).sum.toDouble / out.map(_._2).sum)
    out.foreach(t => assert(t._7 === eceExpect, "same ECE on every row"))
  }

  test("phashPairs: planted groups come out bimodal — all survivors in-group, low hamming") {
    val out = Multimodal.phashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "the planted near-dup groups must be found")
    out.foreach { case (a, b, h) =>
      assert(a / 7 === b / 7, s"pair ($a,$b) crosses planted groups")
      assert(h <= 6L, s"pair ($a,$b) hamming $h above threshold")
    }
    assert(out.exists(_._3 === 0L), "some re-encodes hash identically")
  }
}
