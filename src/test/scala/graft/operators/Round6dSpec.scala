package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 fourth-session operators: common-neighbor link prediction,
  * daily-count autocorrelation, Zipf OLS fit, shingle containment
  * pairs, kNN majority-vote classification, and the schema-evolution
  * merge read. Values are pinned by the DuckDB oracle; these tests
  * restate each computation independently driver-side (set replays,
  * integer normal equations, hand-built corpora).
  */
class Round6dSpec extends SparkSpec {

  test("linkPredict equals a driver-side neighbor-set replay") {
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val n = ids.length.toLong
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    for (id <- ids; d <- Seq((id + 1) % n, (id + 2) % n,
        (id * id + 3) % n) if d != id)
      und += ((math.min(id, d), math.max(id, d)))
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- und) { nbrs(a) += b; nbrs(b) += a }
    val expected = (for {
      w <- nbrs.keys.toSeq
      members = nbrs(w).toSeq.sorted
      u <- members; v <- members if u < v
    } yield (u, v)).groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (p, cn) => cn >= 2 && !und.contains(p) }
      .map { case ((u, v), cn) =>
        val union = nbrs(u).size + nbrs(v).size - cn
        (u, v, cn, 1000000L * cn / union)
      }.toSet
    val got = Graphs.linkPredict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("autocorr: integer deviation replay reproduces num/den and acf") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val n = daily.length.toLong
    val sx = daily.sum
    val dv = daily.map(x => n * x - sx)
    val den = dv.map(d => d * d).sum
    val rows = EventAnalytics.autocorr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1) === (1L to 7L))
    rows.foreach { case (k, num, d, acf) =>
      val expNum = (k.toInt until dv.length)
        .map(t => dv(t) * dv(t - k.toInt)).sum
      assert(d === den)
      assert(num === expNum)
      assert(math.abs(acf - num.toDouble / den.toDouble) < 1e-6)
    }
    // a 30-day homogeneous Poisson-ish series must not be strongly
    // autocorrelated at every lag (sanity against degenerate output)
    assert(rows.map(_._4).forall(a => a >= -1.0 && a <= 1.0))
  }

  test("zipfFit: integer normal equations replay; slope is negative") {
    val freqs = Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val top = freqs.sortBy { case (t, f) => (-f, t) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      val xm = math.floor(1e6 * math.log((i + 1).toDouble) + 0.5).toLong
      val ym = math.floor(1e6 * math.log(f.toDouble) + 0.5).toLong
      (xm, ym)
    }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val row = TextAnalysis.zipfFit(spark, sf).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === n * sxy - sx * sy)
    assert(row.getLong(2) === n * sxx - sx * sx)
    assert(row.getDouble(3) < 0.0) // Zipf: frequency falls with rank
  }

  test("containmentPairs flags the embedded clone, not the reverse") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      // doc 1's text embedded verbatim in a longer doc
      (2L, "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen"),
      (3L, "entirely different unrelated words appear in this one"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    // doc1 ⊂ doc2: containment(1→2) = 1.0; 2→1 is 6/12 = 0.5 < 0.8
    assert(got === Set((1L, 2L, 1.0)))
  }

  test("knnClassify equals an exact-cosine driver replay") {
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2) % 2))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = all.filter(_._1 < 32).map { case (qid, qv, yTrue) =>
      val top = all.filter(_._1 != qid)
        .map { case (id, v, l) => (r6(cos(v, qv)), id, l) }
        .sortBy { case (cs, id, _) => (-cs, id) }.take(5)
      val votes = top.map(_._3.toLong).sum
      (qid, yTrue.toLong, votes, if (votes * 2 > 5) 1L else 0L)
    }.toSet
    val got = Similarity.knnClassify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.size === 32)
  }

  test("s11 schema evolution: merged read sees both generations' columns") {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), length(col("text")).as("tl"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val row = Audits.s11SchemaEvolution(spark, sf).collect().head
    assert(row.getLong(0) === base.length.toLong)
    assert(row.getLong(1) === base.count(_._1 % 2 == 0).toLong)
    assert(row.getLong(2) === base.count(_._1 % 2 == 1).toLong)
    assert(row.getLong(3) === base.filter(_._1 % 2 == 1).map(_._2).sum)
    assert(row.getLong(4) === base.map(_._3).sum)
  }
}
