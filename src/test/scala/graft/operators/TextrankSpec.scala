package graft.operators

import graft.{SparkSpec, Tables}

/** TextRank keywords: the full 10-round weighted-PageRank recursion is
  * restated in plain driver Scala over the collected corpus — same
  * integer-micro rounding at every step — and compared to the
  * operator's top-20.
  */
class TextrankSpec extends SparkSpec {

  test("text_textrank equals a 10-round driver-side mass recursion " +
      "over the symmetrized bigram graph") {
    val toks = Tables.documents(spark, sf)
      .selectExpr("filter(split(lower(text), '\\\\s+'), " +
        "x -> length(x) > 0) AS tk")
      .collect().map(_.getSeq[String](0)).filter(_.length >= 2)
    val pairs = toks.flatMap(tk => tk.zip(tk.tail)).filter(p => p._1 != p._2)
    val und = pairs ++ pairs.map(_.swap)
    val w = und.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wout = w.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val nodes = wout.keySet
    val n = nodes.size
    var r: Map[String, Long] =
      nodes.map(_ -> math.round(1e6 / n)).toMap
    for (_ <- 1 to 10) {
      val inMass = w.toSeq.map { case ((a, b), wt) =>
        b -> math.round(r(a).toDouble * wt / wout(a))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(t => t -> (math.round(0.15 * 1e6 / n) +
        math.round(0.85 * inMass.getOrElse(t, 0L)))).toMap
    }
    val want = r.toSeq.sortBy { case (t, m) => (-m, t) }.take(20)
    val got = TextAnalysis.textrank(spark, sf).collect()
      .map(x => (x.getAs[String]("term"), x.getAs[Long]("rank_micros")))
      .toSeq
    assert(got === want)
    // rank mass sanity: every term keeps at least its teleport floor
    assert(got.forall(_._2 >= math.round(0.15 * 1e6 / n)))
  }
}
