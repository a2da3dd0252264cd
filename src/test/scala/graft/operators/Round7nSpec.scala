package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 14: weighted Slope One, restated driver-side. */
class Round7nSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("slope one equals an independent deviation-matrix replay") {
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("q")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val o2c = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ratings = li.map { case (ok, pk, q) => ((o2c(ok), pk), q) }
      .groupBy(_._1).map { case ((c, i), xs) =>
        (c, i, rnd(100.0 * xs.map(_._2).sum / xs.size)) }.toSeq
    val byCust = ratings.groupBy(_._1)
    val dev = byCust.values.flatMap { rs =>
      for (a <- rs; b <- rs if a._2 != b._2)
        yield ((a._2, b._2), a._3 - b._3)
    }.groupBy(_._1).collect { case ((j, i), xs) if xs.size >= 2 =>
      (j, i) -> (xs.map(_._2).sum, xs.size.toLong) }.toMap
    val rated = ratings.map(r => (r._1, r._2)).toSet
    val want = byCust.keys.filter(_ % 97 == 0).flatMap { u =>
      val mine = byCust(u)
      val cands = dev.keys.filter(k => mine.exists(_._2 == k._2))
        .map(_._1).toSet
      val preds = cands.toSeq.filterNot(j => rated((u, j))).flatMap { j =>
        val terms = mine.flatMap { case (_, i, rc) =>
          dev.get((j, i)).map { case (sd, c) => (sd + rc * c, c) } }
        if (terms.isEmpty) None
        else {
          val num = terms.map(_._1).sum
          val den = terms.map(_._2).sum
          Some((j, rnd(num.toDouble / den.toDouble), den))
        }
      }
      preds.sortBy { case (j, p, _) => (-p, j) }.take(5)
        .map { case (j, p, d) => (u, j, p, d) }
    }.toSet
    val got = Recommend.slopeOne(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty, "no predictions produced on the fixture")
    // support-weighted predictions only lean on co-rating evidence
    got.foreach { case (_, _, pred, sup) =>
      assert(sup >= 2L)
      // quantities are 1–50 → centi ratings 100–5000; slope one can
      // extrapolate past the observed range but not absurdly
      assert(pred > -5000L && pred < 15000L, s"wild prediction $pred")
    }
  }
}
