package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 6: sampled Brandes betweenness and the seasonal-naive
  * backtest, each restated driver-side from first principles.
  */
class Round7fSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("betweenness equals a driver-side Brandes replay") {
    val n = Tables.documents(spark, sf).count()
    val edges = (0L until n).flatMap { i =>
      Seq((i + 1) % n, (i + 2) % n, (i * i + 3) % n)
        .filter(_ != i).map(d => (i, d))
    }
    val nbrs = edges.flatMap { case (s, d) =>
      val (a, b) = (math.min(s, d), math.max(s, d))
      Seq((a, b), (b, a))
    }.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = (0L until n).filter(_ % 97 == 0)
    val maxDepth = 4
    val bc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    seeds.foreach { s0 =>
      // forward: levels with sigma
      var levels = Vector(Map(s0 -> 1L))
      var seen = Set(s0)
      for (_ <- 1 to maxDepth) {
        val nxt = collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        levels.last.foreach { case (v, sig) =>
          nbrs.getOrElse(v, Nil).foreach { w =>
            if (!seen(w)) nxt(w) += sig
          }
        }
        seen ++= nxt.keySet
        levels = levels :+ nxt.toMap
      }
      // backward: micro-quantized dependency accumulation
      var delta = Map.empty[Long, Long] // level h+1 deltas
      for (h <- (maxDepth - 1) to 1 by -1) {
        val dl = collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        levels(h).foreach { case (v, sig) =>
          nbrs.getOrElse(v, Nil).foreach { w =>
            levels(h + 1).get(w).foreach { sigW =>
              dl(v) += rnd(sig.toDouble / sigW.toDouble *
                (1000000L + delta.getOrElse(w, 0L)).toDouble)
            }
          }
        }
        dl.foreach { case (v, d) => bc(v) += d }
        delta = dl.toMap
      }
    }
    val want = bc.toSeq.sortBy { case (v, d) => (-d, v) }.take(100)
    val got = Graphs.betweenness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    // bridges exist: the quadratic hub edges concentrate real mass
    assert(got.head._2 > 0L && got.length == 100)
  }

  test("seasonal-naive backtest equals a lag replay over daily counts") {
    val days = Tables.events(spark, sf).select(to_date(col("ts")).as("d"))
      .collect().map(_.getDate(0).toLocalDate)
      .groupBy(identity).toSeq.map { case (d, v) => (d, v.size.toLong) }
      .sortBy(_._1.toEpochDay)
    val xs = days.map(_._2)
    val e7 = xs.indices.drop(7).map(i => math.abs(xs(i) - xs(i - 7)))
    val e1 = xs.indices.drop(1).map(i => math.abs(xs(i) - xs(i - 1)))
    val mae7 = rnd(1e6 * e7.sum.toDouble / e7.size.toDouble)
    val mae1 = rnd(1e6 * e1.sum.toDouble / e1.size.toDouble)
    val mase = rnd(1e6 * (e7.sum.toDouble / e7.size.toDouble) /
      (e1.sum.toDouble / e1.size.toDouble))
    val row = EventAnalytics.snaiveBacktest(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) ===
      ((xs.size.toLong, e7.size.toLong, mae7, mae1, mase)))
    assert(row.getLong(4) > 0L)
  }
}
