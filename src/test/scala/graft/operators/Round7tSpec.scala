package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 20: Friedman rank test and double-sweep diameter —
  * driver-side replays from first principles. */
class Round7tSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("Friedman doubled-rank statistic equals the classic " +
    "fractional-rank formula") {
    val scores = Tables.embeddings(spark, sf).select(col("embedding"))
      .collect().map { r =>
        val e = r.getSeq[Float](0).map(v => rnd(1e6 * v.toDouble))
        (e.slice(0, 8).sum, e.slice(8, 16).sum,
          (0 until 16 by 2).map(e).sum)
      }
    val n = scores.length.toLong
    // classic fractional average ranks within each block of 3
    def franks(b: (Long, Long, Long)): Seq[Double] = {
      val vs = Seq(b._1, b._2, b._3)
      vs.map { x =>
        val less = vs.count(_ < x)
        val tied = vs.count(_ == x)
        (2 * less + tied + 1) / 2.0
      }
    }
    val rs = scores.map(franks)
    val rjs = (0 until 3).map(j => rs.map(_(j)).sum)
    val ssqF = rs.flatten.map(r => r * r).sum
    val num = rjs.map(rj => (rj - 2.0 * n) * (rj - 2.0 * n)).sum
    val chi2 = 2.0 * num / (ssqF - 12.0 * n)
    val r = Profiling.stat38Friedman(spark, sf).collect().head
    assert(r.getLong(0) === n)
    // doubled-rank sums are exactly twice the fractional-rank sums
    assert(r.getLong(1) === math.round(2 * rjs(0)))
    assert(r.getLong(2) === math.round(2 * rjs(1)))
    assert(r.getLong(3) === math.round(2 * rjs(2)))
    assert(math.abs(r.getLong(4) - 1e6 * chi2) <= 1)
    // doubled ranks per block always sum to 12 (= 2 * (1+2+3))
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) === 12 * n)
  }

  test("double-sweep diameter equals the BFS replay") {
    val n = Tables.documents(spark, sf).count()
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val adj = ids.flatMap { i =>
      val deg = 1 + (md5_60(s"kc:$i") % 5).toInt
      (0 until deg).map(j => (i, md5_60(s"kc:$i:$j") % n))
    }.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSeq }
    def bfs(seed: Long): Map[Long, Long] = {
      val dist = scala.collection.mutable.Map(seed -> 0L)
      var frontier = Seq(seed)
      var d = 0L
      while (frontier.nonEmpty && d < 16) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Seq.empty[Long]))
          .distinct.filterNot(v => dist.contains(v))
        next.foreach(v => dist(v) = d + 1)
        frontier = next
        d += 1
      }
      dist.toMap
    }
    def far(dist: Map[Long, Long]): (Long, Long) =
      dist.toSeq.map { case (nd, dd) => (dd, nd) }
        .sortBy(t => (-t._1, t._2)).head.swap
    val d1 = bfs(ids.min)
    val (fa, ea) = far(d1)
    val (fb, eb) = far(bfs(fa))
    val r = Graphs.diameter(spark, sf).collect().head
    assert(r.getLong(0) === d1.size.toLong)
    assert((r.getLong(1), r.getLong(2)) === (fa, ea))
    assert((r.getLong(3), r.getLong(4)) === (fb, eb))
    // sweep property: the second eccentricity dominates the first
    assert(r.getLong(4) >= r.getLong(2))
  }
}
