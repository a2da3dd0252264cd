package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 10: isotonic calibration (minimax ≡ PAVA) and
  * randomized response, restated driver-side.
  */
class Round7jSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("integer-minimax isotonic fit equals a classic PAVA replay") {
    val cells = Tables.embeddings(spark, sf)
      .select((0 until 8).map(i =>
          round(element_at(col("embedding"), i + 1).cast("double") *
            1e6).cast("long"))
        .reduce(_ + _).as("score"),
        (col("label") % 2).cast("long").as("y"))
      .select(round(lit(1e6) * (lit(1.0) / (lit(1.0) +
          exp(-(col("score").cast("double") / lit(1e6)))))).cast("long")
          .as("pm"),
        col("y"))
      .withColumn("bin",
        least(floor(col("pm").cast("double") / 31250.0).cast("long"),
          lit(31L)))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // classic pool-adjacent-violators on exact rationals
    case class Block(bins: List[Long], n: Long, pos: Long)
    var stack = List.empty[Block]
    cells.foreach { case (b, n, p) =>
      var top = Block(List(b), n, p)
      // violation: top's rate < previous block's rate (exact
      // cross-multiplied comparison — no FP in the pooling decision)
      while (stack.nonEmpty &&
             stack.head.pos * top.n >= top.pos * stack.head.n) {
        val prev = stack.head
        stack = stack.tail
        top = Block(prev.bins ++ top.bins, prev.n + top.n,
          prev.pos + top.pos)
      }
      stack = top :: stack
    }
    val want = stack.reverse.flatMap { blk =>
      val fit = rnd(1e6 * blk.pos.toDouble / blk.n.toDouble)
      blk.bins.map(_ -> fit)
    }.toMap
    val got = Profiling.isotonicCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(r => r._1 -> r._5).toMap === want)
    // raw rates replay and the fit is monotone non-decreasing in bin
    got.foreach { case (b, n, pos, raw, _) =>
      val cell = cells.find(_._1 == b).get
      assert((n, pos) === (cell._2, cell._3))
      assert(raw === rnd(1e6 * pos.toDouble / n.toDouble))
    }
    val sorted = got.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._5,
        s"isotonic fit decreased: $a -> $b")
      case _ =>
    }
    // and PAVA genuinely pooled something here (the raw rates are not
    // already monotone on this corpus)
    assert(got.exists { case (_, _, _, raw, iso) => raw != iso })
  }

  test("randomized response equals a driver-side coin replay and " +
    "debiases toward the true fraction") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val has = ev.toSet
    val want = types.map { t =>
      val bits = users.map { u =>
        val b = if (has((u, t))) 1L else 0L
        val flip = if (md5_60(s"rr:$t:$u") % 4 == 3) 1L else 0L
        (b, (b + flip) % 2)
      }
      val n = users.size.toLong
      val ty = bits.map(_._1).sum
      val ry = bits.map(_._2).sum
      (t, n, ty, ry,
        rnd(1e6 * (ry.toDouble / n.toDouble - 0.25) / 0.5),
        rnd(1e6 * ty.toDouble / n.toDouble))
    }.toSet
    val got = Privacy.randResponse(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === want)
    // the estimator must beat the raw perturbed fraction as an
    // estimate of the truth on every type (debiasing does its job)
    got.foreach { case (t, n, _, ry, est, tru) =>
      val rawErr = math.abs(rnd(1e6 * ry.toDouble / n.toDouble) - tru)
      val estErr = math.abs(est - tru)
      assert(estErr <= rawErr + 1,
        s"$t: debiased error $estErr worse than raw $rawErr")
    }
  }
}
