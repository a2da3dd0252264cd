package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 2: random-walk corpus generation, basket
  * co-occurrence, incremental aggregate maintenance, WOE/IV feature
  * screening — each restated driver-side from first principles.
  */
class Round7bSpec extends SparkSpec {

  private def nDocs: Long =
    Tables.documents(spark, sf).count()

  // the derived link rule (Graphs scaladoc), re-stated independently
  private def directedEdges(n: Long): Set[(Long, Long)] =
    (0L until n).flatMap { i =>
      Seq((i + 1) % n, (i + 2) % n, (i * i + 3) % n)
        .filter(_ != i).map(d => (i, d))
    }.toSet

  test("random walks replay the md5-ranked neighbor picks exactly") {
    val n = nDocs
    val nbrs = directedEdges(n).toSeq.groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).distinct.sorted }
    val got = Graphs.randomWalks(spark, sf).collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[Long]("node")))
    val want = (0L until n).filter(_ % 97 == 0).flatMap { seed =>
      (0 until 2).flatMap { k =>
        val w = seed * 2 + k
        var node = seed
        (0L to 8L).flatMap { t =>
          if (t == 0L) Some((w, 0L, seed))
          else {
            val out = nbrs(node)
            val pick = out((md5_60(s"$w:$t:$node") % out.size).toInt)
            node = pick
            Some((w, t, pick))
          }
        }
      }
    }
    assert(got.toSeq.sorted === want.sorted)
    // every step moves along a real edge — the corpus is valid input
    // for a skip-gram trainer
    val byWalk = got.groupBy(_._1).values
    byWalk.foreach { steps =>
      val path = steps.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(nbrs(a).contains(b), s"hop $a -> $b is not an edge")
      }
    }
  }

  test("skip-gram pairs restate from the collected walk corpus") {
    val walks = Graphs.randomWalks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = walks.toSeq.groupBy(_._1).values.toSeq.flatMap { steps =>
      for {
        a <- steps; b <- steps
        if a._2 != b._2 && math.abs(a._2 - b._2) <= 2
      } yield (a._3, b._3)
    }.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .toSet
    val got = Graphs.walkSkipgramPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("dp counts: Laplace noise restates from the md5 uniform and " +
      "the release is the noised distinct-user count") {
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val trueCounts = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Privacy.dpCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSet === trueCounts.keySet)
    got.foreach { case (et, n, noiseMicros, released, eps, sens) =>
      assert(n === trueCounts(et))
      val u = (md5_60(s"dp:$et") % 1000000L + 0.5) / 1000000.0
      val noise = r6(-2.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5)))
      assert(noiseMicros === math.round(noise * 1e6))
      assert(released === n + math.round(noise))
      assert(eps === 500000L && sens === 1L)
    }
    // the seeded noise must actually perturb at least one category
    assert(got.exists { case (_, n, _, released, _, _) => released != n })
  }

  // driver-side basket replay shared by the rec1/rec2 tests
  private lazy val baskets = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
    .map(r => (r.getLong(0), r.getLong(1)))
  private lazy val nOrders = baskets.map(_._1).distinct.length.toLong
  private lazy val support = baskets.groupBy(_._2).map { case (i, xs) =>
    i -> xs.length.toLong }
  private lazy val pairCounts = baskets.groupBy(_._1).values.flatMap { b =>
    val items = b.map(_._2).distinct.sorted
    for (i <- items.indices; j <- i + 1 until items.length)
      yield (items(i), items(j))
  }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

  test("item co-occurrence equals a driver-side basket recount") {
    val rows = Recommend.itemCooccur(spark, sf).collect()
    val want = pairCounts.toSeq.filter(_._2 >= 2)
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(100)
      .map { case ((a, b), nAb) =>
        val (na, nb) = (support(a), support(b))
        (a, b, nAb, na, nb,
          math.round(1e6 * (nAb * nOrders).toDouble / (na * nb).toDouble),
          math.round(1e6 * nAb.toDouble / math.sqrt((na * nb).toDouble)))
      }
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want)
    // the cut is a top-k plan, not a global sort
    val plan = Recommend.itemCooccur(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("association rules restate from the same basket counts") {
    val got = Recommend.assocRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val want = pairCounts.toSeq.filter(_._2 >= 2)
      .flatMap { case ((a, b), nAb) => Seq((a, b, nAb), (b, a, nAb)) }
      .map { case (ant, cons, nAb) =>
        val (na, nc) = (support(ant), support(cons))
        (ant, cons, nAb, na, nc,
          math.round(1e6 * nAb.toDouble / na.toDouble),
          math.round(1e6 * (nAb * nOrders).toDouble / (na * nc).toDouble))
      }
      .filter(_._6 >= 100000L)
      .sortBy { case (ant, cons, _, _, _, conf, _) => (-conf, ant, cons) }
      .take(100)
    assert(got === want)
    assert(got.nonEmpty, "support/confidence thresholds pruned everything")
  }

  test("incremental agg merge is bit-identical to the full recompute") {
    val got = Relational.inc1AggMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val full = Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("min_price"),
        max(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("max_price"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === full)
    // both sides of the cutoff must actually contribute, or the merge
    // test degenerates to a plain aggregate
    val o = Tables.orders(spark, sf)
    assert(o.filter(col("o_orderdate") < lit("2000-01-01")).count() > 0)
    assert(o.filter(col("o_orderdate") >= lit("2000-01-01")).count() > 0)
  }

  test("gumbel top-k restates from the dsir weights and the md5 noise") {
    val w = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("lr_total_micro")))
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val keyed = w.map { case (id, nt, lr) =>
      val w6 = r6(lr.toDouble / (nt * 1000000L).toDouble)
      val u = (md5_60(s"gum:$id") % 1000000L + 0.5) / 1000000.0
      val g6 = r6(-math.log(-math.log(u)))
      (id, nt, lr, math.round(1e6 * (w6 + g6)))
    }
    val want = keyed.sortBy { case (id, _, _, k) => (-k, id) }.take(50)
    val got = Sampling.gumbelTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
    // the noise must actually perturb membership vs the pure arg-top of
    // w — otherwise this is a threshold filter, not a sampler
    val pureTop = w
      .sortBy { case (id, nt, lr) => (-(lr.toDouble / (nt * 1e6)), id) }
      .take(50).map(_._1).toSet
    assert(want.map(_._1).toSet != pureTop)
  }

  test("kmeans++ seeding replays the Gumbel-argmax D2 chain exactly") {
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def gumbel(j: Int, id: Long): Double = {
      val u = (md5_60(s"kpp:$j:$id") % 1000000L + 0.5) / 1000000.0
      r6(-math.log(-math.log(u)))
    }
    def l2(v: Array[Double], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += (v(i) - c(i)) * (v(i) - c(i)); i += 1 }
      r6(acc)
    }
    var centers = Vector.empty[(Long, Array[Double])]
    for (j <- 0 until 6) {
      val picked = vecs.map { case (id, v) =>
        val key =
          if (j == 0) gumbel(0, id)
          else {
            val d2 = centers.map(c => l2(v, c._2)).min
            r6(math.log(d2 + 1e-6)) + gumbel(j, id)
          }
        (id, v, key)
      }.maxBy { case (id, _, key) => (key, -id) }
      centers :+= ((picked._1, picked._2.map(r6)))
    }
    val assign = vecs.map { case (_, v) =>
      centers.zipWithIndex
        .map { case ((_, c), i) => (l2(v, c), i.toLong) }.min
    }
    val want = assign.groupBy(_._2).map { case (idx, xs) =>
      (idx, centers(idx.toInt)._1, xs.length.toLong,
        xs.map(d => math.round(d._1 * 1e6)).sum)
    }.toSet
    val got = Similarity.kmeansppInit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(centers.map(_._1).distinct.size == 6,
      "a center was picked twice — the D2 damping is not working")
  }

  test("WOE/IV restates from the category counts; IV is consistent") {
    val rows = Training.ml20WoeIv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSet === Set("mktsegment", "nation"))
    rows.groupBy(_._1).foreach { case (_, cats) =>
      val posTot = cats.map(_._3).sum
      val negTot = cats.map(_._4).sum
      assert(posTot > 0 && negTot > 0)
      var iv = 0L
      cats.foreach { case (_, _, nPos, nNeg, woeMicros, _) =>
        val woe6 = BigDecimal(math.log(
          ((nPos + 0.5) / posTot) / ((nNeg + 0.5) / negTot)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(woeMicros === math.round(1e6 * woe6))
        iv += math.round(1e6 *
          (nPos.toDouble / posTot - nNeg.toDouble / negTot) * woe6)
      }
      cats.foreach { case (_, _, _, _, _, ivMicros) =>
        assert(ivMicros === iv)
      }
    }
  }
}
