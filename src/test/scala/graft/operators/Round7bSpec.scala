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

  test("item co-occurrence equals a driver-side basket recount") {
    val rows = Recommend.itemCooccur(spark, sf).collect()
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val support = baskets.groupBy(_._2).map { case (i, xs) =>
      i -> xs.length.toLong }
    val pairCounts = baskets.groupBy(_._1).values.flatMap { b =>
      val items = b.map(_._2).distinct.sorted
      for (i <- items.indices; j <- i + 1 until items.length)
        yield (items(i), items(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
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
