package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  // the derived link rule, re-stated independently of the operator
  private def edgeSet(n: Long): Set[(Long, Long)] =
    (0L until n).flatMap { i =>
      Seq((i + 1) % n, (i + 2) % n, (i * i + 3) % n)
        .filter(_ != i).map(d => (i, d))
    }.toSet

  test("pagerank conserves rank mass, keeps hub skew, leaks no storage") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val rows = Graphs.pagerank(spark, sf).collect()
    assert(rows.length == 500)
    // mass in micros: 1e6 up to one round-off per node per round
    val total = rows.map(_.getLong(1)).sum
    assert(math.abs(total - 1000000L) < rows.length,
      s"rank mass drifted: $total")
    // the quadratic hub edge must produce real rank variance — a
    // collapsed (near-uniform) vector would mean the derivation went
    // degenerate at this SF
    assert(rows.map(_.getLong(1)).distinct.length > 100)
    // every checkpoint RDD from the loop is unpersisted before return
    assert(spark.sparkContext.getPersistentRDDs.keySet == pre)
  }

  test("triangle counts equal an independent brute-force recount") {
    val got = Graphs.triangleCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = edgeSet(500)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val credits = collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- und; c <- adj(a) intersect adj(b); if c > b)
      Seq(a, b, c).foreach(v => credits(v) = credits.getOrElse(v, 0L) + 1)
    assert(credits.toMap == got)
    assert(got.values.sum % 3 == 0) // every triangle credits 3 corners
    assert(got.values.sum > 0)
  }

  test("label propagation converges to the planted block communities") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val got = Graphs.communities(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = graft.Tables.documents(spark, sf).count()
    assert(got.size == n)
    // the planted structure is recovered exactly: every node's stable
    // label is its 50-block's minimum id, despite the cross-block edges
    assert(got.forall { case (node, c) => c == node / 50 * 50 })
    assert(got.values.toSet.size == (n / 50).toInt)
    // the loop's checkpoints are unpersisted before return
    assert(spark.sparkContext.getPersistentRDDs.keySet == pre)
  }
}
