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
    assert((spark.sparkContext.getPersistentRDDs.keySet -- pre).isEmpty)
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
    assert((spark.sparkContext.getPersistentRDDs.keySet -- pre).isEmpty)
  }

  test("modularity of the planted partition is strongly positive and recomputes exactly") {
    val rows = Graphs.modularity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 10) // 500 docs / 50-block communities
    assert(rows.forall(_._2 == 50L))
    // independent recompute from the raw edge arithmetic
    val n = 500L
    val und = (0L until n).flatMap { i =>
      val base = i - i % 50
      Seq(base + (i % 50 + 1) % 50, base + (i % 50 + 2) % 50) ++
        (if (i % 50 == 0) Seq((i + 350) % n) else Nil)
    }.zip((0L until n).flatMap(i =>
      Seq(i, i) ++ (if (i % 50 == 0) Seq(i) else Nil)))
      .collect { case (dst, src) if src != dst =>
        (math.min(src, dst), math.max(src, dst)) }
      .toSet
    val m = und.size.toDouble
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size }
    for ((c, nn, ie, ds, q) <- rows) {
      val expIntra = und.count(e => e._1 / 50 == c / 50 && e._2 / 50 == c / 50
        && e._1 >= c && e._1 < c + 50 && e._2 < c + 50)
      val expDs = (c until c + 50).map(deg(_).toLong).sum
      assert(ie == expIntra, s"community $c intra")
      assert(ds == expDs, s"community $c degree sum")
      // half-AWAY rounding, matching Spark/DuckDB round (rint would
      // diverge on exact .5)
      val qx = 1e6 * (ie / m - (ds / (2 * m)) * (ds / (2 * m)))
      assert(q == (if (qx >= 0) math.floor(qx + 0.5) else math.ceil(qx - 0.5)).toLong)
      assert(q > 50000L, s"community $c modularity contribution weak")
      assert(nn == 50L)
    }
  }

  test("k-hop distances equal a driver-side BFS and leak no storage") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val got = Graphs.khopDistances(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent BFS over the same derived undirected edge rule
    val adj = edgeSet(500)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var dist = Map(0L -> 0L)
    var frontier = Set(0L)
    for (h <- 1L to 8L) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .diff(dist.keySet)
      dist ++= frontier.map(_ -> h)
    }
    assert(got == dist)
    assert(got(0L) == 0L)
    // ring ±1/±2 edges put nodes 1..2 at hop 1; the quadratic hub
    // shortcut must reach SOME far node early or the derivation is
    // degenerate
    assert(got(1L) == 1L && got(2L) == 1L)
    assert(got.size > 100, "8 hops over ring+hub must cover a wide ball")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- pre).isEmpty)
  }

  test("harmonic closeness equals a driver-side multi-source BFS " +
      "and leaks no storage") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val got = Graphs.harmonicCloseness(spark, sf).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("n_reached"),
        r.getAs[Long]("harmonic_micros")))
    val adj = edgeSet(500)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val seeds = (0L until 500L).filter(_ % 97 == 0)
    val want = seeds.map { s =>
      var dist = Map(s -> 0L)
      var frontier = Set(s)
      for (h <- 1L to 8L) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
          .diff(dist.keySet)
        dist ++= frontier.map(_ -> h)
      }
      val reached = dist.filter(_._2 > 0)
      (s, reached.size.toLong,
        reached.values.map(d => math.round(1e6 / d)).sum)
    }
    assert(got.toSeq === want)
    assert(got.nonEmpty && got.forall(_._2 > 100))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- pre).isEmpty)
  }
}
