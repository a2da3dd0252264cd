package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 batch 19: Borůvka MSF vs a union-find Kruskal replay under
  * the same (w, a, b) total order — the forest is unique under a total
  * order, so the two algorithms must agree edge-for-edge. */
class Round7sSpec extends SparkSpec {

  private def deriveEdges(): Seq[(Long, Long, Long)] = {
    val n = Tables.documents(spark, sf).count()
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val und = ids.flatMap { i =>
      val deg = 1 + (md5_60(s"mst:$i") % 4).toInt
      (0 until deg).map { j =>
        val d = md5_60(s"mst:$i:$j") % n
        (math.min(i, d), math.max(i, d))
      }
    }.filter(p => p._1 != p._2).distinct
    und.map { case (a, b) =>
      (a, b, 1 + md5_60(s"mw:$a:$b") % 1000000)
    }.toSeq
  }

  private final class UnionFind(ids: Seq[Long]) {
    private val p = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (p(r) != r) r = p(r)
      var c = x
      while (p(c) != c) { val nx = p(c); p(c) = r; c = nx }
      r
    }
    def union(a: Long, b: Long): Boolean = {
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) false else { p(math.max(ra, rb)) = math.min(ra, rb); true }
    }
  }

  test("Borůvka MSF equals Kruskal under the shared total order") {
    val edges = deriveEdges()
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val uf = new UnionFind(nodes)
    val kruskal = edges
      .sortBy(e => (e._3, e._1, e._2))
      .filter(e => uf.union(e._1, e._2))
      .toSet
    val got = Graphs.mst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === kruskal)
    // forest size identity: |MSF| = #touched-nodes - #components
    val comps = nodes.map(uf.find).distinct.size
    assert(got.size === nodes.size - comps)
    // no duplicate edges survived the per-round dedup
    assert(got.size === Graphs.mst(spark, sf).count())
  }

  test("pure-distributed Borůvka (localThreshold=0) emits the same " +
    "forest as the hybrid local-tail path") {
    val hybrid = Graphs.mst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = Graphs.mst(spark, sf, localThreshold = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist === hybrid)
  }
}
