package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spatial family: the grid-cell stencil join must (a) find exactly the
  * all-pairs result — the losslessness contract the DuckDB oracle also
  * checks — and (b) run as an equi-join on the cell keys, never a
  * nested loop over the corpus.
  */
class SpatialSpec extends SparkSpec {

  test("radius pairs: stencil join == quadratic all-pairs, via an " +
      "equi-join on cell keys") {
    val df = Spatial.radiusPairs(spark, sf)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"stencil join degenerated to a product:\n$p")
    val got = df.collect().map(_.toSeq).toSet
    // quadratic truth on the same point cloud
    val pts = Spatial.points(spark, sf)
    val a = pts.select(col("id").as("id_a"), col("x").as("ax"),
      col("y").as("ay"))
    val b = pts.select(col("id").as("id_b"), col("x").as("bx"),
      col("y").as("by"))
    val r = 2000000L
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist2"))
      .collect().map(_.toSeq).toSet
    assert(got === want, "stencil join lost or invented pairs")
    assert(got.nonEmpty, "fixture produced no pairs — radius too small")
  }

  test("pairs are emitted exactly once (no stencil double-count)") {
    val df = Spatial.radiusPairs(spark, sf)
    assert(df.count() === df.select("id_a", "id_b").distinct().count())
  }

  test("knn join: every query point gets exactly k ranked neighbors " +
      "and ranks are 1..k by increasing distance") {
    val rows = Spatial.knnJoin(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to 5L))
      val d = sorted.map(_.getLong(2))
      assert(d.toSeq === d.sorted.toSeq)
    }
  }

  test("cell density cells tile the declared domain") {
    val rows = Spatial.cellDensity(spark, sf).collect()
    val cells = Spatial.DomainMicros / 2000000L
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < cells)
      assert(r.getLong(1) >= 0 && r.getLong(1) < cells)
    }
  }

  test("dbscan equals a driver-side replay and produces real clusters") {
    // larger radius than the driver default: the sf0.001 cloud is too
    // sparse at r=2e6 to exercise the core/border/noise trichotomy
    val r = 8000000L
    val minPts = 3
    val got = Spatial.dbscan(spark, sf, idCap = 2000L, rMicros = r,
        minPts = minPts).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getLong(3))).toSet
    val pts = Spatial.points(spark, sf).filter(col("id") <= 2000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map { p =>
      p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= r * r)
        .map(_._1).toSet
    }.toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // components over core-core edges by label propagation to min id
    var comp = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      for (id <- core) {
        val m = (nbrs(id).intersect(core) + id).map(comp).min
        if (m < comp(id)) { comp += id -> m; changed = true }
      }
    }
    val want = pts.map { p =>
      val id = p._1
      val nn = nbrs(id).size.toLong
      if (core(id)) (id, nn, "core", comp(id))
      else {
        val coreNbrs = nbrs(id).intersect(core)
        if (coreNbrs.nonEmpty) (id, nn, "border", coreNbrs.map(comp).min)
        else (id, nn, "noise", -1L)
      }
    }.toSet
    assert(got === want)
    val roles = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(roles.getOrElse("core", 0) > 0, s"no cores: $roles")
    assert(roles.getOrElse("noise", 0) > 0, s"no noise: $roles")
    assert(got.filter(_._3 == "core").map(_._4).size > 1,
      "degenerate single-cluster outcome")
  }
}
