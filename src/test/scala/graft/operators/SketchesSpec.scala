package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("each sketch row partitions the full token stream") {
    val nTokens = Tables.documents(spark, sf)
      .select(explode(filter(split(lower(col("text")), "\\s+"),
        t => length(t) > 0)).as("t"))
      .count()
    val grid = Sketches.cmsSketch(spark, sf).collect()
    val perRow = grid.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perRow.keySet == Set(0L, 1L, 2L, 3L))
    assert(perRow.values.forall(_ == nTokens),
      s"every row hashes every occurrence exactly once: $perRow")
    assert(grid.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
  }

  test("estimates are one-sided and replay through the shared md5-60 " +
    "bridge") {
    val est = Sketches.cmsEstimates(spark, sf).collect()
    assert(est.length == 10)
    est.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"count-min must overestimate: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // replay one probe's cells with the driver-side md5-60 oracle
    val grid = Sketches.cmsSketch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probe = est.minBy(_.getString(0)).getString(0)
    val replayed = (0 until Sketches.Depth)
      .map(i => grid((i.toLong,
        ((md5_60(s"cms${i}_$probe") % 256) + 256) % 256)))
      .min
    assert(est.find(_.getString(0) == probe).get.getLong(2) == replayed)
  }
}
