package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4f operators: recursive CTE hierarchy walk, bucketized big-big
  * range join, deterministic Poisson bootstrap. Values are pinned by
  * the DuckDB oracles; these tests pin plans and semantic invariants.
  */
class Round4fSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sql9: recursion reaches every customer exactly once, depth = key width") {
    val rows = Relational.sql9Recursive(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(total === Tables.customer(spark, sf).count(),
      "every key's div-10 parent chain must reach a root exactly once")
    val maxKey = Tables.customer(spark, sf)
      .agg(max(col("c_custkey"))).collect().head.getLong(0)
    val maxDepth = rows.map(_.getAs[Int]("depth")).max
    assert(maxDepth === maxKey.toString.length - 1)
  }

  test("rj2: bucketized equi-join ≡ naive inequality join, no nested loop") {
    val df = Relational.rj2BucketedRange(spark, sf)
    val p = plan(df)
    assert(!p.contains("NestedLoop"),
      s"bucketization must avoid the O(n·m) nested loop:\n$p")
    // naive reference: direct inequality join, same grouping
    val promos = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(500)) === 0)
      .select(col("o_orderkey").as("promo_id"),
        col("o_orderdate").cast("timestamp").cast("long").as("lo_s"))
      .withColumn("hi_s", col("lo_s") + 3L * 86400)
    val naive = Tables.lineitem(spark, sf)
      .select(col("l_quantity"),
        col("l_shipdate").cast("timestamp").cast("long").as("ship_s"))
      .join(promos, col("ship_s") >= col("lo_s") && col("ship_s") < col("hi_s"))
      .groupBy(col("promo_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === naive)
  }

  test("stat8: replicate weights concentrate and the draw is reproducible") {
    val rows = Relational.stat8Bootstrap(spark, sf).collect()
    assert(rows.length === 16)
    val n = Tables.orders(spark, sf).count()
    val trueMean = Tables.orders(spark, sf)
      .agg(avg(col("o_totalprice"))).collect().head.getDouble(0)
    rows.foreach { r =>
      // sum of n Poisson(1) weights: mean n, sd sqrt(n) — 5 sigma gate
      assert(math.abs(r.getAs[Long]("n_eff") - n) <= 5 * math.sqrt(n.toDouble),
        s"replicate ${r.getAs[Long]("r")}: n_eff=${r.getAs[Long]("n_eff")} vs n=$n")
      assert(math.abs(r.getAs[Double]("boot_mean") - trueMean) < trueMean * 0.2)
    }
    // determinism: a re-run is bit-identical (no RNG state anywhere)
    val again = Relational.stat8Bootstrap(spark, sf).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }
}
