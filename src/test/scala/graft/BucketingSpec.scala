package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides of a repeated
  * large⋈large join on the join key removes the per-query shuffle —
  * at 100 TB this turns every orders⋈lineitem from two exchanges into
  * zero. Local test: write both tables bucketed, assert the join plan
  * has NO Exchange and results match the plain join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders⋈lineitem plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // hint("merge"): at this SF the orders side is broadcast-sized, which
    // would also avoid the shuffle but not exercise the bucketed
    // co-location; force the sort-merge path the plan takes at 100 TB
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    // the JOIN itself must not shuffle either side (the final groupBy
    // exchange on o_orderstatus is expected)
    val joinSection = p.split("HashAggregate", 2).last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      s"expected a bucketed equi-join:\n$p")
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles a side:\n$p")

    // results identical to the plain (shuffling) join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bucketed = joined.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bucketed === plain)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
