package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution: the runtime re-planning layer the engine
  * leans on at scale (the charter's "AQE for runtime re-plan"). These
  * tests pin the two behaviors that matter at 100 TB: a shuffled join
  * whose build side turns out small converts to broadcast AT RUNTIME
  * (static planning could not know), and post-shuffle partitions
  * coalesce to match actual data volume instead of the static
  * shuffle.partitions knob.
  */
class AqeSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption.filter(_ != null) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE converts a statically-shuffled join to broadcast at runtime") {
    // static broadcast off (the optimizer cannot prove the filtered side
    // small), adaptive broadcast on — only the RUNTIME stage statistics
    // can trigger the conversion
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val small = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 450000.0) // tiny after the filter
        .select(col("o_orderkey"), col("o_orderpriority"))
      val joined = Tables.lineitem(spark, sf)
        .join(small, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect() // finalize adaptive plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"runtime stats should convert the join:\n$finalPlan")
      assert(!finalPlan.contains("SortMergeJoin"))
    }
  }

  test("join hints steer the physical strategy (BROADCAST / SHUFFLE_HASH / MERGE)") {
    // the hint surface users reach for when statistics mislead the
    // planner; each hint must surface in the executed strategy
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      Tables.orders(spark, sf).createOrReplaceTempView("o_h")
      Tables.customer(spark, sf).createOrReplaceTempView("c_h")
      def planOf(hint: String): String = spark.sql(
        s"""SELECT /*+ $hint(c_h) */ count(*)
            FROM o_h JOIN c_h ON o_custkey = c_custkey""")
        .queryExecution.executedPlan.toString
      assert(planOf("BROADCAST").contains("BroadcastHashJoin"))
      assert(planOf("SHUFFLE_HASH").contains("ShuffledHashJoin"))
      assert(planOf("MERGE").contains("SortMergeJoin"))
    }
  }

  test("AQE coalesces post-shuffle partitions to the data, not the knob") {
    withConf("spark.sql.shuffle.partitions" -> "64") {
      val agg = Tables.nation(spark, sf)
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      agg.collect()
      val finalPlan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("AQEShuffleRead coalesced"),
        s"tiny shuffle must coalesce below the 64-partition knob:\n$finalPlan")
    }
  }
}
