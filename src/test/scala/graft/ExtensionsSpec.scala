package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions gets the native functions and the TopKPerKey
  * strategy with no per-operator register() calls. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects functions and the top-k strategy at build") {
    val base = spark // materialize the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // native expression resolves in plain SQL, no register() needed
      val d = s2.sql(
        "SELECT l2_sq(array(0.0d, 2.0d), array(0.0d, 0.0d)) AS d")
        .collect().head.getDouble(0)
      assert(d === 4.0)
      val cos = s2.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect().head.getDouble(0)
      assert(cos === 1.0)
      // the declarative rank-filter shape plans through the custom exec
      val df = s2.read.parquet(s"$sf/orders.parquet")
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 1)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        df.queryExecution.executedPlan.toString)
      assert(df.count() > 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
