package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions gets the native functions and the TopKPerKey
  * strategy with no per-operator register() calls. */
class ExtensionsSpec extends SparkSpec {

  test("Graft.attach wires functions, strategy, and optimizer rule into an existing session") {
    Graft.attach(spark)
    Graft.attach(spark) // idempotent
    assert(spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect().head.getDouble(0) === 1.0)
    val em = spark.sessionState.experimentalMethods
    assert(em.extraStrategies.contains(plans.TopKPerKeyStrategy))
    assert(em.extraOptimizations.count(_ == plans.NativeKernelRule) === 1)
  }

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
      // the custom Generator resolves and fans out through the
      // injected registry too (LATERAL VIEW path)
      val sh = s2.sql(
        """SELECT shingle FROM (SELECT array('a','b','c','d') AS tk)
           LATERAL VIEW shingle_gen(tk, 3) t AS shingle""")
        .collect().map(_.getString(0)).toSeq
      assert(sh === Seq("a b c", "b c d"))
      // the declarative rank-filter shape plans through the custom exec
      val df = s2.read.parquet(s"$sf/orders.parquet")
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 1)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        df.queryExecution.executedPlan.toString)
      assert(df.count() > 0)
      // the optimizer rule rewrites declarative HOF vector folds into
      // the native kernels — plan shows the native names, results are
      // bit-equal (the kernels fold in the same order)
      val emb = s2.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = emb.filter(col("vec_id") === 0).select(col("v").as("q"))
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val hof = emb.crossJoin(q).select(col("vec_id"),
        aggregate(zip_with(col("v"), col("q"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("l2"),
        (dot(col("v"), col("q")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("q"), col("q")))))
          .as("cos"))
      val p = hof.queryExecution.optimizedPlan.toString
      assert(p.contains("l2_sq"), s"L2 fold not rewritten:\n$p")
      assert(p.contains("cosine_sim"), s"cosine fold not rewritten:\n$p")
      assert(!p.toLowerCase.contains("aggregate(zip_with"),
        s"HOF fold survived the rewrite:\n$p")
      // and the rewritten query returns the same values as the
      // explicitly-native form
      val viaRule = hof.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      val native = emb.crossJoin(q).select(col("vec_id"),
        call_function("l2_sq", col("v"), col("q")).as("l2"),
        call_function("cosine_sim", col("v"), col("q")).as("cos"))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(viaRule.sameElements(native))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
