package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark over a reference-scale OSM document (~100 MB, the size of
  * the extract the reference processed): text-scan census, full
  * read→shape pipeline, then Q1–Q5 over the shaped cache. Generated
  * once into /tmp and reused across runs. Also invoked from
  * graft.Bench so the per-round BENCH json carries these numbers.
  */
object OsmBench {

  final case class Result(mb: Double, auditSec: Double, shapeSec: Double,
                          queriesSec: Double, rows: Long) {
    def json: String =
      f""""osm_mb":$mb%.1f,"osm_audit_sec":$auditSec%.2f,""" +
        f""""osm_shape_sec":$shapeSec%.2f,"osm_queries_sec":$queriesSec%.2f,""" +
        s""""osm_rows":$rows"""
  }

  def run(spark: SparkSession,
          nNodes: Int = 620000, nWays: Int = 62000): Result = {
    val path = s"/tmp/graft_osm_${nNodes}_$nWays.osm"
    if (!new java.io.File(path).exists())
      OsmSynth.generate(path, nNodes, nWays)
    val mb = new java.io.File(path).length() / 1e6
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val auditSec = time(OsmEngine.auditTags(spark, path).count())
    var shaped: DataFrame = null
    var rows = 0L
    val shapeSec = time {
      shaped = OsmEngine.shape(OsmEngine.elements(spark, path)).cache()
      rows = shaped.count()
    }
    val queriesSec = time {
      OsmEngine.q1UniqueUsers(shaped).count()
      OsmEngine.q2TypeCounts(shaped).count()
      OsmEngine.q3Amenities(shaped).count()
      OsmEngine.q4TopShops(shaped).count()
      OsmEngine.q5TopHighways(shaped).count()
    }
    shaped.unpersist()
    Result(mb, auditSec, shapeSec, queriesSec, rows)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark)
    println(s"""{"metric":"osm_scale",${r.json}}""")
    spark.stop()
  }
}
