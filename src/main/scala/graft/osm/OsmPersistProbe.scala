package graft.osm

import graft.osm.pbf.PbfSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev probe (not part of the driver contract): isolates whether the OSM
  * shape phases' bench swings come from the parse itself or from the
  * DISK_ONLY cache write that OsmBench wraps around it. */
object OsmPersistProbe {
  def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val xml = "/tmp/graft_osm_506727_59642.osm"
    val pbf = xml + ".pbf"
    for (i <- 1 to 2) {
      println(f"[$i] pbf shape noPersist: ${time(OsmEngine.shape(PbfSource.elements(spark, pbf)).count())}%.2f")
      println(f"[$i] xs  shape noPersist: ${time(OsmEngine.shape(OsmXmlSplit.elements(spark, xml)).count())}%.2f")
      val t = time { val d = OsmEngine.shape(PbfSource.elements(spark, pbf)).persist(StorageLevel.DISK_ONLY); d.count(); d.unpersist(blocking = true) }
      println(f"[$i] pbf shape DISK_ONLY: $t%.2f")
      val t2 = time { val d = OsmEngine.shape(PbfSource.elements(spark, pbf)).persist(StorageLevel.MEMORY_AND_DISK); d.count(); d.unpersist(blocking = true) }
      println(f"[$i] pbf shape MEM_DISK:  $t2%.2f")
      val t3 = time { val d = OsmEngine.shape(OsmXmlSplit.elements(spark, xml)).persist(StorageLevel.MEMORY_AND_DISK); d.count(); d.unpersist(blocking = true) }
      println(f"[$i] xs  shape MEM_DISK:  $t3%.2f")
    }
    spark.stop()
  }
}
