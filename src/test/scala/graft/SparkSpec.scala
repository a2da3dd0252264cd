package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep saveAsTable (BucketingSpec) out of the repo working dir
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${java.util.UUID.randomUUID()}")
      // HDFS-backed store: no RocksDB maintenance threads / snapshot-lag
      // warnings in short-lived test queries
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf: String = "/root/testdata/sf0.001"

  def fixture(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  /** md5-60 restated independently of the Catalyst expression
    * (MessageDigest + hex), the one driver-side oracle every
    * hash-pipeline replay spec shares. */
  def md5_60(k: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
}
