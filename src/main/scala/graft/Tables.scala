package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md /
  * FIXTURES.md §3). One parquet file per table under `\$dir/`.
  *
  * All operators take the table DataFrame, so Catalyst sees a plain
  * `FileScan parquet` relation and can push filters / prune columns into
  * the scan — at 100 TB the scan is the dominant cost and pushdown is the
  * first-order optimization.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs
    * (legacy conf — only affects NANOS columns) and rebuild the
    * microsecond timestamp with integer division (`div`, not `/`: the
    * epoch-nano magnitude ~1.7e18 exceeds double's 2^53 exact range). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
