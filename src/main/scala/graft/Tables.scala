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
  /** events.parquet has shipped with three different physical types for
    * `ts` across testdata generations, so the loader branches on the
    * dtype it actually observes rather than assuming one:
    *
    *  - parquet TIMESTAMP(NANOS): Spark rejects the footer outright
    *    ([PARQUET_TYPE_ILLEGAL]), so the initial read throws; retry under
    *    `spark.sql.legacy.parquet.nanosAsLong` (scoped to that fallback,
    *    not a permanent session mutation) and rebuild microseconds with
    *    integer division (`div`, not `/`: epoch-nano magnitude ~1.7e18
    *    exceeds double's 2^53 exact range).
    *  - raw BIGINT nanos (a nanosAsLong read, or an int64 generation):
    *    same `timestamp_micros(ts div 1000)` rebuild.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ: cast to
    *    the session-local TimestampType; under the UTC session every
    *    entry point sets, the instant is unchanged and downstream
    *    `window`/`unix_timestamp` semantics match the DuckDB oracle.
    *  - TIMESTAMP (LTZ): already what downstream expects. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try load(s, d, "events")
      catch { case scala.util.control.NonFatal(_) =>
        // Legacy TIMESTAMP(NANOS) files (PARQUET_TYPE_ILLEGAL at schema
        // read — the concrete exception class varies by Spark version,
        // so match any non-fatal failure). On a successful retry the
        // conf must stay set for the scan's execution phase; if the
        // retry ALSO fails (e.g. missing file) the prior value is
        // restored so an unrelated error can't leave a lasting session
        // mutation that would mask future NANOS columns as longs.
        val prior = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try load(s, d, "events")
        catch { case scala.util.control.NonFatal(e2) =>
          prior match {
            case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
          throw e2
        }
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
