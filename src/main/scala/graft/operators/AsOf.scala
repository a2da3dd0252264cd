package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator the reference lacks and Spark has
  * no primitive for (SURVEY.md §2f "joins: none"). Composed from
  * built-ins per the preference order: union the two tagged streams,
  * sort within key by time, and carry the latest left-row forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame.
  *
  * Scale: ONE shuffle on the key (the union is partitioned once), then a
  * per-partition streaming window pass — compare to the naive
  * inequality-join + groupBy-max, which is O(n·m) per key and re-shuffles
  * twice. This is the sort-merge as-of plan a purpose-built engine runs.
  */
object AsOf {

  /** For each event, the key/time-wise most recent order (o_orderdate ≤
    * event ts) of the same user bucket (orders keyed to users via
    * o_custkey % 15 — the synthetic tables share no natural key; the
    * join *shape* is the operator under test). Ties on o_orderdate are
    * pinned to the largest o_orderkey.
    */
  def asofEventOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir).select(
      (col("o_custkey") % 15).as("k"), col("o_orderdate").as("ts"),
      col("o_orderkey"), lit(null).cast("long").as("event_id"))
    val events = Tables.events(s, dir).select(
      (col("user_id") % 15).as("k"), col("ts"),
      lit(null).cast("long").as("o_orderkey"), col("event_id"))
    // side 0 = orders (lookup side), 1 = events (probe side): an order at
    // exactly t sorts before an event at t ⇒ "<=" as-of semantics; equal
    // order timestamps are disambiguated by o_orderkey so `last` is total.
    val tagged = orders.withColumn("side", lit(0))
      .unionByName(events.withColumn("side", lit(1)))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("side").asc,
        col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("last_orderkey"))
  }

  /** `asof2_tolerance` — [[asofEventOrders]] with a STALENESS BOUND
    * (pandas merge_asof's `tolerance`, kdb's windowed aj): the carried
    * match only counts when it falls within `tolDays` of the probe
    * row, else NULL — the production guard against silently joining a
    * decades-stale dimension row, which is exactly what the unbounded
    * face does on this corpus (orders end in 2001, events live in
    * 2024; at the 8,200-day default only the early-January events
    * still see a fresh-enough order, so both outcomes are exercised
    * at every SF).
    *
    * Same single-shuffle union+window plan as the unbounded face; the
    * carry keeps (match ts, match key) as a struct so the staleness
    * test is one comparison per probe row — no second join, no
    * re-shuffle. Correctness note: nulling the MOST RECENT match when
    * stale is exactly "no match within [ts−tol, ts]", since any older
    * candidate is staler still. */
  def asofEventOrdersTolerance(s: SparkSession, dir: String,
                               tolDays: Int = 8200): DataFrame = {
    val orders = Tables.orders(s, dir).select(
      (col("o_custkey") % 15).as("k"), col("o_orderdate").as("ts"),
      col("o_orderkey"), lit(null).cast("long").as("event_id"))
    val events = Tables.events(s, dir).select(
      (col("user_id") % 15).as("k"), col("ts"),
      lit(null).cast("long").as("o_orderkey"), col("event_id"))
    val tagged = orders.withColumn("side", lit(0))
      .unionByName(events.withColumn("side", lit(1)))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("side").asc,
        col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("m", last(
        when(col("side") === 0,
          struct(col("ts").as("ots"), col("o_orderkey").as("okey"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"),
        when(col("m.ots") >=
          col("ts") - expr(s"INTERVAL $tolDays DAYS"), col("m.okey"))
          .as("last_orderkey_fresh"))
  }
}
