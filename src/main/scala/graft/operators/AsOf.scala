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

  /** The probe(orders)/lookup(lineitem shipdates) tagged union the
    * FORWARD and NEAREST faces share: these two directions need
    * lookup rows on BOTH sides of every probe to be non-vacuous, and
    * shipdates interleave with order dates corpus-wide (the
    * events/orders pairing of the backward faces has a 20-year gap —
    * forward from an event would never match). `lid` is the lineitem's
    * total-order id (l_orderkey·10 + l_linenumber, linenumber ≤ 7) so
    * every tie rule is pinned. */
  private def orderShipTagged(s: SparkSession, dir: String): DataFrame = {
    val ship = Tables.lineitem(s, dir).select(
      (col("l_suppkey") % 15).as("k"), col("l_shipdate").as("ts"),
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("lid"),
      lit(null).cast("long").as("o_orderkey"))
    val probes = Tables.orders(s, dir).select(
      (col("o_custkey") % 15).as("k"), col("o_orderdate").as("ts"),
      lit(null).cast("long").as("lid"), col("o_orderkey"))
    ship.withColumn("side", lit(0))
      .unionByName(probes.withColumn("side", lit(1)))
  }

  /** `asof3_forward` — merge_asof's `direction='forward'`: for each
    * order, the EARLIEST shipment with ship ts ≥ the order date in its
    * bucket (ties on ts → smallest lid). Same single-shuffle
    * union+window plan as the backward face, run over the REVERSED
    * ordering with a growing [unboundedPreceding, currentRow] frame —
    * NOT `first` over [currentRow, unboundedFollowing]: Spark's
    * unbounded-FOLLOWING frame re-evaluates its aggregate from
    * scratch per row (O(n²) per partition — measured minutes at
    * sf0.1), while the growing frame is incremental. In reversed
    * (ts desc) order, side ASC puts a ts-equal shipment BEFORE the
    * probe, keeping `≥` semantics, and `last` lands on the earliest
    * shipment (smallest lid on ties, via lid desc). */
  def asofOrderShipForward(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").desc, col("side").asc,
        col("lid").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderShipTagged(s, dir)
      .withColumn("next_lid",
        last(col("lid"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("o_orderkey"), col("next_lid"))
  }

  /** `asof4_nearest` — merge_asof's `direction='nearest'`: the closer
    * of the backward carry (ship ≤ order date; ties → LARGEST lid,
    * the backward face's rule) and the strictly-later forward carry
    * (ship > order date; ties → smallest lid), by |day distance|;
    * equal distances pin to the BACKWARD match (the merge_asof
    * convention this library documents). Both carries are GROWING
    * [unboundedPreceding, currentRow] frames (incremental — the
    * unbounded-following form re-evaluates per row, O(n²) per
    * partition): backward over (ts asc, side asc) so ts-equal
    * shipments land in the backward frame (distance 0, which wins
    * every comparison), forward over the reversed (ts desc,
    * side desc) so only strictly-later shipments precede the probe.
    * One shuffle, two sorts of the same exchange. Emits the winning
    * lid and its exact day distance. */
  def asofOrderShipNearest(s: SparkSession, dir: String): DataFrame = {
    val wB = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("side").asc,
        col("lid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("k"))
      .orderBy(col("ts").desc, col("side").desc,
        col("lid").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = when(col("side") === 0,
      struct(col("ts").as("mts"), col("lid").as("mlid")))
    val db = datediff(col("ts"), col("b.mts")).cast("long")
    val df_ = datediff(col("f.mts"), col("ts")).cast("long")
    orderShipTagged(s, dir)
      .withColumn("b", last(m, ignoreNulls = true).over(wB))
      .withColumn("f", last(m, ignoreNulls = true).over(wF))
      .filter(col("side") === 1)
      .select(col("o_orderkey"),
        when(col("b").isNull, col("f.mlid"))
          .when(col("f").isNull, col("b.mlid"))
          .when(db <= df_, col("b.mlid"))
          .otherwise(col("f.mlid")).as("nearest_lid"),
        when(col("b").isNull, df_)
          .when(col("f").isNull, db)
          .when(db <= df_, db)
          .otherwise(df_).as("dist_days"))
  }
}
