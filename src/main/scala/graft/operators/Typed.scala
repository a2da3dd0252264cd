package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed Dataset[T] face of the engine (charter: case-class
  * Encoders where type safety helps) — and the user-level
  * `Aggregator[IN, BUF, OUT]` UDAF surface, which is a different API
  * from the Catalyst-level TypedImperativeAggregate
  * ([[graft.functions.MisraGriesAgg]]): an Aggregator is what a library
  * USER writes without touching Catalyst internals.
  *
  * Engineering honesty on the trade: typed transforms deserialize each
  * row into the case class (no whole-stage codegen through the lambda),
  * so the untyped column-expression face (Relational.q1PricingSummary)
  * is the performance path; the typed face buys compile-time safety for
  * business logic at a per-row boxing cost. Both faces produce
  * bit-identical results here — the aggregation buffer accumulates
  * revenue in exact integer 10⁻⁴-dollar units (2dp price × 2dp
  * discount-complement is exact in 4dp), so partial-merge order cannot
  * perturb the sum and any engine reproduces it.
  */
object Typed {

  case class LineItem(l_orderkey: Long, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_returnflag: String)

  /** Discounted revenue + item count, accumulated in exact integer
    * units: price cents × discount-complement percent = 10⁻⁴ dollars. */
  object RevenueAgg extends Aggregator[LineItem, (Long, Long), (Double, Long)] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: LineItem): (Long, Long) = {
      val priceCents = math.rint(a.l_extendedprice * 100).toLong
      val discPct = math.rint((1.0 - a.l_discount) * 100).toLong
      (b._1 + priceCents * discPct, b._2 + 1L)
    }
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): (Double, Long) = (b._1 / 1e4, b._2)
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** Typed pipeline: Dataset[LineItem] → typed filter → groupByKey →
    * custom Aggregator. Column pruning still reaches the scan (the
    * as[T] projection narrows the schema before deserialization). */
  def typed1Revenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_returnflag"))
      .as[LineItem]
    ds.filter(_.l_quantity > 0)
      .groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("rev"))
      .select(col("key").as("l_returnflag"),
        col("rev._1").as("revenue"), col("rev._2").as("n_items"))
  }
}
