package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate
  * (`TypedImperativeAggregate`) — the mergeable-summaries pattern that
  * makes frequency estimation work at 100 TB: each task keeps at most
  * `capacity` counters (constant memory regardless of cardinality),
  * partial sketches merge associatively at the exchange, and the final
  * map carries the deterministic guarantee
  *
  *   est(x) ≤ true(x) ≤ est(x) + n/(capacity+1)
  *
  * so every item with true frequency above n/(capacity+1) is
  * guaranteed present (Misra & Gries 1982; merge rule from Agarwal et
  * al., "Mergeable Summaries", PODS'12: sum counters, then subtract
  * the (capacity+1)-th largest and drop non-positives — the error
  * bounds add to at most εn across any merge tree).
  *
  * Individual estimates depend on merge order, so oracle-checked query
  * faces must emit only the guaranteed facts (presence + bound), not
  * raw estimates — same discipline as the HLL sketch in stat2.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "mg_topk capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType}")
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      b.get(key) match {
        case Some(c) => b.update(key, c + 1)
        case None if b.size < capacity => b.update(key, 1L)
        case None => // decrement-all step: one shared unit comes off
          // every counter AND the unseen incoming item (k+1 units per
          // step ⇒ at most n/(k+1) steps ⇒ the error bound)
          val dead = List.newBuilder[String]
          b.foreach { case (k, c) =>
            if (c == 1L) dead += k else b.update(k, c - 1)
          }
          dead.result().foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
                     o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    o.foreach { case (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    if (b.size > capacity) {
      val cut = b.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = List.newBuilder[String]
      b.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else b.update(k, c - cut)
      }
      dead.result().foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    val kv = b.toArray
    ArrayBasedMapData(
      kv.map(x => UTF8String.fromString(x._1): Any),
      kv.map(_._2: Any))
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { b.update(in.readUTF(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
