package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash over a token array: per token one
  * xxhash64 (same seed-42 function as Spark's `xxhash64`), each bit
  * votes ±1 weighted by repetition, sign vector → fingerprint.
  *
  * Replaces the higher-order-function fold (`aggregate` + per-token
  * `transform(sequence(0,63))` + `zip_with`) which allocates two
  * 64-element arrays per TOKEN; this allocates one 64-int vote buffer
  * per ROW. Bit-identical output to the HOF form (FunctionsSpec).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    while (t < arr.numElements()) {
      val tok = arr.getUTF8String(t)
      val h = XxHash64Function.hash(tok, StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** MinHash signature: k permutation-minima over shingle hashes in one
  * pass — h_i(x) = (a_i·fold(xxhash64(x)) + b_i) mod P with the same
  * (a_i, b_i, P) parameters as the HOF form it replaces.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 1000000007L
  private val as: Array[Long] = (1 to k).map(i => 2L * i * 104729L + 1L).toArray
  private val bs: Array[Long] = (1 to k).map(i => i * 7919L).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(P)
    var t = 0
    while (t < arr.numElements()) {
      val sh = arr.getUTF8String(t)
      val base = {
        val h = XxHash64Function.hash(sh, StringType, 42L) % 1000000000L
        if (h < 0) h + 1000000000L else h // pmod semantics
      }
      var i = 0
      while (i < k) {
        val v = (as(i) * base + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}
