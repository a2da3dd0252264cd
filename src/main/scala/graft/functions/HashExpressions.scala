package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-verifiable 60-bit base hash: the top 60 bits of the
  * MD5 digest (= the first 15 hex characters, read as an unsigned
  * integer). MD5 exists in every SQL engine (Spark `md5`, DuckDB
  * `md5`, Trino `md5`), so every hash-seeded operator built on this
  * base (SimHash, MinHash) can be reproduced bit-for-bit by an
  * independent oracle via `('0x' || substr(md5(t), 1, 15))::BIGINT`.
  * xxhash64 would be a few ns/token faster but is Spark-only; at
  * 100 TB the hash is a constant factor inside a narrow map stage,
  * while cross-engine verifiability is what lets two engines agree on
  * WHICH documents are duplicates.
  */
object Md5Base {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(utf8 bytes) as a non-negative Long. */
  def hash60(s: UTF8String): Long = {
    val b = s.getBytes
    hash60Bytes(b, 0, b.length)
  }

  /** [[hash60]] over a byte slice — lets window-scanning kernels
    * (CDC boundary detection) hash each window without allocating a
    * substring UTF8String per position. */
  def hash60Bytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var v = 0L
    var i = 0
    // bytes 0..6 (14 hex chars) then the high nibble of byte 7 (15th)
    while (i < 7) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    (v << 4) | ((dig(7) & 0xF0L) >> 4)
  }
}

/** Shared eval kernels for the hash expressions. A top-level object so
  * Scala emits static forwarders — generated whole-stage code calls
  * `graft.functions.HashImpl.simhash60(...)` directly (the same shape
  * as Spark's own hash expressions calling XxHash64Function). */
object HashImpl {

  /** Single-pass 60-bit SimHash: per token one md5-60 hash, each bit
    * votes ±1 weighted by repetition, bit set iff votes > 0. */
  def simhash60(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    var t = 0
    while (t < arr.numElements()) {
      val h = Md5Base.hash60(arr.getUTF8String(t))
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** k permutation-minima in one pass — h_i(x) = (a_i·x + b_i) mod P
    * with x = md5-60(shingle) mod 1e9 (exact Long range, ANSI-safe). */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    import MinHashSig.{FOLD, P}
    val mins = Array.fill(k)(P)
    var t = 0
    while (t < arr.numElements()) {
      val base = Md5Base.hash60(arr.getUTF8String(t)) % FOLD
      var i = 0
      while (i < k) {
        val v = (MinHashSig.aParam(i + 1) * base + MinHashSig.bParam(i + 1)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}

/** Scalar md5-60 — the native form of the composed chain
  * `conv(substring(md5(s), 1, 15), 16, 10)`: digest bytes straight to a
  * Long via [[Md5Base.hash60]], no 32-char hex string, no substring
  * copy, no base-16 reparse. The composed chain allocates and parses
  * those intermediates PER CALL — per shingle in winnow (the round-4
  * bench tail), per (row, replicate) in the Poisson bootstrap, per
  * document in every sampling coin. Bit-equality against the composed
  * form is pinned in FunctionsSpec; the DuckDB oracle bridge
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` is unchanged, so every
  * oracle replays the same 60 bits.
  */
case class Md5Base60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_base60"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("md5_base60 expects a string column")

  override def nullSafeEval(input: Any): Any =
    Md5Base.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Base.hash60($c)")

  override protected def withNewChildInternal(c: Expression): Md5Base60 =
    copy(child = c)
}

/** Single-pass 60-bit SimHash over a token array — see
  * [[HashImpl.simhash60]]. Replaces the higher-order-function fold
  * (`aggregate` + per-token `transform(sequence(...))` + `zip_with`)
  * which allocates two 60-element arrays per TOKEN; this allocates one
  * 60-int vote buffer per ROW, and `doGenCode` keeps it inside the
  * whole-stage span. Bit-identical to the HOF form (FunctionsSpec) and
  * to the DuckDB mirror in SparkEntry.oracleSql("dedup_simhash").
  */
/** Custom table-generating function (the `Generator` extension point —
  * explode's API): emit each n-token shingle of a token array as its
  * OWN OUTPUT ROW, never materializing the shingle array. The HOF form
  * (`transform(sequence(...), i -> concat_ws(slice(...)))` + explode)
  * allocates all shingles per document before the explode multiplies
  * them; for a 1M-token document that array is the task's peak memory.
  * The generator streams them: O(n) width per emitted row, O(1) extra
  * state. Positional (duplicates preserved) — callers add distinct
  * where set semantics are wanted.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("shingle_gen expects array<string>")
  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType)))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val numTok = arr.numElements()
    if (numTok == 0) return Nil
    val sep = UTF8String.fromString(" ")
    def join(from: Int, len: Int): UTF8String = {
      val parts = new Array[UTF8String](2 * len - 1)
      var i = 0
      while (i < len) {
        parts(2 * i) = arr.getUTF8String(from + i)
        if (i < len - 1) parts(2 * i + 1) = sep
        i += 1
      }
      UTF8String.concat(parts: _*)
    }
    // mirror Dedup.shingles: short docs emit the whole-doc shingle
    if (numTok < n)
      return Seq(org.apache.spark.sql.catalyst.InternalRow(join(0, numTok)))
    (0 to numTok - n).iterator.map(i =>
      org.apache.spark.sql.catalyst.InternalRow(join(i, n)))
  }
  override protected def withNewChildInternal(c: Expression): ShingleGenerator =
    copy(child = c)
}

case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    HashImpl.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhash60($c)")

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

/** MinHash signature expression — see [[HashImpl.minhashSig]]. The
  * (a_i, b_i, P) parameters are exposed from the companion so tests
  * and oracles share a single source of truth.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    HashImpl.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpl.minhashSig($c, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  /** Prime modulus of the universal hash family. */
  val P = 1000000007L
  /** Base-hash fold bound: keeps a·x + b inside exact Long range. */
  val FOLD = 1000000000L
  def aParam(i: Int): Long = 2L * i * 104729L + 1L
  def bParam(i: Int): Long = i * 7919L
}

/** Streaming ordered-triple generator over a SORTED DISTINCT string
  * array: one output row (b1, b2, b3) per index triple i<j<k — the
  * combination explode behind rec6_lift3. The nested
  * `transform(sequence…)³ + flatten²` HOF form it replaces ran three
  * interpreted lambda layers and MATERIALIZED the full C(b,3) struct
  * array per basket before exploding it (~1.1k structs for a 20-brand
  * basket); this streams the triples without allocating the array.
  * <3 elements emits nothing — exactly the retired
  * `when(n >= 3, …).otherwise([])` branch. */
case class Combo3Generator(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("combo3_gen expects array<string>")
    }
  override def elementSchema: StructType =
    StructType(Seq(StructField("b1", StringType),
      StructField("b2", StringType), StructField("b3", StringType)))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val n = arr.numElements()
    if (n < 3) return Nil
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var i = 0
      private var j = 1
      private var k = 2
      override def hasNext: Boolean = i <= n - 3
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        val row = org.apache.spark.sql.catalyst.InternalRow(
          arr.getUTF8String(i), arr.getUTF8String(j), arr.getUTF8String(k))
        k += 1
        if (k > n - 1) { j += 1; k = j + 1 }
        if (j > n - 2) { i += 1; j = i + 1; k = j + 1 }
        row
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): Combo3Generator =
    copy(child = c)
}
