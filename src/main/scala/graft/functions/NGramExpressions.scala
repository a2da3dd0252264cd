package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval kernels for the n-gram expressions — top-level object so
  * whole-stage codegen calls the static forwarders directly.
  */
object NGramImpl {

  private val SEP = UTF8String.fromString(" ")

  private def join(arr: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * len - 1)
    var i = 0
    while (i < len) {
      parts(2 * i) = arr.getUTF8String(from + i)
      if (i < len - 1) parts(2 * i + 1) = SEP
      i += 1
    }
    UTF8String.concat(parts: _*)
  }

  /** All positional n-token grams of a token array, space-joined.
    * `wholeShort=true` mirrors the repo's shingle convention (a doc
    * shorter than n emits its whole-doc gram); `false` emits an empty
    * array for short docs (the novelty convention). One O(tokens) pass
    * per CALL — the property the higher-order-function form loses when
    * Catalyst inlines the tokenizer into `element_at`/`slice` lambdas
    * (each element then re-runs split+filter over the raw text, turning
    * the pass O(tokens²); measured 11.6s → 1.5s on the sf0.1 documents
    * table for the 3-gram explode).
    */
  def tokenNgrams(arr: ArrayData, n: Int, wholeShort: Boolean): ArrayData = {
    val numTok = arr.numElements()
    if (numTok < n) {
      if (!wholeShort)
        return new GenericArrayData(Array.empty[Any])
      // mirror `otherwise(array(concat_ws(" ", tk)))`: an empty token
      // array still emits one empty-string gram
      if (numTok == 0)
        return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
      return new GenericArrayData(Array[Any](join(arr, 0, numTok)))
    }
    val out = new Array[Any](numTok - n + 1)
    var i = 0
    while (i <= numTok - n) { out(i) = join(arr, i, n); i += 1 }
    new GenericArrayData(out)
  }

  /** Sliding-window minima over a long array: element i is
    * min(arr[i..i+w)). Monotonic-deque, O(n) total — the winnowing
    * fingerprint selection without the per-window `array_min(slice(…))`
    * rescan (O(n·w), or O(n²) once the hash transform is inlined).
    */
  def rollingMin(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      // getLong on a null slot silently yields 0 — a nullable input
      // would corrupt window minima with no error, so fail fast here
      // (call sites guarantee non-null only by convention)
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"rolling_min: null element at index $i")
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native n-gram constructor — the codegen-safe form of
  * `transform(sequence(1, size(tk)-n+1), i -> concat_ws(' ',
  * slice(tk, i, n)))`. Bit-identical output (FunctionsSpec pins the
  * equivalence) but evaluates its child exactly once per call, so the
  * `size(…) > 0` filters that InferFiltersFromGenerate pushes below
  * explode stay linear instead of re-running an inlined tokenizer per
  * element. Reference n-gram audit shape: openstreet_kolkata.py:539-562
  * shapes per-element token work the same way (one pass per element).
  */
case class TokenNGrams(child: Expression, n: Int, wholeShort: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("token_ngrams expects array<string>")
    }

  override def nullSafeEval(input: Any): Any =
    NGramImpl.tokenNgrams(input.asInstanceOf[ArrayData], n, wholeShort)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramImpl.tokenNgrams($c, $n, $wholeShort)")

  override protected def withNewChildInternal(c: Expression): TokenNGrams =
    copy(child = c)
}

/** Native sliding-window minimum over array<long> — see
  * [[NGramImpl.rollingMin]]. */
case class RollingMin(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_min"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull may be true on transform() output even when the
      // lambda can't produce nulls — accept it; eval rejects an actual
      // null ELEMENT at runtime (fail-fast in rollingMin) rather than
      // reading it as 0
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("rolling_min expects array<bigint>")
    }

  override def nullSafeEval(input: Any): Any =
    NGramImpl.rollingMin(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramImpl.rollingMin($c, $w)")

  override protected def withNewChildInternal(c: Expression): RollingMin =
    copy(child = c)
}

/** The unigram-LM piece vocabulary and scores — single source of truth
  * shared by the [[UnigramSegment]] kernel, the operators
  * (Training.tok10/tok11), the specs and the DuckDB oracle builders.
  * Log-probabilities are integer micros (ln p · 1e6, negative); the
  * spread makes longer pieces win when present while keeping genuine
  * Viterbi-vs-greedy divergences (see Training.tok11Unigram).
  */
object UnigramVocab {
  val tri: Seq[String] = Seq("the", "and", "ing", "ion", "tio",
    "ent", "ati", "for", "her", "ter", "hat", "tha", "ere", "ate",
    "his", "con", "res", "ver", "all")
  val bi: Seq[String] = Seq("th", "he", "in", "er", "an", "re",
    "on", "at", "en", "nd", "ti", "es", "or", "te", "of", "ed",
    "is", "it", "al", "ar", "st", "to", "nt", "ng", "se", "ha",
    "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be",
    "ma", "si", "om", "ur")
  val charMicros: Long = -3000000L
  val biMicros: Long = -4500000L
  val triMicros: Long = -5500000L

  private[functions] val biSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); bi.foreach(s.add); s
  }
  private[functions] val triSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); tri.foreach(s.add); s
  }
}

/** Eval kernel for [[UnigramSegment]] — top-level object so whole-stage
  * codegen calls the static forwarder directly. */
object UnigramImpl {
  /** Viterbi max-sum segmentation of one word under [[UnigramVocab]]:
    * dp(p) = best (score, pieceLen) ending at position p, candidates
    * are the char / vocab-bigram / vocab-trigram endings, ties prefer
    * the LONGER piece. Returns the space-joined pieces; the word score
    * reconstructs exactly from piece lengths (len-k pieces carry the
    * k-gram score by construction). One O(len) pass with two scalar
    * arrays — the higher-order-function fold this replaces allocated
    * an array-of-structs accumulator per position (measured 27.9 s →
    * sub-second for the sf0.1 distinct-word frame). */
  def segment(word: UTF8String): UTF8String = {
    val s = word.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    val sc = new Array[Long](n + 1)
    val pl = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestSc = sc(i - 1) + UnigramVocab.charMicros
      var bestPl = 1
      if (i >= 2 && UnigramVocab.biSet.contains(s.substring(i - 2, i))) {
        val c = sc(i - 2) + UnigramVocab.biMicros
        if (c > bestSc || (c == bestSc && 2 > bestPl)) {
          bestSc = c; bestPl = 2
        }
      }
      if (i >= 3 && UnigramVocab.triSet.contains(s.substring(i - 3, i))) {
        val c = sc(i - 3) + UnigramVocab.triMicros
        if (c > bestSc || (c == bestSc && 3 > bestPl)) {
          bestSc = c; bestPl = 3
        }
      }
      sc(i) = bestSc
      pl(i) = bestPl
      i += 1
    }
    var pos = n
    var pieces = List.empty[String]
    while (pos > 0) {
      pieces ::= s.substring(pos - pl(pos), pos)
      pos -= pl(pos)
    }
    UTF8String.fromString(pieces.mkString(" "))
  }
}

/** `unigram_segment(word)` — the native Viterbi kernel behind
  * Training.tok11Unigram; see [[UnigramImpl.segment]]. */
case class UnigramSegment(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("unigram_segment expects string")
    }

  override def nullSafeEval(input: Any): Any =
    UnigramImpl.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramImpl.segment($c)")

  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
}

/** Eval kernel for [[WordPieceSegment]] — top-level object so
  * whole-stage codegen calls the static forwarder directly. */
object WordPieceImpl {
  /** Greedy longest-match WordPiece segmentation of one word under
    * [[UnigramVocab]]: at each unconsumed position try the 3-gram,
    * then the 2-gram, else emit the single char — the BERT serving
    * algorithm, bit-equal to the higher-order `aggregate` fold it
    * replaces (the fold allocated a (long, string) struct accumulator
    * and re-concatenated the token string at EVERY position; this is
    * one O(len) pass with a single StringBuilder — tok11's
    * [[UnigramImpl.segment]] template applied to tok10). */
  def segment(word: UTF8String): UTF8String = {
    val s = word.toString
    val n = s.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(2 * n)
    var i = 0
    while (i < n) {
      val take =
        if (n - i >= 3 && UnigramVocab.triSet.contains(s.substring(i, i + 3))) 3
        else if (n - i >= 2 && UnigramVocab.biSet.contains(s.substring(i, i + 2))) 2
        else 1
      if (sb.length > 0) sb.append(' ')
      sb.append(s, i, i + take)
      i += take
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `wordpiece_segment(word)` — the native greedy kernel behind
  * Training.tok10WordPiece; see [[WordPieceImpl.segment]]. */
case class WordPieceSegment(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_segment"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("wordpiece_segment expects string")
    }

  override def nullSafeEval(input: Any): Any =
    WordPieceImpl.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordPieceImpl.segment($c)")

  override protected def withNewChildInternal(c: Expression): WordPieceSegment =
    copy(child = c)
}

/** Eval kernel for [[CdcBoundaries]]. */
object CdcImpl {
  /** Content-defined-chunking boundary positions of one document: every
    * 1-based character position e in [8, numChars] where the md5-60
    * hash of the trailing 8-char window (chars e-8..e-1, 0-based) is
    * ≡ 0 (mod `mod`) — bit-equal to the HOF form
    * `filter(sequence(8, n), i -> pmod(hash60(substr(i-7, 8)), mod) = 0)`
    * it replaces. The HOF allocated a substring UTF8String and ran an
    * interpreted lambda per POSITION; this walks the char offsets once
    * and hashes each window's byte slice in place. md5 itself is not a
    * rolling hash, so the per-window digest remains (the portability
    * price the scaladoc on Packing.cdcChunksOf documents); a
    * production gear-hash drops into this same kernel. */
  def boundaries(text: UTF8String, mod: Int): ArrayData = {
    val bytes = text.getBytes
    val n = text.numChars()
    if (n < 8) return new GenericArrayData(Array.empty[Any])
    // char start byte-offsets (offs(c) = byte index of char c)
    val offs = new Array[Int](n + 1)
    var bi = 0
    var c = 0
    while (c < n) {
      offs(c) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      c += 1
    }
    offs(n) = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var e = 8
    while (e <= n) {
      val h = Md5Base.hash60Bytes(bytes, offs(e - 8), offs(e) - offs(e - 8))
      if (h % mod == 0L) out += e
      e += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_boundaries(text, mod)` — the native rolling-window boundary
  * scan behind Packing.cdcChunksOf; see [[CdcImpl.boundaries]]. */
case class CdcBoundaries(child: Expression, mod: Int)
    extends UnaryExpression {
  require(mod >= 1, "cdc modulus must be >= 1")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("cdc_boundaries expects string")
    }

  override def nullSafeEval(input: Any): Any =
    CdcImpl.boundaries(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcImpl.boundaries($c, $mod)")

  override protected def withNewChildInternal(c: Expression): CdcBoundaries =
    copy(child = c)
}

/** Eval kernel for [[FrameEnergies]]. */
object FrameEnergyImpl {
  /** Per-frame PCM energy of a payload string: frame f (of `flen`
    * chars) has energy Σ |codepoint − 32| over its chars; emits
    * floor(numChars / flen) frames (trailing partial frame dropped,
    * empty array when the payload is shorter than one frame) —
    * bit-equal to the nested `transform(sequence)/aggregate` HOF fold
    * it replaces, which allocated a 64-element array and ran two
    * interpreted lambdas per FRAME. One fused O(chars) pass per row.
    *
    * ASCII-ONLY parity caveat: the HOF twin uses `ascii()`, which
    * returns the FIRST UTF-8 BYTE of a multi-byte char, while this
    * kernel uses the codepoint — they agree on every ASCII char
    * (payloads here are base64-ish ASCII by construction,
    * Multimodal.mm9Silence) and diverge on any non-ASCII payload. A
    * non-ASCII corpus must either re-pin parity against a
    * first-byte twin or switch the kernel to hash the first byte. */
  def energies(px: UTF8String, flen: Int): ArrayData = {
    val s = px.toString
    val nChars = s.codePointCount(0, s.length)
    val nf = nChars / flen
    if (nf == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nf)
    var ci = 0
    var f = 0
    while (f < nf) {
      var e = 0L
      var j = 0
      while (j < flen) {
        val cp = s.codePointAt(ci)
        e += math.abs(cp - 32L)
        ci += Character.charCount(cp)
        j += 1
      }
      out(f) = e
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** `frame_energies(payload, flen)` — the native audio-frame energy
  * fold behind Multimodal.mm9Silence; see [[FrameEnergyImpl.energies]]. */
case class FrameEnergies(child: Expression, flen: Int)
    extends UnaryExpression {
  require(flen >= 1, "frame length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "frame_energies"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("frame_energies expects string")
    }

  override def nullSafeEval(input: Any): Any =
    FrameEnergyImpl.energies(input.asInstanceOf[UTF8String], flen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FrameEnergyImpl.energies($c, $flen)")

  override protected def withNewChildInternal(c: Expression): FrameEnergies =
    copy(child = c)
}

/** Eval kernel for [[HilbertKey]]. */
object HilbertImpl {
  /** The classic iterative Hilbert xy→d recurrence (reflection +
    * swap per bit, 16-bit grid): the inherently SEQUENTIAL per-bit
    * state made a 33-projection Spark chain of it (4.2 s warm over the
    * sf0.1 lineitem scan); one fused loop per row keeps it inside
    * whole-stage codegen like the other vector kernels. */
  def key(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var i = 15
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }
}

/** `hilbert_key(x, y)` — the native Hilbert-curve key behind
  * Packing.hilbertBlocks; see [[HilbertImpl.key]]. */
case class HilbertKey(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("hilbert_key expects two bigint arguments")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertImpl.key(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.HilbertImpl.key($x, $y)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertKey = copy(left = l, right = r)
}
