package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Eval kernel for [[PiiScan]] — the fused multi-pattern PII scanner
  * behind `TextAnalysis.piiRedact` and the streaming document
  * preprocess.
  *
  * It hand-implements EXACTLY the four Java-regex patterns the
  * stacked `regexp_extract_all`/`regexp_replace` battery used
  * (TextAnalysis.UrlRe/EmailRe/Ipv4Re/PhoneRe), match-for-match:
  * counts are non-overlapping leftmost matches on the ORIGINAL text
  * (one cheap scan per pattern instead of one regex state machine per
  * pattern), and redaction replays the precedence-ordered sequential
  * scrub (URL → email → IP → phone, each scan over the previous
  * output, replacements never rescanned — `Matcher.appendReplacement`
  * semantics). Each scanner resolves its pattern's backtracking
  * deterministically:
  *
  *  - URL `https?://[^\s]+`: after "http", a following 's' commits
  *    (the no-'s' alternative would need ':' == 's' — impossible),
  *    then "://" plus a maximal non-whitespace run of length ≥ 1.
  *  - Email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a
  *    maximal local-class run must be followed by '@' (the '+' can
  *    never shrink past a non-local char, so a failed run's inner
  *    suffixes fail identically and the scan resumes after it); the
  *    domain backtracks to the LARGEST dot followed by ≥ 2 letters,
  *    and the TLD run is greedy — exactly Java's greedy-then-shrink
  *    order.
  *  - IPv4 `\b\d{1,3}(\.\d{1,3}){3}\b` and phone `\b\d{3}-\d{4}\b`:
  *    bounded nested trials in Java's preference order (each {1,3}
  *    longest-first), word boundaries on the scanned string.
  *
  * All four character classes are pure ASCII (`\d`, `\s`, `\b`'s \w
  * are ASCII in Java's default mode), so scanning UTF-16 chars is
  * exact for any input. Bit-equality with the regex battery is pinned
  * in FunctionsSpec over adversarial strings AND the corpus. */
object PiiImpl {

  @inline private def isWs(c: Char): Boolean = // Java \s
    c == ' ' || c == '\t' || c == '\n' || c.toInt == 0x0B || c == '\f' ||
      c == '\r'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isWord(c: Char): Boolean = // Java \w (ASCII)
    isAlpha(c) || isDigit(c) || c == '_'
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** Leftmost URL match at or after `from`; (start, end) packed as a
    * long, or -1. */
  private def urlFind(s: String, from: Int): Long = {
    val n = s.length
    var p = s.indexOf("http", from)
    while (p >= 0) {
      var j = p + 4
      if (j < n && s.charAt(j) == 's') j += 1
      if (j + 3 <= n && s.charAt(j) == ':' && s.charAt(j + 1) == '/' &&
        s.charAt(j + 2) == '/' && j + 3 < n && !isWs(s.charAt(j + 3))) {
        var e = j + 3
        while (e < n && !isWs(s.charAt(e))) e += 1
        return pack(p, e)
      }
      p = s.indexOf("http", p + 1)
    }
    -1L
  }

  /** Leftmost email match at or after `from`. */
  private def emailFind(s: String, from: Int): Long = {
    val n = s.length
    var p = from
    while (p < n) {
      while (p < n && !isLocal(s.charAt(p))) p += 1
      if (p >= n) return -1L
      var runEnd = p
      while (runEnd < n && isLocal(s.charAt(runEnd))) runEnd += 1
      if (runEnd < n && s.charAt(runEnd) == '@') {
        val dStart = runEnd + 1
        var dEnd = dStart
        while (dEnd < n && isDomain(s.charAt(dEnd))) dEnd += 1
        // largest dot with >= 2 letters after it (greedy A+ backtrack);
        // the part before the dot must be non-empty (A+ >= 1 char)
        var j = dEnd - 3
        while (j > dStart &&
          !(s.charAt(j) == '.' && isAlpha(s.charAt(j + 1)) &&
            isAlpha(s.charAt(j + 2)))) j -= 1
        if (j > dStart && s.charAt(j) == '.' && isAlpha(s.charAt(j + 1)) &&
          isAlpha(s.charAt(j + 2))) {
          var e = j + 3
          while (e < n && isAlpha(s.charAt(e))) e += 1 // greedy TLD
          return pack(p, e)
        }
      }
      // every start inside the failed run fails identically
      p = runEnd + 1
    }
    -1L
  }

  /** Leftmost IPv4 match at or after `from` (Java preference order:
    * each \d{1,3} longest-first, \b on both ends). */
  private def ipv4Find(s: String, from: Int): Long = {
    val n = s.length
    var p = from
    while (p < n) {
      if (isDigit(s.charAt(p)) && (p == 0 || !isWord(s.charAt(p - 1)))) {
        var g1 = 3
        while (g1 >= 1) {
          val e1 = ipGroups(s, p, g1)
          if (e1 >= 0) return pack(p, e1)
          g1 -= 1
        }
      }
      p += 1
    }
    -1L
  }

  /** Try IPv4 with first group length `g1` at `p`; returns end or -1. */
  private def ipGroups(s: String, p: Int, g1: Int): Int = {
    val n = s.length
    if (!digits(s, p, g1) || p + g1 >= n || s.charAt(p + g1) != '.') return -1
    var b2 = p + g1 + 1
    var g2 = 3
    while (g2 >= 1) {
      if (digits(s, b2, g2) && b2 + g2 < n && s.charAt(b2 + g2) == '.') {
        var b3 = b2 + g2 + 1
        var g3 = 3
        while (g3 >= 1) {
          if (digits(s, b3, g3) && b3 + g3 < n && s.charAt(b3 + g3) == '.') {
            var b4 = b3 + g3 + 1
            var g4 = 3
            while (g4 >= 1) {
              val e = b4 + g4
              if (digits(s, b4, g4) && (e == n || !isWord(s.charAt(e))))
                return e
              g4 -= 1
            }
          }
          g3 -= 1
        }
      }
      g2 -= 1
    }
    -1
  }

  @inline private def digits(s: String, at: Int, len: Int): Boolean = {
    if (at + len > s.length) return false
    var i = at
    while (i < at + len) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    true
  }

  /** Leftmost phone match (`\b\d{3}-\d{4}\b`) at or after `from`. */
  private def phoneFind(s: String, from: Int): Long = {
    val n = s.length
    var p = from
    while (p + 8 <= n) {
      if ((p == 0 || !isWord(s.charAt(p - 1))) && digits(s, p, 3) &&
        s.charAt(p + 3) == '-' && digits(s, p + 4, 4) &&
        (p + 8 == n || !isWord(s.charAt(p + 8))))
        return pack(p, p + 8)
      p += 1
    }
    -1L
  }

  @inline private def pack(a: Int, b: Int): Long = (a.toLong << 32) | b

  private type Finder = (String, Int) => Long

  private def countMatches(s: String, f: Finder): Long = {
    var c = 0L
    var from = 0
    var m = f(s, from)
    while (m >= 0) {
      c += 1
      from = m.toInt
      m = f(s, from)
    }
    c
  }

  private def replaceMatches(s: String, f: Finder, repl: String): String = {
    var m = f(s, 0)
    if (m < 0) return s // common case: no allocation at all
    val sb = new java.lang.StringBuilder(s.length)
    var from = 0
    while (m >= 0) {
      val st = (m >>> 32).toInt
      val e = m.toInt
      sb.append(s, from, st).append(repl)
      from = e
      m = f(s, from)
    }
    sb.append(s, from, s.length)
    sb.toString
  }

  /** One call = the whole PII battery: counts on the original text,
    * sequential precedence-ordered redaction. */
  def scan(text: UTF8String): InternalRow = {
    val s0 = text.toString
    val nUrl = countMatches(s0, urlFind)
    val nEmail = countMatches(s0, emailFind)
    val nIp = countMatches(s0, ipv4Find)
    val nPhone = countMatches(s0, phoneFind)
    val s1 = replaceMatches(s0, urlFind, "<URL>")
    val s2 = replaceMatches(s1, emailFind, "<EMAIL>")
    val s3 = replaceMatches(s2, ipv4Find, "<IP>")
    val s4 = replaceMatches(s3, phoneFind, "<PHONE>")
    new GenericInternalRow(Array[Any](nUrl, nEmail, nIp, nPhone,
      UTF8String.fromString(s4)))
  }
}

/** `pii_scan(text)` → struct(n_urls, n_emails, n_ips, n_phones,
  * redacted) — the fused native scanner behind TextAnalysis.piiRedact
  * and EventStreams.preprocessStream; see [[PiiImpl.scan]]. */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiScan.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_scan"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("pii_scan expects string")
    }

  override def nullSafeEval(input: Any): Any =
    PiiImpl.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiImpl.scan($c)")

  override protected def withNewChildInternal(c: Expression): PiiScan =
    copy(child = c)
}

object PiiScan {
  val schema: StructType = StructType(Seq(
    StructField("n_urls", LongType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
}

/** Eval kernel for [[GopherScan]] — the integer sufficient statistics
  * of the Gopher quality battery in one pass, replacing a stack of
  * interpreted HOFs (Spark's higher-order `aggregate`/`filter` lambdas
  * run INTERPRETED per element even inside a codegen'd projection) and
  * five `split`-by-stopword array allocations per row.
  *
  * Deliberately emits ONLY exact integers (token count, summed token
  * codepoint lengths, tokens containing an ASCII letter, stopword
  * occurrences) — every float division and HALF_UP rounding stays in
  * the SAME Catalyst expressions the HOF forms used, so bit-equality
  * of the derived signals is structural, not re-proved rounding
  * semantics.
  *
  * Exact-twin notes: tokens are maximal runs of non-`\s` chars (the
  * `split("\\s+")` + drop-empties shape); token length is the CODEPOINT
  * count (Spark `length()` = UTF8String.numChars), not UTF-16 units;
  * `n_stop` counts LEFT-TO-RIGHT NON-OVERLAPPING occurrences of the
  * literal ` w ` patterns — exactly `size(split(text, " w ")) - 1`
  * (Spark's split keeps trailing empty strings, so the identity holds
  * at string edges too). */
object GopherImpl {

  private val Stops = Array(" the ", " a ", " of ", " in ", " to ")

  @inline private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c.toInt == 0x0B || c == '\f' ||
      c == '\r'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  def scan(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var nWords = 0L
    var sumLen = 0L
    var nAlpha = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var hasAlpha = false
        while (i < n && !isWs(s.charAt(i))) {
          if (isAlpha(s.charAt(i))) hasAlpha = true
          i += 1
        }
        nWords += 1
        sumLen += s.codePointCount(start, i)
        if (hasAlpha) nAlpha += 1
      }
    }
    var nStop = 0L
    var k = 0
    while (k < Stops.length) {
      val w = Stops(k)
      var from = s.indexOf(w)
      while (from >= 0) {
        nStop += 1
        from = s.indexOf(w, from + w.length)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](nWords, sumLen, nAlpha, nStop))
  }
}

/** `gopher_scan(text)` → struct(n_words, sum_len, n_alpha, n_stop) —
  * the native integer-stats kernel behind TextAnalysis.gopherKeep /
  * gopherFilter; see [[GopherImpl.scan]]. */
case class GopherScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherScan.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_scan"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("gopher_scan expects string")
    }

  override def nullSafeEval(input: Any): Any =
    GopherImpl.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherImpl.scan($c)")

  override protected def withNewChildInternal(c: Expression): GopherScan =
    copy(child = c)
}

object GopherScan {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
}

/** Eval kernel for [[LetterCounts]]. */
object LetterCountsImpl {
  /** The 26-letter histogram of the LOWERCASED text — bit-equal to the
    * 26-term `length(lower(text)) − length(regexp_replace(lower(text),
    * c, ""))` battery it replaces (each removed char is exactly one
    * char of the lowercased string, so the length delta IS the
    * codepoint count), but one O(bytes) pass instead of 26 regex
    * passes + 52 `lower()` evaluations per row. ASCII a–z bytes in
    * UTF-8 are always standalone lead bytes, so counting raw bytes of
    * the lowercased string is exact for any input. */
  def counts(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val out = new Array[Long](26)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a'.toByte && b <= 'z'.toByte) out(b - 'a'.toByte) += 1L
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `letter_counts(text)` → array<bigint>(26) — the native letter
  * histogram behind TextAnalysis.charEntropy; see
  * [[LetterCountsImpl.counts]]. */
case class LetterCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "letter_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("letter_counts expects string")
    }

  override def nullSafeEval(input: Any): Any =
    LetterCountsImpl.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LetterCountsImpl.counts($c)")

  override protected def withNewChildInternal(c: Expression): LetterCounts =
    copy(child = c)
}
