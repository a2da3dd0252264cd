package graft.osm

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Splittable OSM XML ingest.
  *
  * Spark's built-in xml source is not splittable — a planet-scale
  * document parses as ONE task. But OSM dumps are line-oriented (one
  * element-open/close/child per line — the same property the A1
  * text-scan census relies on, OsmEngine.auditTags), so split points
  * can be found without parsing: the driver probes the file at
  * `targetSplitBytes` strides and advances each probe to the next
  * top-level element start (`<node|way|relation` at up-to-2-space
  * indent). Probing reads O(#splits × probe window) bytes — metadata
  * scale, like PbfSource's blob index — and each (start, end) range
  * then parses independently in its own task.
  *
  * The per-range parser is a line decoder (attribute regex + XML
  * entity unescape) that emits the exact all-string schema of the
  * built-in source, asserted row-identical in OsmXmlSplitSpec, so
  * shape/audits/queries run unchanged downstream.
  *
  * UNCOMPRESSED INPUT ONLY: byte-offset probing cannot seek inside a
  * compressed stream, so `.osm.bz2`/`.osm.zip` must go through
  * `OsmEngine.read` (single-stream bz2 codec / one-time zip unpack —
  * see OsmEngine.unpackIfArchive) or be decompressed first; at scale
  * the PBF source is the compressed-AND-splittable path.
  */
object OsmXmlSplit {

  private val ElementStart: Regex =
    """^\s{0,2}<(node|way|relation)[\s/>]""".r
  private val Attr: Regex = """([\w:]+)="([^"]*)"""".r
  private val NumRef: Regex = """&#(\d+);""".r

  private[osm] def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else {
      val t = s.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&apos;", "'")
      val u = NumRef.replaceAllIn(t,
        m => Regex.quoteReplacement(m.group(1).toInt.toChar.toString))
      u.replace("&amp;", "&") // last, so &amp;lt; decodes to the literal &lt;
    }

  /** Advance from `offset` to the start of the next top-level element
    * line; returns file length if none found in the probe window. */
  private def nextElementStart(raf: RandomAccessFile, offset: Long,
                               window: Int = 1 << 20): Long = {
    val fileLen = raf.length()
    if (offset >= fileLen) return fileLen
    raf.seek(offset)
    val buf = new Array[Byte](math.min(window.toLong, fileLen - offset).toInt)
    raf.readFully(buf)
    val text = new String(buf, StandardCharsets.UTF_8)
    var from = 0
    while (from < text.length) {
      val nl = text.indexOf('\n', from)
      if (nl < 0) return fileLen
      val lineStart = nl + 1
      val lineEnd0 = text.indexOf('\n', lineStart)
      val lineEnd = if (lineEnd0 < 0) text.length else lineEnd0
      if (ElementStart.findFirstIn(text.substring(lineStart, lineEnd)).isDefined)
        // byte offset of the line start (ASCII-safe: OSM markup bytes
        // before the match are single-byte; attr VALUES may be UTF-8
        // but we only land on line boundaries)
        return offset + text.substring(0, lineStart)
          .getBytes(StandardCharsets.UTF_8).length
      from = lineEnd
    }
    fileLen
  }

  /** Driver-side split index: (start, end) byte ranges, each beginning
    * at a top-level element line. */
  def splitRanges(path: String,
                  targetSplitBytes: Long = 16L << 20): Seq[(Long, Long)] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      val starts = Seq.newBuilder[Long]
      var probe = 0L
      var last = -1L
      while (probe < len) {
        val s = nextElementStart(raf, probe)
        if (s < len && s != last) { starts += s; last = s }
        probe = math.max(s, probe + targetSplitBytes)
      }
      val ss = starts.result()
      ss.zip(ss.drop(1) :+ len)
    } finally raf.close()
  }

  /** Nodes ∪ ways in the XML `elements` schema, parsed range-parallel.
    * Relations are skipped (the reference processes only nodes/ways). */
  def elements(spark: SparkSession, path: String,
               targetSplitBytes: Long = 16L << 20): DataFrame = {
    val ranges = splitRanges(path, targetSplitBytes)
    val par = math.max(1, math.min(ranges.size,
      spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(ranges, par).mapPartitions {
      it =>
        it.flatMap { case (start, end) =>
          val raf = new RandomAccessFile(path, "r")
          try {
            raf.seek(start)
            val buf = new Array[Byte]((end - start).toInt)
            raf.readFully(buf)
            parseLines(new String(buf, StandardCharsets.UTF_8))
          } finally raf.close()
        }
    }
    spark.createDataFrame(rdd, graft.osm.pbf.PbfSource.elementSchema)
  }

  private val attrOrder = Seq("id", "visible", "version", "changeset",
    "timestamp", "user", "uid", "lat", "lon")

  private[osm] def parseLines(text: String): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    val lines = text.linesIterator
    while (lines.hasNext) {
      val line = lines.next()
      ElementStart.findFirstMatchIn(line) match {
        case Some(m) if m.group(1) != "relation" =>
          val tpe = m.group(1)
          val attrs = Attr.findAllMatchIn(line)
            .map(a => a.group(1) -> unescape(a.group(2))).toMap
          val tags = Seq.newBuilder[Row]
          val nds = Seq.newBuilder[Row]
          if (!line.trim.endsWith("/>")) {
            var done = false
            while (!done && lines.hasNext) {
              val child = lines.next()
              val t = child.trim
              if (t.startsWith(s"</$tpe>")) done = true
              else if (t.startsWith("<tag")) {
                val ca = Attr.findAllMatchIn(t)
                  .map(a => a.group(1) -> unescape(a.group(2))).toMap
                tags += Row(ca.getOrElse("k", null), ca.getOrElse("v", null))
              } else if (t.startsWith("<nd")) {
                val ca = Attr.findAllMatchIn(t)
                  .map(a => a.group(1) -> unescape(a.group(2))).toMap
                nds += Row(ca.getOrElse("ref", null))
              }
            }
          }
          val a = attrOrder.map(attrs.get(_).orNull)
          val tagSeq = tags.result()
          val ndSeq = nds.result()
          out += Row(a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7), a(8),
            if (tagSeq.isEmpty) null else tagSeq, tpe,
            if (ndSeq.isEmpty) null else ndSeq)
        case Some(_) => // relation: skip its children
          if (!line.trim.endsWith("/>")) {
            var done = false
            while (!done && lines.hasNext)
              if (lines.next().contains("</relation>")) done = true
          }
        case None => // prolog / <osm> / </osm> / stray child — skip
      }
    }
    out.result()
  }

  /** `<relation>` elements in [[graft.osm.pbf.PbfSource.relationSchema]],
    * parsed range-parallel — the XML-path feeder of
    * [[OsmEngine.relationMembers]] (r15; the PBF path decodes relations
    * natively, and with this the plain-XML default ingest serves the
    * full element model too). Same split index, same line decoder, same
    * all-string discipline; node/way elements are skipped here exactly
    * as [[elements]] skips relations, so one file scan per element
    * family — at planet scale each is its own range-parallel job over
    * the same byte ranges. */
  def relations(spark: SparkSession, path: String,
                targetSplitBytes: Long = 16L << 20): DataFrame = {
    val ranges = splitRanges(path, targetSplitBytes)
    val par = math.max(1, math.min(ranges.size,
      spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(ranges, par).mapPartitions {
      it =>
        it.flatMap { case (start, end) =>
          val raf = new RandomAccessFile(path, "r")
          try {
            raf.seek(start)
            val buf = new Array[Byte]((end - start).toInt)
            raf.readFully(buf)
            parseRelationLines(new String(buf, StandardCharsets.UTF_8))
          } finally raf.close()
        }
    }
    spark.createDataFrame(rdd, graft.osm.pbf.PbfSource.relationSchema)
  }

  private val relAttrOrder = Seq("id", "visible", "version", "changeset",
    "timestamp", "user", "uid")

  private[osm] def parseRelationLines(text: String): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    val lines = text.linesIterator
    while (lines.hasNext) {
      val line = lines.next()
      ElementStart.findFirstMatchIn(line) match {
        case Some(m) if m.group(1) == "relation" =>
          val attrs = Attr.findAllMatchIn(line)
            .map(a => a.group(1) -> unescape(a.group(2))).toMap
          val tags = Seq.newBuilder[Row]
          val members = Seq.newBuilder[Row]
          if (!line.trim.endsWith("/>")) {
            var done = false
            while (!done && lines.hasNext) {
              val t = lines.next().trim
              if (t.startsWith("</relation>")) done = true
              else if (t.startsWith("<member")) {
                val ca = Attr.findAllMatchIn(t)
                  .map(a => a.group(1) -> unescape(a.group(2))).toMap
                members += Row(ca.getOrElse("type", null),
                  ca.getOrElse("ref", null), ca.getOrElse("role", null))
              } else if (t.startsWith("<tag")) {
                val ca = Attr.findAllMatchIn(t)
                  .map(a => a.group(1) -> unescape(a.group(2))).toMap
                tags += Row(ca.getOrElse("k", null), ca.getOrElse("v", null))
              }
            }
          }
          val a = relAttrOrder.map(attrs.get(_).orNull)
          val tagSeq = tags.result()
          val memberSeq = members.result()
          out += Row(a(0), a(1), a(2), a(3), a(4), a(5), a(6),
            if (tagSeq.isEmpty) null else tagSeq,
            if (memberSeq.isEmpty) null else memberSeq)
        case Some(other) => // node/way: skip its children here
          val tpe = other.group(1)
          if (!line.trim.endsWith("/>")) {
            var done = false
            while (!done && lines.hasNext)
              if (lines.next().contains(s"</$tpe>")) done = true
          }
        case None => // prolog / <osm> / </osm> / stray child — skip
      }
    }
    out.result()
  }
}
