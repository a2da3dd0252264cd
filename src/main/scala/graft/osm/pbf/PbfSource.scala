package graft.osm.pbf

import java.io.RandomAccessFile
import java.math.BigDecimal
import java.time.Instant
import java.util.zip.Inflater

import graft.osm.OsmEngine
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** OSM PBF read path — the reference's north-star input alongside XML.
  *
  * Scale design: PBF is a sequence of independently-decompressible blobs
  * (`[len][BlobHeader][Blob]`). The driver does a METADATA-ONLY scan of
  * that framing — read the 4-byte length + tiny BlobHeader, then SEEK
  * past the data — so indexing a planet-scale file costs O(#blobs) small
  * reads and touches no payload bytes. The resulting (offset, length)
  * work list then parallelizes exactly like parquet row groups: each
  * task seeks into its range, inflates one blob, decodes it. A bigger
  * file is a longer work list; the code does not change.
  *
  * The varint/zigzag/delta decode is genuinely imperative per-partition
  * logic — the documented last-resort case for dropping below the
  * DataFrame API. It emits rows in the SAME all-string schema as the
  * XML source, so shape/audits/queries run unchanged downstream.
  *
  * Decoded: DenseNodes, plain Nodes, Ways, with (Dense)Info metadata.
  * Relations are skipped — the reference pipeline processes only nodes
  * and ways (openstreet_kolkata.py:466).
  */
object PbfSource {

  final case class BlobRange(offset: Long, length: Int, blobType: String)

  val elementSchema: StructType = StructType(
    OsmEngine.nodeSchema.fields ++ Seq(
      StructField("type", StringType),
      StructField("nd", OsmEngine.ndType)))

  /** `<member type=… ref=… role=…>` children of a relation. */
  val memberType: ArrayType = ArrayType(StructType(Seq(
    StructField("_type", StringType), StructField("_ref", StringType),
    StructField("_role", StringType))))

  val relationSchema: StructType = StructType(Seq(
    "_id", "_visible", "_version", "_changeset", "_timestamp", "_user",
    "_uid").map(StructField(_, StringType)) ++ Seq(
    StructField("tag", OsmEngine.tagType),
    StructField("member", memberType)))

  /** Metadata-only framing scan: (offset, length, type) per blob. */
  def blobIndex(path: String): Seq[BlobRange] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val out = Seq.newBuilder[BlobRange]
      val fileLen = raf.length()
      var off = 0L
      while (off < fileLen) {
        raf.seek(off)
        val hdrLen = raf.readInt()
        val hdrBytes = new Array[Byte](hdrLen)
        raf.readFully(hdrBytes)
        val r = new ProtoReader(hdrBytes, 0, hdrLen)
        var tpe = ""
        var dataSize = 0
        while (r.hasMore) r.readKey() match {
          case (1, 2) => tpe = r.readBytesStr()
          case (3, 0) => dataSize = r.readVarint().toInt
          case (_, w) => r.skip(w)
        }
        val dataOff = off + 4 + hdrLen
        out += BlobRange(dataOff, dataSize, tpe)
        off = dataOff + dataSize
      }
      out.result()
    } finally raf.close()
  }

  /** Seek + inflate + decode one blob range — the per-task unit shared
    * by the RDD path below and the DataSource V2 reader
    * ([[graft.sources.PbfDataSource]]). */
  def decodeRange(path: String, offset: Long, length: Int): Seq[Row] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      raf.seek(offset)
      val bytes = new Array[Byte](length)
      raf.readFully(bytes)
      decodeBlock(inflate(bytes))
    } finally raf.close()
  }

  /** All nodes+ways as one DataFrame in the XML `elements` schema. */
  def elements(spark: SparkSession, path: String): DataFrame = {
    val ranges = blobIndex(path).filter(_.blobType == "OSMData")
    val par = math.max(1, math.min(ranges.size,
      spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(ranges, par).mapPartitions { it =>
      it.flatMap(br => decodeRange(path, br.offset, br.length))
    }
    spark.createDataFrame(rdd, elementSchema)
  }

  /** Relations as their own DataFrame (the shape pipeline skips them —
    * openstreet_kolkata.py:466 processes only nodes/ways — but the
    * format reader is complete). Same range-parallel execution. */
  def relations(spark: SparkSession, path: String): DataFrame = {
    val ranges = blobIndex(path).filter(_.blobType == "OSMData")
    val par = math.max(1, math.min(ranges.size,
      spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(ranges, par).mapPartitions { it =>
      it.flatMap { br =>
        val raf = new RandomAccessFile(path, "r")
        try {
          raf.seek(br.offset)
          val bytes = new Array[Byte](br.length)
          raf.readFully(bytes)
          decodeRelations(inflate(bytes))
        } finally raf.close()
      }
    }
    spark.createDataFrame(rdd, relationSchema)
  }

  // ---- Blob ----------------------------------------------------------

  private[pbf] def inflate(blob: Array[Byte]): Array[Byte] = {
    val r = new ProtoReader(blob, 0, blob.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (r.hasMore) r.readKey() match {
      case (1, 2) => raw = r.readByteSlice()
      case (2, 0) => rawSize = r.readVarint().toInt
      case (3, 2) => zlib = r.readByteSlice()
      case (_, w) => r.skip(w)
    }
    if (raw != null) raw
    else {
      require(zlib != null && rawSize >= 0, "blob has neither raw nor zlib data")
      val inf = new Inflater()
      inf.setInput(zlib)
      val out = new Array[Byte](rawSize)
      var n = 0
      while (n < rawSize) {
        val k = inf.inflate(out, n, rawSize - n)
        require(k > 0, "truncated zlib stream")
        n += k
      }
      inf.end()
      out
    }
  }

  // ---- PrimitiveBlock ------------------------------------------------

  private final case class BlockCtx(strings: Array[String], granularity: Long,
                                    latOffset: Long, lonOffset: Long,
                                    dateGranularity: Long)

  private[pbf] def decodeBlock(block: Array[Byte]): Seq[Row] = {
    val r = new ProtoReader(block, 0, block.length)
    var strings = Array("")
    val groups = Seq.newBuilder[ProtoReader]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGranularity = 1000L
    while (r.hasMore) r.readKey() match {
      case (1, 2) =>
        val st = r.sub()
        val b = Array.newBuilder[String]
        while (st.hasMore) st.readKey() match {
          case (1, 2) => b += st.readBytesStr()
          case (_, w) => st.skip(w)
        }
        strings = b.result()
      case (2, 2)  => groups += r.sub()
      case (17, 0) => granularity = r.readVarint()
      case (18, 0) => dateGranularity = r.readVarint()
      case (19, 0) => latOffset = r.readVarint()
      case (20, 0) => lonOffset = r.readVarint()
      case (_, w)  => r.skip(w)
    }
    val ctx = BlockCtx(strings, granularity, latOffset, lonOffset,
      dateGranularity)
    groups.result().flatMap(decodeGroup(_, ctx))
  }

  private def decodeGroup(g: ProtoReader, ctx: BlockCtx): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    while (g.hasMore) g.readKey() match {
      case (1, 2) => out += decodeNode(g.sub(), ctx)
      case (2, 2) => out ++= decodeDense(g.sub(), ctx)
      case (3, 2) => out += decodeWay(g.sub(), ctx)
      case (_, w) => g.skip(w) // relations (4) via decodeRelations
    }
    out.result()
  }

  private[pbf] def decodeRelations(block: Array[Byte]): Seq[Row] = {
    val r = new ProtoReader(block, 0, block.length)
    var strings = Array("")
    val groups = Seq.newBuilder[ProtoReader]
    var dateGranularity = 1000L
    while (r.hasMore) r.readKey() match {
      case (1, 2) =>
        val st = r.sub()
        val b = Array.newBuilder[String]
        while (st.hasMore) st.readKey() match {
          case (1, 2) => b += st.readBytesStr()
          case (_, w) => st.skip(w)
        }
        strings = b.result()
      case (2, 2)  => groups += r.sub()
      case (18, 0) => dateGranularity = r.readVarint()
      case (_, w)  => r.skip(w)
    }
    val ctx = BlockCtx(strings, 100L, 0L, 0L, dateGranularity)
    val out = Seq.newBuilder[Row]
    groups.result().foreach { g =>
      while (g.hasMore) g.readKey() match {
        case (4, 2) => out += decodeRelation(g.sub(), ctx)
        case (_, w) => g.skip(w)
      }
    }
    out.result()
  }

  private val MemberTypes = Array("node", "way", "relation")

  private def decodeRelation(r: ProtoReader, ctx: BlockCtx): Row = {
    var id = 0L
    var keys = Array.empty[Long]; var vals = Array.empty[Long]
    var roles = Array.empty[Long]; var memids = Array.empty[Long]
    var types = Array.empty[Long]
    var info = (null: String, null: String, null: String, null: String,
      null: String, "true")
    while (r.hasMore) r.readKey() match {
      case (1, 0)  => id = r.readVarint()
      case (2, 2)  => keys = r.packedLongs(zigzag = false)
      case (3, 2)  => vals = r.packedLongs(zigzag = false)
      case (4, 2)  => info = decodeInfo(r.sub(), ctx)
      case (8, 2)  => roles = r.packedLongs(zigzag = false)
      case (9, 2)  => memids = r.packedLongs(zigzag = true) // delta-coded
      case (10, 2) => types = r.packedLongs(zigzag = false)
      case (_, w)  => r.skip(w)
    }
    var ref = 0L
    val members = memids.indices.map { i =>
      ref += memids(i)
      Row(MemberTypes(types(i).toInt), ref.toString,
        ctx.strings(roles(i).toInt))
    }
    val (version, ts, changeset, uid, user, visible) = info
    Row(id.toString, visible, version, changeset, ts, user, uid,
      orNull(tagRows(ctx, keys, vals)),
      if (members.isEmpty) null else members)
  }

  // ---- field helpers -------------------------------------------------

  /** nanodegrees → decimal-degree string (exact, no double rounding). */
  private def coord(ctx: BlockCtx, offset: Long, v: Long): String =
    BigDecimal.valueOf(offset + ctx.granularity * v, 9)
      .stripTrailingZeros().toPlainString

  private def tsString(ctx: BlockCtx, t: Long): String =
    Instant.ofEpochMilli(t * ctx.dateGranularity).toString

  private def tagRows(ctx: BlockCtx, keys: Array[Long],
                      vals: Array[Long]): Seq[Row] =
    keys.indices.map(i =>
      Row(ctx.strings(keys(i).toInt), ctx.strings(vals(i).toInt)))

  private def orNull(tags: Seq[Row]): Seq[Row] =
    if (tags.isEmpty) null else tags

  /** Info message → (version, timestamp, changeset, uid, user, visible)
    * as the XML attribute strings (null when absent). */
  private def decodeInfo(r: ProtoReader, ctx: BlockCtx):
      (String, String, String, String, String, String) = {
    var version, timestamp, changeset, uid, user, visible: String = null
    while (r.hasMore) r.readKey() match {
      case (1, 0) => version = r.readVarint().toString
      case (2, 0) => timestamp = tsString(ctx, r.readVarint())
      case (3, 0) => changeset = r.readVarint().toString
      case (4, 0) => uid = r.readVarint().toString
      case (5, 0) => user = ctx.strings(r.readVarint().toInt)
      case (6, 0) => visible = (r.readVarint() != 0).toString
      case (_, w) => r.skip(w)
    }
    (version, timestamp, changeset, uid, user,
      if (visible == null) "true" else visible)
  }

  // ---- element decoders ----------------------------------------------

  private def decodeNode(r: ProtoReader, ctx: BlockCtx): Row = {
    var id = 0L; var lat = 0L; var lon = 0L
    var keys = Array.empty[Long]; var vals = Array.empty[Long]
    var info = (null: String, null: String, null: String, null: String,
      null: String, "true")
    while (r.hasMore) r.readKey() match {
      case (1, 0) => id = r.readSint()
      case (2, 2) => keys = r.packedLongs(zigzag = false)
      case (3, 2) => vals = r.packedLongs(zigzag = false)
      case (4, 2) => info = decodeInfo(r.sub(), ctx)
      case (8, 0) => lat = r.readSint()
      case (9, 0) => lon = r.readSint()
      case (_, w) => r.skip(w)
    }
    val (version, ts, changeset, uid, user, visible) = info
    Row(id.toString, visible, version, changeset, ts, user, uid,
      coord(ctx, ctx.latOffset, lat), coord(ctx, ctx.lonOffset, lon),
      orNull(tagRows(ctx, keys, vals)), "node", null)
  }

  private def decodeDense(r: ProtoReader, ctx: BlockCtx): Seq[Row] = {
    var ids, lats, lons, keysVals = Array.empty[Long]
    var versions, timestamps, changesets, uids, userSids, visibles =
      Array.empty[Long]
    while (r.hasMore) r.readKey() match {
      case (1, 2) => ids = r.packedLongs(zigzag = true)
      case (5, 2) =>
        val di = r.sub()
        while (di.hasMore) di.readKey() match {
          case (1, 2) => versions = di.packedLongs(zigzag = false)
          case (2, 2) => timestamps = di.packedLongs(zigzag = true)
          case (3, 2) => changesets = di.packedLongs(zigzag = true)
          case (4, 2) => uids = di.packedLongs(zigzag = true)
          case (5, 2) => userSids = di.packedLongs(zigzag = true)
          case (6, 2) => visibles = di.packedLongs(zigzag = false)
          case (_, w) => di.skip(w)
        }
      case (8, 2)  => lats = r.packedLongs(zigzag = true)
      case (9, 2)  => lons = r.packedLongs(zigzag = true)
      case (10, 2) => keysVals = r.packedLongs(zigzag = false)
      case (_, w)  => r.skip(w)
    }
    // all parallel arrays are delta-coded — integrate as we emit
    var id = 0L; var lat = 0L; var lon = 0L
    var ts = 0L; var cs = 0L; var uid = 0L; var sid = 0L
    var kv = 0
    ids.indices.map { i =>
      id += ids(i); lat += lats(i); lon += lons(i)
      val tags = Seq.newBuilder[Row]
      if (keysVals.nonEmpty) {
        while (kv < keysVals.length && keysVals(kv) != 0L) {
          tags += Row(ctx.strings(keysVals(kv).toInt),
            ctx.strings(keysVals(kv + 1).toInt))
          kv += 2
        }
        kv += 1 // the 0 separator
      }
      var version, tsStr, csStr, uidStr, user: String = null
      var visible = "true"
      if (versions.nonEmpty) version = versions(i).toString
      if (timestamps.nonEmpty) { ts += timestamps(i); tsStr = tsString(ctx, ts) }
      if (changesets.nonEmpty) { cs += changesets(i); csStr = cs.toString }
      if (uids.nonEmpty) { uid += uids(i); uidStr = uid.toString }
      if (userSids.nonEmpty) { sid += userSids(i); user = ctx.strings(sid.toInt) }
      if (visibles.nonEmpty) visible = (visibles(i) != 0).toString
      Row(id.toString, visible, version, csStr, tsStr, user, uidStr,
        coord(ctx, ctx.latOffset, lat), coord(ctx, ctx.lonOffset, lon),
        orNull(tags.result()), "node", null)
    }
  }

  private def decodeWay(r: ProtoReader, ctx: BlockCtx): Row = {
    var id = 0L
    var keys = Array.empty[Long]; var vals = Array.empty[Long]
    var refs = Array.empty[Long]
    var info = (null: String, null: String, null: String, null: String,
      null: String, "true")
    while (r.hasMore) r.readKey() match {
      case (1, 0) => id = r.readVarint()
      case (2, 2) => keys = r.packedLongs(zigzag = false)
      case (3, 2) => vals = r.packedLongs(zigzag = false)
      case (4, 2) => info = decodeInfo(r.sub(), ctx)
      case (8, 2) => refs = r.packedLongs(zigzag = true) // delta-coded
      case (_, w) => r.skip(w)
    }
    var ref = 0L
    val nd = refs.map { d => ref += d; Row(ref.toString) }.toSeq
    val (version, ts, changeset, uid, user, visible) = info
    Row(id.toString, visible, version, changeset, ts, user, uid,
      null, null, orNull(tagRows(ctx, keys, vals)), "way",
      if (nd.isEmpty) null else nd)
  }
}
