package graft.osm.pbf

/** Minimal protobuf wire-format reader for the OSM PBF subset — written
  * against the public spec (fileformat.proto / osmformat.proto at
  * wiki.openstreetmap.org/wiki/PBF_Format). No protobuf-java runtime, no
  * reflection: a tight cursor over a byte array, which is exactly what a
  * per-partition decode loop wants (zero allocation beyond the decoded
  * values themselves).
  */
final class ProtoReader(val buf: Array[Byte], var pos: Int, val end: Int) {

  def hasMore: Boolean = pos < end

  def readVarint(): Long = {
    var x = 0L
    var s = 0
    while (true) {
      val b = buf(pos); pos += 1
      x |= (b & 0x7FL) << s
      if ((b & 0x80) == 0) return x
      s += 7
    }
    x // unreachable
  }

  /** zigzag-decoded varint (protobuf sint64). */
  def readSint(): Long = { val n = readVarint(); (n >>> 1) ^ -(n & 1L) }

  /** (fieldNumber, wireType) */
  def readKey(): (Int, Int) = { val k = readVarint().toInt; (k >>> 3, k & 7) }

  def readLen(): Int = readVarint().toInt

  /** Reader over an embedded length-delimited message; advances this. */
  def sub(): ProtoReader = {
    val n = readLen()
    val r = new ProtoReader(buf, pos, pos + n)
    pos += n
    r
  }

  def readBytesStr(): String = {
    val n = readLen()
    val s = new String(buf, pos, n, "UTF-8")
    pos += n
    s
  }

  def readByteSlice(): Array[Byte] = {
    val n = readLen()
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }

  def skip(wire: Int): Unit = wire match {
    case 0 => readVarint()
    case 1 => pos += 8
    case 2 =>
      // NOT `pos += readLen()`: the += form reads the STALE pos before
      // readLen() advances it past the length varint (off-by-varint-
      // width desync, caught by the relation-skip test)
      val n = readLen()
      pos += n
    case 5 => pos += 4
    case w => throw new IllegalArgumentException(s"wire type $w")
  }

  /** A packed repeated integer field (length-delimited stream of
    * varints), optionally zigzag-decoded. */
  def packedLongs(zigzag: Boolean): Array[Long] = {
    val r = sub()
    val out = Array.newBuilder[Long]
    while (r.hasMore) out += (if (zigzag) r.readSint() else r.readVarint())
    out.result()
  }
}
