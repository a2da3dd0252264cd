package graft.osm.pbf

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.util.zip.Deflater

/** OSM PBF encoder (the sink side of PbfSource): enough of
  * fileformat/osmformat to produce spec-conformant files — OSMHeader
  * blob, zlib'd OSMData blobs, DenseNodes with full DenseInfo,
  * delta/zigzag-coded Ways, per-block string tables. Used by the
  * round-trip tests (PbfSpec) and by OsmSynth to materialize the
  * benchmark corpus in both formats.
  */
object PbfWriter {

  final case class PbfNode(id: Long, latNano: Long, lonNano: Long,
                           tags: Seq[(String, String)], version: Int,
                           tsMillis: Long, changeset: Long, uid: Long,
                           user: String, visible: Boolean)
  final case class PbfWay(id: Long, refs: Seq[Long],
                          tags: Seq[(String, String)], version: Int,
                          tsMillis: Long, changeset: Long, uid: Long,
                          user: String, visible: Boolean)
  /** memberType: 0 = node, 1 = way, 2 = relation (osmformat enum). */
  final case class PbfMember(memberType: Int, ref: Long, role: String)
  final case class PbfRelation(id: Long, members: Seq[PbfMember],
                               tags: Seq[(String, String)], version: Int,
                               tsMillis: Long, changeset: Long, uid: Long,
                               user: String, visible: Boolean)

  private def zz(v: Long): Long = (v << 1) ^ (v >> 63)

  private final class W {
    private val buf = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { buf.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      buf.write(v.toInt)
    }
    def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length); buf.write(b)
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def int(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { key(field, 0); varint(zz(v)) }
    def packed(field: Int, vs: Seq[Long], zigzag: Boolean): Unit = {
      val w = new W
      vs.foreach(v => w.varint(if (zigzag) zz(v) else v))
      bytes(field, w.toArray)
    }
    def msg(field: Int, m: W): Unit = bytes(field, m.toArray)
    def toArray: Array[Byte] = buf.toByteArray
  }

  private def deltas(vs: Seq[Long]): Seq[Long] =
    vs.headOption.toSeq ++ vs.sliding(2).collect { case Seq(a, b) => b - a }

  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def apply(s: String): Long = idx.getOrElseUpdate(s, idx.size).toLong
    def all: Seq[String] = idx.keys.toSeq
  }

  private def zlib(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def frame(out: DataOutputStream, tpe: String,
                    blob: Array[Byte]): Unit = {
    val hdr = new W
    hdr.str(1, tpe)
    hdr.int(3, blob.length)
    val hb = hdr.toArray
    out.writeInt(hb.length)
    out.write(hb)
    out.write(blob)
  }

  private def rawBlob(payload: Array[Byte]): Array[Byte] = {
    val b = new W
    b.bytes(1, payload)
    b.toArray
  }

  private def zlibBlob(payload: Array[Byte]): Array[Byte] = {
    val b = new W
    b.int(2, payload.length)
    b.bytes(3, zlib(payload))
    b.toArray
  }

  private def denseNodeBlock(nodes: Seq[PbfNode]): Array[Byte] = {
    val st = new StringTable
    val dense = new W
    dense.packed(1, deltas(nodes.map(_.id)), zigzag = true)
    val di = new W
    di.packed(1, nodes.map(_.version.toLong), zigzag = false)
    di.packed(2, deltas(nodes.map(_.tsMillis / 1000)), zigzag = true)
    di.packed(3, deltas(nodes.map(_.changeset)), zigzag = true)
    di.packed(4, deltas(nodes.map(_.uid)), zigzag = true)
    di.packed(5, deltas(nodes.map(n => st(n.user))), zigzag = true)
    di.packed(6, nodes.map(n => if (n.visible) 1L else 0L), zigzag = false)
    dense.msg(5, di)
    dense.packed(8, deltas(nodes.map(_.latNano)), zigzag = true)
    dense.packed(9, deltas(nodes.map(_.lonNano)), zigzag = true)
    if (nodes.exists(_.tags.nonEmpty))
      dense.packed(10, nodes.flatMap(n =>
        n.tags.flatMap { case (k, v) => Seq(st(k), st(v)) } :+ 0L),
        zigzag = false)
    val group = new W
    group.msg(2, dense)
    blockBytes(st, group)
  }

  private def infoMsg(st: StringTable, version: Int, tsMillis: Long,
                      changeset: Long, uid: Long, user: String,
                      visible: Boolean): W = {
    val info = new W
    info.int(1, version.toLong)
    info.int(2, tsMillis / 1000)
    info.int(3, changeset)
    info.int(4, uid)
    info.int(5, st(user))
    info.int(6, if (visible) 1L else 0L)
    info
  }

  private def wayBlock(ways: Seq[PbfWay]): Array[Byte] = {
    val st = new StringTable
    val group = new W
    ways.foreach { w =>
      val m = new W
      m.int(1, w.id)
      if (w.tags.nonEmpty) {
        m.packed(2, w.tags.map(t => st(t._1)), zigzag = false)
        m.packed(3, w.tags.map(t => st(t._2)), zigzag = false)
      }
      m.msg(4, infoMsg(st, w.version, w.tsMillis, w.changeset, w.uid,
        w.user, w.visible))
      if (w.refs.nonEmpty) m.packed(8, deltas(w.refs), zigzag = true)
      group.msg(3, m)
    }
    blockBytes(st, group)
  }

  private def relationBlock(rels: Seq[PbfRelation]): Array[Byte] = {
    val st = new StringTable
    val group = new W
    rels.foreach { rel =>
      val m = new W
      m.int(1, rel.id)
      if (rel.tags.nonEmpty) {
        m.packed(2, rel.tags.map(t => st(t._1)), zigzag = false)
        m.packed(3, rel.tags.map(t => st(t._2)), zigzag = false)
      }
      m.msg(4, infoMsg(st, rel.version, rel.tsMillis, rel.changeset,
        rel.uid, rel.user, rel.visible))
      if (rel.members.nonEmpty) {
        m.packed(8, rel.members.map(mm => st(mm.role)), zigzag = false)
        m.packed(9, deltas(rel.members.map(_.ref)), zigzag = true)
        m.packed(10, rel.members.map(_.memberType.toLong), zigzag = false)
      }
      group.msg(4, m)
    }
    blockBytes(st, group)
  }

  /** PrimitiveBlock: string table + one group; granularity=1 (explicit,
    * nanodegree units), date_granularity left at the 1000 default. */
  private def blockBytes(st: StringTable, group: W): Array[Byte] = {
    val block = new W
    val stw = new W
    st.all.foreach(s => stw.str(1, s))
    block.msg(1, stw)
    block.msg(2, group)
    block.int(17, 1)
    block.toArray
  }

  def write(path: String, nodes: Seq[PbfNode], ways: Seq[PbfWay],
            perBlob: Int = 4000,
            relations: Seq[PbfRelation] = Seq.empty): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      val hb = new W
      hb.str(4, "OsmSchema-V0.6")
      hb.str(4, "DenseNodes")
      frame(out, "OSMHeader", rawBlob(hb.toArray)) // raw-payload path
      nodes.grouped(perBlob).foreach(g =>
        frame(out, "OSMData", zlibBlob(denseNodeBlock(g))))
      ways.grouped(perBlob).foreach(g =>
        frame(out, "OSMData", zlibBlob(wayBlock(g))))
      relations.grouped(perBlob).foreach(g =>
        frame(out, "OSMData", zlibBlob(relationBlock(g))))
    } finally out.close()
  }
}
