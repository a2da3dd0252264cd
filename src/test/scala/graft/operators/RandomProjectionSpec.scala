package graft.operators

import graft.{SparkSpec, Tables}

class RandomProjectionSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("random projection equals a plain-Scala replay and preserves distance") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val got = Similarity.randomProjection(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == emb.size * 16)

    // exact replay: md5-parity sign matrix, left-to-right fold, 0.25
    // scale, micros at the boundary — restated with MessageDigest
    val signs = Array.tabulate(16, 64)((j, i) =>
      if (md5_60(s"rp_${j}_$i") % 2 == 0) 1.0 else -1.0)
    for (vid <- emb.keys.take(20); j <- 0 until 16) {
      var acc = 0.0
      for (i <- 0 until 64) acc += emb(vid)(i) * signs(j)(i)
      assert(got((vid, j.toLong)) == rnd(1e6 * acc * 0.25),
        s"vec $vid dim $j")
    }

    // JL property: the ±1/√16 projection preserves pairwise L2² in
    // expectation; the median ratio over sampled pairs sits near 1
    val ids = emb.keys.toArray.sorted.take(40)
    val ratios = for {
      a <- ids.indices; b <- (a + 1) until ids.length
      if (a + b) % 7 == 0
    } yield {
      val (xa, xb) = (emb(ids(a)), emb(ids(b)))
      val orig = (0 until 64).map(i => math.pow(xa(i) - xb(i), 2)).sum
      val proj = (0 until 16).map { j =>
        val d = (got((ids(a), j.toLong)) - got((ids(b), j.toLong))) / 1e6
        d * d
      }.sum
      proj / orig
    }
    val med = ratios.sorted.apply(ratios.length / 2)
    assert(med > 0.6 && med < 1.6, s"median distortion $med")
  }
}
