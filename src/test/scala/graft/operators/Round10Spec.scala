package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-10 pins: the chunk-level CDC dedup face replays from a
  * driver recomputation, the mst round-budget guard fails loudly, and
  * the resultOnce/materializedLocal leak fixes leave no persisted RDDs
  * behind. */
class Round10Spec extends SparkSpec {

  /** Driver restatement of the md5-60 window hash + boundary rule the
    * cdc_boundaries kernel implements. */
  private def chunksOfText(text: String, mod: Int = 64): Seq[(Int, Int)] = {
    val n = text.length
    val ends = ((8 to n).filter { e =>
      md5_60(text.substring(e - 8, e)) % mod == 0
    } :+ n).distinct.sorted
    val starts = 0 +: ends.dropRight(1)
    starts.zip(ends).filter { case (s, e) => e > s }
  }

  test("chunk3_cdc_dedup restates from a driver chunk-and-group replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chunks = docs.flatMap { case (id, t) =>
      chunksOfText(t).map { case (s, e) => (id, t.substring(s, e)) }
    }
    def hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byDigest = chunks.groupBy { case (_, c) => hex(c) }
    val want = byDigest.map { case (d, occ) =>
      d -> (occ.head._2.length.toLong, occ.length.toLong,
        occ.map(_._1).distinct.length.toLong)
    }
    val wantTop = want.toSeq.filter(_._2._2 > 1)
      .sortBy { case (d, (_, n, _)) => (-n, d) }.take(15)
    val nChunks = chunks.length.toLong
    val nUnique = want.size.toLong
    val saved = want.values.map { case (len, n, _) => (n - 1) * len }.sum

    val got = Packing.cdcDedup(spark, sf).collect()
    assert(got.length === wantTop.length)
    assert(got.length > 0, "corpus must contain duplicated chunks")
    got.zip(wantTop).foreach { case (r, (d, (len, n, nd))) =>
      assert(r.getAs[String]("chunk_md5") === d)
      assert(r.getAs[Long]("chunk_len") === len)
      assert(r.getAs[Long]("n_occurrences") === n)
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("saved_bytes") === (n - 1) * len)
      assert(r.getAs[Long]("n_chunks") === nChunks)
      assert(r.getAs[Long]("n_unique_chunks") === nUnique)
      assert(r.getAs[Long]("total_saved_bytes") === saved)
    }
  }

  test("pack2 length buckets restate from a driver batch-and-pad replay") {
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
      .sortBy { case (id, len) => (len, id) }
    def padded(rows: Seq[(Long, Long)], batch: Int): (Long, Long) =
      rows.grouped(batch).map { g =>
        (g.map(_._2).sum, g.map(_._2).max * g.length)
      }.foldLeft((0L, 0L)) { case ((s, p), (gs, gp)) => (s + gs, p + gp) }
    // SQL-standard ntile: first (n mod b) buckets get the extra row
    val n = lens.length
    val (base, extra) = (n / 8, n % 8)
    val cuts = (0 to 8).map(i => i * base + math.min(i, extra))
    val byBucket = (0 until 8).map(i => lens.slice(cuts(i), cuts(i + 1)))
    val wantPadded = byBucket.map(b => padded(b.toSeq, 32))
    val got = Packing.lengthBuckets(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(got.length === 8)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_docs") === byBucket(i).length.toLong)
      assert(r.getAs[Long]("sum_tokens") === wantPadded(i)._1)
      assert(r.getAs[Long]("padded_tokens") === wantPadded(i)._2)
      assert(r.getAs[Long]("padded_total") === wantPadded.map(_._2).sum)
      // naive baseline: arrival (doc_id) order, no length layout
      assert(r.getAs[Long]("padded_naive_total") ===
        padded(lens.sortBy(_._1).toSeq, 32)._2)
      assert(r.getAs[Long]("bucketing_savings_micros") > 0L,
        "length-bucketing must beat arrival-order batching")
    }
  }

  test("pack3 FIM restates from a driver split-and-reorder replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.map { case (id, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = tk.length.toLong
      val applied = md5_60(s"fimr:$id") % 100 < 50 && n >= 3
      val c1 = md5_60(s"fim1:$id") % (n + 1)
      val c2 = md5_60(s"fim2:$id") % (n + 1)
      val (lo, hi) = (math.min(c1, c2).toInt, math.max(c1, c2).toInt)
      val psm =
        if (!applied) tk.mkString(" ")
        else "<PRE> " + tk.take(lo).mkString(" ") +
          " <SUF> " + tk.drop(hi).mkString(" ") +
          " <MID> " + tk.slice(lo, hi).mkString(" ")
      id -> (n, if (applied) 1L else 0L,
        if (applied) lo.toLong else n,
        if (applied) (hi - lo).toLong else 0L,
        if (applied) n - hi else 0L, hex(psm))
    }.toMap
    val got = Packing.fimTransform(spark, sf).collect()
    assert(got.length === want.size)
    // the face must actually exercise both arms
    assert(got.count(_.getAs[Long]("fim_applied") == 1L) > 0)
    assert(got.count(_.getAs[Long]("fim_applied") == 0L) > 0)
    got.foreach { r =>
      val w = want(r.getAs[Long]("doc_id"))
      assert((r.getAs[Long]("n_tokens"), r.getAs[Long]("fim_applied"),
        r.getAs[Long]("n_prefix"), r.getAs[Long]("n_middle"),
        r.getAs[Long]("n_suffix"), r.getAs[String]("psm_digest")) === w)
    }
  }

  test("mst fails loudly when the round budget exhausts above the " +
    "local threshold instead of collecting an unbounded edge set") {
    val e = intercept[IllegalStateException] {
      Graphs.mst(spark, sf, rounds = 0, localThreshold = 0L)
    }
    assert(e.getMessage.contains("round budget"))
  }

  test("giStar and nearDupCross leave no persisted RDDs behind " +
    "(the accumulating-checkpoint leak)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    Spatial.giStar(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    Dedup.nearDupCross(spark, docs, Fixtures.crawlBatch(docs)).collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
  }

  test("prfRm3Indexed == prfRm3 bit for bit (the postings index serves " +
    "the exact RM3 answer)") {
    val want = Retrieval.prfRm3(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val got = Retrieval.prfRm3Indexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(want.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("resultOnce serves in-memory inputs fresh per call (no stale " +
    "reuse across different batches)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hist = docs.toSeq.toDF("doc_id", "text")
    // batch 1: exact copies of two history docs; batch 2: disjoint junk
    val b1 = Seq((1000001L, docs(0)._2), (1000002L, docs(1)._2))
      .toDF("doc_id", "text")
    val b2 = Seq((1000003L, "zzz qqq xxx yyy www vvv uuu ttt sss rrr"))
      .toDF("doc_id", "text")
    val r1 = Dedup.nearDupCross(spark, hist, b1).collect()
    val r2 = Dedup.nearDupCross(spark, hist, b2).collect()
    assert(r1.map(_.getLong(0)).toSet === Set(1000001L, 1000002L))
    assert(r2.isEmpty, "a stale staged result served the wrong batch")
  }
}
