package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 operators: IVF-PQ combined ANN. Values are pinned by the
  * DuckDB oracle; these tests pin recall, exact-re-rank math, and the
  * plan shape.
  */
class Round6Spec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ivfpq: re-ranked scores are exact; candidates agree with plain IVF") {
    val ipq = Similarity.annIvfPq(spark, sf).collect()
    assert(ipq.length === 10)
    // the re-rank is exact math: every returned cos_sim equals what
    // brute force computes for the same vec_id (IVF-family convention —
    // at tiny SF the probed cells need not hold the global top-1)
    val bruteScores = Similarity.annBruteForce(spark, sf, k = 1000).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    ipq.foreach { r =>
      assert(bruteScores(r.getLong(0)) === r.getAs[Double]("cos_sim"),
        s"id ${r.getLong(0)}")
    }
    // composed vs coarse-only: same probed cells, so with a shortlist
    // that covers the candidate pool the two top-10 sets largely agree
    val ivf = Similarity.annIvf(spark, sf).collect().map(_.getLong(0)).toSet
    val overlap = ipq.map(_.getLong(0)).count(ivf.contains)
    assert(overlap >= 7, s"ivfpq/ivf top-10 overlap only $overlap")
  }

  test("spanStrip: cloned text is fully stripped, unique text fully kept") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val unique = (1 to 12).map(i => s"beta$i").mkString(" ")
    val mixed = (1 to 4).map(i => s"gamma$i").mkString(" ") + " " + shared
    val docs = Seq(
      (1L, shared), (2L, shared),  // clone pair: every token span-covered
      (3L, unique),                // no shared 8-gram anywhere
      (4L, mixed)                  // unique 4-token prefix + shared tail
    ).toDF("doc_id", "text")
    val out = Dedup.spanStrip(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_head"))).toMap
    assert(out(1L)._2 === 0L, "clone must lose every covered token")
    assert(out(2L)._2 === 0L)
    assert(out(3L) === ((12L, 12L, unique.take(60))), "unique doc untouched")
    // the mixed doc keeps ONLY its unique prefix: the shared 12-token
    // tail is covered by spans duplicated against docs 1 and 2
    assert(out(4L)._1 === 16L)
    assert(out(4L)._3 === (1 to 4).map(i => s"gamma$i").mkString(" "))
  }

  test("ivfpq: assignment+encoding are narrow, probe join broadcasts — no corpus shuffle") {
    val p = plan(Similarity.annIvfPq(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"IVF-PQ corpus path must not shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"probe join should broadcast the nprobe rows:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"shortlist must be heap-based:\n$p")
  }

  test("clusterSplit: exactly one shuffle (the norm-hash window), no join") {
    val p = plan(graft.operators.Sampling.clusterSplit(
      graft.Tables.documents(spark, sf)))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"split must be window-over-one-partitioning:\n$p")
    assert(!p.contains("Join"), s"split must not join:\n$p")
  }

  test("ml5: stats side joins back via broadcast, no data-sized shuffle on pass 2") {
    val p = plan(graft.operators.Training.robustScale(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"64-row stats frame must broadcast:\n$p")
  }

  test("bm25 indexed: query reads ONLY the terms' bucket partitions; " +
      "scores identical to the in-session BM25") {
    val terms = Seq("spark", "query", "filter")
    val df = TextAnalysis.bm25Indexed(spark, sf, terms)
    val p = plan(df)
    // the query terms' hash buckets must land as a STATIC partition
    // filter on the bucketed postings scan — the O(matched buckets)
    // read is the whole point of persisting the index
    assert("PartitionFilters: \\[tb#\\d+L? IN".r.findFirstIn(p).isDefined,
      s"no static partition pruning on the postings scan:\n$p")
    val indexed = df.collect().map(_.toSeq).toSeq
    val inSession = TextAnalysis.bm25(
      graft.Tables.documents(spark, sf), terms).collect().map(_.toSeq).toSeq
    assert(indexed === inSession,
      "persisted-index BM25 must be score-identical to the in-session BM25")
  }
}
