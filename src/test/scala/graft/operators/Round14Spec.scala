package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 pins. */
class Round14Spec extends SparkSpec {

  test("crawlBatch ids are disjoint from documents.doc_id at every " +
    "driver SF (the dedup_cross oracle's membership test is exact)") {
    // The dedup_cross oracle classifies history vs batch by
    // IN / NOT IN documents — exact ONLY while no synthetic batch id
    // (+2e6 / +3e6 offsets) collides with a real doc_id. The offsets
    // are non-congruent to the corpus's replica offsets today, but
    // nothing structural prevents a denser future fixture from
    // violating that; this pin makes such growth fail loudly instead
    // of silently misclassifying oracle rows.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables.documents(spark, dir)
      val batch = Fixtures.crawlBatch(docs)
      val collisions = batch.select(col("doc_id"))
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .count()
      assert(collisions === 0L,
        s"$dir: $collisions crawlBatch ids collide with documents.doc_id " +
          "— the dedup_cross oracle's IN/NOT IN membership split is no " +
          "longer exact; pick batch offsets outside the corpus id space")
      // and the batch is non-empty, so the pin is not vacuous
      assert(batch.limit(1).count() === 1L, s"$dir: empty crawl batch")
    }
  }

  test("rank-space generators on a SPARSE id space: no phantom " +
    "endpoints, and linkEdges is exactly isomorphic to its " +
    "contiguous twin") {
    import org.apache.spark.sql.DataFrame
    // sparse twin corpus: an order-preserving affine relabel (id*7 +
    // 1e6) of the sf0.001 documents — ranks are unchanged, ids are
    // sparse. The r14 rewire contract: (1) every generator endpoint
    // is a REAL doc_id (the pre-r14 `% n_docs` forms minted phantom
    // ids here); (2) linkEdges, whose wiring is pure rank arithmetic,
    // must be the contiguous graph under the relabel, edge for edge.
    val tmp = "/tmp/graft_sparse_docs_spec"
    val relabel = (c: org.apache.spark.sql.Column) => c * 7L + 1000000L
    graft.Tables.documents(spark, sf)
      .withColumn("doc_id", relabel(col("doc_id")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ids = graft.Tables.documents(spark, tmp).select(col("doc_id"))
    def phantoms(e: DataFrame): Long =
      e.select(col("src").as("doc_id"))
        .unionAll(e.select(col("dst").as("doc_id")))
        .join(ids, Seq("doc_id"), "left_anti").count()
    val sparse = Graphs.linkEdges(spark, tmp)
    assert(phantoms(sparse) === 0L, "linkEdges minted phantom ids")
    assert(phantoms(Graphs.blockEdges(spark, tmp)) === 0L,
      "blockEdges minted phantom ids")
    // mst's md5 draws hash the REAL ids (different coins on the
    // relabeled corpus, so no isomorphism claim) — but its forest's
    // endpoints must still all be real documents
    val forest = Graphs.mst(spark, tmp)
    assert(forest.select(col("a").as("doc_id"))
      .unionAll(forest.select(col("b").as("doc_id")))
      .join(ids, Seq("doc_id"), "left_anti").count() === 0L,
      "mst drew phantom endpoints")
    // exact multiset isomorphism for the pure-rank wiring
    val mapped = Graphs.linkEdges(spark, sf)
      .select(relabel(col("src")).as("src"), relabel(col("dst")).as("dst"))
    def em(e: DataFrame): DataFrame =
      e.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
    val diff = em(sparse).unionAll(em(mapped))
      .groupBy(col("src"), col("dst"), col("c"))
      .agg(count(lit(1)).as("sides"))
      .filter(col("sides") =!= 2).count()
    assert(diff === 0L, s"$diff (src,dst,mult) rows differ between the " +
      "sparse graph and the relabeled contiguous graph")
    assert(sparse.limit(1).count() === 1L, "vacuous: empty edge set")
  }
}
