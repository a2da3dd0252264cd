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
}
