package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4e operators: product-quantized ANN, last-touch attribution,
  * winnowing fingerprints, URL canonicalization. Values are pinned by
  * the DuckDB oracles; these tests pin plans, recall, and the semantic
  * invariants.
  */
class Round4eSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pq: ADC shortlist recovers the brute-force top-1 and scores match exactly") {
    val pq = Similarity.annPq(spark, sf).collect()
    assert(pq.length === 10)
    val brute = Similarity.annBruteForce(spark, sf).collect()
    // PQ is approximate: assert the top hit survives compression and
    // that every returned cos_sim equals the exact score brute force
    // computes for the same vec_id (the re-rank is exact math)
    assert(pq.head.getLong(0) === brute.head.getLong(0))
    val bruteScores = brute.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      bruteScores.get(r.getLong(0)).foreach { exact =>
        assert(r.getAs[Double]("cos_sim") === exact)
      }
    }
  }

  test("pq: encoding is a zero-shuffle narrow map — one exchange total (top-k)") {
    val df = Similarity.annPq(spark, sf)
    val p = plan(df)
    // corpus side: scan → project(codes) → broadcast-join query → TakeOrdered;
    // no hash exchange anywhere (the quantizer was collected as a model)
    assert(!p.contains("Exchange hashpartitioning"),
      s"PQ scan must not shuffle the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k should be heap-based:\n$p")
  }

  test("ev4: every purchase attributed, gap nonnegative, touch precedes") {
    val rows = EventAnalytics.lastTouchAttribution(spark, sf).collect()
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length === nPurchases)
    rows.foreach { r =>
      val touch = r.getAs[String]("touch_type")
      assert(Set("view", "click", "none").contains(touch))
      if (touch == "none") assert(r.isNullAt(r.fieldIndex("gap_s")))
      else assert(r.getAs[Long]("gap_s") >= 0L)
    }
  }

  test("ev4: single user_id exchange — no self-join, no subquery") {
    val p = plan(EventAnalytics.lastTouchAttribution(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), s"attribution must not self-join:\n$p")
  }

  test("winnow: an injected clone shares ALL fingerprints with its source") {
    val docs = Tables.documents(spark, sf).limit(50)
    val clone = docs.filter(col("doc_id") === 3)
      .withColumn("doc_id", lit(90001L))
    val fps = TextAnalysis.winnow(docs.unionAll(clone)).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(fps(3L) === fps(90001L), "identical text ⇒ identical fingerprint set")
    // density: winnowing keeps a strict subset of shingle hashes
    val nTokens = docs.filter(col("doc_id") === 3)
      .select(size(split(col("text"), "\\s+"))).collect().head.getInt(0)
    assert(fps(3L).size < nTokens)
  }

  test("winnow: selection is narrow until the fingerprint explode") {
    val p = plan(TextAnalysis.winnow(Tables.documents(spark, sf)))
    assert(!p.contains("Exchange"), s"winnowing must not shuffle:\n$p")
  }

  test("web1: hosts are case-folded, www-stripped, tracking params dropped") {
    val rows = TextAnalysis.urlNormalize(
      Fixtures.withUrls(Tables.documents(spark, sf))).collect()
    val hosts = rows.map(_.getString(0)).toSet
    assert(hosts === Set("example.com", "news.example.org",
      "cdn.media.example", "shop.example.net"))
    rows.foreach { r =>
      // paths are /p/0../p/6 plus their '/p/N&raw' literal-'&'
      // variants (doc_id % 11 == 2) — no ?utm or #frag residue
      assert(r.getAs[Long]("n_paths") <= 14)
    }
    val total = rows.map(_.getAs[Long]("n_pages")).sum
    assert(total === Tables.documents(spark, sf).count())
    // the literal-'&' path survives: the fixture injects it, so some
    // host must profile MORE than the 7 base paths (the orphan-'&'
    // repair firing on it would collapse '/p/N&raw' back to '/p/N')
    assert(Fixtures.withUrls(Tables.documents(spark, sf))
      .filter(col("text").contains("&raw")).count() > 0)
    assert(rows.map(_.getAs[Long]("n_paths")).max > 7)
  }
}
