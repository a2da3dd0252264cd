package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture corpora for the near-duplicate detectors.
  *
  * The synthetic `documents` table has no near-duplicates (3-shingle
  * Jaccard between random word-salad docs is ~0.02), so the detectors
  * would correctly return nothing. To exercise them end-to-end the
  * fixture injects mutant copies — doc_id+1e6, first token dropped —
  * and the detectors must recover exactly those pairs. This lives in
  * the fixture layer, NOT inside the operators: production operators
  * take whatever corpus they are given.
  */
object Fixtures {

  /** documents ∪ first-token-dropped mutants of doc_id < 50. */
  def mutantDocs(s: SparkSession, dir: String): DataFrame =
    withMutants(Tables.documents(s, dir))

  def withMutants(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    val mut = base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), """^\S+\s*""", "").as("text"))
    base.unionByName(mut)
  }

  /** The bounded slice the all-pairs n-gram oracle verifies literally:
    * originals < 40 plus their mutants. */
  def mutantSlice(s: SparkSession, dir: String): DataFrame =
    mutantDocs(s, dir).filter(col("doc_id") < 40 ||
      (col("doc_id") >= 1000000L && col("doc_id") < 1000040L))

  /** Typo-grade slice for the CHARACTER-level fuzzy join: 30-char
    * lowercase prefixes of doc_id < 80, plus single-SUBSTITUTION
    * mutants ('z' at a key-derived position, doc_id+1e6) of the first
    * 40 and single-DELETION mutants (doc_id+2e6) of the rest — every
    * mutant is within edit distance 1 of its base, far below the d=2
    * join radius, while distinct word-salad prefixes sit far above it.
    * Pure key functions, so the DuckDB oracle rebuilds the same
    * strings. */
  def typoSlice(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).filter(col("doc_id") < 80)
      .select(col("doc_id"), substring(lower(col("text")), 1, 30).as("s"))
    val p = pmod(col("doc_id"), lit(15)) + lit(5) // edit position, 1-based
    val subs = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("s").substr(lit(1), p - 1), lit("z"),
          col("s").substr(p + 1, lit(100))).as("s"))
    val dels = base.filter(col("doc_id") >= 40)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("s").substr(lit(1), p - 1),
          col("s").substr(p + 1, lit(100))).as("s"))
    base.unionByName(subs).unionByName(dels)
  }

  /** Embedding corpus with injected semantic near-duplicates: vectors
    * with vec_id < 30 reappear under vec_id+1e6, same label, first
    * coordinate shifted by +0.01 — cosine ≈ 0.9999 to the original,
    * far above anything two distinct synthetic vectors reach.
    * [[Similarity.semDedup]] must drop exactly the mutants. */
  def embeddingMutants(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("embedding"))
    val mut = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        concat(array(get(col("embedding"), lit(0)) + lit(0.01)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    base.unionByName(mut)
  }

  /** Deterministic re-crawl batch against the full corpus as history:
    * every 5th document comes back byte-identical under a fresh doc_id
    * (the re-crawl case — a true duplicate) and every 7th comes back
    * with an appended edit marker (changed content — genuinely new).
    * [[Dedup.incremental]] must drop exactly the re-crawls. */
  def crawlBatch(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    base.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      .unionByName(
        base.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" edit v2")).as("text")))
  }

  /** Deterministic NEXT crawl snapshot of the documents corpus — the
    * crawl-over-crawl face of [[Profiling.snapshotDiff]]: every 5th
    * document disappears (removed), every remaining 7th comes back
    * with appended content (changed), every 11th also arrives under a
    * brand-new doc_id (added), everything else is byte-identical.
    * Pure key functions, so the DuckDB oracle rebuilds the identical
    * snapshot. */
  def crawlSnapshot(d: DataFrame): DataFrame = {
    val kept = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    kept.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .unionByName(kept.filter(pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("text", concat(col("text"), lit(" rev2"))))
      .unionByName(d.filter(pmod(col("doc_id"), lit(11)) === 0)
        .withColumn("doc_id", col("doc_id") + 4000000L))
  }

  /** Deterministic CDC batch against the orders snapshot: every
    * key ≡ 3 (mod 10) arrives as an update (re-priced, status 'U') and
    * every key ≡ 7 (mod 100) arrives again as a brand-new order under a
    * shifted key — the fixture face of [[Relational.merge1Upsert]]. */
  def orderUpdates(o: DataFrame): DataFrame = {
    o.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 2).cast("double")
          .as("o_totalprice"),
        lit("U").as("o_orderstatus"))
      .unionByName(
        o.filter(pmod(col("o_orderkey"), lit(100)) === 7)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"),
            lit("N").as("o_orderstatus")))
  }

  /** Deterministic synthetic-PII augmentation: appends an email, a URL,
    * a phone number and an IPv4 address derived from doc_id. The corpus
    * itself is PII-free word salad, so this is the fixture face of
    * [[TextAnalysis.piiRedact]] — the positions and values vary per
    * document, and the DuckDB oracle rebuilds the identical text. */
  /** Deterministic URL mix for the crawl-curation operators: every doc
    * gets one URL whose host (mixed case, optional www.), path, tracking
    * params (every 3rd doc) and fragment (every 4th doc) are pure
    * functions of doc_id — the corpus itself is URL-free, and the DuckDB
    * oracle rebuilds the same strings. */
  def withUrls(d: DataFrame): DataFrame = {
    val id = col("doc_id")
    val host = element_at(array(lit("Example.COM"), lit("www.News.example.org"),
      lit("CDN.media.example"), lit("shop.example.net")),
      (pmod(id, lit(4)) + 1).cast("int"))
    d.withColumn("text", concat(col("text"),
      lit(" see https://"), host, lit("/p/"), pmod(id, lit(7)).cast("string"),
      // a literal '&' INSIDE the path with no query string — the case
      // an overeager orphan-'&' repair would corrupt into '?raw'
      when(pmod(id, lit(11)) === 2, lit("&raw")).otherwise(lit("")),
      when(pmod(id, lit(3)) === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"),
          pmod(id, lit(5)).cast("string")))
        // utm FIRST then a real param — the orphaned-'&' shape the
        // normalizer must repair to '?page=N'
        .when(pmod(id, lit(5)) === 1,
          concat(lit("?utm_medium=email&page="),
            pmod(id, lit(7)).cast("string")))
        .otherwise(lit("")),
      when(pmod(id, lit(4)) === 0, lit("#frag")).otherwise(lit(""))))
  }

  def withPii(d: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    d.withColumn("text", concat(col("text"),
      lit(" contact user"), id, lit("@example.com via https://site"), id,
      lit(".example/path or call 555-01"),
      lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
      lit(" from 10.0."), pmod(col("doc_id"), lit(255)).cast("string"), lit(".7")))
  }
}
