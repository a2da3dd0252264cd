package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full training-data preprocessing pipeline, fused: quality
  * filter → PII redaction → exact dedup → stratified sample →
  * per-stratum accounting.
  *
  * Every per-document signal — the Gopher keep decision, the scrubbed-
  * content digest, the PII hit count, sample membership — is a COLUMN
  * expression (TextAnalysis.gopherKeep / redact / piiCount,
  * Sampling.bucket100), so the narrow part of the pipeline is one fused
  * projection entirely inside whole-stage codegen. The only shuffles
  * are the dedup's digest aggregation (16-byte keys, not text) and the
  * final per-lang rollup; the canonical set joins back as a broadcast.
  * The executed plan touches the corpus twice (the dedup branch
  * re-derives (digest, id) on the join's build side) — at 100 TB you
  * checkpoint `enriched` once and both consumers read the narrow
  * columnar intermediate instead of re-scanning text.
  */
object Preprocess {

  /** End-to-end over the (PII-augmented) corpus; returns per-lang
    * accounting of what survived each gate. */
  def pipeline(s: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 60, "de" -> 30, "zh" -> 10)
    val rate = rates.foldLeft(lit(20)) { case (acc, (lang, pct)) =>
      when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    val t = col("text")
    // one projection computes every per-document signal; the PII
    // counts + scrub digest come from ONE fused native scan
    val pii = TextAnalysis.piiScan(s, t)
    val enriched = Fixtures.withPii(Tables.documents(s, dir)).select(
      col("doc_id"), col("lang"),
      TextAnalysis.gopherKeep(t).as("keep"),
      md5(pii.getField("redacted").cast("binary")).as("redacted_hash"),
      (pii.getField("n_urls") + pii.getField("n_emails") +
        pii.getField("n_ips") + pii.getField("n_phones")).as("n_pii"),
      (Sampling.bucket100(col("doc_id")) < rate).cast("long").as("in_sample"))
    // exact dedup on the REDACTED content: smallest doc_id per content
    // group survives; only (digest, id) pairs reach the exchange
    val canonical = enriched
      .groupBy(col("redacted_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("is_canonical"))
    enriched
      .join(canonical, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_quality"),
        sum(col("n_pii")).cast("long").as("n_pii_hits"),
        sum(coalesce(col("is_canonical"), lit(0L))).cast("long")
          .as("n_canonical"),
        sum(when(col("keep") === 1 &&
            coalesce(col("is_canonical"), lit(0L)) === 1 &&
            col("in_sample") === 1, 1L).otherwise(0L))
          .cast("long").as("n_final"))
  }
}
