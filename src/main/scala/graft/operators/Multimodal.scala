package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, plus a decode/feature-extract stage.
  *
  * The decode step is a STUB (no image/audio codecs in this container):
  * `fakeDecode` derives deterministic pseudo-features (byte length,
  * content digest, synthetic width/height/frames) from the bytes — but
  * the Spark-side plumbing is real: binary columns survive parquet
  * round-trips, the metadata struct is columnar-pruned, and the
  * feature-extract stage is a narrow per-row projection that partitions
  * like any 100 TB binary-asset scan (no shuffle, split by file ranges).
  * Swapping in a real codec is a one-function change behind the same
  * schema.
  */
object Multimodal {

  /** Manufacture a binary "asset" column from document text (utf-8
    * bytes) with typed metadata, then run the stubbed decode /
    * feature-extract. Output is flat + digest-based, so the oracle can
    * verify the plumbing end-to-end.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val asset = d.select(
      col("doc_id"),
      col("text").cast("binary").as("media_bytes"),
      struct(
        lit("image/fake").as("mime"),
        (pmod(col("doc_id"), lit(8)) * 64 + 64).as("width"),
        (pmod(col("doc_id"), lit(5)) * 64 + 64).as("height")).as("meta"))
    // --- stubbed decode: deterministic fake features from the bytes ---
    asset.select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("media_bytes")).cast("long").as("n_bytes"),
      md5(col("media_bytes")).as("content_digest"),
      // "frame sampling": one fake frame per 64 bytes, ≥1. floor() before
      // the cast: Spark ANSI casts double→int by truncation but other
      // engines round-to-nearest, so make the floor explicit.
      greatest(lit(1L), floor(length(col("media_bytes")) / 64).cast("long"))
        .as("n_frames"))
  }

  /** Frame-sample explode: the per-frame fan-out stage (1 row per fake
    * frame, capped) — the shape of video-frame extraction at scale,
    * where the explode multiplies rows before a repartition feeds the
    * GPU/feature stage. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val f = decodeFeatures(s, dir).filter(col("doc_id") < 20)
    f.select(col("doc_id"),
        explode(sequence(lit(0), least(col("n_frames") - 1, lit(7))))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit("#"),
          col("frame_idx").cast("string"))).as("frame_digest"))
  }
}
