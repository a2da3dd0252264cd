package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized-property tests over seeded generated corpora: the
  * invariants these pin must hold for ANY input, not just the fixture
  * tables — seeded `util.Random` keeps every run reproducible (no
  * scalatest-plus bridge in the dependency set, so generation is
  * hand-rolled rather than scalacheck-driven).
  */
class PropertySpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  /** A corpus of `n` docs over a tiny vocabulary, with every doc whose
    * id % 3 == 0 duplicated verbatim under id+10000 (formatting-noised:
    * uppercase + double spaces — normalizes identically). */
  private def corpus(seed: Long, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      val words = Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "), if (i % 2 == 0) "en" else "de")
    }
    val noisyDups = base.filter(_._1 % 3 == 0).map { case (id, text, lang) =>
      (id + 10000L, text.toUpperCase.replace(" ", "  "), lang)
    }
    (base ++ noisyDups).toDF("doc_id", "text", "lang")
  }

  test("clusterSplit properties: total partition, no straddle, deterministic") {
    Seq(1L, 7L, 42L).foreach { seed =>
      val docs = corpus(seed, 60)
      val split = Sampling.clusterSplit(docs).cache()
      try {
        // total: every document is assigned exactly one split
        assert(split.count() === docs.count(), s"seed $seed")
        assert(split.filter(!col("split").isin("train", "val", "test"))
          .count() === 0L, s"seed $seed")
        // no straddle: a canonical group lives in exactly one split
        assert(split.groupBy("canonical_id")
          .agg(countDistinct("split").as("k"))
          .filter(col("k") > 1).count() === 0L, s"seed $seed")
        // the noisy duplicate of doc i resolves to canonical i
        assert(split.filter(col("doc_id") >= 10000L)
          .filter(col("canonical_id") =!= col("doc_id") - 10000L)
          .count() === 0L, s"seed $seed")
        // determinism: a second evaluation assigns identical splits
        val again = Sampling.clusterSplit(docs).collect()
          .map(r => r.getLong(0) -> r.getString(3)).toMap
        split.collect().foreach(r =>
          assert(again(r.getLong(0)) === r.getString(3), s"seed $seed"))
      } finally split.unpersist()
    }
  }

  test("spanStrip properties: counts conserve, clones strip, uniques keep") {
    Seq(3L, 11L).foreach { seed =>
      val docs = corpus(seed, 40).drop("lang")
      val out = Dedup.spanStrip(docs).collect()
      out.foreach { r =>
        assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ===
          r.getAs[Long]("n_tokens"), s"seed $seed doc ${r.getLong(0)}")
      }
      // exact clone pairs (id%3==0 originals vs +10000 copies after
      // normalization differences — spanStrip tokenizes lowercase, so
      // the noisy copy IS span-identical): both sides lose every token
      // of any >=8-token doc
      val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
      byId.keys.filter(id => id >= 10000L).foreach { dupId =>
        val orig = byId(dupId - 10000L)
        if (orig.getAs[Long]("n_tokens") >= 8L) {
          assert(byId(dupId).getAs[Long]("n_kept") === 0L,
            s"seed $seed clone $dupId")
          assert(orig.getAs[Long]("n_kept") === 0L,
            s"seed $seed original ${dupId - 10000L}")
        }
      }
    }
  }

  test("bucket100 property: every bucket lands in [0, 100)") {
    val docs = corpus(13L, 80)
    val range = docs.select(Sampling.bucket100(col("doc_id")).as("b"))
      .agg(min("b"), max("b")).collect().head
    assert(range.getLong(0) >= 0L && range.getLong(1) < 100L)
  }
}
