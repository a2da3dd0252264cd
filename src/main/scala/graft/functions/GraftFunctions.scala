package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registry for graft's native Catalyst expressions. Operators call
  * `register` (idempotent) and reference the functions by name via
  * `call_function`; external users can instead attach
  * [[graft.GraftExtensions]] at session build time.
  */
object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim"    -> (es => CosineSimilarity(es(0), es(1))),
    "l2_sq"         -> (es => L2Squared(es(0), es(1))),
    "plane_sig"     -> (es => PlaneSignature(es(0), es(1))),
    "simhash60"     -> (es => SimHash60(es.head)),
    "md5_base60"    -> (es => Md5Base60(es.head)),
    // even-odd ray-cast against the geo8 octagon (see OctagonContains:
    // the declarative 8-edge CASE tree blew HotSpot's JIT method limit
    // inside the candidate join's condition)
    "octagon_contains" -> (es =>
      OctagonContains(es(0), es(1), es(2), es(3), es(4))),
    "minhash_sig16" -> (es => MinHashSig(es.head, 16)),
    // Spark ships bloom-filter expressions for its runtime join filters
    // but does not register them as SQL functions; graft exposes them
    // for explicit bloom pre-filters (incremental dedup's broadcast
    // membership sketch). bloom_agg(longCol, estItems, numBits) →
    // binary; bloom_might_contain(bf, longCol) → boolean.
    "bloom_agg" -> (es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1), es(2))),
    "bloom_might_contain" -> (es =>
      new org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es(0), es(1))),
    // Misra-Gries heavy-hitters sketch: mg_topk(strCol, capacity) →
    // map<string,bigint> of surviving counters (capacity must be a
    // literal — it sizes every task's constant-memory buffer)
    "mg_topk" -> (es => MisraGriesAgg(es(0),
      es(1).eval().asInstanceOf[Number].intValue)),
    // table-generating function (Generator): one output row per
    // n-token shingle, streamed — no per-document shingle array
    // streaming ordered-triple generator (rec6_lift3's combination
    // explode): one row per i<j<k triple of the sorted brand set
    "combo3_gen" -> (es => Combo3Generator(es.head)),
    "shingle_gen" -> (es => ShingleGenerator(es(0),
      es(1).eval().asInstanceOf[Number].intValue)),
    // native n-gram constructor: token_ngrams(tk, n [, wholeShort])
    // → array<string> of positional space-joined grams (one pass —
    // codegen-safe replacement for the transform/slice HOF form)
    "token_ngrams" -> (es => TokenNGrams(es(0),
      es(1).eval().asInstanceOf[Number].intValue,
      if (es.length > 2) es(2).eval().asInstanceOf[Boolean] else true)),
    // sliding-window minima over array<bigint> (winnowing selection)
    "rolling_min" -> (es => RollingMin(es(0),
      es(1).eval().asInstanceOf[Number].intValue)),
    // unigram-LM Viterbi segmentation of one word (tok11's kernel)
    "unigram_segment" -> (es => UnigramSegment(es.head)),
    // greedy longest-match WordPiece segmentation (tok10's kernel)
    "wordpiece_segment" -> (es => WordPieceSegment(es.head)),
    // CDC boundary positions: cdc_boundaries(text, mod) → array<int>
    // of 1-based end positions whose trailing 8-char window hash ≡ 0
    "cdc_boundaries" -> (es => CdcBoundaries(es(0),
      es(1).eval().asInstanceOf[Number].intValue)),
    // per-frame PCM energies: frame_energies(payload, flen) →
    // array<bigint> (mm9's kernel)
    "frame_energies" -> (es => FrameEnergies(es(0),
      es(1).eval().asInstanceOf[Number].intValue)),
    // Hilbert-curve key on the 16-bit grid (zorder2's kernel)
    "hilbert_key" -> (es => HilbertKey(es(0), es(1))),
    // fused PII battery: pii_scan(text) → struct(n_urls, n_emails,
    // n_ips, n_phones, redacted) — one call replaces 4 regex counts +
    // the 4-pass sequential scrub, match-for-match
    "pii_scan" -> (es => PiiScan(es.head)),
    // Gopher quality integer stats: gopher_scan(text) →
    // struct(n_words, sum_len, n_alpha, n_stop); ratios/rounding stay
    // in Catalyst so derived signals are structurally bit-equal
    "gopher_scan" -> (es => GopherScan(es.head)),
    // 26-letter histogram of the lowercased text: letter_counts(text)
    // → array<bigint>(26) — one pass, replaces charEntropy's 26-regex
    // battery bit-for-bit
    "letter_counts" -> (es => LetterCounts(es.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
