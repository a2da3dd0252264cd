package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling and contract validation — the quality gate every
  * large-scale ingest pipeline runs BEFORE training-data curation:
  * first profile what actually landed (null rates, cardinalities,
  * ranges), then assert the data contract (typed rules with violation
  * counts) so a bad upstream drop fails loudly instead of silently
  * poisoning the mixture downstream.
  *
  * Scale shape: both operators are single-scan multi-aggregates — every
  * statistic is a conditional count/sum/min/max folded in one pass with
  * map-side partial aggregation, and only the final one-row (profile)
  * or rules-row frame leaves the executors. The exact multi-column
  * `count(DISTINCT ...)` in the profiler plans through Catalyst's
  * Expand (one extra projected pass per distinct column, still a single
  * scan); at 100 TB swap exact distincts for `approx_count_distinct`
  * (the HLL face stat2 already covers) — the wide pivot-to-long shape
  * stays identical.
  */
object Profiling {

  /** Crawl-over-crawl snapshot diff — the corpus-lifecycle report
    * every recurring ingestion runs before promoting a new snapshot:
    * per (source, change_type) document counts, where change_type ∈
    * added (new doc_id), removed (doc_id gone), changed (same doc_id,
    * different content hash), unchanged. Content comparison is by md5
    * computed BEFORE the join, so only (doc_id, source, 32-char hash)
    * rows shuffle — never the text — and the full-outer join
    * co-partitions on doc_id; at 100 TB this is one narrow shuffle of
    * key+hash per side regardless of document size. The md5 is
    * engine-portable (lowercase hex both engines), so the oracle
    * replays the classification bit-for-bit on the rebuilt fixture
    * snapshot ([[Fixtures.crawlSnapshot]]). */
  def snapshotDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val o = old.select(col("doc_id"), col("source").as("osource"),
      md5(col("text")).as("oh"))
    val n = neu.select(col("doc_id"), col("source").as("nsource"),
      md5(col("text")).as("nh"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(coalesce(col("osource"), col("nsource")).as("source"),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") =!= col("nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"))
      .groupBy(col("source"), col("change_type"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Per-column profile of the documents table in long format:
    * (column, n_rows, n_null, n_distinct, min_str, max_str,
    * avg_len_micros). One aggregate row computes all 5×4 statistics in
    * a single scan, then a `stack` unpivots it to one row per column.
    *
    * Determinism: min/max are computed in each column's NATIVE type
    * (numeric min, not string min) and cast to string only for the
    * uniform report schema; avg_len is Σlength/(non-null count) — two
    * exact integer aggregates and one IEEE divide on exact inputs,
    * micro-quantized.
    */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_null"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"),
        sum(length(col(c).cast("string")).cast("long")).as(s"${c}_len"))
    }
    val one = d.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', ${c}_rows, ${c}_null, ${c}_distinct, " +
        s"${c}_min, ${c}_max, ${c}_len")
      .mkString(", ")
    one
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_null, n_distinct, min_str, max_str, sum_len)"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"),
        round(lit(1e6) * col("sum_len").cast("double") /
          (col("n_rows") - col("n_null"))).cast("long").as("avg_len_micros"))
  }

  /** Data-contract validation: named boolean rules over the documents
    * table, each reported as (rule, n_checked, n_violations, pass).
    * Row-level rules fold as conditional sums in ONE aggregate over one
    * scan; the table-level uniqueness rule derives from the same pass
    * (n_rows − n_distinct keys). A rule on a NULL operand counts as a
    * violation (explicit null-safe predicates below) — contracts fail
    * closed, never silently skip.
    */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val langs = Seq("en", "de", "fr", "es", "zh")
    def viol(okWhenNonNull: Column, c: Column): Column =
      sum(when(c.isNull || !okWhenNonNull, 1L).otherwise(0L))
    val one = d.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("v_id_null"),
      countDistinct(col("doc_id")).as("id_distinct"),
      viol(length(col("text")) > 0, col("text")).as("v_text_empty"),
      viol(col("lang").isin(langs.map(lit): _*), col("lang")).as("v_lang"),
      viol(col("source").rlike("^src[0-9]+$"), col("source")).as("v_source"),
      viol(col("n_chars") === length(col("text")), col("n_chars"))
        .as("v_chars"))
    one
      .select(expr("""stack(6,
        'doc_id_not_null',  n_rows, v_id_null,
        'doc_id_unique',    n_rows, n_rows - id_distinct,
        'text_non_empty',   n_rows, v_text_empty,
        'lang_in_contract', n_rows, v_lang,
        'source_pattern',   n_rows, v_source,
        'n_chars_matches',  n_rows, v_chars)
        AS (rule, n_checked, n_violations)"""))
      .select(col("rule"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Population-stability-index (PSI) drift check on the `lang`
    * distribution between two deterministic halves of the corpus
    * (md5-bucket < 50 = reference, else current) — the monitor a
    * production ingest runs between yesterday's and today's landing to
    * catch a mixture shift before it poisons training. Per-category
    * term (p−q)·ln(p/q) with +0.5 Laplace smoothing (a category absent
    * from one half must contribute a large finite term, not ±∞), plus
    * the total over categories.
    *
    * Scale shape: one data-sized conditional aggregation (groupBy lang,
    * map-side combined); the margins and total fold over the ≤|cats|
    * result rows via windows. Determinism: counts are exact longs, the
    * smoothed ratios are fixed-shape IEEE expressions, terms round to
    * integer micro-nats before the total sum. */
  def driftPsi(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(s, dir)
      .select(col("lang"),
        (Sampling.bucket100(col("doc_id")) < 50).as("is_ref"))
      .groupBy(col("lang")).agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
    val withTotals = cells
      .withColumn("tot_ref", sum(col("n_ref")).over(all))
      .withColumn("tot_cur", sum(col("n_cur")).over(all))
      .withColumn("k", count(lit(1)).over(all))
    val p = (col("n_ref").cast("double") + lit(0.5)) /
      (col("tot_ref").cast("double") + lit(0.5) * col("k"))
    val q = (col("n_cur").cast("double") + lit(0.5)) /
      (col("tot_cur").cast("double") + lit(0.5) * col("k"))
    withTotals
      .withColumn("term_micronats",
        round(lit(1e6) * (p - q) * log(p / q)).cast("long"))
      .withColumn("psi_total_micronats",
        sum(col("term_micronats")).over(all))
      .select(col("lang"), col("n_ref"), col("n_cur"),
        col("term_micronats"), col("psi_total_micronats"))
  }

  /** χ² independence test + Cramér's V of lang × source — the
    * bounded-[0,1] companion to [[mutualInfo]] (MI is unbounded, so
    * dashboards threshold V instead): χ² = Σ (N·n_xy − n_x·n_y)² /
    * (N·n_x·n_y), V = √(χ² / (N·min(r−1, c−1))). The grid COMPLETES
    * with zero cells before the sum (a (lang, source) combination that
    * never co-occurs still has positive expectation — dropping it
    * biases χ² toward independence, the ev14 lesson).
    *
    * Scale shape: one data-sized (lang, source) aggregation; the grid
    * completion is a ≤(r·c)-row broadcast cross of the two margin
    * frames. Determinism: the χ² numerator/denominator are exact
    * integer products (bounded by N⁴ — fine for any N < ~50k cells·
    * counts; at larger N swap the term to the double form, same
    * output to 6dp), each cell term micro-rounds before the total. */
  def cramersV(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
    val obs = d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_obs"))
    val langs = d.groupBy(col("lang")).agg(count(lit(1)).as("n_x"))
    val srcs = d.groupBy(col("source")).agg(count(lit(1)).as("n_y"))
    val all = Window.partitionBy(lit(1))
    // grid dims ride along as a broadcast 1-row frame (a DISTINCT
    // window is unsupported; these are margin-frame counts anyway)
    val dims = broadcast(langs.agg(count(lit(1)).as("r"))
      .crossJoin(srcs.agg(count(lit(1)).as("c"))))
    broadcast(langs).crossJoin(broadcast(srcs))
      .join(obs, Seq("lang", "source"), "left")
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
      .crossJoin(dims)
      .select(col("lang"), col("source"), col("n_x"), col("n_y"),
        coalesce(col("n_obs"), lit(0L)).as("n_xy"), col("n"),
        (least(col("r"), col("c")) - 1L).as("k"))
      .withColumn("term_micros",
        round(lit(1e6) *
          ((col("n") * col("n_xy") - col("n_x") * col("n_y")) *
            (col("n") * col("n_xy") - col("n_x") * col("n_y")))
            .cast("double") /
          (col("n") * col("n_x") * col("n_y")).cast("double"))
          .cast("long"))
      .withColumn("chi2_micros", sum(col("term_micros")).over(all))
      .select(col("lang"), col("source"), col("n_xy"), col("term_micros"),
        col("chi2_micros"),
        round(lit(1e6) * sqrt((col("chi2_micros").cast("double") / 1e6) /
          (col("n") * col("k")).cast("double"))).cast("long")
          .as("v_micros"))
  }

  /** Mutual information between `lang` and `source` — the dependence
    * profile between two categorical columns (0 ⇔ independent): for
    * each joint cell, term = (n_xy/N)·ln(N·n_xy / (n_x·n_y)), summed to
    * the total MI in nats. A curation pipeline uses this to detect when
    * a "random" source split is secretly language-skewed.
    *
    * Scale shape: one data-sized (lang, source) aggregation; margins
    * are window sums over the ≤|cells| frame, never a second scan.
    * Determinism: all counts exact longs, terms round to micro-nats
    * before the window total. */
  def mutualInfo(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_xy"))
    val all = Window.partitionBy(lit(1))
    cells
      .withColumn("n_x",
        sum(col("n_xy")).over(Window.partitionBy(col("lang"))))
      .withColumn("n_y",
        sum(col("n_xy")).over(Window.partitionBy(col("source"))))
      .withColumn("n_all", sum(col("n_xy")).over(all))
      .withColumn("term_micronats",
        round(lit(1e6) *
          (col("n_xy").cast("double") / col("n_all")) *
          log(col("n_xy").cast("double") * col("n_all") /
            (col("n_x").cast("double") * col("n_y")))).cast("long"))
      .withColumn("mi_total_micronats",
        sum(col("term_micronats")).over(all))
      .select(col("lang"), col("source"), col("n_xy"),
        col("term_micronats"), col("mi_total_micronats"))
  }

  /** Shared score/label frame for the classifier-evaluation metrics:
    * score = Σ of the first 8 embedding dims in integer micros, binned
    * to 1e3-micro resolution (the standard distributed-AUC contract —
    * Spark MLlib's BinaryClassificationMetrics bins the same way:
    * exact ranking over raw fp scores needs a global sort over
    * near-unique keys, binned scores aggregate map-side to a bounded
    * frame); label = embeddings.label mod 2. Bin division goes through
    * floor on a double (|score| ≤ 8e6 — exact) so negative scores bin
    * identically in any engine. */
  /** THE shared classifier score (Σ of the first 8 embedding dims in
    * integer micros) used by every ml1x metric — one definition on the
    * Spark side to mirror the single $embScoreSql on the oracle side;
    * a change here must change there, and nowhere else. */
  private def embScore: Column = (0 until 8)
    .map(k => round(col("embedding")(k).cast("double") * 1e6).cast("long"))
    .reduce(_ + _)

  private def scoreBins(s: SparkSession, dir: String): DataFrame = {
    val score = embScore
    Tables.embeddings(s, dir)
      .select(floor(score.cast("double") / 1000.0).cast("long").as("bin"),
        (col("label") % 2).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("np"),
        sum(lit(1L) - col("y")).as("nn"))
  }

  /** Exact ROC AUC over the binned score frame via the Mann–Whitney
    * rank-sum identity: AUC = (Σ_pairs [s⁺ > s⁻] + ½[s⁺ = s⁻]) /
    * (N⁺·N⁻), computed WITHOUT enumerating pairs — per score bin,
    * positives beat every negative in a strictly lower bin and tie the
    * negatives sharing their bin, so u2 = Σ_bins np·(2·cum_nn_below +
    * nn) counts doubled wins exactly.
    *
    * Scale shape: one data-sized aggregation (groupBy bin, map-side
    * combined to ≤|bins| partials), then cumulative windows over the
    * bin frame — bounded by bin count, not data. Determinism: every
    * sum is an exact integer sum; the single IEEE divide happens on
    * exact longs at the end, micro-rounded. */
  def rocAuc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBelow = Window.partitionBy(lit(1)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    scoreBins(s, dir)
      .withColumn("cum_nn_below",
        coalesce(sum(col("nn")).over(wBelow), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cum_nn_below") + col("nn")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(lit(1e6) * col("u2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .cast("long").as("auc_micros"))
  }

  /** The ROC curve behind [[rocAuc]]: one operating point per distinct
    * score bin, thresholding at "predict positive when bin ≥ t" —
    * cumulative TP/FP from the high end plus micro-quantized TPR/FPR.
    * Same bounded bin frame as the AUC; the threshold sweep is two
    * cumulative windows, not |thresholds| passes over the data. */
  def rocPoints(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAbove = Window.partitionBy(lit(1)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    scoreBins(s, dir)
      .withColumn("cum_tp", sum(col("np")).over(wAbove))
      .withColumn("cum_fp", sum(col("nn")).over(wAbove))
      .withColumn("n_pos", sum(col("np")).over(all))
      .withColumn("n_neg", sum(col("nn")).over(all))
      .select(col("bin").as("threshold_bin"), col("cum_tp"), col("cum_fp"),
        round(lit(1e6) * col("cum_tp").cast("double") /
          col("n_pos").cast("double")).cast("long").as("tpr_micros"),
        round(lit(1e6) * col("cum_fp").cast("double") /
          col("n_neg").cast("double")).cast("long").as("fpr_micros"))
  }

  /** Precision–recall curve + average precision over the same binned
    * score frame as [[rocAuc]] — the ranking metric that matters when
    * positives are rare (a curation classifier fishing 1% good docs
    * out of a crawl lives on PR, not ROC: ROC's FPR denominator is the
    * huge negative class, so a flood of false accepts barely moves
    * it). One operating point per score bin, thresholding "accept when
    * bin ≥ t"; AP is the step-interpolated Σ ΔR·P over descending
    * thresholds.
    *
    * Scale shape: identical to [[rocAuc]] — one data-sized map-side-
    * combined aggregation to the bounded bin frame, then cumulative
    * windows over bins. Determinism: per-bin precision quantizes to
    * micros BEFORE the AP sum, so the only cross-row folds are exact
    * integer sums; one IEEE divide per output value. */
  def prAuc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAbove = Window.partitionBy(lit(1)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    scoreBins(s, dir)
      .withColumn("cum_tp", sum(col("np")).over(wAbove))
      .withColumn("cum_fp", sum(col("nn")).over(wAbove))
      .withColumn("n_pos", sum(col("np")).over(all))
      .withColumn("prec_micros",
        round(lit(1e6) * col("cum_tp").cast("double") /
          (col("cum_tp") + col("cum_fp")).cast("double")).cast("long"))
      .withColumn("ap_micros",
        round(sum(col("np") * col("prec_micros")).over(all).cast("double") /
          col("n_pos").cast("double")).cast("long"))
      .select(col("bin").as("threshold_bin"), col("cum_tp"), col("cum_fp"),
        col("prec_micros"),
        round(lit(1e6) * col("cum_tp").cast("double") /
          col("n_pos").cast("double")).cast("long").as("recall_micros"),
        col("ap_micros"))
  }

  /** F1-optimal decision threshold — the step that turns the ml10-17
    * RANKING metrics into a deployable classifier: sweep every score
    * bin as the accept cutoff, compute F1 from exact cumulative
    * counts, keep the argmax (ties to the lower bin). One row out:
    * the chosen threshold with its confusion counts and P/R/F1.
    *
    * Scale shape: the same bounded bin frame as [[rocAuc]]; the sweep
    * is two cumulative windows, the argmax one row_number. F1 =
    * 2tp/(2tp+fp+fn) stays in exact longs until one final micro-round
    * per metric. */
  def thresholdOpt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAbove = Window.partitionBy(lit(1)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    val pick = Window.partitionBy(lit(1))
      .orderBy(col("f1_micros").desc, col("bin").asc)
    scoreBins(s, dir)
      .withColumn("tp", sum(col("np")).over(wAbove))
      .withColumn("fp", sum(col("nn")).over(wAbove))
      .withColumn("fn", sum(col("np")).over(all) - col("tp"))
      .withColumn("f1_micros",
        round(lit(1e6) * (lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .cast("long"))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("bin").as("threshold_bin"), col("tp"), col("fp"),
        col("fn"),
        round(lit(1e6) * col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double")).cast("long")
          .as("precision_micros"),
        round(lit(1e6) * col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double")).cast("long")
          .as("recall_micros"),
        col("f1_micros"))
  }

  /** Calibration / reliability profile of a probabilistic classifier —
    * the companion check to [[rocAuc]] (AUC measures ranking,
    * calibration measures whether p=0.8 MEANS 80%): predicted
    * probability p = σ(score/1e6) micro-quantizes, bins into deciles,
    * and each bin reports mean predicted vs empirical positive rate
    * plus its |gap|; the expected calibration error
    * ECE = Σ nᵦ/N·|meanᵦ−fracᵦ| rides along as a total column.
    *
    * Scale shape: one data-sized aggregation to ≤10 bins (map-side
    * combined), the ECE a window fold over the bin frame. Determinism:
    * p quantizes to micros per row BEFORE any aggregation, so every
    * cross-row sum is an exact integer sum (the σ itself is one exp +
    * divide — a fixed IEEE sequence, the ml9 precedent); gaps are
    * integer, and the single ECE divide runs on exact longs. */
  def calibrationBins(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val score = embScore
    val p = lit(1.0) / (lit(1.0) + exp(-(score.cast("double") / lit(1e6))))
    val all = Window.partitionBy(lit(1))
    Tables.embeddings(s, dir)
      .select(round(lit(1e6) * p).cast("long").as("pm"),
        (col("label") % 2).cast("long").as("y"))
      .withColumn("bin",
        least(floor(col("pm").cast("double") / 100000.0).cast("long"),
          lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pm")).as("sum_pm"),
        sum(col("y")).as("n_pos"))
      .withColumn("mean_p_micros",
        round(col("sum_pm").cast("double") / col("n")).cast("long"))
      .withColumn("frac_pos_micros",
        round(lit(1e6) * col("n_pos").cast("double") / col("n"))
          .cast("long"))
      .withColumn("gap_micros",
        abs(col("mean_p_micros") - col("frac_pos_micros")))
      .withColumn("ece_micros",
        round(sum(col("n") * col("gap_micros")).over(all).cast("double") /
          sum(col("n")).over(all)).cast("long"))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_p_micros"),
        col("frac_pos_micros"), col("gap_micros"), col("ece_micros"))
  }

  /** `ml23_isotonic` — isotonic (monotone non-decreasing) calibration
    * of the ml12 sigmoid scores via the MINIMAX identity: the isotonic
    * least-squares fit at bin i equals max_{j≤i} min_{k≥i} wavg(j..k)
    * (Ayer et al. 1955) — the closed form of what PAVA computes by
    * sequential pooling, restated as pure joins/aggregations because
    * pool-adjacent-violators is inherently sequential and a shuffle
    * engine wants set algebra, not a scan. The spec proves the
    * identity by replaying classic PAVA driver-side and asserting
    * bit-equality.
    *
    * Monotone-rounding argument (why quantizing EARLY is exact here):
    * round is nondecreasing, and min/max commute with any
    * nondecreasing function, so max_j min_k round(1e6·w(j,k)) =
    * round(1e6 · max_j min_k w(j,k)) — the integer minimax over
    * micro-quantized interval averages IS the micro-quantized exact
    * fit, not an approximation of it.
    *
    * Scale shape: one data-sized map-side-combinable rollup to K = 32
    * probability bins; the (j,k) interval frame is K(K+1)/2 = 528
    * rows and the minimax triple ~K³/6 — driver-free, broadcast-only
    * joins over model-sized frames, same class as the ALS normal
    * equations. Output per bin: count, positives, raw rate, isotonic
    * rate. */
  def isotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val score = embScore
    val p = lit(1.0) / (lit(1.0) + exp(-(score.cast("double") / lit(1e6))))
    val all = Window.partitionBy(lit(1)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = Tables.embeddings(s, dir)
      .select(round(lit(1e6) * p).cast("long").as("pm"),
        (col("label") % 2).cast("long").as("y"))
      .withColumn("bin",
        least(floor(col("pm").cast("double") / 31250.0).cast("long"),
          lit(31L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .withColumn("cn", sum(col("n")).over(all))
      .withColumn("cp", sum(col("pos")).over(all))
      .localCheckpoint(true) // K-row model frame, reused three ways
    val j = cells.select(col("bin").as("jb"), col("n").as("jn"),
      col("pos").as("jp"), col("cn").as("jcn"), col("cp").as("jcp"))
    val k = cells.select(col("bin").as("kb"), col("cn").as("kcn"),
      col("cp").as("kcp"))
    // interval j..k weighted average in micros, exact integers in
    val ivals = j.join(k, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        round(lit(1e6) *
          (col("kcp") - col("jcp") + col("jp")).cast("double") /
          (col("kcn") - col("jcn") + col("jn")).cast("double"))
          .cast("long").as("wavg"))
    val i = cells.select(col("bin"), col("n"), col("pos"))
    val inner = i.join(ivals,
        col("jb") <= col("bin") && col("kb") >= col("bin"))
      .groupBy(col("bin"), col("jb")).agg(min(col("wavg")).as("mn"))
    val iso = inner.groupBy(col("bin")).agg(max(col("mn")).as("iso_micros"))
    i.join(iso, "bin")
      .select(col("bin"), col("n"), col("pos").as("n_pos"),
        round(lit(1e6) * col("pos").cast("double") /
          col("n").cast("double")).cast("long").as("raw_micros"),
        col("iso_micros"))
  }

  /** `stat34_mcnemar` — McNemar's paired test (1947) comparing two
    * classifiers on the SAME examples: classifier A = the shared
    * ml1x score (dims 1–8), classifier B = the same construction on
    * dims 9–16, both thresholded at 0. Accuracy deltas on paired
    * predictions are driven ONLY by the discordant cells — b (A
    * right, B wrong) and c (A wrong, B right) — and the continuity-
    * corrected statistic (|b−c|−1)²/(b+c) is χ²₁ under exchangeable
    * disagreement. The unpaired-test mistake (treating the two
    * accuracy estimates as independent samples) overstates n by the
    * concordant mass; this face is the correct pairing.
    *
    * Scale shape: one narrow projection + one 1-row aggregation —
    * four integer cell counts, one quantized divide. */
  def mcnemar(s: SparkSession, dir: String): DataFrame = {
    val scoreB = (8 until 16)
      .map(k => round(col("embedding")(k).cast("double") * 1e6)
        .cast("long"))
      .reduce(_ + _)
    Tables.embeddings(s, dir)
      .select((col("label") % 2).cast("long").as("y"),
        when(embScore > 0, 1L).otherwise(0L).as("pa"),
        when(scoreB > 0, 1L).otherwise(0L).as("pb"))
      .select(col("y"),
        (col("pa") === col("y")).cast("long").as("ra"),
        (col("pb") === col("y")).cast("long").as("rb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ra") === 1 && col("rb") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("ra") === 0 && col("rb") === 1, 1L).otherwise(0L))
          .as("c"))
      .select(col("n"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          round(lit(1e6) *
            (abs(col("b") - col("c")) - 1L).cast("double") *
            (abs(col("b") - col("c")) - 1L).cast("double") /
            (col("b") + col("c")).cast("double")).cast("long"))
          .otherwise(0L).as("chi2_micros"))
  }

  /** `stat35_cohens_kappa` — Cohen's κ (1960) between [[mcnemar]]'s
    * two classifiers: chance-corrected agreement. Raw agreement p_o
    * flatters any pair that both predict the majority class; κ
    * subtracts the agreement p_e the marginals would produce by
    * chance, κ = (p_o − p_e)/(1 − p_e). Computed from the four
    * integer cells of the A×B prediction contingency table — one
    * aggregation, exact until the two quantized divides.
    *
    * Scale shape: identical to [[mcnemar]] — narrow projection, one
    * 1-row rollup. */
  def cohensKappa(s: SparkSession, dir: String): DataFrame = {
    val scoreB = (8 until 16)
      .map(k => round(col("embedding")(k).cast("double") * 1e6)
        .cast("long"))
      .reduce(_ + _)
    Tables.embeddings(s, dir)
      .select(when(embScore > 0, 1L).otherwise(0L).as("pa"),
        when(scoreB > 0, 1L).otherwise(0L).as("pb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pa") === col("pb"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(col("pa")).as("a1"), sum(col("pb")).as("b1"))
      .select(col("n"), col("n_agree"),
        round(lit(1e6) * col("n_agree").cast("double") /
          col("n").cast("double")).cast("long").as("po_micros"),
        round(lit(1e6) *
          (col("a1").cast("double") * col("b1").cast("double") +
            (col("n") - col("a1")).cast("double") *
            (col("n") - col("b1")).cast("double")) /
          (col("n").cast("double") * col("n").cast("double")))
          .cast("long").as("pe_micros"),
        round(lit(1e6) *
          (col("n_agree").cast("double") / col("n").cast("double") -
            (col("a1").cast("double") * col("b1").cast("double") +
              (col("n") - col("a1")).cast("double") *
              (col("n") - col("b1")).cast("double")) /
            (col("n").cast("double") * col("n").cast("double"))) /
          (lit(1.0) -
            (col("a1").cast("double") * col("b1").cast("double") +
              (col("n") - col("a1")).cast("double") *
              (col("n") - col("b1")).cast("double")) /
            (col("n").cast("double") * col("n").cast("double"))))
          .cast("long").as("kappa_micros"))
  }

  /** `stat38_friedman` — Friedman's rank test (1937) across THREE
    * paired score projections per embedding row, completing the
    * paired-comparison ladder: [[mcnemar]] handles 2 paired binary
    * outcomes, stat37's Wilcoxon 2 paired continuous ones, Friedman
    * k ≥ 3 (it is the nonparametric repeated-measures ANOVA, and the
    * standard first step of the Demšar classifier-comparison
    * protocol). Treatments: score A = dims 1-8 (the shared ml1x
    * projection), B = dims 9-16 (the stat34 twin), C = the even dims.
    * Within each row the three scores get average ranks carried as
    * exact integers by stat37's doubled-rank identity (here computed
    * by pairwise CASE comparison — no window needed for k = 3), and
    * the tie-corrected statistic
    * χ² = (k−1)·Σⱼ(Pⱼ−n(k+1))² / (Σᵢⱼρ²ᵢⱼ − nk(k+1)²) is a ratio of
    * two INTEGERS in doubled-rank space (the 4× factors cancel), so
    * the only double is the final quantized divide.
    *
    * Scale shape: one narrow projection + one map-side-combined 1-row
    * rollup over (ρ₁, ρ₂, ρ₃, Σρ²) — no shuffle wider than the
    * 4-long partials, no window, no join. */
  def stat38Friedman(s: SparkSession, dir: String): DataFrame = {
    val scoreC = (0 until 16 by 2)
      .map(k => round(col("embedding")(k).cast("double") * 1e6)
        .cast("long"))
      .reduce(_ + _)
    val scoreB = (8 until 16)
      .map(k => round(col("embedding")(k).cast("double") * 1e6)
        .cast("long"))
      .reduce(_ + _)
    def lt(a: Column, b: Column): Column =
      when(a < b, 1L).otherwise(0L)
    def eq(a: Column, b: Column): Column =
      when(a === b, 1L).otherwise(0L)
    // doubled average rank of x among {x, o1, o2}:
    // 2*(1 + #{others < x}) + #{others == x}  (+1 -1 cancel)
    def rho(x: Column, o1: Column, o2: Column): Column =
      lit(2L) * (lit(1L) + lt(o1, x) + lt(o2, x)) + eq(o1, x) + eq(o2, x)
    val m = Tables.embeddings(s, dir)
      .select(embScore.as("m1"), scoreB.as("m2"), scoreC.as("m3"))
      .select(rho(col("m1"), col("m2"), col("m3")).as("r1"),
        rho(col("m2"), col("m1"), col("m3")).as("r2"),
        rho(col("m3"), col("m1"), col("m2")).as("r3"))
      .agg(count(lit(1)).as("n"),
        sum(col("r1")).as("p1"), sum(col("r2")).as("p2"),
        sum(col("r3")).as("p3"),
        sum(col("r1") * col("r1") + col("r2") * col("r2") +
          col("r3") * col("r3")).as("ssq"))
    def sq(c: Column): Column = c * c
    m.select(col("n"), col("p1"), col("p2"), col("p3"),
      round(lit(1e6) * lit(2L) *
        (sq(col("p1") - col("n") * 4L) + sq(col("p2") - col("n") * 4L) +
          sq(col("p3") - col("n") * 4L)).cast("double") /
        (col("ssq") - col("n") * 48L).cast("double"))
        .cast("long").as("chi2_micros"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic on the `n_chars`
    * distribution between the md5-split halves — the numeric-drift
    * companion to [[driftPsi]]'s categorical check:
    * D = max over v of |F_A(v) − F_B(v)|. ENTIRELY exact integer
    * arithmetic until the final report: the max runs over
    * |cumA·nB − cumB·nA| (longs), so the argmax value and numerator
    * are engine-independent by construction, not by fp luck.
    *
    * Scale shape: one data-sized groupBy(n_chars) (map-side combined
    * to ≤|distinct values| partials), then cumulative windows over the
    * value-frame — distinct-value-sized, not data-sized; the final
    * reduce emits one row. */
  def ksTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir).select(col("n_chars"),
      (Sampling.bucket100(col("doc_id")) < 50).as("is_a"))
    val cells = d.groupBy(col("n_chars")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val wcum = Window.partitionBy(lit(1)).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    val cum = cells
      .withColumn("cum_a", sum(col("ca")).over(wcum))
      .withColumn("cum_b", sum(col("cb")).over(wcum))
      .withColumn("n_a", sum(col("ca")).over(all))
      .withColumn("n_b", sum(col("cb")).over(all))
      .withColumn("diff",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
    val dnum = cum.agg(max(col("diff")).as("d_num"),
      max(col("n_a")).as("na"), max(col("n_b")).as("nb"))
    cum.select(col("n_chars"), col("diff"))
      .crossJoin(broadcast(dnum))
      .filter(col("diff") === col("d_num"))
      .groupBy(col("na"), col("nb"), col("d_num"))
      .agg(min(col("n_chars")).as("v_at_max"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
        (col("na") * col("nb")).as("d_denom"), col("v_at_max"),
        round(lit(1e6) * col("d_num").cast("double") /
          (col("na") * col("nb"))).cast("long").as("d_micros"))
  }

  /** Binary confusion matrix + derived metrics for the shared
    * embedding classifier (score > 0 ⇒ positive, same integer-micro
    * score ml10–ml12 rank and calibrate): TP/FP/FN/TN counts, then
    * precision, recall, F1, accuracy — the eval row every model
    * comparison table starts from.
    *
    * Scale shape: a single scan + one 4-cell aggregation (map-side
    * partials). Determinism: cells are exact integer sums; each metric
    * is a FIXED IEEE expression over those longs (the F1 reuses the
    * same two divides), mirrored verbatim by the oracle, 6dp-rounded. */
  def confusion(s: SparkSession, dir: String): DataFrame = {
    val score = embScore
    val cells = Tables.embeddings(s, dir)
      .select((score > 0).as("pred"), (col("label") % 2 === 1).as("y"))
      .agg(
        sum(when(col("pred") && col("y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("y"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("y"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("y"), 1L).otherwise(0L)).as("tn"))
    val p = col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
    val r = col("tp").cast("double") / (col("tp") + col("fn")).cast("double")
    cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round(p, 6).as("precision"),
      round(r, 6).as("recall"),
      round(lit(2.0) * p * r / (p + r), 6).as("f1"),
      round((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"), 6)
        .as("accuracy"))
  }

  /** Frequent categorical values across the lake's low-cardinality
    * columns (support ≥ 1%) — the profile row a catalog page shows per
    * column. Exact counting (these columns are genuinely
    * low-cardinality; for an unbounded column swap in the Misra–Gries
    * UDAF the heavy-hitters query already carries). Support is an
    * exact integer floor division; the ≥1% gate compares 100·n ≥ N in
    * integers. */
  def freqItems(s: SparkSession, dir: String): DataFrame = {
    def top(df: org.apache.spark.sql.DataFrame, c: String,
            tag: String): org.apache.spark.sql.DataFrame =
      df.groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("tot"))))
        .filter(col("n") * 100L >= col("tot"))
        .select(lit(tag).as("column_name"), col("value"), col("n"),
          expr("(1000000 * n) div tot").as("support_micros"))
    top(Tables.events(s, dir), "event_type", "events.event_type")
      .unionAll(top(Tables.documents(s, dir), "lang", "documents.lang"))
      .unionAll(top(Tables.documents(s, dir), "source", "documents.source"))
  }

  /** Per-dimension PSI drift of the first 8 embedding dims between the
    * two label groups — feature-level drift (prof3 is
    * distribution-level): each dim bins into 10 fixed-width cells over
    * [−0.5, 0.5] (clamped), then the prof3 smoothed-PSI math runs per
    * dim. A dim with high PSI separates the classes — the same table
    * doubles as a univariate feature-importance screen.
    *
    * Scale shape: the 8-dim explode is row-local; ONE (dim, bin)
    * aggregation; margins are windows per dim over the ≤80-cell frame.
    * Same micro-nat term quantization as prof3. */
  def dimDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
    val rows = (0 until 8).map { k =>
      e.select(lit(k.toLong).as("dim"),
        least(greatest(floor((col("embedding")(k).cast("double") +
          lit(0.5)) * 10).cast("long"), lit(0L)), lit(9L)).as("bin"),
        (col("label") % 2 === 0).as("is_ref"))
    }.reduce(_ unionAll _)
    val cells = rows.groupBy(col("dim"), col("bin")).agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    val perDim = Window.partitionBy(col("dim"))
    val withTotals = cells
      .withColumn("tot_ref", sum(col("n_ref")).over(perDim))
      .withColumn("tot_cur", sum(col("n_cur")).over(perDim))
      .withColumn("k", count(lit(1)).over(perDim))
    val p = (col("n_ref").cast("double") + lit(0.5)) /
      (col("tot_ref").cast("double") + lit(0.5) * col("k"))
    val q = (col("n_cur").cast("double") + lit(0.5)) /
      (col("tot_cur").cast("double") + lit(0.5) * col("k"))
    withTotals
      .withColumn("term_micronats",
        round(lit(1e6) * (p - q) * log(p / q)).cast("long"))
      .groupBy(col("dim"))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"),
        sum(col("term_micronats")).as("psi_micronats"))
  }

  /** Decile lift table for the shared embedding classifier: rank by
    * score (vec_id tiebreak — a total order, so ntile is
    * deterministic), 10 equal buckets, per-decile positive rate and
    * lift vs the base rate. The campaign-targeting eval: "how much
    * better than random is the top 10%?"
    *
    * Exactness: lift = (n_pos·N)/(n·N_pos) is rational — emitted as an
    * exact integer floor division in micros (bounded: 10⁶·n_pos·N
    * needs n_pos·N < 9·10¹² — pre-divide at planet scale), same for
    * the rate. The decile shuffle moves (score, label) longs only. */
  def liftDeciles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val score = embScore
    // decile split over the full row frame — scalable exact ntile
    // (Ranking.withGlobalRank + closed-form tile arithmetic, no
    // single-partition window; bit-equal, vec_id tie-broken)
    val dec = Ranking.withGlobalRank(
        Tables.embeddings(s, dir)
          .select(score.as("sm"), (col("label") % 2).cast("long").as("y"),
            col("vec_id")),
        "__rn", "__n", Seq(col("sm").desc, col("vec_id").asc))
      .withColumn("decile", Ranking.ntileOfRank(col("__rn"), col("__n"), 10))
    val cells = dec.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    cells
      .crossJoin(broadcast(cells.agg(sum(col("n")).as("n_tot"),
        sum(col("n_pos")).as("pos_tot"))))
      .select(col("decile"), col("n"), col("n_pos"),
        expr("(1000000 * n_pos) div n").as("rate_micros"),
        expr("(1000000 * n_pos * n_tot) div (n * pos_tot)")
          .as("lift_micros"))
  }

  /** `prof5_partition_anomaly` — per-ingest-partition volume anomaly
    * detection, the data-quality gate a 100 TB pipeline runs after
    * every load: the (event_type, day) cell grid's row counts are
    * scored against each type's robust center — |count − median| >
    * 3·1.4826·MAD flags a cell (the stat22 fence, reused at partition
    * granularity, where a broken ingest shows up as a day-cell
    * collapse or spike long before any content-level check fires).
    * Emits every cell with its flag so the report is non-empty and
    * the healthy baseline is visible.
    *
    * Scale shape: one map-side-combinable (type, day) rollup — cells,
    * not rows, shuffle after it (types × days, tiny); medians are the
    * exact lower-median convention via per-type rank windows over the
    * cell frame. All-integer arithmetic — determinism is free. */
  def partitionAnomaly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_rows"))
    val wType = Window.partitionBy(col("event_type"))
    // exact lower median of the ≤ #days cell counts per type: k-th
    // order statistic at k = (n_cells + 1) div 2 over a pinned order
    val med = cells
      .withColumn("rn", row_number().over(wType
        .orderBy(col("n_rows").asc, col("day").asc)))
      .withColumn("n_cells", count(lit(1)).over(wType))
      .filter(col("rn") === expr("(n_cells + 1) div 2"))
      .select(col("event_type"), col("n_rows").as("med"))
    val dev = cells.join(med, "event_type")
      .withColumn("ad", abs(col("n_rows") - col("med")))
    val mad = dev
      .withColumn("rn", row_number().over(wType
        .orderBy(col("ad").asc, col("day").asc)))
      .withColumn("n_cells", count(lit(1)).over(wType))
      .filter(col("rn") === expr("(n_cells + 1) div 2"))
      .select(col("event_type"), col("ad").as("mad"))
    dev.join(mad, "event_type")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_rows"), col("med"), col("mad"),
        when(col("ad") * 10000 > col("mad") * 44478, 1L).otherwise(0L)
          .as("flagged"))
  }

  /** `stat39_jarque_bera` — Jarque–Bera normality test on the
    * `n_chars` length distribution: JB = n/6·(g₁² + (g₂−3)²/4) from
    * the exact raw power sums Σx..Σx⁴ (x ≤ ~10⁴ so x⁴ ≤ 10¹⁶ per
    * term; the Σx⁴ accumulator alone can pass 2⁶³ at scale, so it
    * sums in DECIMAL(38,0) — DuckDB's HUGEINT twin). Central moments
    * and the two shape statistics are derived driver-free in ONE
    * projected expression tree written identically in the oracle, so
    * every IEEE op lines up 1:1; outputs are micro-quantized.
    * The "does a Gaussian assumption even apply" pre-check the
    * parametric stat faces (stat11/stat29/stat33) lean on.
    *
    * Scale shape: one narrow scan folding five power sums map-side to
    * a 1-row frame — no shuffle wider than the partials, no window. */
  def stat39JarqueBera(s: SparkSession, dir: String): DataFrame = {
    val x = col("n_chars")
    val m = Tables.documents(s, dir)
      .select(x.as("x"), (x * x).as("x2"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x2")).as("s2"), sum(col("x2") * col("x")).as("s3"),
        sum((col("x2") * col("x2")).cast("decimal(38,0)")).as("s4"))
    // exact-integer sums → doubles once, identical tree in the oracle
    // (raw Σx⁴ stays internal: emitting DECIMAL beside the oracle's
    // HUGEINT would make the compare type-fragile for no signal)
    m.select(col("n"), col("s1"), col("s2"),
      round(lit(1e6) * jbExpr(col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"))._1).cast("long").as("skew_micros"),
      round(lit(1e6) * jbExpr(col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"))._2).cast("long").as("kurt_micros"),
      round(lit(1e6) * jbExpr(col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"))._3).cast("long").as("jb_micros"))
  }

  /** Shared JB expression tree: (skewness g₁, kurtosis g₂, JB) as
    * doubles from the exact integer power sums. Central moments via
    * mk = E[xᵏ] − binomial expansion around the mean, each written as
    * the same literal arithmetic the DuckDB oracle uses. */
  private def jbExpr(n: Column, s1: Column, s2: Column, s3: Column,
                     s4: Column): (Column, Column, Column) = {
    val nd = n.cast("double")
    val mu = s1.cast("double") / nd
    val m2 = s2.cast("double") / nd - mu * mu
    val m3 = s3.cast("double") / nd - lit(3.0) * mu *
      (s2.cast("double") / nd) + lit(2.0) * mu * mu * mu
    val m4 = s4.cast("double") / nd - lit(4.0) * mu *
      (s3.cast("double") / nd) + lit(6.0) * mu * mu *
      (s2.cast("double") / nd) - lit(3.0) * mu * mu * mu * mu
    val g1 = m3 / sqrt(m2 * m2 * m2)
    val g2 = m4 / (m2 * m2)
    val jb = nd / lit(6.0) *
      (g1 * g1 + (g2 - lit(3.0)) * (g2 - lit(3.0)) / lit(4.0))
    (g1, g2, jb)
  }

  /** `stat40_grubbs` — Grubbs' maximum-studentized-deviate outlier
    * test on `n_chars`: G = max|x − x̄|/s. The candidate is picked by
    * the EXACT integer argmax of |n·x − Σx| (ties → doc_id asc), so
    * which document is flagged never depends on floating point; the
    * statistic itself is then one double expression over exact sums,
    * micro-quantized. The single-point complement of stat22's
    * MAD-fence bulk scan: "is the single worst row already
    * statistically impossible under normality?"
    *
    * Scale shape: one scan folds (n, Σx, Σx²) map-side; the argmax is
    * a second scan ending in TakeOrderedAndProject(1) against the
    * broadcast 1-row stats — no global sort, no window. */
  def stat40Grubbs(s: SparkSession, dir: String): DataFrame = {
    val stats = broadcast(Tables.documents(s, dir)
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2")))
    val cand = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .crossJoin(stats)
      .withColumn("dev", abs(col("n") * col("n_chars") - col("s1")))
      .orderBy(col("dev").desc, col("doc_id").asc)
      .limit(1)
    cand.select(col("doc_id"), col("n_chars"), col("n"),
      round(lit(1e6) * (col("dev").cast("double") / col("n").cast("double")) /
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n").cast("double")) /
          (col("n").cast("double") - lit(1.0))))
        .cast("long").as("g_micros"))
  }

  /** `prof6_fd_discovery` — functional-dependency audit over the
    * denormalized orders⋈customer⋈nation frame: for each candidate
    * determinant→dependent pair, the violation mass
    * Σ_det (distinct deps − 1) and whether the FD holds exactly.
    * The schema-inference face of the profiling family: FDs that
    * hold are join-key/normalization candidates; FDs that almost
    * hold (small violation count) are data-quality leads. Candidates
    * cover held-by-construction (nationkey→n_name), held-via-join
    * (custkey→mktsegment) and expected-to-fail (mktsegment→nation,
    * priority→status) shapes so both verdicts are exercised.
    *
    * Scale shape: ONE scan of the join explodes to 6 (fd, det, dep)
    * rows per order row, then two map-side-combinable aggs:
    * (fd, det) distinct-dep counts, then the per-fd rollup — the
    * join itself broadcasts the dimension side. At 100 TB the
    * explode factor is the candidate count, linear and column-
    * pruned (only the referenced columns are read). */
  def prof6FdDiscovery(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
    val cands = Seq(
      ("nationkey->n_name", col("c_nationkey").cast("string"),
        col("n_name")),
      ("n_name->nationkey", col("n_name"),
        col("c_nationkey").cast("string")),
      ("nationkey->regionkey", col("c_nationkey").cast("string"),
        col("n_regionkey").cast("string")),
      ("mktsegment->nationkey", col("c_mktsegment"),
        col("c_nationkey").cast("string")),
      ("custkey->mktsegment", col("o_custkey").cast("string"),
        col("c_mktsegment")),
      ("priority->status", col("o_orderpriority"),
        col("o_orderstatus")))
    val melted = base.select(explode(array(cands.map { case (f, d, p) =>
      struct(lit(f).as("fd"), d.as("det"), p.as("dep"))
    }: _*)).as("e")).select(col("e.fd"), col("e.det"), col("e.dep"))
    melted
      .groupBy(col("fd"), col("det"))
      .agg(countDistinct(col("dep")).as("n_dep"),
        count(lit(1)).as("n_rows"))
      .groupBy(col("fd"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_dep") - 1L).as("violations"))
      .select(col("fd"), col("n_classes"), col("n_rows"),
        col("violations"),
        when(col("violations") === 0L, 1L).otherwise(0L).as("fd_holds"))
  }

  /** `prof7_pk_discovery` — candidate-key (uniqueness) audit over
    * `orders`, the companion of [[prof6FdDiscovery]]'s FD audit: for
    * each candidate column set, the duplicate mass n − |distinct| and
    * the is-key verdict. Single columns and composites are both
    * exercised so the report shows a real key (o_orderkey), near-keys
    * (custkey+date) and hopeless ones (date alone) — the
    * schema-inference signal a 100 TB ingest uses to pick MERGE keys
    * and bucketing columns.
    *
    * Scale shape: one fact scan exploded ×|candidates| (the prof6
    * device), one map-side-combinable (cand, key) count, one
    * cand-sized rollup. */
  def prof7PkDiscovery(s: SparkSession, dir: String): DataFrame = {
    val cands = Seq(
      ("orderkey", concat_ws("|", col("o_orderkey"))),
      ("custkey", concat_ws("|", col("o_custkey"))),
      ("orderdate", concat_ws("|", col("o_orderdate"))),
      ("custkey+orderdate",
        concat_ws("|", col("o_custkey"), col("o_orderdate"))),
      ("orderdate+priority",
        concat_ws("|", col("o_orderdate"), col("o_orderpriority"))))
    Tables.orders(s, dir)
      .select(explode(array(cands.map { case (nm, k) =>
        struct(lit(nm).as("cand"), k.as("k")) }: _*)).as("e"))
      .select(col("e.cand"), col("e.k"))
      .groupBy(col("cand"), col("k")).agg(count(lit(1)).as("c"))
      .groupBy(col("cand"))
      .agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") - 1L).as("dup_mass"))
      .select(col("cand"), col("n_rows"), col("n_distinct"),
        col("dup_mass"),
        when(col("dup_mass") === 0L, 1L).otherwise(0L).as("is_key"))
  }

  /** `ml28_brier` — Brier score with the Murphy (1973) decomposition
    * over 32 probability bins: reliability (calibration gap),
    * resolution (how far bin outcomes move from the base rate) and
    * uncertainty ȳ(1−ȳ) — the proper-scoring-rule companion of
    * ml12's calibration table, using the SAME logistic probability
    * of the shared embedding classifier. Brier itself is EXACT: each
    * row's (p − y)² accumulates as integer micro² before one divide;
    * the three decomposition terms quantize per bin BEFORE their
    * k-row integer sums (the stat29 convention).
    *
    * Scale shape: one narrow scan → one 32-bin map-side-combined agg
    * → a 1-row rollup; no window, no join. */
  def ml28Brier(s: SparkSession, dir: String): DataFrame = {
    val pM = round(lit(1e6) /
      (lit(1.0) + exp(-(embScore.cast("double") / lit(1e6)))))
      .cast("long")
    val rows = Tables.embeddings(s, dir)
      .select(pM.as("p"), (col("label") % 2).cast("long").as("y"))
    val bins = rows
      .select(expr("p * 32 DIV 1000001").as("bin"), col("p"), col("y"),
        ((col("p") - col("y") * 1000000L) *
          (col("p") - col("y") * 1000000L)).as("sq"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_k"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"), sum(col("sq")).as("ssq"))
    val tot = broadcast(bins.agg(sum(col("n_k")).as("n"),
      sum(col("sy")).as("sy_tot"), sum(col("ssq")).as("ssq_tot")))
    val nD = col("n").cast("double")
    val yBar = col("sy_tot").cast("double") / nD
    def binDev(a: Column, b: Column): Column = {
      val d = a.cast("double") / col("n_k").cast("double") - b
      col("n_k").cast("double") * d * d
    }
    val terms = bins.crossJoin(tot)
      .select(col("n"), col("sy_tot"), col("ssq_tot"),
        round(lit(1e6) * binDev(col("sp") / lit(1000000L),
          col("sy").cast("double") / col("n_k").cast("double"))
          .cast("double")).cast("long").as("rel_term"),
        round(lit(1e6) * binDev(col("sy"), yBar).cast("double"))
          .cast("long").as("res_term"))
    terms.groupBy(col("n"), col("sy_tot"), col("ssq_tot"))
      .agg(count(lit(1)).as("k_bins"), sum(col("rel_term")).as("rel_sum"),
        sum(col("res_term")).as("res_sum"))
      .select(col("n"), col("k_bins"),
        round(col("ssq_tot").cast("double") /
          (col("n").cast("double") * lit(1e6))).cast("long")
          .as("brier_micros"),
        round(col("rel_sum").cast("double") / col("n").cast("double"))
          .cast("long").as("reliability_micros"),
        round(col("res_sum").cast("double") / col("n").cast("double"))
          .cast("long").as("resolution_micros"),
        round(lit(1e6) * (col("sy_tot").cast("double") /
          col("n").cast("double")) *
          (lit(1.0) - col("sy_tot").cast("double") /
            col("n").cast("double"))).cast("long")
          .as("uncertainty_micros"))
  }

  /** `ml29_ks` — the Kolmogorov–Smirnov separation of the shared
    * classifier's score distributions between classes (the
    * credit-scoring "KS statistic" reported beside AUC): max over
    * thresholds of |F₁(t) − F₀(t)|, located at its argmax score.
    * ENTIRELY exact integers until the final report (the stat19
    * device): the max runs over |cum₁·n₀ − cum₀·n₁| in longs over the
    * distinct-score domain, so the argmax threshold and numerator are
    * engine-independent by construction.
    *
    * Scale shape: one (score, y) rollup map-side combined to ≤
    * |distinct scores| partials, one cumulative window over that
    * domain frame, one 1-row argmax — never a data-sized sort. */
  def ml29Ks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = Tables.embeddings(s, dir)
      .select(embScore.as("sm"), (col("label") % 2).cast("long").as("y"))
      .groupBy(col("sm"))
      .agg(sum(col("y")).as("t1"), sum(lit(1L) - col("y")).as("t0"))
    val w = Window.orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byScore
      .select(col("sm"),
        sum(col("t1")).over(w).as("c1"), sum(col("t0")).over(w).as("c0"))
    val tot = broadcast(byScore.agg(sum(col("t1")).as("n1"),
      sum(col("t0")).as("n0")))
    cum.crossJoin(tot)
      .select(col("sm"), col("n0"), col("n1"),
        abs(col("c1") * col("n0") - col("c0") * col("n1")).as("d"))
      .orderBy(col("d").desc, col("sm").asc).limit(1)
      // the scaled numerator passes 2⁶³ at planet-scale class sizes —
      // DECIMAL(38,0) (HUGEINT in the oracle) keeps the floor exact
      .select(col("n0"), col("n1"), col("sm").as("ks_at_score"),
        expr("(1000000 * CAST(d AS DECIMAL(38,0))) DIV " +
          "(CAST(n0 AS DECIMAL(38,0)) * n1)")
          .as("ks_micros"))
  }

  /** `stat41_kruskal` — Kruskal–Wallis H across the event-type groups
    * on `value` cents, with tie correction: the k-group extension of
    * stat13's Mann–Whitney (one-way ANOVA on ranks — the
    * distribution-free sibling of stat29's F). Doubled average ranks
    * keep everything integer: r₂(v) = 2·#below + t_v + 1 over the
    * DISTINCT-cents frame, group rank sums R₂g = Σ t_gv·r₂(v), and
    * H = 3·Σ(R₂g − n_g(N+1))²/(n_g·N(N+1)) in doubled-rank space;
    * per-group terms are micro-quantized BEFORE the k-row integer sum
    * (the stat29 convention), then the exact tie factor
    * C = 1 − Σ(t³−t)/(N³−N) divides once.
    *
    * Scale shape: two map-side-combinable aggs — (type, cents) and
    * (cents) — then ONE window over the ≤ distinct-cents frame (the
    * stat19/stat33 device: ranks over value DOMAIN, never rows) and a
    * broadcast join back; no data-sized sort anywhere. */
  def stat41Kruskal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("value") * 100).cast("long")
    val rows = Tables.events(s, dir)
      .select(col("event_type"), cents.as("v"))
    val byTypeV = rows.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("tgv"))
    val byV = rows.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .withColumn("cum", sum(col("t")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("v"), col("t"),
        (lit(2L) * (col("cum") - col("t")) + col("t") + 1L).as("r2"))
    val groups = byTypeV.join(broadcast(byV), "v")
      .groupBy(col("event_type"))
      .agg(sum(col("tgv")).as("n_g"),
        sum(col("tgv") * col("r2")).as("rs2"))
    // t³ passes 2⁶³ when one value dominates a planet-scale corpus —
    // the cube rides DECIMAL(38,0) (HUGEINT in the oracle)
    val totals = broadcast(byV.agg(sum(col("t")).as("nn"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") -
        col("t")).as("tsum")))
    val terms = groups.crossJoin(totals)
      .select(col("event_type"), col("n_g"), col("nn"), col("tsum"),
        // doubled-rank identity: R̄g−(N+1)/2 = (R₂g−n_g(N+1))/(2n_g);
        // 12/(N(N+1))·Σ n_g(…)² collapses to the 3/(…) form below
        round(lit(1e6) * lit(3.0) *
          ((col("rs2") - col("n_g") * (col("nn") + 1L)).cast("double") *
            (col("rs2") - col("n_g") * (col("nn") + 1L)).cast("double")) /
          (col("n_g").cast("double") * col("nn").cast("double") *
            (col("nn") + 1L).cast("double"))).cast("long")
          .as("h_term_micros"))
    terms.groupBy(col("nn"), col("tsum"))
      .agg(count(lit(1)).as("k_groups"),
        sum(col("h_term_micros")).as("h_micros"))
      .select(col("k_groups"), col("nn").as("n"), col("h_micros"),
        round(lit(1e6) * (lit(1.0) -
          col("tsum").cast("double") /
          (col("nn").cast("double") * col("nn").cast("double") *
            col("nn").cast("double") - col("nn").cast("double"))))
          .cast("long").as("tie_c_micros"),
        round(col("h_micros").cast("double") /
          (lit(1.0) - col("tsum").cast("double") /
            (col("nn").cast("double") * col("nn").cast("double") *
              col("nn").cast("double") - col("nn").cast("double"))))
          .cast("long").as("h_adj_micros"))
  }
}
