package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch over the token stream — the fixed-memory frequency
  * summary that complements the engine's other sketches (HLL distinct
  * in stat2/stat6, Misra-Gries heavy hitters in text_heavy_hitters,
  * bloom membership in dedup_incremental): point-queryable count
  * ESTIMATES with a one-sided (over-count only) error of at most
  * εN, ε = e/width, in d×w integers of state regardless of corpus
  * size.
  *
  * Determinism: the d row-hashes derive from the engine's md5-60
  * bridge (`md5_base60('cms<i>_' || token) mod w`) — the same
  * seeded-digest discipline as MinHash/SimHash, so any engine (and the
  * DuckDB oracle) rebuilds the identical cell grid; every cell value is
  * an integer count.
  *
  * Scale shape: the sketch build is ONE hash-aggregate — tokens leave
  * the mappers only as (row, bucket) int pairs with map-side partial
  * sums, and the reduced state is d·w rows total (1 024 here) no matter
  * the corpus. That inversion — state sized by the SKETCH, not the
  * vocabulary — is the whole point at 100 TB: the exact token
  * `groupBy` used by the probe face below would carry the vocabulary
  * through the shuffle, the sketch never does. Per-executor partial
  * grids union by cell-wise addition (count-min is a commutative
  * monoid), which is exactly what the partial-agg already does.
  */
object Sketches {

  val Depth = 4
  val Width = 256

  /** One (row, bucket) cell per token occurrence, d rows per token. */
  private def cells(token: Column): Column = explode(array(
    (0 until Depth).map { i =>
      struct(lit(i.toLong).as("r"),
        pmod(Sampling.hash60(concat(lit(s"cms${i}_"), token)),
          lit(Width.toLong)).as("b"))
    }: _*))

  private def tokenStream(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(lower(col("text"))))
        .as("token"))

  /** The materialized sketch grid: (row_id, bucket, n) for every
    * non-empty cell. */
  def cmsSketch(s: SparkSession, dir: String): DataFrame =
    tokenStream(s, dir)
      .select(cells(col("token")).as("c"))
      .groupBy(col("c.r").as("row_id"), col("c.b").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Probe face: estimate the ten most frequent tokens through the
    * sketch and report the one-sided error against the exact counts.
    * The exact `groupBy(token)` here exists only to pick probes and
    * grade the estimate — a production pipeline probes the d·w grid
    * directly with its query keys (the top frame is broadcast;
    * `est ≥ true` always, by the count-min bound). */
  def cmsEstimates(s: SparkSession, dir: String): DataFrame = {
    val toks = tokenStream(s, dir)
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("token").asc)
      .limit(10)
    val probes = broadcast(top)
      .select(col("token"), col("true_count"), cells(col("token")).as("c"))
      .select(col("token"), col("true_count"),
        col("c.r").as("row_id"), col("c.b").as("bucket"))
    cmsSketch(s, dir)
      .join(probes, Seq("row_id", "bucket"))
      .groupBy(col("token"), col("true_count"))
      .agg(min(col("n")).as("est_count"))
      .select(col("token"), col("true_count"), col("est_count"),
        (col("est_count") - col("true_count")).as("overcount"))
  }

  /** Approximate-quantile CONTRACT check (the stat2-HLL pattern for
    * order statistics): Spark's `approx_percentile` (Greenwald–Khanna,
    * mergeable partials — the 100 TB quantile plan) runs beside the
    * exact `percentile`, and the report pins the PORTABLE contract —
    * the exact quantiles in cents plus a flag that each approximate
    * answer's rank window overlaps the target rank ± n/accuracy. The
    * sketch's internal answers are engine-specific and never leave the
    * query; a GK regression flips the flag and fails the hash check.
    *
    * EVAL FACE — NOT a production path. The exact `percentile` half of
    * the aggregation buffers the whole column per group (a
    * memory-unbounded aggregate) and exists ONLY to validate the
    * sketch's rank contract at oracle scale; at 100 TB swap in
    * [[approxQuantilesSketchOnly]], which keeps the Greenwald–Khanna
    * sketch alone — mergeable bounded-size partials ahead of a single
    * exchange, plan-asserted shuffle-bounded in PlanSpec (the same
    * swap-at-scale convention as timeToConvert's percentile and the
    * stat2 HLL-vs-exact check).
    *
    * Scale shape: one aggregation computes all exact+approx quantiles,
    * then one more scan folds the four rank windows as conditional
    * sums against the broadcast 4-row frame. Values micro-quantize to
    * cents, so the exact quantile interpolation lands on exact binary
    * fractions (ml5 precedent). */
  /** The PRODUCTION quantile path stat20 validates: `approx_percentile`
    * alone — per-partition GK sketches of bounded size (~accuracy
    * entries) merge through ONE exchange; no exact percentile, no
    * full-column buffering, nothing data-sized crosses the wire.
    * PlanSpec asserts exactly one exchange with a partial sketch
    * aggregate below it. */
  def approxQuantilesSketchOnly(s: SparkSession, dir: String,
                                acc: Int = 1000): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val qArr = qs.map(q => s"${q}D").mkString("array(", ", ", ")")
    Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("m"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"approx_percentile(m, $qArr, $acc)").as("apx"))
      .select(col("n_rows"),
        posexplode(col("apx")).as(Seq("qi", "apx_cents")))
      .select(element_at(array(qs.map(lit): _*), col("qi").cast("int") + 1)
          .as("q"),
        col("n_rows"), col("apx_cents"))
  }

  /** Portable contract check for [[approxQuantilesSketchOnly]] — the
    * driver face of stat28. The GK answers themselves are
    * engine-specific bytes and never leave the query; what IS portable
    * is the sketch's rank guarantee (each answer's rank window overlaps
    * the target rank ± n/accuracy), so the output is the boolean
    * contract per quantile and the oracle asserts `true` against the
    * exact ranks (the stat20 device). Unlike stat20 this face keeps
    * the production scale shape: NO exact `percentile` aggregate
    * anywhere — the validation scan is a map-side-combinable
    * conditional sum against the broadcast 4-row sketch frame, so
    * both stages are bounded-size-partials ahead of one exchange. */
  def approxQuantilesSketchContract(s: SparkSession, dir: String,
                                    acc: Int = 1000): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val m = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("m"))
    val perQ = approxQuantilesSketchOnly(s, dir, acc)
    m.crossJoin(broadcast(perQ))
      .groupBy(col("q"), col("n_rows"), col("apx_cents"))
      .agg(
        sum(when(col("m") < col("apx_cents"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("m") <= col("apx_cents"), 1L).otherwise(0L)).as("hi"))
      .select(col("q"), col("n_rows"),
        (col("lo") <= col("q") * col("n_rows") +
            col("n_rows").cast("double") / acc &&
          col("hi") >= col("q") * col("n_rows") -
            col("n_rows").cast("double") / acc).as("within_bound"))
  }

  def approxQuantiles(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val acc = 1000
    val m = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("m"))
    val qArr = qs.map(q => s"${q}D").mkString("array(", ", ", ")")
    val one = m.agg(
      count(lit(1)).as("n_rows"),
      expr(s"percentile(m, $qArr)").as("exact"),
      expr(s"approx_percentile(m, $qArr, $acc)").as("apx"))
    val perQ = one.select(col("n_rows"),
      posexplode(arrays_zip(col("exact"), col("apx"))).as(Seq("qi", "z")))
      .select(col("n_rows"), col("qi"),
        col("z.exact").as("exact_cents"),
        col("z.apx").as("apx_cents"))
    m.crossJoin(broadcast(perQ))
      .groupBy(col("qi"), col("n_rows"), col("exact_cents"),
        col("apx_cents"))
      .agg(
        sum(when(col("m") < col("apx_cents"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("m") <= col("apx_cents"), 1L).otherwise(0L)).as("hi"))
      .withColumn("q",
        element_at(array(qs.map(lit): _*), col("qi").cast("int") + 1))
      .select(col("q"), col("n_rows"), col("exact_cents"),
        (col("lo") <= col("q") * col("n_rows") +
            col("n_rows").cast("double") / acc &&
          col("hi") >= col("q") * col("n_rows") -
            col("n_rows").cast("double") / acc).as("within_bound"))
  }
}
