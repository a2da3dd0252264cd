package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ordering WITHOUT a single-partition sort — the scale
  * fix for the `Window.orderBy(...)` (no partitionBy) family. A global
  * window pulls the whole frame through ONE task (WindowExec warns
  * about exactly this); fine for model-sized frames, a serialization
  * point for corpus-sized ones. This helper computes the IDENTICAL
  * 1-based global rank in three scale-safe steps:
  *
  *   1. `repartitionByRange` on the sort key — Spark's RangePartitioner
  *      guarantees every row in partition i orders before every row in
  *      partition i+1 (the same mechanism a distributed ORDER BY uses),
  *      with corpus/`parts` rows per task;
  *   2. a PARTITIONED window ranks rows locally within each range
  *      partition (each task sorts only its slice);
  *   3. per-partition counts — a `parts`-row frame — prefix-sum into
  *      offsets and broadcast back; global rank = offset + local rank.
  *
  * The result is bit-identical to
  * `row_number().over(Window.orderBy(sort))` whenever the sort key is
  * TOTALLY tie-broken (every call site here tie-breaks on a unique id;
  * with ties the rank would depend on which side of a range boundary a
  * tie lands — don't use it untied). The sampled range bounds vary
  * run-to-run, but correctness never depends on WHERE the cuts fall,
  * only on the ordering invariant, so the output is deterministic even
  * though the partitioning isn't.
  *
  * `ntile` never needs a second pass: Spark's ntile(k) over n rows
  * gives the first n%k tiles ceil(n/k) rows and the rest floor(n/k) —
  * a closed-form function of (rank, n) computed by [[ntileOfRank]] /
  * inverted by [[tileStart]] in exact integer arithmetic.
  */
private[graft] object Ranking {

  /** Integer division with a positive divisor guard (ANSI mode throws
    * on pmod-by-zero even in the unchosen branch of a `when`). */
  private def idiv(a: Column, b: Column): Column = {
    val d = greatest(b, lit(1L))
    ((a - pmod(a, d)) / d).cast("long")
  }

  /** Adds `rankCol` = the exact 1-based global rank of each row under
    * `sort`, and `nCol` = the total row count (both LONG), without any
    * single-partition stage. `sort` must be totally tie-broken. */
  def withGlobalRank(df: DataFrame, rankCol: String, nCol: String,
                     sort: Seq[Column], parts: Int = 32): DataFrame = {
    val parted = df.repartitionByRange(parts, sort: _*)
      .withColumn("__rk_pid", spark_partition_id())
    val local = parted.withColumn("__rk_lrn",
      row_number().over(
        Window.partitionBy(col("__rk_pid")).orderBy(sort: _*))
        .cast("long"))
    // parts-row frame: counts → exclusive prefix offsets + the total.
    // The window here orders a ≤`parts`-row frame — bounded, not
    // corpus-sized — so the single partition is by construction tiny.
    val offsets = parted.groupBy(col("__rk_pid"))
      .agg(count(lit(1)).as("__rk_cnt"))
      .withColumn("__rk_off",
        coalesce(sum(col("__rk_cnt")).over(
          Window.orderBy(col("__rk_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(nCol,
        sum(col("__rk_cnt")).over(Window.partitionBy(lit(1))))
      .select(col("__rk_pid"), col("__rk_off"), col(nCol))
    local.join(broadcast(offsets), Seq("__rk_pid"))
      .withColumn(rankCol, col("__rk_off") + col("__rk_lrn"))
      .drop("__rk_pid", "__rk_lrn", "__rk_off")
  }

  /** The bucket `ntile(k)` assigns to 1-based rank `rn` of `n` rows:
    * the first r = n%k tiles hold q+1 = n/k+1 rows, the rest q.
    * Exact LONG arithmetic, bit-equal to Spark's NTile. */
  def ntileOfRank(rn: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k.toLong))
    val r = pmod(n, lit(k.toLong))
    val fat = r * (q + lit(1L)) // rows covered by the q+1-sized tiles
    when(rn <= fat, idiv(rn - 1, q + lit(1L)) + lit(1L))
      .otherwise(r + idiv(rn - fat - 1, q) + lit(1L))
  }

  /** First 1-based rank inside tile `b` of ntile(k) over n rows — the
    * inverse of [[ntileOfRank]]; rank-within-tile = rn − tileStart + 1
    * replaces a second partitioned row_number. */
  def tileStart(b: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k.toLong))
    val r = pmod(n, lit(k.toLong))
    when(b <= r, (b - 1) * (q + lit(1L)) + lit(1L))
      .otherwise(r * (q + lit(1L)) + (b - 1 - r) * q + lit(1L))
  }
}
