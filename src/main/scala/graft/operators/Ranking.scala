package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ordering WITHOUT a single-partition sort — the scale
  * fix for the `Window.orderBy(...)` (no partitionBy) family. A global
  * window pulls the whole frame through ONE task (WindowExec warns
  * about exactly this); fine for model-sized frames, a serialization
  * point for corpus-sized ones. This helper computes the IDENTICAL
  * 1-based global rank in three scale-safe steps:
  *
  *   1. `repartitionByRange` + `sortWithinPartitions` on the sort key —
  *      Spark's RangePartitioner guarantees every row in partition i
  *      orders before every row in partition i+1 (the same mechanism a
  *      distributed ORDER BY uses), with corpus/`parts` rows per task;
  *   2. one lightweight job counts rows per partition BY READING THE
  *      SHUFFLE FILES (no recompute) — a `parts`-length array on the
  *      driver, prefix-summed into offsets plus the total;
  *   3. a per-partition map stamps rank = offset(i) + local position —
  *      the RDD zipWithIndex device, kept as `mapPartitionsWithIndex`
  *      so the offset base and the total row count ride along. The
  *      imperative escape is justified the same way pack4's per-shard
  *      packer is: no declarative form exists that reuses the range
  *      partitioning without a second exchange (a window partitioned
  *      on `spark_partition_id()` re-shuffles what is already placed).
  *
  * Cost per call: ONE exchange (the range shuffle; its input runs
  * twice — once for range-bound sampling, once for the write — so
  * feed it a checkpointed/file-backed frame, not a deep DAG) plus two
  * shuffle-file reads (count job, stamp job). The result is
  * bit-identical to `row_number().over(Window.orderBy(sort))` whenever
  * the sort key is TOTALLY tie-broken (every call site here tie-breaks
  * on a unique id; with ties the rank would depend on which side of a
  * range boundary a tie lands — don't use it untied). The sampled
  * range bounds vary run-to-run, but correctness never depends on
  * WHERE the cuts fall, only on the ordering invariant, so the output
  * is deterministic even though the partitioning isn't.
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

  /** Frames at or below this row count take the single-partition
    * window path: one task sorting ≤4M narrow rows beats the
    * distributed plan's sampling pass + count job + extra scheduling,
    * and the output is bit-identical either way — the same
    * size-driven physical choice Spark itself makes between broadcast
    * and shuffle joins (and the same 4M envelope TopKPerKey's partial
    * phase budgets). Above it, the range-stamp path serves. */
  val SmallFrameRows: Long = 4000000L

  /** Adds `rankCol` = the exact 1-based global rank of each row under
    * `sort`, and `nCol` = the total row count (both LONG), without any
    * corpus-sized single-partition stage. `sort` must be totally
    * tie-broken. EAGER: runs a count (and, on the large path, the
    * range shuffle and partition-count job) at call time (the
    * localCheckpoint convention — acceptable inside `queries()`
    * builders, which are invoked per run); feed it a
    * checkpointed/file-backed frame, not a deep DAG, since the size
    * probe and the rank plan each execute the input once. */
  def withGlobalRank(df: DataFrame, rankCol: String, nCol: String,
                     sort: Seq[Column], parts: Int = 32,
                     smallThreshold: Long = SmallFrameRows): DataFrame = {
    val s = df.sparkSession
    val total = df.count()
    if (total <= smallThreshold) {
      // small frame: the global window IS the cheap plan, and by the
      // bit-equality contract the choice is invisible to the result.
      // The single partition here is ≤ smallThreshold rows BY THE
      // GUARD, never corpus-sized.
      import org.apache.spark.sql.expressions.Window
      return df
        .withColumn(rankCol,
          row_number().over(Window.orderBy(sort: _*)).cast("long"))
        .withColumn(nCol, lit(total))
    }
    val sorted = df.repartitionByRange(parts, sort: _*)
      .sortWithinPartitions(sort: _*)
    val rdd = sorted.rdd // captured ONCE so every job below reuses the
                         // same shuffle output instead of re-planning
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before i
    val n = offsets.last
    val stamped = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1L; Row.fromSeq(row.toSeq :+ r :+ n) }
    }
    s.createDataFrame(stamped,
      sorted.schema.add(rankCol, LongType, nullable = false)
        .add(nCol, LongType, nullable = false))
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
