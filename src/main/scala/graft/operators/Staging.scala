package graft.operators

/** THE staged-artifact protocol shared by every "build once per
  * corpus, read many" operator (IVF index, BM25 postings, BPE model,
  * the iterative graph results): a /tmp directory keyed by
  * (tag, params, corpus dir, source-file fingerprint) plus a `_built`
  * marker committed only after the build completes. One definition so
  * the shared caveats live in one place:
  *
  *  - the fingerprint is an MD5 digest of the SOURCE parquet's
  *    path:size:mtime — a regenerated corpus changes the digest, so a
  *    stale artifact is simply a different (ignored) directory and can
  *    never serve changed data (a real digest, not an XOR fold that
  *    could cancel across inputs);
  *  - `tag` carries the algorithm version (…_v1) — bump it when the
  *    staged computation changes so an old artifact can't serve new
  *    code;
  *  - concurrent FIRST builds in separate JVMs can race the build
  *    directory; a deployment puts a lock (or a scheduler-owned build
  *    step) in front, same as any shared index build. Within one JVM
  *    the marker check is idempotent: rebuilding identical content
  *    over a still-read directory is benign (same input ⇒ same bytes).
  */
/** Eager lineage cut for ITERATIVE loops that also DISCARDS the origin
  * plan's statistics. `Dataset.localCheckpoint` preserves the optimized
  * plan's stats into the replacement LogicalRDD (SPARK-39834:
  * `LogicalRDD.fromDataset` → `rewriteStatsAndConstraints`), and
  * size-only stats estimate a join as the PRODUCT of its children — so
  * a loop whose round tree references the previous round's checkpoint
  * m ≥ 2 times compounds the stored sizeInBytes as
  * bits_r ≈ m·bits_{r−1}: a doubly-exponential BigInt that Catalyst's
  * stats visitor multiplies on the DRIVER at every subsequent
  * checkpoint (observed in round 9's Borůvka rewrite: million-bit
  * ToomCook multiplications pinning the driver for minutes by inner
  * round ~5). Re-wrapping the checkpointed RDD through
  * `createDataFrame` drops the preserved stats so every round starts
  * from fresh default-size leaves; the cost is a lazy
  * InternalRow→Row→InternalRow conversion on consumer reads of the
  * loop-carried (label-, frontier- or contracted-edge-sized) frames.
  * One-shot multi-consumer checkpoints can keep plain
  * `localCheckpoint(true)` — they cannot compound. */
private[operators] object Lineage {
  def cut(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.sparkSession.createDataFrame(df.localCheckpoint(true).rdd,
      df.schema)
}

private[operators] object Staging {

  /** Lowercase-hex MD5 of a string, truncated to 16 chars — the staged
    * artifact fingerprint base (a real digest: no XOR-cancellation
    * across inputs, no same-size/mtime-granularity collisions). */
  def digestHex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  def fingerprint(dir: String, table: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    digestHex(s"${src.getAbsolutePath}:${src.length()}:${src.lastModified()}")
  }

  /** `/tmp/graft_<tag>[_<params>]_<dir-slug>_<fingerprint>` */
  def base(tag: String, dir: String, params: String,
           srcTable: String): String = {
    val p = if (params.isEmpty) "" else s"${params}_"
    s"/tmp/graft_${tag}_$p" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + fingerprint(dir, srcTable)
  }

  /** Run `build` exactly once per base path (marker-committed). */
  def buildOnce(basePath: String)(build: => Unit): Unit = {
    val marker = new java.io.File(s"$basePath/_built")
    if (!marker.exists()) {
      build
      marker.createNewFile()
    }
  }

  private val matCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Materialize `df` to a per-call /tmp parquet and return a read of
    * it — lets an operator whose inputs are arbitrary in-memory frames
    * unpersist its checkpointed intermediates in a `finally` WITHOUT
    * invalidating the returned plan (a localCheckpoint truncates
    * lineage, so unpersisting one that a still-lazy result plan reads
    * would lose the data; the mst/cc convention applied to unfingerprinted
    * inputs). The path is per-(JVM, call) unique, so concurrent calls
    * never clobber a plan another caller still reads; the bytes written
    * are result-sized (rollups/top-K), never corpus-sized. */
  def materialized(df: org.apache.spark.sql.DataFrame, tag: String)
      : org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    val path = s"/tmp/graft_mat_${tag}_" +
      ProcessHandle.current().pid() + "_" + matCounter.incrementAndGet()
    df.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }
}
