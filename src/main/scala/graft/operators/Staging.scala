package graft.operators

/** THE staged-artifact protocol shared by every "build once per
  * corpus, read many" operator (IVF index, BM25 postings, BPE model,
  * the iterative graph results): a /tmp directory keyed by
  * (tag, params, corpus dir, source-file fingerprint) plus a `_built`
  * marker committed only after the build completes. One definition so
  * the shared caveats live in one place:
  *
  *  - the fingerprint is size XOR rotate(mtime, 21) of the SOURCE
  *    parquet — a regenerated corpus changes both, so a stale artifact
  *    is simply a different (ignored) directory and can never serve
  *    changed data;
  *  - `tag` carries the algorithm version (…_v1) — bump it when the
  *    staged computation changes so an old artifact can't serve new
  *    code;
  *  - concurrent FIRST builds in separate JVMs can race the build
  *    directory; a deployment puts a lock (or a scheduler-owned build
  *    step) in front, same as any shared index build. Within one JVM
  *    the marker check is idempotent: rebuilding identical content
  *    over a still-read directory is benign (same input ⇒ same bytes).
  */
private[operators] object Staging {

  def fingerprint(dir: String, table: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    java.lang.Long.toHexString(src.length() ^
      java.lang.Long.rotateLeft(src.lastModified(), 21))
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
}
