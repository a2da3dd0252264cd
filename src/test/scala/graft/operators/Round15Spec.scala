package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 pins. */
class Round15Spec extends SparkSpec {

  test("staging marker protocol is crash-consistent: a torn build " +
    "directory (data, no _built) is ignored and rebuilt; the marker " +
    "alone commits") {
    // The Staging scaladoc documents the contract; this enforces it.
    // Crash model: a first build writes part files and dies BEFORE
    // `_built` — the directory exists, may even contain readable
    // parquet, but was never committed. A reader must treat it as
    // absent and rebuild (overwrite), then commit. Conversely, once
    // `_built` exists, buildOnce must NEVER re-run the build — the
    // marker is the single commit point.
    val base = Staging.base("spec_torn_v1", sf, "p1", "documents")
    val dataPath = s"$base/data"
    def rmrf(p: String): Unit = {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(Path.of(p)))
        Files.walk(Path.of(p)).sorted(Comparator.reverseOrder())
          .forEach(f => { Files.deleteIfExists(f); () })
    }
    rmrf(base)
    import spark.implicits._
    // 1. simulate the torn first build: stale parquet lands in the
    //    data dir (a crash can leave complete-looking files), NO marker
    Seq((1L, "stale")).toDF("k", "v")
      .write.mode("overwrite").parquet(dataPath)
    assert(!new java.io.File(s"$base/_built").exists())
    // 2. second process arrives: buildOnce must RUN the build (torn
    //    dir ignored), and the build's overwrite must replace the
    //    stale bytes
    var ran = 0
    Staging.buildOnce(base) {
      ran += 1
      Seq((1L, "fresh"), (2L, "fresh")).toDF("k", "v")
        .write.mode("overwrite").parquet(dataPath)
    }
    assert(ran === 1, "torn directory (no _built) must trigger a rebuild")
    assert(new java.io.File(s"$base/_built").exists(), "rebuild must commit")
    val served = spark.read.parquet(dataPath)
    assert(served.count() === 2L)
    assert(served.filter(col("v") === "stale").count() === 0L,
      "rebuild must overwrite the torn build's bytes, not merge with them")
    // 3. committed artifact: the build closure must NOT run again —
    //    a poison build proves buildOnce short-circuits on the marker
    Staging.buildOnce(base) {
      fail("_built marker present: build must not re-run")
    }
    rmrf(base)
  }

  test("rankedDocs staging serves the identical rank frame on warm " +
    "calls (blockEdges' per-call modularity path no longer " +
    "re-checkpoints)") {
    // r15: rankedDocs went from per-call localCheckpoint (one leaked
    // checkpointed RDD per modularity call) to a staged per-corpus
    // parquet. Contract: two independent calls into an operator that
    // consumes it (linkEdges) read the same staged rank artifact and
    // leave NO new persisted RDDs behind.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val e1 = Graphs.linkEdges(spark, sf)
    val n1 = e1.count()
    val e2 = Graphs.linkEdges(spark, sf)
    assert(e2.count() === n1)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"linkEdges warm calls must not leave persisted RDDs: $leaked")
  }
}
