package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Layout + selection operators: sequence packing, RAG chunking, DSIR
  * importance weights, partitioned sink. Oracle hashes pin the exact
  * values; these tests pin the SEMANTIC invariants a consumer relies
  * on (tiling, coverage, monotonicity, pruning).
  */
class PackingSpec extends SparkSpec {

  test("pack1: sequences tile each source's token stream exactly") {
    val d = Tables.documents(spark, sf)
    val packed = Packing.packSequences(spark, sf).collect()
    val perSourceTokens = d
      .select(col("source"),
        size(TextAnalysis.tokens(lower(col("text")))).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("total"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bySource = packed.groupBy(_.getString(0))
    assert(bySource.keySet === perSourceTokens.keySet)
    for ((src, rows) <- bySource) {
      val (totTok, totDocs) = perSourceTokens(src)
      assert(rows.map(_.getLong(3)).sum === totTok, s"token tiling broken for $src")
      assert(rows.map(_.getLong(2)).sum === totDocs, s"doc partition broken for $src")
      // first sequence starts at offset 0; doc-id ranges never overlap
      // across sequences (packing is an order-preserving partition)
      assert(rows.map(_.getLong(1)).min === 0L)
      val sorted = rows.sortBy(_.getLong(1))
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if b != null && a != null)
        assert(a.getLong(5) < b.getLong(4), s"doc ranges overlap in $src") // last_doc < next first_doc
    }
  }

  test("chunk1: chunk widths match the width/stride arithmetic per doc") {
    val out = Packing.ragChunks(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toInt).toSeq
      }
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(lower(col("text")))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet === toks.keySet)
    for ((id, n) <- toks) {
      val nChunks = math.max(1, (n + 47) / 48)
      val expected = (0 until nChunks).map(i => math.min(64, math.max(0, n - i * 48)))
      assert(out(id) === expected, s"doc $id: n=$n")
    }
  }

  test("dsir: target-language docs score higher than the rest") {
    val w = TextAnalysis.dsirWeights(spark, sf, targetLang = "de")
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .select(col("lang") === "de",
        col("lr_total_micro").cast("double") / col("n_tokens"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    val (target, rest) = w.partition(_._1)
    assert(target.nonEmpty && rest.nonEmpty)
    val avgT = target.map(_._2).sum / target.length
    val avgR = rest.map(_._2).sum / rest.length
    assert(avgT > avgR,
      s"target-domain mean log-ratio $avgT not above non-target $avgR")
    // and the flag agrees with the sign of the total
    val bad = TextAnalysis.dsirWeights(spark, sf)
      .filter((col("keep") === 1L) =!= (col("lr_total_micro") > 0L)).count()
    assert(bad === 0L)
  }

  test("merge1: actions partition the keyspace and values follow the winner") {
    val snap = Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
      "o_totalprice", "o_orderstatus")
    val upd = Fixtures.orderUpdates(snap)
    val out = Relational.merge1Upsert(snap, upd, "o_orderkey")
    // cardinality: every snapshot key survives, every new key inserts
    val nSnap = snap.count()
    val nNew = upd.filter(col("o_orderstatus") === "N").count()
    assert(out.count() === nSnap + nNew)
    // updated keys carry the update's values, not the snapshot's
    val wrong = out.filter(col("action") === "update")
      .filter(col("o_orderstatus") =!= "U").count()
    assert(wrong === 0L)
    // keep-rows are bit-identical to the snapshot
    val kept = out.filter(col("action") === "keep")
      .drop("action")
    assert(kept.exceptAll(snap.join(upd.select("o_orderkey"),
      Seq("o_orderkey"), "left_anti")).count() === 0L)
  }

  test("merge2 SCD2: updated keys close version 0, exactly one current row per key") {
    val snap = Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
      "o_totalprice", "o_orderstatus")
    val upd = Fixtures.orderUpdates(snap)
    val out = Relational.merge2Scd2(snap, upd, "o_orderkey")
    assert(out.count() === snap.count() + upd.count())
    // exactly one current version per key, always the max version
    val bad = out.groupBy(col("o_orderkey"))
      .agg(sum(col("is_current")).as("n_cur"),
        max(col("version")).as("v_max"),
        max(when(col("is_current") === 1, col("version"))).as("v_cur"))
      .filter(col("n_cur") =!= 1 || col("v_cur") =!= col("v_max"))
    assert(bad.count() === 0L)
    // an updated key has its v0 closed and its v1 current with the
    // re-priced value; an untouched key stays current at v0
    val updated = out.filter(col("o_orderkey") % 10 === 3 &&
      col("o_orderkey") < 1000000000L)
    assert(updated.filter(col("version") === 0)
      .filter(col("is_current") =!= 0).count() === 0L)
    assert(updated.filter(col("version") === 1)
      .filter(col("o_orderstatus") =!= "U").count() === 0L)
    val untouched = out.filter(col("o_orderkey") % 10 =!= 3 &&
      col("o_orderkey") % 100 =!= 7 && col("o_orderkey") < 1000000000L)
    assert(untouched.filter(col("version") =!= 0 ||
      col("is_current") =!= 1).count() === 0L)
    // chaining: feeding the output back accumulates a THIRD version
    // for re-updated keys, with exactly one current row still
    val out2 = Relational.merge2Scd2(out,
      upd.filter(col("o_orderstatus") === "U"), "o_orderkey")
    val chained = out2.filter(col("o_orderkey") % 10 === 3 &&
      col("o_orderkey") < 1000000000L)
    assert(chained.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("is_current")).as("cur"),
        max(col("version")).as("vmax"))
      .filter(col("n") =!= 3 || col("cur") =!= 1 || col("vmax") =!= 2)
      .count() === 0L)
  }

  test("zorder: block bounding boxes are tighter than the unclustered layout") {
    val blocks = Packing.zorderBlocks(spark, sf).collect()
    assert(blocks.nonEmpty)
    // Z-order locality: the mean per-block x-range must be far below
    // the global x-range (a random partition would span nearly all of
    // it) — this is the file-skipping win the layout exists for.
    val xSpans = blocks.map(r => r.getLong(3) - r.getLong(2))
    val globalMin = blocks.map(_.getLong(2)).min
    val globalMax = blocks.map(_.getLong(3)).max
    val meanSpan = xSpans.sum.toDouble / xSpans.length
    assert(meanSpan < (globalMax - globalMin) * 0.8,
      s"blocks show no x locality: mean span $meanSpan of ${globalMax - globalMin}")
    // row conservation
    assert(blocks.map(_.getLong(1)).sum ===
      Tables.lineitem(spark, sf).count())
  }

  test("s9: read-back is partition-pruned and round-trips exactly") {
    val df = Audits.s9PartitionedSink(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("roundtrip_ok") == 1L))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("lang"),
      s"lang filter did not become a partition filter:\n$p")
  }
}
