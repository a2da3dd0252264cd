package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Scale design: the brute-force path broadcasts the (single-row) query
  * and scans once — the right plan for one query at any corpus size. The
  * LSH path buckets the corpus by random-hyperplane signature so a query
  * touches only its probe buckets; signatures are computed from
  * deterministic hash-derived planes, so no stored model is needed and
  * any executor can recompute them.
  *
  * All math runs in double — cosine through the native codegen'd
  * CosineSimilarity expression, bucketing through literal-plane
  * higher-order folds. No UDFs, no driver collect of the corpus.
  */
object Similarity {

  /** Cosine via graft's native codegen'd expression (one fused loop —
    * see functions.CosineSimilarity); requires GraftFunctions.register
    * on the session, which every operator entry point does. */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim",
      a.cast("array<double>"), b.cast("array<double>"))

  /** The query row: a fixed corpus vector (vec_id = 0) so results are
    * reproducible without external input. */
  private def queryVec(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))

  /** Brute-force cosine top-k: broadcast the query, one scan, per-row
    * cosine, TakeOrderedAndProject for the top-k (per-partition heaps —
    * no global sort). Ordering is on the rounded score with vec_id
    * tiebreak, pinned for the oracle. */
  def annBruteForce(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
    e.crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic Rademacher hyperplanes (Charikar-style SimHash for
    * vectors): `bits` planes of ±1 per dimension, generated from a fixed
    * seed at PLAN-BUILD time and shipped as literal arrays — zero per-row
    * hashing, tiny codegen footprint, identical on every executor/run
    * (java.util.Random's sequence is part of its spec). */
  private def planeLits(bits: Int, dims: Int = 64): Column = {
    val rnd = new java.util.Random(42L)
    array((0 until bits).map { _ =>
      array((0 until dims).map { _ =>
        lit(if (rnd.nextBoolean()) 1.0 else -1.0)
      }: _*)
    }: _*)
  }

  /** LSH-bucketed ANN: 12-bit hyperplane signature → bucket id; the query
    * probes only its own bucket and re-ranks candidates with exact
    * cosine. At 100 TB the corpus side is pre-bucketed (one shuffle,
    * reusable across queries) and each probe is a bucket-key lookup —
    * work per query is O(bucket), not O(corpus). */
  def annLsh(s: SparkSession, dir: String, k: Int = 10,
             bits: Int = 12): DataFrame = {
    GraftFunctions.register(s)
    val bucket = (v: Column) =>
      aggregate(
        zip_with(planeLits(bits), sequence(lit(0), lit(bits - 1)),
          (plane, i) => when(
            aggregate(zip_with(v, plane, (x, p) => x.cast("double") * p),
              lit(0.0), (acc, x) => acc + x) > 0,
            call_function("shiftleft", lit(1L), i)).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)
    val corpus = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
    val q = queryVec(s, dir).select(col("q"), bucket(col("q")).as("qbkt"))
    corpus.join(broadcast(q), col("bkt") === col("qbkt"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding near-duplicate pairs on a bounded slice: all-pairs cosine
    * over vec_id < 60, keep pairs above threshold. The unbounded-scale
    * variant is annLsh's bucketing applied pairwise; this bounded kernel
    * is the oracle-checkable exact face. */
  def embNearDup(s: SparkSession, dir: String,
                 threshold: Double = 0.3): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).filter(col("vec_id") < 60)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("ea"), col("eb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF-style ANN: coarse quantizer = per-label mean vectors (the
    * labels stand in for k-means cells on this corpus); every corpus
    * vector is assigned to its NEAREST centroid (not its own label —
    * this is a real inverted-file assignment), the query probes its
    * `nprobe` nearest cells, and only those cells are re-ranked
    * exactly.
    *
    * Scale shape: centroids are a K-row broadcast; assignment is one
    * narrow crossJoin(broadcast)+argmin pass (reusable across queries —
    * the inverted file); each query touches ~corpus/K × nprobe rows.
    * No driver collect: the "model" stays a DataFrame end to end.
    */
  def annIvf(s: SparkSession, dir: String, k: Int = 10,
             nprobe: Int = 3): DataFrame = {
    GraftFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
    // K centroids as (cell, centroid: array<double>)
    val centroids = e.select(col("label").as("cell"),
        posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .getField("m").as("centroid"))
    val byDist = (idCol: String) => Window.partitionBy(col(idCol))
      .orderBy(col("dist").asc, col("cell").asc)
    // inverted file: every vector assigned to its nearest centroid
    val assigned = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cell"),
        (lit(1.0) - cosine(col("embedding"), col("centroid"))).as("dist"))
      .withColumn("rn", row_number().over(byDist("vec_id")))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
    // query probes its nprobe nearest cells
    val probes = queryVec(s, dir)
      .crossJoin(broadcast(centroids))
      .select(col("q"), col("cell"),
        (lit(1.0) - cosine(col("q"), col("centroid"))).as("dist"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("dist").asc, col("cell").asc)))
      .filter(col("rn") <= nprobe)
      .select(col("q"), col("cell"))
    assigned.join(broadcast(probes), "cell")
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Centroid per label — the IVF coarse-quantizer training step: mean
    * vector by class, emitted as (label, dim, value) long-form so the
    * oracle can check it without array equality. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.select(col("label"), posexplode(col("embedding")))
      .filter(col("pos") < 4)
      .groupBy(col("label"), col("pos").cast("long").as("dim"))
      .agg(round(avg(col("col").cast("double")), 6).as("centroid"))
  }
}
