package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-occurrence mining over order baskets — the counting kernel under
  * association rules, item-item collaborative filtering and
  * "frequently bought together": which part pairs appear in the same
  * order more often than chance. The reference has no joins at all
  * (SURVEY §2f); this is the charter's training-data extension of the
  * basket-shaped data the TPC-H tables already carry.
  */
object Recommend {

  /** `rec1_item_cooccur` — item-item co-occurrence with lift and
    * cosine association scores: distinct (order, part) pairs self-join
    * on the order key (a < b so each unordered pair counts once),
    * support-pruned at `minSupport` co-occurrences, ranked by
    * (count desc, pair asc) and cut to `topK`.
    *
    * Scale shape: the self-join is an equi-join on l_orderkey — the
    * key both tables would be bucketed by at 100 TB, so co-located and
    * shuffle-free there; pair explosion is bounded by basket size
    * squared (TPC-H baskets are ≤ ~13 lines, so ≤ ~80 pairs/basket —
    * linear in orders, never corpus-quadratic). Pair counting
    * partial-aggregates map-side on (a, b); the per-item support table
    * is item-cardinality-sized and BROADCAST to the aggregated pairs;
    * the final cut is TakeOrderedAndProject, never a global sort.
    * Scores are integer micros from single IEEE ops on exact integer
    * counts, so the DuckDB oracle reproduces them bit-for-bit:
    * lift = n_ab·N / (n_a·n_b), cosine = n_ab / √(n_a·n_b). */
  def itemCooccur(s: SparkSession, dir: String, minSupport: Int = 2,
                  topK: Int = 100): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .distinct()
    val nOrders = items.agg(
      countDistinct(col("okey")).as("n_orders"))
    val support = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.okey") === col("b.okey"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(support.select(col("item").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(support.select(col("item").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(lit(1e6) * (col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).cast("long")
          .as("lift_micros"),
        round(lit(1e6) * col("n_ab").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double"))).cast("long")
          .as("cosine_micros"))
      .orderBy(col("n_ab").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
  }

  /** `rec2_assoc_rules` — association rules from the same basket
    * counts: both directions of every supported pair become candidate
    * rules antecedent → consequent, scored by
    * confidence = n_ab / n_ant (integer micros) and kept when
    * confidence ≥ `minConfMicros`; ranked by (confidence desc, pair
    * asc), cut to `topK`. Confidence is the deployment signal ("of
    * orders containing A, this share also had B"); lift rides along so
    * high-confidence-only-because-B-is-everywhere rules are visible.
    *
    * Scale shape: identical to [[itemCooccur]] up to the pair counts
    * (one bounded self-join + partial agg); the direction flip is a
    * narrow 2× union of the AGGREGATED pair table (pair-cardinality
    * sized, never basket rows), supports broadcast on, final cut
    * TakeOrderedAndProject. */
  def assocRules(s: SparkSession, dir: String, minSupport: Int = 2,
                 minConfMicros: Long = 100000L, topK: Int = 100)
  : DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .distinct()
    val nOrders = items.agg(countDistinct(col("okey")).as("n_orders"))
    val support = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.okey") === col("b.okey"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val rules = pairs
      .select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_ab"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_ab")))
    rules
      .join(broadcast(support.select(col("item").as("antecedent"),
        col("n_item").as("n_ant"))), "antecedent")
      .join(broadcast(support.select(col("item").as("consequent"),
        col("n_item").as("n_cons"))), "consequent")
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ant"), col("n_cons"),
        round(lit(1e6) * col("n_ab").cast("double") /
          col("n_ant").cast("double")).cast("long").as("conf_micros"),
        round(lit(1e6) * (col("n_ab") * col("n_orders")).cast("double") /
          (col("n_ant") * col("n_cons")).cast("double")).cast("long")
          .as("lift_micros"))
      .filter(col("conf_micros") >= minConfMicros)
      .orderBy(col("conf_micros").desc, col("antecedent").asc,
        col("consequent").asc)
      .limit(topK)
  }

  /** `rec3_als_step` — one exact half-step of alternating least
    * squares matrix factorization (Koren/Hu-Koren-Volinsky; the
    * explicit-feedback normal-equations form), the collaborative-
    * filtering layer above [[itemCooccur]]'s counting kernel: with
    * item factors held FIXED, each user's k=2 latent vector has a
    * CLOSED FORM — p_u = (Σ_i q_i·q_iᵀ + λI)⁻¹ · Σ_i r_ui·q_i — so the
    * whole user-side update is one grouped aggregation plus a 2×2
    * matrix inverse done in plain column arithmetic. This is exactly
    * how distributed ALS iterates at scale (each half-step is a
    * shuffle-by-user then shuffle-by-item aggregation; no gradient
    * loop, no driver state beyond λ), demonstrated here as one
    * verifiable step.
    *
    * Ratings are Σ quantity per (customer, part) from lineitem ⋈
    * orders — the orderkey equi-join both tables are bucketed by at
    * 100 TB. Item factors are the derandomized init every graft
    * iterative model uses: q_c = (md5_60("alsq<c>:" + partkey) mod
    * 2001 − 1000) milli-units ∈ [−1, 1], a pure function of the item
    * key, so step 1 is reproducible across engines and restarts.
    *
    * Determinism: all five per-user sums (S11=Σq1², S12=Σq1q2,
    * S22=Σq2², T1=Σr·q1, T2=Σr·q2) are EXACT integer sums in milli-
    * unit space (partition-order-independent); the inverse runs as
    * single IEEE ops on those exact longs and rounds to micros. λ
    * enters as λ·n_items·I — the confidence-weighted regularization of
    * the published implicit-ALS variant, kept integral (λ=0.1 → 100
    * milli² per rating). det > 0 always: A is positive-definite for
    * λ > 0. */
  def alsUserStep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    def qInit(comp: String): Column =
      (pmod(call_function("md5_base60",
        concat_ws("", lit(s"alsq$comp:"), col("l_partkey"))),
        lit(2001L)) - lit(1000L))
    val ratings = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).cast("long").as("r"))
      .withColumn("q1", qInit("1"))
      .withColumn("q2", qInit("2"))
    val sums = ratings.groupBy(col("custkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("q1") * col("q1")).as("s11"),
        sum(col("q1") * col("q2")).as("s12"),
        sum(col("q2") * col("q2")).as("s22"),
        sum(col("r") * col("q1")).as("t1"),
        sum(col("r") * col("q2")).as("t2"))
    // real units: A11 = s11/1e6 + λ·n, A12 = s12/1e6, b = t/1e3 —
    // doubles built from the exact longs with one IEEE expression per
    // output, the repo convention (both engines evaluate identically).
    val a11 = (col("s11").cast("double") / 1e6) +
      lit(0.1) * col("n_items").cast("double")
    val a12 = col("s12").cast("double") / 1e6
    val a22 = (col("s22").cast("double") / 1e6) +
      lit(0.1) * col("n_items").cast("double")
    val b1 = col("t1").cast("double") / 1e3
    val b2 = col("t2").cast("double") / 1e3
    val det = a11 * a22 - a12 * a12
    sums.select(col("custkey"), col("n_items"),
        round(lit(1e6) * (a22 * b1 - a12 * b2) / det).cast("long")
          .as("p1_micros"),
        round(lit(1e6) * (a11 * b2 - a12 * b1) / det).cast("long")
          .as("p2_micros"))
  }
}
