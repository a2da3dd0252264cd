package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 fourth-session, sixth batch: prefix-filtered similarity
  * join and weekly lifecycle accounting. The prefix-filter test runs
  * the brute-force all-pairs join over a corpus engineered so the
  * filter MUST prune (rare + stopword-heavy docs) — equality proves
  * losslessness where it is actually exercised. */
class Round6iSpec extends SparkSpec {

  test("prefixFilterPairs equals brute force on a pruning-heavy corpus") {
    import spark.implicits._
    // heavy shared-stopword tails + distinctive rare heads: the shared
    // words fall OUTSIDE the prefixes, so candidates only form via the
    // rare heads — the pruning path the fixture's tiny vocab underuses
    val docs = Seq(
      (1L, "apple banana the of and to in is it that"),
      (2L, "apple banana the of and to in is it was"),   // near-dup of 1
      (3L, "cherry durian the of and to in is it that"),
      (4L, "cherry durian the of and to in is it was"),  // near-dup of 3
      (5L, "unrelated words entirely different content here now then"),
      (6L, "apple cherry of and to in is it maybe perhaps"))
      .toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sets = docs.collect().map(r => (r.getLong(0),
      r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet))
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.7
    } yield (a, b,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    assert(got === brute)
    assert(brute.map(p => (p._1, p._2)) === Set((1L, 2L), (3L, 4L)))
  }

  test("prefixFilterPairs matches the plain fixture oracle pairs") {
    val viaPrefix = Dedup.prefixFilterPairs(
        graft.operators.Fixtures.mutantSlice(spark, sf), 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // independent: exact all-pairs over the same slice via the
    // (capped) brute join
    val d = graft.operators.Fixtures.mutantSlice(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet))
    val brute = (for {
      (a, sa) <- d; (b, sb) <- d if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.7
    } yield (a, b,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    assert(viaPrefix === brute)
  }

  test("lifecycle: states replay; every user is new exactly once") {
    val active = Tables.events(spark, sf)
      .select(col("user_id"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val weeks = active.map(_._2).distinct.sorted
    val byUser = active.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    byUser.foreach { case (_, ws) =>
      val first = ws.min
      var prev = false
      weeks.filter(_ >= first).foreach { w =>
        val act = ws(w)
        val state =
          if (w == first) "new"
          else if (act && prev) "retained"
          else if (act) "resurrected"
          else if (prev) "churned"
          else "dormant"
        exp((w, state)) += 1L
        prev = act
      }
    }
    val got = EventAnalytics.lifecycle(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === exp.toMap)
    val newTotal = got.collect { case ((_, "new"), n) => n }.sum
    assert(newTotal === byUser.size.toLong)
  }
}
