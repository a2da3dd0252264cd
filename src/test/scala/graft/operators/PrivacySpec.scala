package graft.operators

import graft.{SparkSpec, Tables}
import java.time.LocalDate

/** Privacy release-gate audits: the reports are re-derived in plain
  * driver Scala from the collected events (independent restatement of
  * the profile build + class rollups), and the generalization ladder's
  * defining monotonicity is pinned.
  */
class PrivacySpec extends SparkSpec {

  /** (first_day, top_type, spend_tier) per user, restated from raw
    * collected rows. */
  private def profiles(): Map[Long, (LocalDate, String, Long)] = {
    val rows = Tables.events(spark, sf)
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    rows.groupBy(_._1).map { case (u, es) =>
      val firstDay = es.map(_._2).min
        .toLocalDateTime.toLocalDate
      val spendCents = es.map(e => math.round(e._4 * 100)).sum
      val tier = math.floor(math.log10(1.0 + spendCents.toDouble)).toLong
      val topType = es.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (t, c) => (-c, t) }.head._1
      u -> (firstDay, topType, tier)
    }
  }

  test("priv1: k-anonymity report equals the driver-side restatement") {
    val cls = profiles().values.groupBy(p => (p._1, p._2))
      .view.mapValues(_.size).values.toSeq
    val atRisk = cls.filter(_ < Privacy.K)
    val r = Privacy.kAnonymity(spark, sf).collect().head
    assert(r.getAs[Long]("n_users") === cls.sum)
    assert(r.getAs[Long]("n_classes") === cls.size)
    assert(r.getAs[Long]("k_min") === cls.min)
    assert(r.getAs[Long]("n_classes_at_risk") === atRisk.size)
    assert(r.getAs[Long]("n_users_at_risk") === atRisk.sum)
    assert(r.getAs[Long]("risk_micros") ===
      math.round(1e6 * atRisk.sum.toDouble / cls.sum))
  }

  test("priv2: l-diversity counts homogeneous classes and their users") {
    val byClass = profiles().values.groupBy(p => (p._1, p._2)).values
    val homog = byClass.filter(_.map(_._3).toSet.size == 1)
    val r = Privacy.lDiversity(spark, sf).collect().head
    assert(r.getAs[Long]("n_classes") === byClass.size)
    assert(r.getAs[Long]("l_min") ===
      byClass.map(_.map(_._3).toSet.size).min)
    assert(r.getAs[Long]("n_homogeneous") === homog.size)
    assert(r.getAs[Long]("n_users_exposed") === homog.map(_.size).sum)
  }

  test("priv3: generalization ladder is monotone — coarser dates mean " +
      "fewer classes and never-lower k") {
    val rows = Privacy.generalizationLadder(spark, sf).collect()
      .map(r => (r.getAs[String]("level"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("k_min"), r.getAs[Long]("n_users_at_risk")))
    assert(rows.map(_._1).toSeq ===
      Seq("1_day", "2_week", "3_month"))
    val classes = rows.map(_._2)
    assert(classes(0) >= classes(1) && classes(1) >= classes(2),
      s"class count must collapse as QI coarsens: ${classes.toSeq}")
    val kmins = rows.map(_._3)
    assert(kmins(0) <= kmins(1) && kmins(1) <= kmins(2),
      s"k cannot drop when classes merge: ${kmins.toSeq}")
  }

  test("profile build shuffles on user_id, not a global window") {
    val df = Privacy.kAnonymity(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(user_id".r.findFirstIn(p).isDefined,
      s"modal window lost its user_id partitioning:\n$p")
  }
}
