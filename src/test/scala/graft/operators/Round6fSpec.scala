package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 fourth-session, third batch: activity streaks, runs test,
  * Benford audit, vocabulary coverage curve, decile lift. Driver-side
  * replays from the raw fixture, independent of the Spark plans. */
class Round6fSpec extends SparkSpec {

  private lazy val userDays: Map[Long, Seq[Long]] =
    Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

  test("streaks: islands replay per user") {
    val got = EventAnalytics.streaks(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.keySet === userDays.keySet)
    userDays.foreach { case (u, days) =>
      // split the sorted epoch-day list into consecutive runs
      val streaks = days.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.head == d - 1 => (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }.map(run => (run.length.toLong, run.last)) // (len, startEpochDay)
      val best = streaks.minBy { case (len, start) => (-len, start) }
      val (nActive, maxStreak, start) = got(u)
      assert(nActive === days.length.toLong)
      assert(maxStreak === best._1)
      assert(start === java.time.LocalDate.ofEpochDay(best._2).toString)
    }
  }

  private lazy val daily: Seq[(String, Long)] =
    Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)

  test("runsTest: run counting and z replay") {
    val byVal = daily.sortBy { case (d, x) => (x, d) }
    val med = byVal((byVal.length + 1) / 2 - 1)._2
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    val runs = 1L + signs.sliding(2).count {
      case Seq(a, b) => a != b; case _ => false }
    val n1 = signs.count(identity).toLong
    val n2 = signs.size - n1
    val row = EventAnalytics.runsTest(spark, sf).collect().head
    assert(row.getLong(0) === runs)
    assert(row.getLong(1) === n1)
    assert(row.getLong(2) === n2)
    val mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2).toDouble
    assert(math.abs(row.getDouble(3) - mu) < 1e-5)
  }

  test("benford: reference probs sum to exactly 1e6; digit counts replay") {
    assert(Relational.BenfordMicros.sum === 1000000L)
    val digits = Tables.events(spark, sf).select(col("value")).collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong)
      .filter(_ > 0).map(_.toString.head.asDigit.toLong)
    val exp = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Relational.stat23Benford(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(rows.map(_._1).toSet === exp.keySet)
    rows.foreach { case (d, n, bf) =>
      assert(n === exp(d))
      assert(bf === Relational.BenfordMicros(d.toInt - 1))
    }
  }

  test("coverageCurve: monotone, capped at total, replayed from counts") {
    val freqs = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
    val total = freqs.map(_._2).sum
    val rows = TextAnalysis.coverageCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (k, cum, tot, cov) =>
      assert(tot === total)
      assert(cum === freqs.take(k.toInt).map(_._2).sum)
      assert(cov === math.floor(1e6 * cum.toDouble / total + 0.5).toLong)
    }
    assert(rows.map(_._2) === rows.map(_._2).sorted)
  }

  test("liftDeciles: ntile replay; weighted mean lift is 1") {
    val scored = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        val s = (0 until 8)
          .map(k => math.floor(e(k).toDouble * 1e6 + 0.5).toLong).sum
        (s, r.getLong(0), (r.getInt(2) % 2).toLong)
      }.sortBy { case (s, id, _) => (-s, id) }
    val n = scored.length
    // standard ntile: first (n mod 10) buckets take ceil(n/10)
    val (q, rem) = (n / 10, n % 10)
    val sizes = (0 until 10).map(i => if (i < rem) q + 1 else q)
    val buckets = sizes.scanLeft(0)(_ + _).sliding(2).toSeq
      .map { case Seq(a, b) => scored.slice(a, b) }
    val rows = Profiling.liftDeciles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    val posTot = scored.map(_._3).sum
    rows.zip(buckets).foreach { case ((dec, cnt, np, lift), b) =>
      assert(cnt === b.length.toLong)
      assert(np === b.map(_._3).sum)
      assert(lift === 1000000L * np * n / (cnt * posTot))
    }
    // deciles partition the corpus
    assert(rows.map(_._2).sum === n.toLong)
    assert(rows.map(_._3).sum === posTot)
  }
}
