package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4h operators: RFM customer scoring, BMP pixel statistics,
  * temperature-scaled mixture. Values are pinned by the DuckDB oracles;
  * these tests pin plans and semantic invariants.
  */
class Round4hSpec extends SparkSpec {

  test("rfm: quartiles are balanced and the segment encodes the scores") {
    val rows = EventAnalytics.rfmScores(spark, sf).collect()
    assert(rows.nonEmpty)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val counts = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.length)
      assert(counts.keySet === Set(1L, 2L, 3L, 4L))
      // ntile balance: bucket sizes differ by at most 1
      assert(counts.values.max - counts.values.min <= 1, s"$c unbalanced")
    }
    rows.foreach { r =>
      assert(r.getAs[String]("segment") ===
        s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}${r.getAs[Long]("m_score")}")
      assert(r.getAs[Long]("recency_days") >= 0)
    }
  }

  test("mm4: pixel stats decode the real payload — mean within byte range") {
    val rows = Multimodal.pixelStats(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("px_min"), r.getAs[Long]("px_max"))
      val mean = r.getAs[Double]("px_mean")
      assert(mn <= mx && mean >= mn && mean <= mx)
      // payload is ASCII text: printable range
      assert(mn >= 32 && mx < 128)
      val dark = r.getAs[Double]("dark_frac")
      assert(dark >= 0.0 && dark <= 1.0)
    }
  }

  test("mm4: the whole decode+profile is one narrow projection") {
    val p = Multimodal.pixelStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"pixel stats must not shuffle:\n$p")
  }

  test("typed1: the Dataset/Aggregator face still prunes the scan schema") {
    val p = Typed.typed1Revenue(spark, sf)
      .queryExecution.executedPlan.toString
    // the as[LineItem] projection narrows the read before
    // deserialization — shipdate and the other 6 columns never load
    assert(!p.contains("l_shipdate"), s"unpruned scan:\n$p")
    assert(p.contains("l_returnflag"))
  }

  test("mix2: temperature flattens the mixture toward (but not to) uniform") {
    val rows = TextAnalysis.temperatureMix(spark, sf).collect()
    val n = rows.length
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      val temp = r.getAs[Double]("temp_share")
      val uniform = 1.0 / n
      // sqrt scaling moves every share strictly toward uniform
      if (share > uniform) assert(temp < share && temp > uniform - 1e-6)
      if (share < uniform) assert(temp > share && temp < uniform + 1e-6)
    }
  }
}
