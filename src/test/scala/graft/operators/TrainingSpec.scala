package graft.operators

import graft.{SparkSpec, Tables}

class TrainingSpec extends SparkSpec {

  // round half away from zero, restated independently of the operator
  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("linear GD weights equal an independent driver-side replay") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val got = Training.linearGd(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // plain-Scala replay: features from raw string ops, GD in a loop —
    // no Spark expressions shared with the operator under test
    val feats = Tables.documents(spark, sf)
      .select("text", "lang", "n_chars").collect().map { r =>
        val text = r.getString(0)
        val x2 = text.toLowerCase.split("\\s+").count(_.nonEmpty) * 10000L
        val vowels = text.count(c => "aeiou".contains(c))
        val x3 = rnd(1e6 * vowels.toDouble / math.max(text.length, 1))
        val y = if (r.getString(1) == "en") 1000000L else 0L
        (Array(r.getLong(2) * 1000L, x2, x3, 1000000L), y)
      }
    val n = feats.length
    var w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to 8) {
      val g = Array(0L, 0L, 0L, 0L)
      for ((x, y) <- feats) {
        val p = rnd(x.indices.map(j => w(j) * x(j)).sum.toDouble / 1e6)
        val r = p - y
        for (j <- 0 until 4) g(j) += rnd(r.toDouble * x(j) / 1e6)
      }
      w = Array.tabulate(4)(j => w(j) - rnd(0.05 * g(j).toDouble / n))
    }
    assert(got == Map("chars_k" -> w(0), "tokens_h" -> w(1),
      "vowel_ratio" -> w(2), "bias" -> w(3)))
    assert(w.exists(_ != 0L)) // the probe actually moved
    // the checkpointed feature projection is unpersisted before return
    assert(spark.sparkContext.getPersistentRDDs.keySet == pre)
  }
}
