package graft

/** Smoke: every SparkEntry query runs on sf0.001 and the contract holds
  * (each oracleSql key has a queries entry; flagship returns rows). The
  * value-level correctness gate is the driver's DuckDB compare
  * (scripts/check_oracle.py mirrors it locally).
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs and yields a non-degenerate schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      withClue(name) { df.count() } // must execute without throwing
    }
  }
}
