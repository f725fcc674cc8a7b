package graft

/** Every registered query runs end-to-end at sf0.001 and the flagship
  * entry returns rows (the driver's t1 smoke).
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle coverage or is explicitly exempt") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without DuckDB oracle: ${noOracle.mkString(", ")}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan
    }
  }
}
