package graft

/** Driver-contract smoke: entry() returns rows; every queries() entry runs at
  * sf0.001; every oracleSql key has a matching query. */
class SparkEntrySpec extends SparkSpec {
  test("entry returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run at sf0.001 and oracle keys are a subset") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name has empty schema")
      df.count() // must execute
    }
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without query: $unknown")
  }
}
