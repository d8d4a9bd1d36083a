package graft

/** Every driver-contract query must at least execute on sf0.001 — the same
  * smoke the driver applies to entry(). Full value-level checking happens
  * against the DuckDB oracles (tools/compare_oracle.py at sf0.01).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.count() >= 0)
    }
  }
}
