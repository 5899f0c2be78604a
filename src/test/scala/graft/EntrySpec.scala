package graft

/** Pins the driver's smoke contract: SparkEntry.entry runs the flagship
  * query on sf0.001 and must return rows; every declared query name has
  * unique, well-formed oracle coverage.
  */
class EntrySpec extends SparkSpec {

  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a declared query; SQL is non-empty") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle for unknown query $name")
      assert(sql.trim.nonEmpty)
    }
    // full oracle coverage — the round-2 invariant (zero rows-only checks)
    assert(SparkEntry.oracleSql.keySet === qs)
  }
}
