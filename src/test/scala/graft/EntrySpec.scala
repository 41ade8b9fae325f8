package graft

class EntrySpec extends SparkSpec {

  test("driver contract: entry() returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("driver contract: oracle SQL are single statements") {
    // a trailing ';' or a ';'-separated second statement would break a
    // single-statement executor; ';' inside string/regex literals is fine
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.trim.endsWith(";") || sql.linesIterator.exists(_.trim.endsWith(";"))
    }
    assert(bad.isEmpty, s"multi-statement oracle SQL: ${bad.keys}")
  }

  test("driver contract: query names are stable identifiers") {
    SparkEntry.queries.keys.foreach(n =>
      assert(n.matches("[a-z0-9_]+"), s"non-identifier query name: $n"))
  }
}
