package graft

/** The §3.2 lifecycle as ONE chain (streaming/EndToEnd.scala): protobuf
  * feed bytes → wire decode → producer envelope → graftqueue V2 sink →
  * micro-batch consumers → KPI views → suggestion engine. The
  * correctness gate hash-checks it against the batch suggestions
  * oracle at sf0.01; this spec pins the same equivalence at sf0.001 so
  * a fidelity regression in ANY hop (timestamp truncation, double
  * round-trip, queue byte loss, view drift) fails `sbt test` before
  * the driver sees it.
  */
class EndToEndSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming e2e chain is row-identical to the batch suggestions pipeline") {
    val e2e = graft.streaming.EndToEnd.suggestionsE2E(spark, dir)
    val batch = Pipelines.suggestions(spark, dir, onlyChanges = true)
    assert(e2e.columns.toSeq == batch.columns.toSeq)
    val cols = e2e.columns.map(org.apache.spark.sql.functions.col)
    // exceptAll both ways = multiset equality, bit-exact on every column
    assert(e2e.select(cols: _*).exceptAll(batch.select(cols: _*)).isEmpty)
    assert(batch.select(cols: _*).exceptAll(e2e.select(cols: _*)).isEmpty)
    assert(e2e.count() == batch.count())
  }
}
