package graft

import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {

  test("listener records actions with input paths, duration, and row counts") {
    val l = Lineage.attach(spark)
    try {
      val ev = TestdataAdapter.table(spark, "/root/testdata/sf0.001", "events")
      ev.groupBy("event_type").count().collect()
      ev.select("event_id").write.format("noop").mode("overwrite").save()
      // listener callbacks are delivered asynchronously — poll briefly
      val deadline = System.nanoTime() + 10000000000L
      while (l.records.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      val recs = l.records
      assert(recs.nonEmpty, "no lineage captured")
      assert(recs.forall(_.error.isEmpty))
      assert(recs.exists(_.inputPaths.exists(_.contains("events.parquet"))),
        s"input paths missing: ${recs.map(_.inputPaths)}")
      assert(recs.forall(_.durationMs >= 0))
      val report = Lineage.report(spark, l)
      // >= because a late-arriving callback may land between the record
      // snapshot above and the report build
      assert(report.count() >= recs.length)
      assert(report.columns.toSeq ==
        Seq("action", "duration_ms", "input_paths", "output_rows", "error"))
    } finally Lineage.detach(spark, l)
  }

  test("detached listener stops recording") {
    val l = Lineage.attach(spark)
    Lineage.detach(spark, l)
    l.clear()
    spark.range(10).count()
    Thread.sleep(500) // give a stray callback time to land if one were coming
    assert(l.records.isEmpty)
  }
}
