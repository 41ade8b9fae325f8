package graft

import org.apache.spark.sql.functions.col
import graft.rel.Quality
import graft.rel.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("each rule counts exactly its violations in one pass") {
    val df = Seq(
      (Some(1L), Some("click"), Some(10.0), Some("""{"k":1}""")),
      (Some(1L), Some("view"), Some(-5.0), Some("not json")), // dup id, range, regex
      (None, Some("bogus"), None, None),                      // null id, bad type
      (Some(3L), None, Some(2e6), Some("""{"k":2}""")))       // null type, range
      .toDF("event_id", "event_type", "value", "props")
    val r = Quality.check(df, Seq(
      NotNull("event_id"),
      Unique("event_id"),
      NotNull("event_type"),
      InRange("value", 0, 1e6),
      InSet("event_type", Seq("click", "view")),
      Matches("props", "^\\{.*\\}$")))
      .collect()
      .map(x => x.getAs[String]("rule") ->
        ((x.getAs[Long]("n_violations"), x.getAs[Boolean]("pass")))).toMap

    assert(r("not_null(event_id)") == ((1L, false)))
    assert(r("unique(event_id)") == ((1L, false)))   // two rows share id 1
    assert(r("not_null(event_type)") == ((1L, false)))
    assert(r("in_range(value, 0.0, 1000000.0)") == ((2L, false))) // -5 and 2e6
    assert(r("in_set(event_type)") == ((1L, false))) // 'bogus'; nulls don't count
    assert(r("matches(props)") == ((1L, false)))     // 'not json'; nulls don't count
    assert(r.values.forall(_._1 <= 4))
  }

  test("clean data passes every registered events rule") {
    val ev = TestdataAdapter.table(spark, "/root/testdata/sf0.001", "events")
    val r = Quality.eventsReport(ev).collect()
    assert(r.length == 8)
    assert(r.forall(_.getAs[Boolean]("pass")), "driver testdata must be clean")
  }

  test("write-audit-publish: passing batch publishes, failing batch leaves target untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wap").toString + "/t"
    val rules = Seq(NotNull("event_id"), InRange("value", 0, 100))
    val good = Seq((Some(1L), 10.0), (Some(2L), 20.0)).toDF("event_id", "value")
    val (ok1, _) = Quality.writeAuditPublish(good, rules, dir)
    assert(ok1)
    assert(spark.read.parquet(dir).count() == 2)

    val bad = Seq((Some(3L), 999.0), (None: Option[Long], 4.0)).toDF("event_id", "value")
    val (ok2, report) = Quality.writeAuditPublish(bad, rules, dir)
    assert(!ok2)
    // live table is byte-untouched; staging left behind for inspection
    assert(spark.read.parquet(dir).count() == 2)
    assert(spark.read.parquet(dir + "__staging").count() == 2)
    val failed = report.filter(!col("pass")).collect().map(_.getAs[String]("rule")).toSet
    assert(failed == Set("not_null(event_id)", "in_range(value, 0.0, 100.0)"))
  }

  test("observed rules audit an existing action with zero extra scans") {
    val ev = TestdataAdapter.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "value")
    val (audited, obs) = Quality.observed(ev, Seq(
      NotNull("event_id"),
      InRange("value", 0, 1e6),
      InSet("event_type", Seq("click", "view", "signup", "purchase", "error"))))
    // the pipeline's own action (here a write) drives metric collection
    audited.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == 1000L)
    assert(m("not_null(event_id)") == 0L)
    assert(m("in_range(value, 0.0, 1000000.0)") == 0L)
    assert(m("in_set(event_type)") == 0L)
    // Unique needs a distinct aggregate — rejected up front
    intercept[IllegalArgumentException] {
      Quality.observed(ev, Seq(Unique("event_id")))
    }
  }

  test("the whole rule set compiles to a single aggregation (no per-rule scans)") {
    val ev = TestdataAdapter.table(spark, "/root/testdata/sf0.001", "events")
    val plan = Quality.eventsReport(ev).queryExecution.executedPlan.toString
    // one scan of the parquet input, however many rules ride on it
    assert("FileScan parquet".r.findAllIn(plan).length == 1, plan)
  }
}
