package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The ts-seam regression guard: the driver's `events.ts` parquet column
  * has shipped both as TIMESTAMP(NANOS) — readable only as a long of
  * nanos — and as timestamp[us] (TIMESTAMP_NTZ / INT96-adjusted
  * TIMESTAMP). Round 7 broke because the conversion was written for
  * exactly one of those worlds. This spec writes the SAME events in all
  * three physical forms and asserts the adapter and a streaming twin
  * produce identical rows from each — the test that fails the moment a
  * fixed-type cast sneaks back into the event-time path.
  */
class EventTimeSeamSpec extends SparkSpec {

  import spark.implicits._

  // (event_id, user_id, event_type, value, µs-since-epoch); includes a
  // sub-millisecond component so ns→µs truncation is exercised, and an
  // hour boundary so hourly grouping is non-trivial.
  private val rowsUs = Seq(
    (1L, 10L, "click", 1.5, 1704067200123456L), // 2024-01-01 00:00:00.123456
    (2L, 10L, "click", 2.5, 1704070799999999L), // 2024-01-01 00:59:59.999999
    (3L, 11L, "view", 0.5, 1704070800000001L),  // 2024-01-01 01:00:00.000001
    (4L, 12L, "view", 3.0, 1704153599500000L))  // 2024-01-01 23:59:59.5

  private def base: DataFrame = rowsUs
    .toDF("event_id", "user_id", "event_type", "value", "us")

  /** Write the fixture with ts in one physical form; returns the dir. */
  private def write(form: String): String = {
    val dir = Files.createTempDirectory(s"graft_tsseam_$form").toString
    val df = form match {
      // the legacy nanos world: nanosAsLong surfaced TIMESTAMP(NANOS)
      // as a plain long of nanos, so a raw int64 column reproduces the
      // exact Spark-side schema that path saw (with +999 ns of
      // sub-µs noise to prove the floor-division truncates, not rounds)
      case "long_nanos" =>
        base.withColumn("ts", col("us") * 1000L + 999L)
      case "ntz_us" =>
        base.withColumn("ts",
          timestamp_micros(col("us")).cast("timestamp_ntz"))
      case "tz_us" =>
        base.withColumn("ts", timestamp_micros(col("us")))
      case other => sys.error(other)
    }
    // testdata ships events.parquet as a single FILE (the streaming path
    // file-copies it), so lift the lone part file out of the write dir
    df.drop("us").coalesce(1).write.mode("overwrite").parquet(s"$dir/_w")
    val part = new java.io.File(s"$dir/_w").listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private val forms = Seq("long_nanos", "ntz_us", "tz_us")
  private lazy val dirs: Map[String, String] =
    forms.map(f => f -> write(f)).toMap

  private def collected(df: DataFrame): Seq[Row] =
    df.orderBy("route_id", "vehicle_id", "observed_at").collect().toSeq

  test("TestdataAdapter.vehiclePositions is identical across all ts physical forms") {
    val expected = collected(TestdataAdapter.vehiclePositions(spark, dirs("long_nanos")))
    assert(expected.nonEmpty)
    // µs-truncation really happened (the +999 ns noise is gone)
    assert(expected.map(_.getAs[java.time.LocalDateTime]("observed_at").getNano % 1000)
      .forall(_ == 0))
    forms.tail.foreach { f =>
      val got = collected(TestdataAdapter.vehiclePositions(spark, dirs(f)))
      assert(got == expected, s"form $f diverges from long_nanos")
    }
  }

  test("userEvents µs arithmetic (sessionize input) is identical across forms") {
    def sess(dir: String) =
      graft.rel.Sessionize.sessions(TestdataAdapter.table(spark, dir, "events"))
        .orderBy("user_id", "session_idx").collect().toSeq
    val expected = sess(dirs("long_nanos"))
    assert(expected.nonEmpty)
    forms.tail.foreach { f =>
      assert(sess(dirs(f)) == expected, s"form $f diverges from long_nanos")
    }
  }

  test("TIMESTAMP child under a non-UTC session TZ fails analysis, not silently shifts") {
    val key = "spark.sql.session.timeZone"
    try {
      spark.conf.set(key, "Europe/Bucharest")
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        TestdataAdapter.vehiclePositions(spark, dirs("tz_us"))
      }
      assert(e.getMessage.contains("UTC"))
      // UTC aliases that normalize to offset zero stay accepted
      spark.conf.set(key, "Etc/UTC")
      assert(TestdataAdapter.vehiclePositions(spark, dirs("tz_us")).columns.nonEmpty)
      // zone-free forms carry no session-TZ precondition at all
      spark.conf.set(key, "Europe/Bucharest")
      assert(TestdataAdapter.vehiclePositions(spark, dirs("ntz_us")).columns.nonEmpty)
      assert(TestdataAdapter.vehiclePositions(spark, dirs("long_nanos")).columns.nonEmpty)
    } finally spark.conf.set(key, "UTC")
  }

  test("streaming twin (vehicleHourlyStream) is identical across forms") {
    def run(dir: String) =
      graft.streaming.Streams.vehicleHourlyStream(spark, dir).collect().toSeq
    val expected = run(dirs("long_nanos"))
    assert(expected.nonEmpty)
    forms.tail.foreach { f =>
      assert(run(dirs(f)) == expected, s"form $f diverges from long_nanos")
    }
  }
}
