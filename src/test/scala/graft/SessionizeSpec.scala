package graft

import org.apache.spark.sql.functions._
import graft.rel.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // events(ts nanos, user_id, event_id, event_type, value); helper builds
  // the raw-events shape Sessionize consumes.
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("ts", "user_id", "event_id", "event_type", "value")

  private val H = 3600L * 1000000 * 1000 // one hour in nanos

  test("events within the gap share a session; a gap opens a new one") {
    val df = ev(
      (0L * H, 1L, 1L, "view", 1.0),
      (2L * H, 1L, 2L, "click", 2.0),   // +2h  → same session
      (15L * H, 1L, 3L, "view", 3.0),   // +13h → new session
      (16L * H, 1L, 4L, "buy", 4.0))    // +1h  → same session
    val s = Sessionize.sessions(df).collect()
    assert(s.length == 2)
    assert(s.map(_.getAs[Long]("session_idx")).toSeq == Seq(1L, 2L))
    assert(s.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 2L))
    assert(s(0).getAs[Double]("duration_sec") == 7200.0)
    assert(s(1).getAs[Double]("total_value") == 7.0)
    assert(s(1).getAs[Long]("n_event_types") == 2L)
  }

  test("a boundary gap exactly equal to GapUs does NOT split (strict >)") {
    val gapNanos = Sessionize.GapUs * 1000
    val df = ev((0L, 1L, 1L, "a", 0.0), (gapNanos, 1L, 2L, "a", 0.0),
      (2 * gapNanos + 1000, 1L, 3L, "a", 0.0)) // +gap+1µs → splits
    val s = Sessionize.sessions(df).collect()
    assert(s.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
  }

  test("users sessionize independently and single events form 1-event sessions") {
    val df = ev((0L, 1L, 1L, "a", 1.0), (0L, 2L, 2L, "b", 2.0))
    val s = Sessionize.sessions(df).collect()
    assert(s.length == 2)
    assert(s.forall(_.getAs[Long]("n_events") == 1L))
    assert(s.forall(_.getAs[Double]("duration_sec") == 0.0))
  }

  test("session stats: bounce rate and averages from hand-built sessions") {
    val df = ev(
      (0L * H, 1L, 1L, "view", 1.0),
      (1L * H, 1L, 2L, "click", 2.0),  // session 1: 2 events, 1h
      (20L * H, 1L, 3L, "view", 3.0),  // session 2: bounce
      (0L * H, 2L, 4L, "view", 4.0))   // user 2: one bounce session
    val s = Sessionize.sessionStats(df).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = s(1L)
    assert(u1.getAs[Long]("n_sessions") == 2L)
    assert(u1.getAs[Long]("total_events") == 3L)
    assert(u1.getAs[Double]("avg_events_per_session") == 1.5)
    assert(u1.getAs[Double]("avg_duration_sec") == 1800.0) // (3600 + 0) / 2
    assert(u1.getAs[Double]("bounce_rate") == 0.5)
    assert(u1.getAs[Double]("total_value") == 6.0)
    assert(s(2L).getAs[Double]("bounce_rate") == 1.0)
  }

  test("batch sessions agree with streaming session_window off boundary-exact gaps") {
    import org.apache.spark.sql.functions._
    // session_window splits at diff >= gap, batch at diff > gap; away from
    // the exact boundary the two conventions produce identical sessions
    val df = ev(
      (0L, 1L, 1L, "a", 1.0),
      (2L * H, 1L, 2L, "a", 1.0),
      (20L * H, 1L, 3L, "a", 1.0))
    val batch = Sessionize.sessions(df)
      .select("user_id", "session_start", "session_end", "n_events").collect()
    val viaWindow = df
      .select(col("user_id"),
        graft.functions.Cols.ntzFromNanos(col("ts")).cast("timestamp").as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy("session_start").collect()
    assert(batch.map(_.toString).toSeq == viaWindow.map(_.toString).toSeq)
  }

  test("plan shuffles once on user_id (no second exchange for the groupBy)") {
    val df = ev((0L, 1L, 1L, "a", 1.0), (H, 1L, 2L, "b", 2.0))
    // drop the presentation orderBy — its range exchange is output-only
    val plan = Sessionize.sessions(df).queryExecution.executedPlan
    val exchanges = plan.toString.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected hash + final-sort exchanges only:\n$plan")
  }
}
