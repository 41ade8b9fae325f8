package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.rel.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap fill: missing hours appear with zero count and carried-forward average") {
    val ev = Seq(
      (1L, "click", ts("2024-01-01 00:10:00"), 10.0),
      (1L, "click", ts("2024-01-01 00:40:00"), 20.0),
      // hours 01 and 02 missing for click
      (1L, "click", ts("2024-01-01 03:10:00"), 40.0),
      (2L, "view", ts("2024-01-01 02:15:00"), 5.0))
      .toDF("user_id", "event_type", "observed_at", "value")
    val r = Analytics.hourlyGapFill(ev).collect()
      .map(x => (x.getAs[String]("event_type"),
        x.getAs[java.time.LocalDateTime]("hour_ts").toString.replace('T', ' ').take(13)) ->
        (x.getAs[Long]("n_events"), Option(x.getAs[java.lang.Double]("avg_value")).map(_.doubleValue())))
      .toMap
    // grid spans 00..03 for both types
    assert(r.size == 8)
    assert(r(("click", "2024-01-01 00")) == ((2L, Some(15.0))))
    assert(r(("click", "2024-01-01 01")) == ((0L, Some(15.0)))) // forward-filled
    assert(r(("click", "2024-01-01 02")) == ((0L, Some(15.0))))
    assert(r(("click", "2024-01-01 03")) == ((1L, Some(40.0))))
    // view has no data before 02: null average, zero count
    assert(r(("view", "2024-01-01 00")) == ((0L, None)))
    assert(r(("view", "2024-01-01 02")) == ((1L, Some(5.0))))
  }

  test("funnel: steps only count events strictly after the previous step") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, "signup", ts("2024-01-01 00:00:00"), 0.0),
      (1L, "view", ts("2024-01-01 01:00:00"), 0.0),
      (1L, "purchase", ts("2024-01-01 02:00:00"), 0.0),
      // u2 viewed BEFORE signup only → stops at signup
      (2L, "view", ts("2024-01-01 00:00:00"), 0.0),
      (2L, "signup", ts("2024-01-01 01:00:00"), 0.0),
      // u3 purchase before view-after-signup → purchase step not reached
      (3L, "signup", ts("2024-01-01 00:00:00"), 0.0),
      (3L, "purchase", ts("2024-01-01 00:30:00"), 0.0),
      (3L, "view", ts("2024-01-01 01:00:00"), 0.0),
      // u4 never signs up
      (4L, "view", ts("2024-01-01 00:00:00"), 0.0))
      .toDF("user_id", "event_type", "observed_at", "value")
    val r = Analytics.funnel(ev).collect().head
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_signup") == 3L)           // u1, u2, u3
    assert(r.getAs[Long]("n_view_after_signup") == 2L) // u1, u3
    assert(r.getAs[Long]("n_purchase_after_view") == 1L) // u1 only
    assert(r.getAs[Double]("rate_purchase") == 0.5)
  }

  test("monthly trend: first month has null delta; deltas reconcile with revenue") {
    import graft.rel.Relational
    val r = Relational.monthlyRevenueTrend(spark, "/root/testdata/sf0.001").collect()
    assert(r.length > 12)
    assert(r.head.isNullAt(r.head.fieldIndex("prev_revenue")))
    for (i <- 1 until r.length) {
      val d = r(i).getAs[Double]("mom_delta")
      assert(d == r(i).getAs[Double]("revenue") - r(i - 1).getAs[Double]("revenue"))
    }
  }

  test("rfm: scores in 1..3, every bucket populated, monotone in the metric") {
    import graft.rel.Relational
    val r = Relational.rfmScores(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val scores = r.map(_.getAs[Int](c))
      assert(scores.forall(s => s >= 1 && s <= 3))
      assert(scores.toSet == Set(1, 2, 3), s"$c missing a bucket")
    }
    // monotone: sorting by monetary must sort m_score non-decreasingly
    val byMon = r.sortBy(_.getAs[Double]("monetary")).map(_.getAs[Int]("m_score"))
    assert(byMon.sameElements(byMon.sorted))
  }

  test("scd2: changed rows close and reopen, retired rows close, new rows open") {
    import graft.rel.Relational
    val t0 = "2024-01-01 00:00:00"
    val t1 = "2024-02-01 00:00:00"
    val history = Seq(
      (1L, 10.0, ts(t0), None: Option[Timestamp]),      // unchanged
      (2L, 20.0, ts(t0), None),                          // will change
      (3L, 30.0, ts(t0), None),                          // retired
      (4L, 5.0, ts("2023-06-01 00:00:00"), Some(ts(t0))) // already closed — untouched
    ).toDF("k", "v", "valid_from", "valid_to")
      .withColumn("valid_from", col("valid_from").cast("timestamp_ntz"))
      .withColumn("valid_to", col("valid_to").cast("timestamp_ntz"))
    val snapshot = Seq((1L, 10.0), (2L, 25.0), (5L, 50.0)).toDF("k", "v")
    val r = Relational.scd2Apply(history, snapshot, "k", Seq("v"),
      lit(t1).cast("timestamp_ntz")).collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Double]("v"),
        Option(x.getAs[java.time.LocalDateTime]("valid_to")).map(_.toString.take(7))))
    assert(r.toSet == Set(
      (1L, 10.0, None),            // unchanged open row
      (2L, 20.0, Some("2024-02")), // old version closed
      (2L, 25.0, None),            // new version open
      (3L, 30.0, Some("2024-02")), // retired: closed, no reopen
      (4L, 5.0, Some("2024-01")),  // historical row untouched
      (5L, 50.0, None)))           // brand-new key
    assert(r.length == 6)
  }

  test("cohort retention: offsets measured from first-seen week") {
    val ev = Seq(
      (1L, "click", ts("2024-01-01 10:00:00"), 0.0), // Mon wk0
      (1L, "click", ts("2024-01-10 10:00:00"), 0.0), // wk+1
      (1L, "click", ts("2024-01-17 10:00:00"), 0.0), // wk+2
      (2L, "click", ts("2024-01-03 10:00:00"), 0.0), // same cohort wk0
      (2L, "click", ts("2024-01-09 10:00:00"), 0.0), // wk+1
      (3L, "click", ts("2024-01-09 10:00:00"), 0.0)) // cohort of Jan 8
      .toDF("user_id", "event_type", "observed_at", "value")
    val r = Analytics.cohortRetention(ev).collect()
      .map(x => (x.getAs[java.time.LocalDateTime]("cohort_week").toString.take(10),
        x.getAs[Int]("week_offset")) ->
        x.getAs[Long]("n_active")).toMap
    assert(r(("2024-01-01", 0)) == 2L) // u1+u2 active in their first week
    assert(r(("2024-01-01", 1)) == 2L)
    assert(r(("2024-01-01", 2)) == 1L) // only u1
    assert(r(("2024-01-08", 0)) == 1L) // u3's own cohort
    assert(r.size == 4)
  }

  test("incremental merge: any partial split finalizes identically to full recompute") {
    import graft.rel.Incremental
    val ev = Seq(
      (1L, "click", ts("2024-01-01 00:10:00"), 10.5),
      (2L, "click", ts("2024-01-01 00:40:00"), 20.25),
      (1L, "click", ts("2024-01-01 01:05:00"), 1.0),
      (3L, "view", ts("2024-01-01 01:30:00"), 7.75),
      (2L, "view", ts("2024-01-01 02:59:00"), 2.0))
      .toDF("user_id", "event_type", "observed_at", "value")
    val full = Incremental.finalizeHourly(Incremental.hourlyPartial(ev)).collect().toSeq
    // end-to-end split-at-latest-hour scenario
    val inc = Incremental.incrementalHourlyMerge(ev).collect().toSeq
    assert(inc == full)
    // arbitrary 3-way split merges to the same rows
    val parts = Seq(0, 1, 2).map(k =>
      Incremental.hourlyPartial(ev.filter(col("user_id") % 3 === k)))
    assert(Incremental.finalizeHourly(Incremental.mergePartials(parts)).collect().toSeq == full)
    // merging an empty increment is the identity
    val withEmpty = Incremental.mergePartials(Seq(
      Incremental.hourlyPartial(ev), Incremental.hourlyPartial(ev.filter(lit(false)))))
    assert(Incremental.finalizeHourly(withEmpty).collect().toSeq == full)
  }
}
