package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.detSum

/** Gap-based sessionization of the event stream — the standard
  * "split each user's clickstream into sessions at inactivity gaps"
  * operator every training-data / behavioral pipeline needs (session
  * boundaries feed dialogue-turn grouping, page-visit documents, and
  * per-session labels).
  *
  * Algorithm: per user, order events by time; an event starts a new
  * session when it is the user's first or arrives more than [[GapUs]]
  * after the previous one; the session index is the running count of
  * session-starts; session rows are then a plain grouped aggregation.
  *
  * Scale shape: ONE shuffle total. The lag/running-sum windows are
  * partitioned by `user_id` (no global sort — each user's timeline sorts
  * independently inside its partition), and the final
  * `groupBy(user_id, session_idx)` reuses that clustering
  * (`HashPartitioning(user_id)` satisfies the aggregation's
  * `ClusteredDistribution(user_id, session_idx)`), so Catalyst plans no
  * second exchange. Skew bound: the busiest user's full timeline must fit
  * one task — at 100 TB that is the usual per-entity sessionization bound,
  * and a salting pre-split on (user_id, day) with a boundary-merge pass is
  * the escape hatch if a single entity outgrows it.
  *
  * Determinism: time math in integer µs (nanos floored exactly as DuckDB's
  * `CAST(ts AS TIMESTAMP)` truncates), ordering tie-broken by event_id,
  * value sums decimal-exact via detSum.
  */
object Sessionize {

  /** Inactivity gap that closes a session: 12 h in µs. (The classic web
    * value is 30 min; the synthetic feed averages one event per user per
    * ~7 h, so 12 h yields a meaningful mix — ~3 events/session.)
    */
  val GapUs: Long = 12L * 3600 * 1000000

  /** event ts (long nanos or timestamp) → long µs, schema-adaptive. */
  private def usFromNanos(c: Column): Column =
    graft.functions.Cols.microsFromNanos(c)

  /** events(ts: any physical event-time form) → one row per (user_id, session_idx) with
    * start/end, event/type counts, duration, and exact value total.
    */
  def sessions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val e = events.select(
      col("user_id"), col("event_id"), col("event_type"), col("value"),
      usFromNanos(col("ts")).as("ts_us"))
    val flagged = e
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
    flagged
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        timestamp_micros(min("ts_us")).cast("timestamp_ntz").as("session_start"),
        timestamp_micros(max("ts_us")).cast("timestamp_ntz").as("session_end"),
        count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_event_types"),
        ((max("ts_us") - min("ts_us")).cast("double") / 1000000).as("duration_sec"),
        detSum(col("value")).as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Per-user behavioral profile on top of [[sessions]] — the report
    * sessionization exists to feed: session counts, mean session length
    * (events and seconds), bounce share (single-event sessions), and
    * exact value totals. One extra hash aggregation keyed on user_id,
    * reusing the session frame's existing user_id clustering (no new
    * exchange). Mean columns divide exact integer/decimal sums by exact
    * counts, so cross-engine doubles match bit-for-bit.
    */
  def sessionStats(events: DataFrame): DataFrame =
    sessions(events)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        (sum(col("n_events")).cast("double") / count(lit(1))).as("avg_events_per_session"),
        // duration re-summed in integer µs (double addition order is
        // engine-dependent; the µs round-trip is exact in both)
        // explicit round() before the long cast: the double µs value
        // sits an epsilon off the integer, and Spark's cast truncates
        // where DuckDB's rounds — rounding in both recovers the exact µs
        (sum(round(col("duration_sec") * 1000000).cast("long")).cast("double")
          / lit(1000000) / count(lit(1))).as("avg_duration_sec"),
        (count(when(col("n_events") === 1, 1)).cast("double") / count(lit(1)))
          .as("bounce_rate"),
        detSum(col("total_value")).as("total_value"))
      .orderBy("user_id")

  /** DuckDB oracle twin of [[sessionStats]]: same session CTE chain, one
    * more grouped SELECT.
    */
  lazy val sessionStatsSql: String = {
    val inner = sessionsSql.replace("ORDER BY 1, 2", "")
    s"""WITH s AS ($inner)
       |SELECT user_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(SUM(n_events) AS BIGINT) AS total_events,
       |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events_per_session,
       |  CAST(SUM(CAST(round(duration_sec * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*) AS avg_duration_sec,
       |  CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE) / COUNT(*) AS bounce_rate,
       |  CAST(SUM(CAST(total_value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB oracle twin of [[sessions]]. */
  val sessionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |  FROM events),
       |f AS (
       |  SELECT *, CASE WHEN LAG(ts_us) OVER w IS NULL
       |                   OR ts_us - LAG(ts_us) OVER w > $GapUs THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |g AS (
       |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM f)
       |SELECT user_id, session_idx,
       |  make_timestamp(MIN(ts_us)) AS session_start,
       |  make_timestamp(MAX(ts_us)) AS session_end,
       |  COUNT(*) AS n_events,
       |  COUNT(DISTINCT event_type) AS n_event_types,
       |  CAST(MAX(ts_us) - MIN(ts_us) AS DOUBLE) / 1000000 AS duration_sec,
       |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** SCD2 dimension-history build (Kimball type 2), event-stream form:
    * collapse each user's event stream into validity intervals of their
    * event_type "state" — a history row opens when the state changes,
    * closes (exclusive) at the next change, and the open-ended interval
    * is flagged current. Complements
    * [[graft.rel.Relational.scd2Customers]], which APPLIES a snapshot
    * batch to an existing history: this is the from-scratch rebuild out
    * of a raw event log (change-point compression), the other is the
    * incremental merge.
    *
    * Scale shape: the change filter and the interval lead share one
    * (user_id)-keyed partitioning/ordering, so the whole build is a
    * single hash exchange plus in-partition sorts; time math stays in
    * integer µs until the output edge. Ties (same user, same µs) are
    * broken by event_id inside the windows; the presentation sort adds
    * `state` and `is_current` because two changes can legitimately share
    * a µs timestamp (nanos→µs truncation), and an A→B→A flip inside one
    * µs would otherwise leave the tied rows' order engine-dependent.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val e = events.select(
      col("user_id"), col("event_id"), col("event_type"),
      usFromNanos(col("ts")).as("ts_us"))
    e.withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("event_type") =!= col("prev_state"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .select(
        col("user_id"),
        col("event_type").as("state"),
        timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("valid_from"),
        timestamp_micros(col("next_us")).cast("timestamp_ntz").as("valid_to"),
        col("next_us").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "state", "is_current")
  }

  val scd2HistorySql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |c AS (SELECT *, LAG(event_type) OVER (
      |        PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state
      |      FROM e),
      |ch AS (SELECT * FROM c WHERE prev_state IS NULL OR event_type <> prev_state),
      |iv AS (SELECT user_id, event_type AS state, ts_us,
      |         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_us
      |       FROM ch)
      |SELECT user_id, state,
      |  make_timestamp(ts_us) AS valid_from,
      |  make_timestamp(next_us) AS valid_to,
      |  next_us IS NULL AS is_current
      |FROM iv ORDER BY user_id, valid_from, state, is_current""".stripMargin
}
