package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapters from the driver's synthetic testdata (TESTDATA.md: TPC-H-ish
  * star schema + an `events` stream) into the reference engine's input
  * schemas (SURVEY.md §1), so the library modules (views.Hourly, views.Kpi,
  * suggest.Suggestions, …) run end-to-end on real parquet inputs and are
  * registered in SparkEntry.queries against the DuckDB oracle.
  *
  * Timestamp notes:
  *  - `events.ts` has shipped as parquet TIMESTAMP(NANOS) (readable only
  *    as a long of nanos via spark.sql.legacy.parquet.nanosAsLong) and as
  *    timestamp[us] (read as TIMESTAMP_NTZ). Conversion to the µs-precision
  *    NTZ contract is schema-adaptive — functions.EventTimeExpr dispatches
  *    on the resolved child type (long → exact DIV 1000; timestamp → µs
  *    pass-through), so the adapters survive either physical form. The
  *    oracle's CAST(ts AS TIMESTAMP) truncates ns→µs / no-ops identically.
  *  - Downstream date_trunc/hour arithmetic implicitly casts NTZ to
  *    session-TZ TIMESTAMP (Spark 4.1 behavior), so wall-clock correctness
  *    relies on the UTC session-timezone pin in build.sbt/Verify; query
  *    outputs are re-cast to NTZ at the edge before the oracle compare.
  */
object TestdataAdapter {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Settable per-session at runtime; required before any scan of
    // events.parquet (TIMESTAMP(NANOS)). Harmless for the other tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** long nanos → TIMESTAMP_NTZ at microsecond precision. The DIV 1000 is
    * done in decimal so the full 19-digit nanos value stays exact (a double
    * division would lose precision above 2^53).
    */
  private def ntzFromNanos(c: Column): Column =
    graft.functions.Cols.ntzFromNanos(c)

  /** events → vehicle_positions shape: route=event_type, vehicle=user_id. */
  def vehiclePositions(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("event_type").as("route_id"),
      col("user_id").cast("string").as("vehicle_id"),
      ntzFromNanos(col("ts")).as("observed_at"))

  /** events → trip_updates shape: delay measured by `value`. */
  def tripUpdates(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("event_type").as("route_id"),
      ntzFromNanos(col("ts")).as("observed_at"),
      col("value").as("delay_seconds"))

  /** events → passenger_flow_events shape: stop=user_id, demand=`value`. */
  def flowEvents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("user_id").cast("string").as("stop_id"),
      ntzFromNanos(col("ts")).as("observed_at"),
      col("value").as("estimated_passengers"))

  /** stop_to_route-shaped mapping: stop=user_id, route=event_type — the
    * DISTINCT pairs observed in the stream, so demand/delay/vehicle views
    * share one route-id key space and a stop genuinely fans out to several
    * routes (the J2 double-counting quirk, SURVEY §7.4 item 11).
    */
  def stopToRouteMapping(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("user_id").cast("string").as("stop_id"),
      col("event_type").as("route_id")).distinct()

  /** events → weather_observations shape (deterministic derived metrics). */
  def weather(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      ntzFromNanos(col("ts")).as("observed_at"),
      col("value").as("temperature_c"),
      (col("value") / 10.0).as("precipitation_mm"),
      (col("value") / 100.0).as("wind_speed_mps"))

  /** Raw events keyed by event_id with the µs-truncated NTZ timestamp —
    * the probe side for temporal (as-of) lookups.
    */
  def timedEvents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("event_id"),
      col("event_type").as("route_id"),
      ntzFromNanos(col("ts")).as("observed_at"))

  /** User-activity shape (funnel / cohort / gap-fill analytics): who did
    * what when, with the measure column along for aggregation.
    */
  def userEvents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("user_id"),
      col("event_type"),
      ntzFromNanos(col("ts")).as("observed_at"),
      col("value"))
}
