package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapters from the driver's synthetic testdata (TESTDATA.md: TPC-H-ish
  * star schema + an `events` stream) into the reference engine's input
  * schemas (SURVEY.md §1), so the library modules (views.Hourly, views.Kpi,
  * suggest.Suggestions, …) are exercised end-to-end by the DuckDB-oracle
  * harness on real parquet inputs.
  *
  * All timestamps are normalized to TIMESTAMP_NTZ: the testdata parquet is
  * written timezone-naive and the DuckDB oracle reads it naive, so keeping
  * NTZ end-to-end removes any UTC-adjustment ambiguity in the compare.
  */
object TestdataAdapter {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def ntz(c: org.apache.spark.sql.Column) = c.cast("timestamp_ntz")

  /** events → vehicle_positions shape: route=event_type, vehicle=user_id. */
  def vehiclePositions(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("event_type").as("route_id"),
      col("user_id").cast("string").as("vehicle_id"),
      ntz(col("ts")).as("observed_at"))

  /** events → trip_updates shape: delay measured by `value`. */
  def tripUpdates(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("event_type").as("route_id"),
      ntz(col("ts")).as("observed_at"),
      col("value").as("delay_seconds"))

  /** events → passenger_flow_events shape: stop=user_id, demand=`value`. */
  def flowEvents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("user_id").cast("string").as("stop_id"),
      ntz(col("ts")).as("observed_at"),
      col("value").as("estimated_passengers"))

  /** customer → stop_to_route-shaped mapping: stop=custkey, route=mktsegment. */
  def stopToRouteMapping(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(
      col("c_custkey").cast("string").as("stop_id"),
      col("c_mktsegment").as("route_id")).distinct()

  /** events → weather_observations shape (deterministic derived metrics). */
  def weather(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      ntz(col("ts")).as("observed_at"),
      col("value").as("temperature_c"),
      (col("value") / 10.0).as("precipitation_mm"),
      (col("value") / 100.0).as("wind_speed_mps"))
}
