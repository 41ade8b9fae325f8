package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cols._

/** ML-dataset hourly views (SURVEY.md §2.4 A1-A4, §2.3 J1-J3).
  * Re-expression of the reference's Postgres views
  * (initdb/init-postgis.sql:182-246) as DataFrame => DataFrame functions.
  *
  * Scale notes: every view is a single hash-aggregate on its grouping key —
  * Catalyst plans partial (map-side) + final aggregation, so the shuffle
  * carries pre-combined rows. `stopToRoute` is dimension-sized (stops ×
  * routes) and is broadcast into the event-stream join so the 100 TB fact
  * side never shuffles for J2.
  */
object Hourly {

  /** J1 — stop→route mapping: stop_times ⋈ trips, DISTINCT (stop_id, route_id).
    * Ref: initdb/init-postgis.sql:182-185.
    */
  def stopToRoute(stopTimes: DataFrame, trips: DataFrame): DataFrame =
    stopTimes
      .join(trips, "trip_id")
      .select("stop_id", "route_id")
      .distinct()

  /** J2 + A1 — hourly passenger demand per route. The stop→route fan-out
    * intentionally double-counts demand for stops served by several routes
    * (SURVEY §7.4 item 11). Ref: initdb/init-postgis.sql:187-194.
    */
  def passengerDemandHourly(flowEvents: DataFrame, stopToRoute: DataFrame): DataFrame =
    flowEvents
      .join(broadcast(stopToRoute), "stop_id")
      .groupBy(col("route_id"), hourTs(col("observed_at")).as("hour_ts"))
      .agg(detSum(col("estimated_passengers")).as("passengers"))

  /** A2 — hourly trip-update delay stats. Ref: initdb/init-postgis.sql:196-203. */
  def delayHourly(tripUpdates: DataFrame): DataFrame =
    tripUpdates
      .groupBy(col("route_id"), hourTs(col("observed_at")).as("hour_ts"))
      .agg(
        count(lit(1)).as("trip_update_events"),
        detAvg(col("delay_seconds")).as("avg_delay_seconds"))

  /** A3 — hourly vehicle-position event counts. Ref: initdb/init-postgis.sql:205-211. */
  def vehicleHourly(vehiclePositions: DataFrame): DataFrame =
    vehiclePositions
      .groupBy(col("route_id"), hourTs(col("observed_at")).as("hour_ts"))
      .agg(count(lit(1)).as("vehicle_events"))

  /** A4 — hourly weather averages (no route key). Ref: initdb/init-postgis.sql:213-220. */
  def weatherHourly(weather: DataFrame): DataFrame =
    weather
      .groupBy(hourTs(col("observed_at")).as("hour_ts"))
      .agg(
        detAvg(col("temperature_c")).as("temperature_c"),
        detAvg(col("precipitation_mm")).as("precipitation_mm"),
        detAvg(col("wind_speed_mps")).as("wind_speed_mps"))

  /** J3 — ml_dataset_hourly: demand LEFT JOIN delay, vehicles on
    * (route_id, hour_ts); LEFT JOIN weather on hour_ts; COALESCE(_, 0)
    * feature defaults; hour/day-of-week (Postgres DOW)/is_peak features.
    * Ref: initdb/init-postgis.sql:222-246.
    */
  def mlDatasetHourly(
      demand: DataFrame,
      delay: DataFrame,
      vehicles: DataFrame,
      weather: DataFrame): DataFrame = {
    val keys = Seq("route_id", "hour_ts")
    demand
      .join(delay, keys, "left")
      .join(vehicles, keys, "left")
      .join(weather, Seq("hour_ts"), "left")
      .select(
        col("route_id"),
        col("hour_ts"),
        col("passengers"),
        coalesce(col("trip_update_events"), lit(0L)).as("trip_update_events"),
        coalesce(col("avg_delay_seconds"), lit(0.0)).as("avg_delay_seconds"),
        coalesce(col("vehicle_events"), lit(0L)).as("vehicle_events"),
        coalesce(col("temperature_c"), lit(0.0)).as("temperature_c"),
        coalesce(col("precipitation_mm"), lit(0.0)).as("precipitation_mm"),
        coalesce(col("wind_speed_mps"), lit(0.0)).as("wind_speed_mps"),
        hour(col("hour_ts")).as("hour"),
        pgDow(col("hour_ts")).as("day_of_week"),
        isPeakHour(col("hour_ts")).as("is_peak"))
  }
}
