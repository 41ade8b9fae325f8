package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols._

/** Operational KPI views (SURVEY.md §2.4 A5-A7, §2.5 W1, §2.3 J4).
  * Re-expression of src/optimization/kpi_views.sql:19-98.
  *
  * Scale notes: the three sub-views group on (route_id, hour_ts) — at
  * 100 TB the input shuffles once per view on that key; AQE coalesces the
  * post-shuffle partitions. The headway window (W1) partitions on the same
  * key as the preceding aggregate, so Catalyst reuses the exchange instead
  * of re-shuffling. kpi_hourly's three left joins share join keys — after
  * the first shuffle the rest are co-partitioned.
  */
object Kpi {

  /** A5 — active vehicles per route/hour: exact COUNT(DISTINCT vehicle_id)
    * (the export JSON is exact-matched — approx_count_distinct would break
    * it). Ref: kpi_views.sql:19-26.
    */
  def activeVehiclesHourly(vehiclePositions: DataFrame): DataFrame =
    vehiclePositions
      .filter(col("route_id").isNotNull)
      .groupBy(col("route_id").cast("string").as("route_id"),
        hourTs(col("observed_at")).as("hour_ts"))
      .agg(countDistinct("vehicle_id").as("active_vehicles"))

  /** A6 + W1 + A7 — headway estimate: per-vehicle first-seen per hour,
    * LAG over (route,hour) ordered by first_seen → gap, then
    * AVG FILTER (BETWEEN 0.5 AND 60 minutes). Ref: kpi_views.sql:28-57.
    *
    * Computed in integer microseconds (see Cols.microsBetween): the masked
    * sum is an exact long, the average is floored to whole µs
    * (avg_headway_us, sub-µs truncation ≤1µs vs. the reference), and the
    * minutes value is one double division — bit-identical on any partition
    * layout and in any engine. The filter bounds 0.5/60 min map exactly to
    * 3e7/3.6e9 µs (both dyadic-exact), so integer-domain filtering is
    * equivalent to the reference's minute-domain FILTER.
    */
  def headwayHourly(vehiclePositions: DataFrame): DataFrame = {
    val firstSeen = vehiclePositions
      .filter(col("route_id").isNotNull)
      .groupBy(col("route_id").cast("string").as("route_id"),
        hourTs(col("observed_at")).as("hour_ts"),
        col("vehicle_id"))
      .agg(min("observed_at").as("first_seen"))
    val w = Window.partitionBy("route_id", "hour_ts").orderBy("first_seen")
    val gapUs = microsBetween(col("first_seen"), lag("first_seen", 1).over(w))
    val masked = when(gapUs.between(30000000L, 3600000000L), gapUs)
    firstSeen
      .withColumn("gap_us", masked)
      .groupBy("route_id", "hour_ts")
      .agg(floor(sum(col("gap_us")).cast("double") / count(col("gap_us")))
        .cast("long").as("avg_headway_us"))
      .withColumn("avg_headway_min", col("avg_headway_us") / lit(6.0e7))
  }

  /** A2 (KPI variant) — delay per route/hour. Ref: kpi_views.sql:60-68. */
  def delayHourly(tripUpdates: DataFrame): DataFrame =
    tripUpdates
      .filter(col("route_id").isNotNull)
      .groupBy(col("route_id").cast("string").as("route_id"),
        hourTs(col("observed_at")).as("hour_ts"))
      .agg(
        count(lit(1)).as("trip_update_events"),
        detAvg(col("delay_seconds")).as("avg_delay_seconds"))

  /** J4 — kpi_hourly: predictions LEFT JOIN the three KPI sub-views on
    * (route_id::text, hour_ts), COALESCE defaults, hour-of-day and peak
    * flags. `predictions` needs columns route_id, hour_ts, y_pred, y_true.
    * Ref: kpi_views.sql:71-98.
    */
  def kpiHourly(
      predictions: DataFrame,
      activeVehicles: DataFrame,
      headway: DataFrame,
      delay: DataFrame): DataFrame = {
    val keys = Seq("route_id", "hour_ts")
    predictions
      .withColumn("route_id", col("route_id").cast("string"))
      .join(activeVehicles, keys, "left")
      .join(headway, keys, "left")
      .join(delay, keys, "left")
      .select(
        col("route_id"),
        col("hour_ts"),
        col("y_pred").as("predicted_passengers"),
        col("y_true").as("observed_passengers"),
        coalesce(col("active_vehicles"), lit(0L)).as("active_vehicles"),
        col("avg_headway_min"),
        col("avg_headway_us"),
        coalesce(col("trip_update_events"), lit(0L)).as("trip_update_events"),
        coalesce(col("avg_delay_seconds"), lit(0.0)).cast("double").as("avg_delay_seconds"),
        hour(col("hour_ts")).cast("int").as("hour_of_day"),
        isPeakHour(col("hour_ts")).as("is_peak_hour"))
  }
}
