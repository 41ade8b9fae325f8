package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own analytics surface: hourly views, KPI views,
  * suggestions, exports, validation (SURVEY §2 S/P/J/A/W/O/D rows).
  */
private[graft] trait ReferenceQueries extends RegistryBase {
  import Pipelines._
  import graft.rel.{Analytics, Relational, Sessionize, Sketches}
  import graft.export.Export

  val reference: Seq[Q] = Seq(
    Q("stop_to_route",
      (s, dir) => TestdataAdapter.stopToRouteMapping(s, dir).orderBy("stop_id", "route_id"),
      Some(s"$S2R ORDER BY stop_id, route_id")),

    Q("demand_hourly",
      (s, dir) => demandHourly(s, dir)
        .select(col("route_id"), ntzCol("hour_ts"), col("passengers"))
        .orderBy("route_id", "hour_ts"),
      Some(s"WITH s2r AS ($S2R), f AS ($FLOW) $DEMAND_BODY ORDER BY 1, 2")),

    Q("delay_hourly",
      (s, dir) => delayHourly(s, dir)
        .select(col("route_id"), ntzCol("hour_ts"),
          col("trip_update_events"), col("avg_delay_seconds"))
        .orderBy("route_id", "hour_ts"),
      Some(s"WITH t AS ($TRIP) $DELAY_BODY ORDER BY 1, 2")),

    Q("vehicle_hourly",
      (s, dir) => vehicleHourly(s, dir)
        .select(col("route_id"), ntzCol("hour_ts"), col("vehicle_events"))
        .orderBy("route_id", "hour_ts"),
      Some(s"WITH v AS ($VEH) $VEHICLE_BODY ORDER BY 1, 2")),

    Q("weather_hourly",
      (s, dir) => weatherHourly(s, dir)
        .select(ntzCol("hour_ts"), col("temperature_c"),
          col("precipitation_mm"), col("wind_speed_mps"))
        .orderBy("hour_ts"),
      Some(s"WITH wx AS ($WEA) $WEATHER_BODY ORDER BY 1")),

    Q("ml_dataset_hourly",
      (s, dir) => mlDataset(s, dir)
        .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz"))
        .orderBy("route_id", "hour_ts"),
      Some(ML_DATASET_SQL)),

    Q("kpi_active_vehicles",
      (s, dir) => kpiActiveVehicles(s, dir)
        .select(col("route_id"), ntzCol("hour_ts"), col("active_vehicles"))
        .orderBy("route_id", "hour_ts"),
      Some(s"WITH v AS ($VEH) $KPI_ACTIVE_BODY ORDER BY 1, 2")),

    Q("kpi_headway",
      (s, dir) => kpiHeadway(s, dir)
        .select(col("route_id"), ntzCol("hour_ts"),
          col("avg_headway_us"), col("avg_headway_min"))
        .orderBy("route_id", "hour_ts"),
      Some(s"WITH v AS ($VEH) $KPI_HEADWAY_BODY ORDER BY 1, 2")),

    Q("kpi_delay",
      (s, dir) => kpiDelay(s, dir)
        .select(col("route_id"), ntzCol("hour_ts"),
          col("trip_update_events"), col("avg_delay_seconds"))
        .orderBy("route_id", "hour_ts"),
      Some(s"WITH t AS ($TRIP) $KPI_DELAY_BODY ORDER BY 1, 2")),

    Q("kpi_hourly",
      (s, dir) => kpiHourly(s, dir)
        .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz"))
        .orderBy("route_id", "hour_ts"),
      Some(KPI_HOURLY_SQL)),

    Q("suggestions", suggestionsFlat, Some(SUGGESTIONS_SQL)),

    // Full suggestions frame incl. the D6 reasons JSON — oracle-exact
    // per key: the reasons string is re-parsed with from_json and every
    // extracted field hash-matches DuckDB's direct computation (the JSON
    // text layout itself stays engine-specific, its CONTENT does not).
    Q("suggestions_full",
      (s, dir) => {
        val reasonsSchema =
          """predicted_passengers DOUBLE, observed_passengers DOUBLE,
            |active_vehicles BIGINT, avg_headway_min DOUBLE,
            |current_headway_min DOUBLE, trips_per_hour_est DOUBLE,
            |capacity_est_per_hour DOUBLE, load_factor_per_hour DOUBLE,
            |passengers_per_trip_est DOUBLE, cap_target_per_trip DOUBLE,
            |cap_low_per_trip DOUBLE, avg_delay_seconds DOUBLE,
            |is_peak_hour INT, confidence DOUBLE, rule STRING,
            |trips_per_hour_target DOUBLE, raw_recommended_headway_min DOUBLE""".stripMargin
        suggestions(s, dir, onlyChanges = false)
          .withColumn("r", from_json(col("reasons"),
            org.apache.spark.sql.types.StructType.fromDDL(reasonsSchema.replace("\n", " "))))
          .select(col("route_id"), ntzCol("hour_ts"), col("action"),
            col("recommended_headway_min"), col("priority_score"),
            col("r.predicted_passengers").as("r_predicted_passengers"),
            col("r.observed_passengers").as("r_observed_passengers"),
            col("r.active_vehicles").as("r_active_vehicles"),
            col("r.avg_headway_min").as("r_avg_headway_min"),
            col("r.current_headway_min").as("r_current_headway_min"),
            col("r.trips_per_hour_est").as("r_trips_per_hour_est"),
            col("r.capacity_est_per_hour").as("r_capacity_est_per_hour"),
            col("r.load_factor_per_hour").as("r_load_factor_per_hour"),
            col("r.passengers_per_trip_est").as("r_passengers_per_trip_est"),
            col("r.cap_target_per_trip").as("r_cap_target_per_trip"),
            col("r.cap_low_per_trip").as("r_cap_low_per_trip"),
            col("r.avg_delay_seconds").as("r_avg_delay_seconds"),
            col("r.is_peak_hour").as("r_is_peak_hour"),
            col("r.confidence").as("r_confidence"),
            col("r.rule").as("r_rule"),
            col("r.trips_per_hour_target").as("r_trips_per_hour_target"),
            col("r.raw_recommended_headway_min").as("r_raw_recommended_headway_min"))
          .orderBy("route_id", "hour_ts")
      },
      Some(SUGGESTIONS_FULL_SQL)),

    Q("latest_hour_snapshot",
      (s, dir) => {
        // one persisted kpi frame feeds both the snapshot join and the
        // suggestions side — without it the whole KPI pipeline executes
        // three times (kpi + its MAX(hour_ts) scalar + suggestions)
        val k = kpiHourly(s, dir).persist()
        Export.latestHourSnapshot(k, graft.suggest.Suggestions.suggest(k))
          .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz"))
          .orderBy("route_id")
      },
      Some(LATEST_SNAPSHOT_SQL)),

    Q("peak_hours_rollup",
      (s, dir) => Export.peakHoursRollup(kpiHourly(s, dir).persist()),
      Some(PEAK_ROLLUP_SQL)),

    Q("action_histogram",
      (s, dir) => Export.actionHistogram(suggestions(s, dir)),
      Some(SUGG_HIST_SQL)),

    Q("validation_metrics",
      (s, dir) => Export.validationMetrics(predictions(s, dir)),
      Some(VALIDATION_SQL)),

    Q("validation_by_route",
      (s, dir) => Export.validationByRoute(predictions(s, dir)),
      Some(VALIDATION_BY_ROUTE_SQL)),

    // the predicted-vs-observed scatter's exact point series
    // (validate_predictions.py:84-90); MAE-by-hour, the other plotted
    // series, is validation_by_hour — with both hash-green the only
    // un-reproduced part of the reference's validation step is the
    // matplotlib render call itself
    Q("validation_scatter_points",
      (s, dir) => Export.validationScatterPoints(predictions(s, dir)),
      Some(VALIDATION_SCATTER_SQL)),

    // A11 render (r14) — the scatter plot's occupied-pixel raster: the
    // matplotlib data→display transform in-plan, overplot collapsed to
    // ≤ canvas-size rows. The PNG encode over this exact raster is
    // PlotSpec-pinned (decode-back set equality + byte determinism).
    Q("validation_scatter_raster",
      (s, dir) => graft.export.Plot.scatterRaster(
        Export.validationScatterPoints(predictions(s, dir)), "y_true", "y_pred"),
      Some(VALIDATION_SCATTER_RASTER_SQL)),

    // A11 render (r14) — the MAE-by-hour line chart's vertex pixels.
    Q("validation_by_hour_pixels",
      (s, dir) => graft.export.Plot.byHourPixels(
        Export.validationByHour(predictions(s, dir))),
      Some(VALIDATION_BY_HOUR_PIXELS_SQL)),

    Q("label_lead",
      (s, dir) => Relational.labelLead(demandHourly(s, dir))
        .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz")),
      Some(LABEL_LEAD_SQL)),
  )

}
