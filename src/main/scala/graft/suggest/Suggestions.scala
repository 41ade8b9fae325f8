package graft.suggest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols._

/** The suggestions engine (SURVEY.md §2.9 D1-D6, P9): the reference's
  * per-row Python decide() re-expressed as pure Catalyst column
  * expressions, so the whole decision pipeline stays inside whole-stage
  * codegen and runs embarrassingly parallel at any scale (one narrow
  * projection over kpi_hourly — no shuffle at all).
  *
  * Ref: src/optimization/generate_suggestions.py:25-201.
  *
  * Known, intentional deviation from the reference (only observable with
  * onlyChanges=false): when predicted_passengers is null, pandas carries
  * NaN into passengers_per_trip_est and falls through to the
  * 'within normal range' rule with over=1.0, while this implementation
  * takes the 'missing trip estimate' branch with over=0.0 — i.e. we treat
  * missing data as missing rather than silently maxing the priority term.
  * The saved output (onlyChanges=true) is identical either way because
  * both paths produce action='keep'.
  */
object Suggestions {

  /** Tunables — generate_suggestions.py:25-31. */
  val VehCapacity    = 60.0
  val TargetLoad     = 0.75
  val LowLoad        = 0.40
  val MaxHeadway     = 30.0
  val MinHeadway     = 3.0
  val DefaultHeadway = 12.0
  val CapTarget: Double = VehCapacity * TargetLoad // 45.0 per-trip threshold
  val CapLow: Double    = VehCapacity * LowLoad    // 24.0 per-trip threshold

  /** D1 — current headway fallback chain: observed avg if within [0.5,60];
    * else clamp(60/active_vehicles, 3, 30) when vehicles seen; else 12.0.
    * Ref: generate_suggestions.py:71-82.
    */
  def currentHeadway(avgHeadway: Column, activeVehicles: Column): Column =
    when(avgHeadway.isNotNull && avgHeadway.between(0.5, 60.0), avgHeadway.cast("double"))
      .when(coalesce(activeVehicles, lit(0L)) > 0,
        clamp(lit(60.0) / activeVehicles.cast("double"), MinHeadway, MaxHeadway))
      .otherwise(lit(DefaultHeadway))

  /** D1-D6 + P9 over a kpi_hourly-shaped frame (columns: route_id, hour_ts,
    * predicted_passengers, observed_passengers, active_vehicles,
    * avg_headway_min, avg_delay_seconds, is_peak_hour).
    *
    * Adds: current_headway_min, trips_per_hour_est, capacity_est,
    * load_factor, passengers_per_trip_est, confidence, action,
    * recommended_headway_min, priority_score, rule, reasons (JSON).
    */
  def suggest(kpi: DataFrame, onlyChanges: Boolean = true): DataFrame = {
    val withDerived = kpi
      // D1
      .withColumn("current_headway_min",
        currentHeadway(col("avg_headway_min"), col("active_vehicles")))
      // D2 — derived rates (generate_suggestions.py:83-104)
      .withColumn("trips_per_hour_est",
        when(col("current_headway_min") > 0, lit(60.0) / col("current_headway_min")))
      .withColumn("capacity_est",
        when(col("trips_per_hour_est") > 0, lit(VehCapacity) * col("trips_per_hour_est")))
      .withColumn("load_factor",
        when(col("capacity_est") > 0 && col("predicted_passengers").isNotNull,
          col("predicted_passengers").cast("double") / col("capacity_est")))
      .withColumn("passengers_per_trip_est",
        when(col("trips_per_hour_est") > 0 && col("predicted_passengers").isNotNull,
          col("predicted_passengers").cast("double") / col("trips_per_hour_est")))
      // D3 — confidence (generate_suggestions.py:119-122)
      .withColumn("confidence",
        when(col("load_factor").isNull || isnan(col("load_factor")), lit(0.70))
          .otherwise(clamp(lit(1.0) - abs(col("load_factor") - 1.0) * 0.35, 0.55, 1.0)))

    val peak  = coalesce(col("is_peak_hour"), lit(0)).cast("int")
    val pred0 = coalesce(col("predicted_passengers").cast("double"), lit(0.0))
    val ppt   = col("passengers_per_trip_est")
    val tph   = col("trips_per_hour_est")
    val hw    = col("current_headway_min")
    val conf  = col("confidence")

    // Both branches share tphr_target = pred / cap_target
    // (generate_suggestions.py:155-156, 169-170).
    val tphrTarget = when(lit(CapTarget) > 0, pred0 / CapTarget)
    val rawIncrease = clamp(
      when(tphrTarget.isNotNull && tphrTarget > 0, lit(60.0) / tphrTarget)
        .otherwise(hw * 0.85), MinHeadway, MaxHeadway)
    val rawDecrease = clamp(
      when(tphrTarget.isNotNull && tphrTarget > 0, lit(60.0) / tphrTarget)
        .otherwise(hw * 1.15), MinHeadway, MaxHeadway)

    val missing    = ppt.isNull || tph.isNull
    val isIncrease = !missing && (ppt > CapTarget)
    val isDecrease = !missing && !(ppt > CapTarget) && (ppt < CapLow) && (peak === 0)

    // D5 — priority score (generate_suggestions.py:186-191)
    val over      = when(ppt.isNotNull, clamp((ppt - CapTarget) / CapTarget, 0, 1)).otherwise(lit(0.0))
    val delayNorm = clamp(coalesce(col("avg_delay_seconds").cast("double"), lit(0.0)) / 600.0, 0, 1)

    val decided = withDerived
      // D4 — decision rule (generate_suggestions.py:106-185)
      .withColumn("action",
        when(isIncrease, lit("increase_frequency"))
          .when(isDecrease, lit("decrease_frequency"))
          .otherwise(lit("keep")))
      .withColumn("rule",
        when(missing, lit("missing trip estimate"))
          .when(isIncrease, lit("ppt > cap_target"))
          .when(isDecrease, lit("ppt < cap_low and off-peak"))
          .otherwise(lit("within normal range")))
      .withColumn("recommended_headway_min",
        when(isIncrease,
          clamp(hw * (lit(1.0) - lit(0.35) * conf) + rawIncrease * (lit(0.35) * conf),
            MinHeadway, MaxHeadway))
          .when(isDecrease,
            clamp(hw * (lit(1.0) - lit(0.30) * conf) + rawDecrease * (lit(0.30) * conf),
              MinHeadway, MaxHeadway))
          .otherwise(hw))
      .withColumn("priority_score",
        clamp(lit(0.60) * over + lit(0.20) * peak + lit(0.20) * delayNorm, 0, 1))
      // D6 — reasons JSON (14 base keys + branch keys; null fields kept,
      // matching Python json.dumps). Ref: generate_suggestions.py:128-185.
      .withColumn("reasons", to_json(struct(
        col("predicted_passengers").cast("double").as("predicted_passengers"),
        col("observed_passengers").cast("double").as("observed_passengers"),
        col("active_vehicles").cast("long").as("active_vehicles"),
        col("avg_headway_min").cast("double").as("avg_headway_min"),
        col("current_headway_min"),
        col("trips_per_hour_est"),
        col("capacity_est").as("capacity_est_per_hour"),
        col("load_factor").as("load_factor_per_hour"),
        col("passengers_per_trip_est"),
        lit(CapTarget).as("cap_target_per_trip"),
        lit(CapLow).as("cap_low_per_trip"),
        coalesce(col("avg_delay_seconds").cast("double"), lit(0.0)).as("avg_delay_seconds"),
        peak.as("is_peak_hour"),
        col("confidence"),
        col("rule").as("rule"),
        when(isIncrease || isDecrease, tphrTarget).as("trips_per_hour_target"),
        when(isIncrease, rawIncrease).when(isDecrease, rawDecrease)
          .as("raw_recommended_headway_min")),
        Map("ignoreNullFields" -> "false")))

    // P9 — SAVE_ONLY_CHANGES drops "keep" rows (generate_suggestions.py:206-207)
    if (onlyChanges) decided.filter(col("action") =!= "keep") else decided
  }
}
