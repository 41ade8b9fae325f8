package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.views.{Hourly, Kpi}
import graft.suggest.Suggestions

/** Composition of the reference's analytics path over the driver testdata
  * (SURVEY.md §3.1): adapter inputs → hourly views → KPI views →
  * suggestions. Each stage is a pure DataFrame function from views/suggest;
  * this object only does the plumbing so SparkEntry.queries and the
  * flagship entry() share one definition.
  *
  * Predictions are a deterministic stand-in (y_pred = 0.95 × observed
  * demand): the oracle hash-compare needs reproducible values, so the real
  * RandomForest (ml.DemandModel) is exercised by its own rows-only query
  * and MAE-band test instead (SURVEY §2.12: sklearn vs MLlib trees differ
  * numerically by design).
  */
object Pipelines {
  import TestdataAdapter._

  def demandHourly(s: SparkSession, dir: String): DataFrame =
    Hourly.passengerDemandHourly(flowEvents(s, dir), stopToRouteMapping(s, dir))

  def delayHourly(s: SparkSession, dir: String): DataFrame =
    Hourly.delayHourly(tripUpdates(s, dir))

  def vehicleHourly(s: SparkSession, dir: String): DataFrame =
    Hourly.vehicleHourly(vehiclePositions(s, dir))

  def weatherHourly(s: SparkSession, dir: String): DataFrame =
    Hourly.weatherHourly(weather(s, dir))

  def mlDataset(s: SparkSession, dir: String): DataFrame =
    Hourly.mlDatasetHourly(
      demandHourly(s, dir), delayHourly(s, dir),
      vehicleHourly(s, dir), weatherHourly(s, dir))

  /** Deterministic pseudo-predictions feeding kpi_hourly (see scaladoc). */
  def predictions(s: SparkSession, dir: String): DataFrame =
    demandHourly(s, dir).select(
      col("route_id"), col("hour_ts"),
      (col("passengers") * 0.95).as("y_pred"),
      col("passengers").as("y_true"))

  def kpiActiveVehicles(s: SparkSession, dir: String): DataFrame =
    Kpi.activeVehiclesHourly(vehiclePositions(s, dir))

  def kpiHeadway(s: SparkSession, dir: String): DataFrame =
    Kpi.headwayHourly(vehiclePositions(s, dir))

  def kpiDelay(s: SparkSession, dir: String): DataFrame =
    Kpi.delayHourly(tripUpdates(s, dir))

  def kpiHourly(s: SparkSession, dir: String): DataFrame =
    Kpi.kpiHourly(predictions(s, dir),
      kpiActiveVehicles(s, dir), kpiHeadway(s, dir), kpiDelay(s, dir))

  def suggestions(s: SparkSession, dir: String, onlyChanges: Boolean = true): DataFrame =
    Suggestions.suggest(kpiHourly(s, dir), onlyChanges)
}
