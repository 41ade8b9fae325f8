package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.views.{Hourly, Kpi}

class HourlyKpiSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("J1 stopToRoute distinct mapping") {
    val st = Seq(("t1", "s1"), ("t1", "s2"), ("t2", "s1")).toDF("trip_id", "stop_id")
    val trips = Seq(("t1", "rA"), ("t2", "rA")).toDF("trip_id", "route_id")
    val r = Hourly.stopToRoute(st, trips).as[(String, String)].collect().toSet
    assert(r == Set(("s1", "rA"), ("s2", "rA"))) // (s1,rA) deduped across trips
  }

  test("J2+A1 demand fan-out double-counts multi-route stops (intentional)") {
    val flow = Seq(("s1", t("2024-01-01 10:10:00"), 5.0))
      .toDF("stop_id", "observed_at", "estimated_passengers")
    val s2r = Seq(("s1", "rA"), ("s1", "rB")).toDF("stop_id", "route_id")
    val r = Hourly.passengerDemandHourly(flow, s2r)
      .select("route_id", "passengers").as[(String, Double)].collect().toMap
    assert(r == Map("rA" -> 5.0, "rB" -> 5.0)) // same event counted per route
  }

  test("A6+W1+A7 headway: lag gaps, filter, exact integer-µs average") {
    // vehicles first seen at :00, :10, :30 → gaps 10 and 20 min → avg 15
    val veh = Seq(
      ("r1", "v1", t("2024-01-01 10:00:00")),
      ("r1", "v1", t("2024-01-01 10:05:00")), // later sighting, min() keeps :00
      ("r1", "v2", t("2024-01-01 10:10:00")),
      ("r1", "v3", t("2024-01-01 10:30:00")))
      .toDF("route_id", "vehicle_id", "observed_at")
    val r = Kpi.headwayHourly(veh).select("avg_headway_min").as[Double].collect()
    assert(r.toSeq == Seq(15.0))
  }

  test("A7 headway filter drops sub-30s and >60min gaps") {
    val veh = Seq(
      ("r1", "v1", t("2024-01-01 10:00:00.000000")),
      ("r1", "v2", t("2024-01-01 10:00:10.000000")), // 10s gap < 0.5min → dropped
      ("r1", "v3", t("2024-01-01 10:20:10.000000"))) // 20min gap → kept
      .toDF("route_id", "vehicle_id", "observed_at")
    val r = Kpi.headwayHourly(veh).select("avg_headway_min").as[Double].collect()
    assert(r.toSeq == Seq(20.0))
  }

  test("J3 ml dataset: left joins coalesce missing features to 0") {
    val demand = Seq(("rA", t("2024-01-01 10:00:00"), 7.0)).toDF("route_id", "hour_ts", "passengers")
    val empty = Seq.empty[(String, Timestamp, Long, Double)]
      .toDF("route_id", "hour_ts", "trip_update_events", "avg_delay_seconds")
    val noVeh = Seq.empty[(String, Timestamp, Long)].toDF("route_id", "hour_ts", "vehicle_events")
    val noWx = Seq.empty[(Timestamp, Double, Double, Double)]
      .toDF("hour_ts", "temperature_c", "precipitation_mm", "wind_speed_mps")
    val row = Hourly.mlDatasetHourly(demand, empty, noVeh, noWx).collect().head
    assert(row.getAs[Long]("trip_update_events") == 0L)
    assert(row.getAs[Double]("avg_delay_seconds") == 0.0)
    assert(row.getAs[Double]("temperature_c") == 0.0)
    assert(row.getAs[Int]("hour") == 10)
    assert(row.getAs[Int]("day_of_week") == 1) // 2024-01-01 is a Monday
  }

  test("A5 active vehicles is exact COUNT(DISTINCT)") {
    val veh = Seq(
      ("r1", "v1", t("2024-01-01 10:00:00")),
      ("r1", "v1", t("2024-01-01 10:30:00")),
      ("r1", "v2", t("2024-01-01 10:40:00")))
      .toDF("route_id", "vehicle_id", "observed_at")
    val r = Kpi.activeVehiclesHourly(veh).select("active_vehicles").as[Long].collect()
    assert(r.toSeq == Seq(2L))
  }
}
