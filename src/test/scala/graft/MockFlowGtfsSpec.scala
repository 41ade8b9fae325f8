package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.mockflow.MockFlow
import graft.ingest.GtfsStatic

class MockFlowGtfsSpec extends SparkSpec {
  import spark.implicits._

  test("G2/G3 bucket distribution conserves the hourly total within rounding") {
    val stops = Seq(("s1", 40L), ("s2", 25L)).toDF("stop_id", "base_demand")
    val hours = Seq(
      (Timestamp.valueOf("2024-01-03 08:00:00"), 10.0, 0.0, 0.0),
      (Timestamp.valueOf("2024-01-03 17:00:00"), 22.0, 2.0, 400.0))
      .toDF("hour_ts", "temperature_c", "precipitation_mm", "avg_delay_seconds")
    val ev = MockFlow.generate(stops, hours).cache()
    assert(ev.count() == 2 * 2 * MockFlow.EventsPerHour)
    // per (stop,hour): sum of bucket passengers within ±1-per-bucket rounding
    val agg = ev
      .withColumn("hour_ts", date_trunc("hour", col("observed_at")))
      .withColumn("hp", get_json_object(col("components"), "$.hourly_passengers").cast("long"))
      .groupBy("stop_id", "hour_ts", "hp")
      .agg(sum("estimated_passengers").as("total"))
      .collect()
    agg.foreach { r =>
      val hp = r.getAs[Long]("hp"); val tot = r.getAs[Long]("total")
      assert(math.abs(tot - hp) <= MockFlow.EventsPerHour / 2,
        s"bucket sum $tot too far from hourly $hp")
    }
    // G4 components JSON has its 9 provenance keys
    val c = ev.select("components").as[String].head()
    Seq("base_demand", "time_factor", "dow_factor", "weather_factor", "delay_factor",
      "stop_noise", "hourly_passengers", "bucket_weight", "total_weight")
      .foreach(k => assert(c.contains(s""""$k""""), s"missing $k"))
    // The JSON rendering ≡ the typed provenance columns, row for row —
    // the coverage `mockflow_invariants` carried while it re-parsed the
    // JSON (it reads the typed columns directly since r14; this pin
    // keeps the rendering itself verified, transitively oracle-exact
    // because the typed values are hash-checked in the registry).
    val parsed = org.apache.spark.sql.types.StructType.fromDDL(
      "base_demand BIGINT, time_factor DOUBLE, dow_factor DOUBLE, " +
        "weather_factor DOUBLE, delay_factor DOUBLE, stop_noise DOUBLE, " +
        "hourly_passengers BIGINT, bucket_weight DOUBLE, total_weight DOUBLE")
    val mismatched = ev
      .withColumn("p", from_json(col("components"), parsed))
      .filter(
        col("p.base_demand") =!= col("base_demand") ||
          col("p.time_factor") =!= col("time_factor") ||
          col("p.dow_factor") =!= col("dow_factor") ||
          col("p.weather_factor") =!= col("weather_factor") ||
          col("p.delay_factor") =!= col("delay_factor") ||
          col("p.stop_noise") =!= col("stop_noise") ||
          col("p.hourly_passengers") =!= col("hourly_passengers") ||
          col("p.bucket_weight") =!= col("bucket_weight") ||
          col("p.total_weight") =!= col("total_weight"))
      .count()
    assert(mismatched == 0,
      s"$mismatched rows where parsed components JSON != typed provenance columns")
  }

  test("G1 factor tables match the reference bands") {
    val r = Seq(7, 12, 17, 20, 23, 3).toDF("h")
      .select(MockFlow.timeFactor(col("h")).as("f")).as[Double].collect()
    assert(r.toSeq == Seq(1.9, 1.0, 2.1, 0.8, 0.4, 0.3))
    val wf = Seq((0.0, 6.0), (0.0, 2.0), (-10.0, 0.0), (35.0, 0.0), (15.0, 0.0))
      .toDF("t", "r").select(MockFlow.weatherFactor(col("t"), col("r")).as("f"))
      .as[Double].collect()
    assert(wf.toSeq == Seq(1.25, 1.15, 0.85, 0.9, 1.0))
  }

  test("S3 versioned flow: two feed versions coexist; a pinned read prunes") {
    val path = Files.createTempDirectory("gtfs_versions").toString + "/routes"
    val v1 = GtfsStatic.sha256Hex("feed-v1".getBytes("UTF-8"))
    val v2 = GtfsStatic.sha256Hex("feed-v2".getBytes("UTF-8"))
    assert(v1 != v2 && v1.length == 64)
    val routesV1 = Seq(("r1", "Route 1"), ("r2", "Route 2")).toDF("route_id", "route_name")
    val routesV2 = Seq(("r1", "Route 1 renamed"), ("r3", "Route 3")).toDF("route_id", "route_name")
    GtfsStatic.writeVersioned(routesV1, v1, path)
    GtfsStatic.writeVersioned(routesV2, v2, path)

    val all = spark.read.parquet(path)
    assert(all.count() == 4)
    assert(all.select("version_id").distinct().count() == 2)

    val pinned = GtfsStatic.readVersion(spark, path, v2)
    assert(pinned.select("route_id").as[String].collect().sorted.toSeq == Seq("r1", "r3"))
    // the version equality must prune at the scan (partition filter, not
    // a post-scan row filter over every version's data)
    val plan = pinned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("version_id"))
  }

  test("GTFS static ingest end-to-end on CSV fixtures") {
    val dir = Files.createTempDirectory("gtfs").toString
    def write(name: String, content: String): String = {
      val p = java.nio.file.Paths.get(dir, name)
      Files.writeString(p, content); p.toString
    }
    val routes = GtfsStatic.readCsv(spark,
      write("routes.txt", "route_id,route_name\nR1 ,Main\nR2,Second\nR2,SecondDup\n"),
      Seq("route_id", "route_name"))
    val stops = GtfsStatic.readCsv(spark,
      write("stops.txt", "stop_id,stop_name,stop_lat,stop_lon\nS1,Alpha,44.4,26.1\nS2,Beta, ,26.2\n"),
      Seq("stop_id", "stop_name", "stop_lat", "stop_lon"))
    val trips = GtfsStatic.readCsv(spark,
      write("trips.txt", "trip_id,route_id,service_id\nT1,R1,SV1\nT2,RX,SV1\nT3,R2,SVX\n"),
      Seq("trip_id", "route_id", "service_id"))
    val stopTimes = GtfsStatic.readCsv(spark,
      write("stop_times.txt",
        "trip_id,stop_id,stop_sequence,arrival_time,departure_time\n" +
          "T1,S1,1,08:00:00,25:10:00\nT1,SX,2,09:00:00,09:01:00\nT2,S1,1,10:00:00,10:00:30\n"),
      Seq("trip_id", "stop_id", "stop_sequence", "arrival_time", "departure_time"))
    val calendar = GtfsStatic.readCsv(spark,
      write("calendar.txt", "service_id,monday\nSV1,1\n"), Seq("service_id", "monday"))

    val routesN = GtfsStatic.normalizeIds(routes, Seq("route_id"))
    assert(routesN.filter(col("route_id") === "R1").count() == 1) // "R1 " trimmed

    val (tripsOk, stOk) = GtfsStatic.referentialFilter(
      routesN, stops, GtfsStatic.normalizeIds(trips, Seq("trip_id", "route_id", "service_id")),
      GtfsStatic.normalizeIds(stopTimes, Seq("trip_id", "stop_id")), calendar)
    // T2 dropped (route RX missing), T3 dropped (service SVX missing)
    assert(tripsOk.select("trip_id").as[String].collect().toSeq == Seq("T1"))
    // stop_times: T2 row dropped with its trip, SX row dropped (stop missing)
    assert(stOk.count() == 1)

    val typed = GtfsStatic.typedStopTimes(stOk)
    val row = typed.collect().head
    assert(row.getAs[Int]("arrival_seconds") == 8 * 3600)
    assert(row.getAs[Int]("departure_seconds") == 25 * 3600 + 10 * 60) // >24h preserved

    val (rd, _, _, _) = GtfsStatic.dedupKeys(routesN, stops, tripsOk, typed)
    assert(rd.filter(col("route_id") === "R2").count() == 1)

    assert(GtfsStatic.typedCalendar(calendar).select("monday").as[Boolean].head())
    assert(GtfsStatic.sha256Hex("abc".getBytes("UTF-8")) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")

    val bd = GtfsStatic.stopBaseDemand(typed).select("base_demand").as[Long].collect()
    assert(bd.forall(v => v >= 5 && v <= 50)) // A8 clamp
  }
}
