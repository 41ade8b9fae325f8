package graft

import org.apache.spark.sql.functions._
import graft.ingest.OpenMeteo

/** S7 parse contract against a CAPTURED Open-Meteo response body (the
  * documented /v1/forecast?current=… shape for the reference's Bucharest
  * coordinates, weather-job.py:10-50): the consumer schema must pull
  * exactly normalize_weather's fields out of a real response — including
  * ignoring the envelope fields dict access never touches — and the
  * normalized row must carry both reference quirks (request-constant
  * lat/lon strings; km/h value stored unconverted).
  */
class WeatherIngestSpec extends SparkSpec {
  import spark.implicits._

  // as returned by api.open-meteo.com for
  // ?latitude=44.4268&longitude=26.1025&current=temperature_2m,
  // precipitation,wind_speed_10m,weather_code — grid-snapped coords,
  // generation metadata, a units block, and the current observation
  private val captured =
    """{"latitude":44.4375,"longitude":26.125,
      |"generationtime_ms":0.06604194641113281,"utc_offset_seconds":0,
      |"timezone":"GMT","timezone_abbreviation":"GMT","elevation":85.0,
      |"current_units":{"time":"iso8601","interval":"seconds",
      |"temperature_2m":"°C","precipitation":"mm",
      |"wind_speed_10m":"km/h","weather_code":"wmo code"},
      |"current":{"time":"2026-01-20T18:15","interval":900,
      |"temperature_2m":3.4,"precipitation":0.1,"wind_speed_10m":11.2,
      |"weather_code":61}}""".stripMargin.replace("\n", "")

  test("normalize_weather's field mapping parses a captured response") {
    val row = Seq(captured).toDF("body")
      .select(from_json(col("body"), OpenMeteo.ResponseSchema).as("r"))
      .select(
        to_timestamp(col("r.current.time"), "yyyy-MM-dd'T'HH:mm")
          .cast("timestamp_ntz").cast("string").as("observed_at"),
        col("r.current.temperature_2m"), col("r.current.precipitation"),
        col("r.current.wind_speed_10m"),
        col("r.current.weather_code").cast("string").as("weather_code"))
      .head()
    assert(row.getString(0) == "2026-01-20 18:15:00")
    assert(row.getDouble(1) == 3.4)
    assert(row.getDouble(2) == 0.1)
    assert(row.getDouble(3) == 11.2) // km/h value, stored unconverted (quirk 2)
    assert(row.getString(4) == "61") // str(weather_code)
  }

  test("rendered response bodies carry the full API envelope the parse must ignore") {
    val dir = "/root/testdata/sf0.001"
    val body = OpenMeteo.apiResponses(TestdataAdapter.table(spark, dir, "events"))
      .orderBy("event_id").select("body").head().getString(0)
    // envelope fields present in the body…
    for (k <- Seq("generationtime_ms", "current_units", "elevation", "utc_offset_seconds"))
      assert(body.contains("\"" + k + "\""), s"rendered body lost envelope field $k")
    // …and absent from the normalized output (dict access never reads them)
    val out = OpenMeteo.weatherIngest(TestdataAdapter.table(spark, dir, "events"))
    assert(out.columns.toSeq == Seq("event_id", "observed_at", "latitude", "longitude",
      "temperature_c", "precipitation_mm", "wind_speed_mps", "weather_code"))
    // quirk 1: the stored coordinates are the REQUEST constants, not the
    // response's grid-snapped values
    assert(out.select("latitude", "longitude").distinct().collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("44.4268", "26.1025")))
  }
}
