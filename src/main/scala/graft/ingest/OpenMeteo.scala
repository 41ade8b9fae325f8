package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S7 — the REST weather leg (SURVEY.md §2.1): Open-Meteo "current"
  * responses → normalized weather_observations rows, replaying the
  * reference's normalize_weather field mapping exactly.
  * Ref: src/dag/weather-job.py:33-67.
  *
  * The HTTP GET itself is driver-side by SURVEY §2.1 scope (one small
  * request per hour); what the ENGINE owns — and what this module makes
  * oracle-checkable — is the schema-on-read parse: given response
  * bodies as a string column, `from_json` with the consumer-side schema
  * (only the fields normalize_weather accesses; everything else the API
  * sends — generationtime_ms, current_units, elevation — is ignored,
  * exactly like dict access) into typed rows.
  *
  * Two reference quirks are replayed faithfully, not fixed:
  *   - latitude/longitude in the normalized row are the REQUEST
  *     constants as strings ("44.4268"/"26.1025", weather-job.py:60-61),
  *     NOT the response's grid-snapped coordinates (44.4375/26.125) —
  *     the rendered fixture bodies carry the snapped values to prove the
  *     parse ignores them.
  *   - wind_speed_10m arrives in the API's default km/h but is stored
  *     as `wind_speed_mps` with NO unit conversion (weather-job.py:64).
  *
  * [[apiResponses]] renders deterministic response bodies from the
  * events table (µs-exact timestamps to the minute, ≤4-dp numerics via
  * DECIMAL(9,6) so the JSON text round-trips bit-exactly cross-engine);
  * the DuckDB twin computes the same normalized rows directly, so the
  * render→parse round trip is what the oracle pins.
  */
object OpenMeteo {

  /** Deterministic Open-Meteo current-weather response body per event
    * row — the full envelope shape the API returns, including the
    * fields the normalizer never reads.
    */
  def apiResponses(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      to_json(struct(
        lit(44.4375).as("latitude"),
        lit(26.125).as("longitude"),
        lit(0.125).as("generationtime_ms"),
        lit(0).as("utc_offset_seconds"),
        lit("GMT").as("timezone"),
        lit("GMT").as("timezone_abbreviation"),
        lit(85.0).as("elevation"),
        struct(
          lit("iso8601").as("time"), lit("seconds").as("interval"),
          lit("°C").as("temperature_2m"), lit("mm").as("precipitation"),
          lit("km/h").as("wind_speed_10m"), lit("wmo code").as("weather_code"))
          .as("current_units"),
        struct(
          date_format(graft.functions.Cols.ntzFromNanos(col("ts")),
            "yyyy-MM-dd'T'HH:mm").as("time"),
          lit(900).as("interval"),
          col("value").cast("decimal(9,6)").as("temperature_2m"),
          (col("value") / 10).cast("decimal(9,6)").as("precipitation"),
          (col("value") / 100).cast("decimal(9,6)").as("wind_speed_10m"),
          (col("user_id") % 100).cast("int").as("weather_code")).as("current")),
        Map("ignoreNullFields" -> "false")).as("body"))

  /** The consumer-side schema: exactly the fields normalize_weather
    * accesses (weather-job.py:55-66) at their nesting.
    */
  val ResponseSchema: StructType = StructType.fromDDL(
    "current STRUCT<time: STRING, temperature_2m: DOUBLE, " +
      "precipitation: DOUBLE, wind_speed_10m: DOUBLE, weather_code: INT>")

  /** normalize_weather replayed over rendered response bodies — the
    * transform without the output ordering: stateless per-row column
    * algebra, so the SAME code runs as a streaming append-mode parse
    * stage ([[graft.streaming.Streams.weatherIngestStream]]).
    */
  def weatherIngestCols(events: DataFrame): DataFrame =
    apiResponses(events)
      .withColumn("r", from_json(col("body"), ResponseSchema))
      .select(
        col("event_id"),
        to_timestamp(col("r.current.time"), "yyyy-MM-dd'T'HH:mm")
          .cast("timestamp_ntz").as("observed_at"),
        lit("44.4268").as("latitude"),
        lit("26.1025").as("longitude"),
        col("r.current.temperature_2m").as("temperature_c"),
        col("r.current.precipitation").as("precipitation_mm"),
        col("r.current.wind_speed_10m").as("wind_speed_mps"),
        col("r.current.weather_code").cast("string").as("weather_code"))

  def weatherIngest(events: DataFrame): DataFrame =
    weatherIngestCols(events).orderBy("event_id")

  /** DuckDB twin: the same normalized rows computed straight from the
    * events table (the JSON render→parse is Spark-side mechanics; the
    * decimal(9,6) round trip makes the parsed doubles bit-equal to the
    * direct decimal→double cast).
    */
  val weatherIngestSql: String =
    """SELECT event_id,
      |  date_trunc('minute', CAST(ts AS TIMESTAMP)) AS observed_at,
      |  '44.4268' AS latitude, '26.1025' AS longitude,
      |  CAST(CAST(value AS DECIMAL(9,6)) AS DOUBLE) AS temperature_c,
      |  CAST(CAST(value / 10 AS DECIMAL(9,6)) AS DOUBLE) AS precipitation_mm,
      |  CAST(CAST(value / 100 AS DECIMAL(9,6)) AS DOUBLE) AS wind_speed_mps,
      |  CAST(user_id % 100 AS VARCHAR) AS weather_code
      |FROM events ORDER BY event_id""".stripMargin
}
