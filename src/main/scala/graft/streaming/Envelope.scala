package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Realtime event envelope normalization (SURVEY.md §2.2 P6/P7): the
  * poller's coordinate-validity filter and row-shape projection into the
  * {event_type, entity_id, timestamp, source, payload} envelope.
  * Ref: src/gtfs-realtime-poller/poller.py:60-109.
  *
  * The testdata has no real coordinates; lat/lon are derived
  * deterministically from `value` so that a realistic fraction of rows
  * fails validation — the filter is the point, not the geometry.
  */
object Envelope {

  def vehicleEnvelope(events: DataFrame): DataFrame = {
    val lat = col("value") - 90.0
    val lon = col("value") * 1.5 - 200.0
    events
      .select(
        col("event_id"),
        col("event_type"),
        col("user_id").cast("string").as("entity_id"),
        timestamp_micros(floor(col("ts").cast("decimal(38,0)") / 1000).cast("long"))
          .cast("timestamp_ntz").as("event_ts"),
        lit("gtfs-rt-poller").as("source"),
        lat.as("lat"), lon.as("lon"), col("value"))
      // P6 — drop rows with out-of-range coordinates or missing ids
      .filter(col("entity_id").isNotNull &&
        col("lat").between(-90.0, 90.0) && col("lon").between(-180.0, 180.0))
      .orderBy("event_id")
  }

  val vehicleEnvelopeSql: String =
    """SELECT event_id, event_type, CAST(user_id AS VARCHAR) AS entity_id,
      |  CAST(ts AS TIMESTAMP) AS event_ts, 'gtfs-rt-poller' AS source,
      |  value - 90.0 AS lat, value * 1.5 - 200.0 AS lon, value
      |FROM events
      |WHERE CAST(user_id AS VARCHAR) IS NOT NULL
      |  AND value - 90.0 BETWEEN -90.0 AND 90.0
      |  AND value * 1.5 - 200.0 BETWEEN -180.0 AND 180.0
      |ORDER BY event_id""".stripMargin
}
