package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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
        graft.functions.Cols.ntzFromNanos(col("ts")).as("event_ts"),
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

  /** The producer's wire record (SURVEY.md §2.1 S5): the exact JSON
    * envelope the reference publishes to `gtfs.rt.vehicle_positions`,
    * keyed by entity — `{event_type, entity_id, timestamp, ingested_at,
    * source, payload:{vehicle_id, trip_id, route_id, latitude,
    * longitude, bearing, speed}}` with absent protobuf fields carried as
    * JSON nulls. Ref: src/gtfs-realtime-poller/poller.py:49-54,89-116.
    *
    * Built with `to_json(struct(...))` (key order = struct order =
    * reference dict order; `ignoreNullFields=false` ≡ json.dumps(None)),
    * so the record content is byte-verifiable against a DuckDB twin.
    * Deterministic stand-ins for the wall-clock/feed-dependent parts:
    * ingested_at = event time + 1.5 s (the reference stamps arrival
    * time); trip presence / bearing / speed HasField patterns derive
    * from event_id residues. Timestamps always carry a 6-digit fraction
    * (python isoformat elides an all-zero one — fixed-width is the
    * deliberate deviation, documented here). Numeric payload fields are
    * DECIMAL(9,6): the source values are ≤3 dp, so the cast is exact
    * cross-engine and the JSON text is scale-stable ("1.500000").
    */
  // shared wire-record helpers: event-time µs (schema-adaptive), the
  // fixed-width ISO-8601 renderer, and the deterministic ingest lag
  private val tsUs = graft.functions.Cols.microsFromNanos(col("ts"))
  private def iso(t: Column): Column =
    date_format(t, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'")
  private val tsIso  = iso(timestamp_micros(tsUs))
  private val ingIso = iso(timestamp_micros(tsUs + lit(1500000L)))

  def producerEnvelope(events: DataFrame): DataFrame =
    producerEnvelopeCols(events).orderBy("event_id")

  /** The envelope transform without the output ordering — stateless
    * per-row column algebra, so the SAME code runs as a streaming
    * append-mode producer stage ([[Streams.kafkaEnvelopeStream]]).
    */
  def producerEnvelopeCols(events: DataFrame): DataFrame = {
    val hasTrip    = col("event_id") % 11 =!= 0
    val hasBearing = col("event_id") % 5 =!= 0
    val hasSpeed   = col("event_id") % 7 =!= 0
    events
      .select(
        col("event_id"),
        col("user_id").cast("string").as("entity_id"),
        tsIso.as("ts_iso"),
        ingIso.as("ing_iso"),
        (col("value") - 90.0).cast("decimal(9,6)").as("latitude"),
        (col("value") * 1.5 - 200.0).cast("decimal(9,6)").as("longitude"),
        when(hasBearing, col("value").cast("decimal(9,6)")).as("bearing"),
        when(hasSpeed, (col("value") / 2).cast("decimal(9,6)")).as("speed"),
        when(hasTrip, concat(lit("trip_"), (col("user_id") % 100).cast("string"))).as("trip_id"),
        when(hasTrip, concat(lit("route_"), (col("user_id") % 5).cast("string"))).as("route_id"),
        col("value"))
      .filter(col("entity_id").isNotNull &&
        (col("value") - 90.0).between(-90.0, 90.0) &&
        (col("value") * 1.5 - 200.0).between(-180.0, 180.0))
      .select(
        col("event_id"),
        lit("gtfs.rt.vehicle_positions").as("topic"),
        col("entity_id").as("kafka_key"),
        to_json(struct(
          lit("vehicle_position").as("event_type"),
          col("entity_id"),
          col("ts_iso").as("timestamp"),
          col("ing_iso").as("ingested_at"),
          lit("gtfs-realtime").as("source"),
          struct(
            col("entity_id").as("vehicle_id"),
            col("trip_id"), col("route_id"),
            col("latitude"), col("longitude"),
            col("bearing"), col("speed")).as("payload")),
          Map("ignoreNullFields" -> "false")).as("kafka_value"))
  }

  /** S5, topic 2 of 3: the trip-update wire record — `{event_type,
    * entity_id, timestamp, ingested_at, source, payload:{trip_id,
    * route_id, delay_seconds, stop_updates:[{stop_id, arrival_delay,
    * departure_delay}, …]}}` with a NESTED ARRAY of per-stop structs
    * (the reference accumulates stop_time_update entries).
    * Ref: poller.py:118-157. Deterministic stand-ins: two stop updates
    * per event, HasField absence patterns from event_id residues;
    * entities without a trip (event_id % 13 = 0) are skipped, mirroring
    * the `if not t.trip.trip_id: continue` guard.
    */
  def tripUpdateEnvelope(events: DataFrame): DataFrame = {
    val tripId = concat(lit("trip_"), (col("user_id") % 100).cast("string"))
    events
      .filter(col("event_id") % 13 =!= 0)
      .select(
        col("event_id"),
        lit("gtfs.rt.trip_updates").as("topic"),
        tripId.as("kafka_key"),
        to_json(struct(
          lit("trip_update").as("event_type"),
          tripId.as("entity_id"),
          tsIso.as("timestamp"),
          ingIso.as("ingested_at"),
          lit("gtfs-realtime").as("source"),
          struct(
            tripId.as("trip_id"),
            concat(lit("route_"), (col("user_id") % 5).cast("string")).as("route_id"),
            ((col("event_id") % 1200) - 120).cast("int").as("delay_seconds"),
            array(
              struct(
                concat(lit("stop_"), (col("user_id") % 50).cast("string")).as("stop_id"),
                when(col("event_id") % 3 =!= 0, (col("event_id") % 300).cast("int"))
                  .as("arrival_delay"),
                when(col("event_id") % 4 =!= 0, (col("event_id") % 240).cast("int"))
                  .as("departure_delay")),
              struct(
                concat(lit("stop_"), ((col("user_id") + 1) % 50).cast("string")).as("stop_id"),
                when(col("event_id") % 5 =!= 0, (col("event_id") % 180).cast("int"))
                  .as("arrival_delay"),
                when(col("event_id") % 6 =!= 0, (col("event_id") % 120).cast("int"))
                  .as("departure_delay"))).as("stop_updates")).as("payload")),
          Map("ignoreNullFields" -> "false")).as("kafka_value"))
      .orderBy("event_id")
  }

  val tripUpdateEnvelopeSql: String = {
    def stu(stopExpr: String, arrMod: Int, arrRange: Int, depMod: Int, depRange: Int) =
      s"""'{"stop_id":"stop_' || $stopExpr ||
         |'","arrival_delay":' ||
         |CASE WHEN event_id % $arrMod <> 0 THEN CAST(event_id % $arrRange AS VARCHAR) ELSE 'null' END ||
         |',"departure_delay":' ||
         |CASE WHEN event_id % $depMod <> 0 THEN CAST(event_id % $depRange AS VARCHAR) ELSE 'null' END || '}'"""
        .stripMargin.replace("\n", "\n  ")
    s"""SELECT event_id, 'gtfs.rt.trip_updates' AS topic,
       |  'trip_' || CAST(user_id % 100 AS VARCHAR) AS kafka_key,
       |  '{"event_type":"trip_update","entity_id":"trip_' || CAST(user_id % 100 AS VARCHAR) ||
       |  '","timestamp":"' || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' ||
       |  '","ingested_at":"' || strftime(CAST(ts AS TIMESTAMP) + INTERVAL 1500 MILLISECOND,
       |                                  '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' ||
       |  '","source":"gtfs-realtime","payload":{"trip_id":"trip_' || CAST(user_id % 100 AS VARCHAR) ||
       |  '","route_id":"route_' || CAST(user_id % 5 AS VARCHAR) ||
       |  '","delay_seconds":' || CAST((event_id % 1200) - 120 AS VARCHAR) ||
       |  ',"stop_updates":[' ||
       |  ${stu("CAST(user_id % 50 AS VARCHAR)", 3, 300, 4, 240)} || ',' ||
       |  ${stu("CAST((user_id + 1) % 50 AS VARCHAR)", 5, 180, 6, 120)} ||
       |  ']}}' AS kafka_value
       |FROM events WHERE event_id % 13 <> 0
       |ORDER BY event_id""".stripMargin
  }

  /** S5, topic 3 of 3: the service-alert wire record — `{…,
    * payload:{alert_id, cause, effect, description}}`, with the
    * reference's `entity.id or "unknown"` fallback and a missing-
    * translation description → null. Ref: poller.py:159-189.
    */
  def alertEnvelope(events: DataFrame): DataFrame = {
    val alertId = when(col("event_id") % 17 === 0, lit("unknown"))
      .otherwise(concat(lit("alert_"), (col("event_id") % 1000).cast("string")))
    events
      .filter(col("event_id") % 11 =!= 0)
      .select(
        col("event_id"),
        lit("gtfs.rt.alerts").as("topic"),
        alertId.as("kafka_key"),
        to_json(struct(
          lit("service_alert").as("event_type"),
          alertId.as("entity_id"),
          tsIso.as("timestamp"),
          ingIso.as("ingested_at"),
          lit("gtfs-realtime").as("source"),
          struct(
            alertId.as("alert_id"),
            (col("user_id") % 12).cast("int").as("cause"),
            (col("user_id") % 9).cast("int").as("effect"),
            when(col("event_id") % 7 =!= 0,
              concat(lit("Service alert "), (col("event_id") % 1000).cast("string")))
              .as("description")).as("payload")),
          Map("ignoreNullFields" -> "false")).as("kafka_value"))
      .orderBy("event_id")
  }

  val alertEnvelopeSql: String =
    """WITH a AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_id % 17 = 0 THEN 'unknown'
      |         ELSE 'alert_' || CAST(event_id % 1000 AS VARCHAR) END AS alert_id
      |  FROM events WHERE event_id % 11 <> 0)
      |SELECT event_id, 'gtfs.rt.alerts' AS topic, alert_id AS kafka_key,
      |  '{"event_type":"service_alert","entity_id":"' || alert_id ||
      |  '","timestamp":"' || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' ||
      |  '","ingested_at":"' || strftime(CAST(ts AS TIMESTAMP) + INTERVAL 1500 MILLISECOND,
      |                                  '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' ||
      |  '","source":"gtfs-realtime","payload":{"alert_id":"' || alert_id ||
      |  '","cause":' || CAST(user_id % 12 AS VARCHAR) ||
      |  ',"effect":' || CAST(user_id % 9 AS VARCHAR) ||
      |  ',"description":' ||
      |  CASE WHEN event_id % 7 <> 0
      |       THEN '"Service alert ' || CAST(event_id % 1000 AS VARCHAR) || '"'
      |       ELSE 'null' END ||
      |  '}}' AS kafka_value
      |FROM a ORDER BY event_id""".stripMargin

  val producerEnvelopeSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(user_id AS VARCHAR) AS entity_id,
      |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS ts_iso,
      |    strftime(CAST(ts AS TIMESTAMP) + INTERVAL 1500 MILLISECOND,
      |             '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS ing_iso,
      |    CAST(value - 90.0 AS DECIMAL(9,6)) AS lat,
      |    CAST(value * 1.5 - 200.0 AS DECIMAL(9,6)) AS lon,
      |    CASE WHEN event_id % 5 <> 0 THEN CAST(value AS DECIMAL(9,6)) END AS bearing,
      |    CASE WHEN event_id % 7 <> 0 THEN CAST(value / 2 AS DECIMAL(9,6)) END AS speed,
      |    CASE WHEN event_id % 11 <> 0 THEN 'trip_' || CAST(user_id % 100 AS VARCHAR) END AS trip_id,
      |    CASE WHEN event_id % 11 <> 0 THEN 'route_' || CAST(user_id % 5 AS VARCHAR) END AS route_id
      |  FROM events
      |  WHERE CAST(user_id AS VARCHAR) IS NOT NULL
      |    AND value - 90.0 BETWEEN -90.0 AND 90.0
      |    AND value * 1.5 - 200.0 BETWEEN -180.0 AND 180.0)
      |SELECT event_id, 'gtfs.rt.vehicle_positions' AS topic, entity_id AS kafka_key,
      |  '{"event_type":"vehicle_position","entity_id":"' || entity_id ||
      |  '","timestamp":"' || ts_iso || '","ingested_at":"' || ing_iso ||
      |  '","source":"gtfs-realtime","payload":{"vehicle_id":"' || entity_id ||
      |  '","trip_id":' || COALESCE('"' || trip_id || '"', 'null') ||
      |  ',"route_id":' || COALESCE('"' || route_id || '"', 'null') ||
      |  ',"latitude":' || CAST(lat AS VARCHAR) ||
      |  ',"longitude":' || CAST(lon AS VARCHAR) ||
      |  ',"bearing":' || COALESCE(CAST(bearing AS VARCHAR), 'null') ||
      |  ',"speed":' || COALESCE(CAST(speed AS VARCHAR), 'null') ||
      |  '}}' AS kafka_value
      |FROM e ORDER BY event_id""".stripMargin
}
