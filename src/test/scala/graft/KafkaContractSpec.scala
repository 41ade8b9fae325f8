package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Envelope

/** Consumer contract for the Kafka seam (SURVEY §2.1 S5/S6): the
  * sandbox has no broker, so the producer→consumer hop can't execute —
  * instead this spec REPLAYS the reference DB-ingestion service's exact
  * parse (ref: src/db-ingestion-service/ingestor.py:50-142) against the
  * wire bytes our three producer envelopes emit, and fails if any field
  * the consumer touches drifts in name, nesting, or parseability.
  *
  * What the reference consumer does per message (ingestor.py:145-158
  * dispatch, 50-142 inserts):
  *   - `json.loads(value)` then dispatch on `event.get("event_type")`
  *     ∈ {vehicle_position, trip_update, service_alert}; anything else
  *     is dropped with a warning.
  *   - vehicle_position (ingestor.py:50-84): REQUIRED (KeyError ⇒
  *     rollback) payload.vehicle_id/.latitude/.longitude and top-level
  *     timestamp/ingested_at; OPTIONAL (`.get`) payload.trip_id/
  *     .route_id. Values land in vehicle_positions(vehicle_id, trip_id,
  *     route_id, lat, lon, geom, observed_at, ingested_at).
  *   - trip_update (ingestor.py:87-112): REQUIRED payload.trip_id +
  *     timestamps; OPTIONAL payload.route_id/.delay_seconds.
  *   - service_alert (ingestor.py:115-142): REQUIRED payload.alert_id +
  *     timestamps; OPTIONAL payload.alert_type/.description. NOTE the
  *     reference quirk: the consumer reads `alert_type` but the poller
  *     publishes `cause`/`effect` (poller.py:173-181), so the inserted
  *     alert_type is ALWAYS NULL — replayed faithfully below.
  *   - timestamps are passed verbatim to psycopg2, so they must parse
  *     as ISO-8601 with a UTC offset.
  */
class KafkaContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def events = TestdataAdapter.table(spark, dir, "events")

  private def vehicle = Envelope.producerEnvelope(events)
  private def trips   = Envelope.tripUpdateEnvelope(events)
  private def alerts  = Envelope.alertEnvelope(events)

  /** Top-level / payload key lists IN DOCUMENT ORDER (json.dumps keeps
    * dict insertion order; from_json→map keeps parse order), collapsed
    * across all rows — one distinct list means every row carries the
    * same shape.
    */
  private def keysOf(df: DataFrame, path: Column): Seq[Seq[String]] =
    df.select(map_keys(from_json(path, MapType(StringType, StringType))).as("k"))
      .distinct().collect().map(_.getSeq[String](0).toSeq).toSeq

  private def assertShape(df: DataFrame, top: Seq[String], payload: Seq[String]): Unit = {
    assert(keysOf(df, col("kafka_value")) == Seq(top),
      s"top-level envelope keys drifted from the ingestor contract $top")
    assert(keysOf(df, get_json_object(col("kafka_value"), "$.payload")) == Seq(payload),
      s"payload keys drifted from the ingestor contract $payload")
  }

  private val envelopeTop =
    Seq("event_type", "entity_id", "timestamp", "ingested_at", "source", "payload")

  test("vehicle_position wire bytes satisfy insert_vehicle_position's parse") {
    assertShape(vehicle, envelopeTop,
      Seq("vehicle_id", "trip_id", "route_id", "latitude", "longitude", "bearing", "speed"))
    // exactly the fields ingestor.py:50-84 accesses, at their nesting
    val schema = StructType.fromDDL(
      "event_type STRING, timestamp STRING, ingested_at STRING, " +
        "payload STRUCT<vehicle_id: STRING, trip_id: STRING, route_id: STRING, " +
        "latitude: DOUBLE, longitude: DOUBLE>")
    val parsed = vehicle
      .select(from_json(col("kafka_value"), schema, Map("mode" -> "FAILFAST")).as("e"))
      .select(col("e.*"), col("e.payload.*")).persist()
    assert(parsed.count() > 0)
    // dispatch value (ingestor.py:148) and KeyError-if-missing fields
    assert(parsed.filter(col("event_type") =!= "vehicle_position").count() == 0)
    for (required <- Seq("timestamp", "ingested_at", "vehicle_id", "latitude", "longitude"))
      assert(parsed.filter(col(required).isNull).count() == 0,
        s"required field $required would KeyError in the reference consumer")
    // psycopg2 receives the timestamp strings verbatim — they must be
    // offset-carrying ISO-8601
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXXXX"
    assert(parsed.filter(to_timestamp(col("timestamp"), tsFmt).isNull ||
      to_timestamp(col("ingested_at"), tsFmt).isNull).count() == 0,
      "timestamps are not offset-carrying ISO-8601")
    // the optional `.get` fields must be genuinely present-or-null, and
    // the HasField stand-ins must exercise BOTH branches
    assert(parsed.filter(col("trip_id").isNull).count() > 0)
    assert(parsed.filter(col("trip_id").isNotNull).count() > 0)
    parsed.unpersist()
  }

  test("trip_update wire bytes satisfy insert_trip_update's parse") {
    assertShape(trips, envelopeTop,
      Seq("trip_id", "route_id", "delay_seconds", "stop_updates"))
    val schema = StructType.fromDDL(
      "event_type STRING, timestamp STRING, ingested_at STRING, " +
        "payload STRUCT<trip_id: STRING, route_id: STRING, delay_seconds: INT>")
    val parsed = trips
      .select(from_json(col("kafka_value"), schema, Map("mode" -> "FAILFAST")).as("e"))
      .select(col("e.*"), col("e.payload.*")).persist()
    assert(parsed.count() > 0)
    assert(parsed.filter(col("event_type") =!= "trip_update").count() == 0)
    for (required <- Seq("timestamp", "ingested_at", "trip_id"))
      assert(parsed.filter(col(required).isNull).count() == 0,
        s"required field $required would KeyError in the reference consumer")
    parsed.unpersist()
  }

  test("service_alert wire bytes satisfy insert_alert's parse — incl. the alert_type quirk") {
    assertShape(alerts, envelopeTop,
      Seq("alert_id", "cause", "effect", "description"))
    val schema = StructType.fromDDL(
      "event_type STRING, timestamp STRING, ingested_at STRING, " +
        "payload STRUCT<alert_id: STRING, alert_type: STRING, description: STRING>")
    val parsed = alerts
      .select(from_json(col("kafka_value"), schema, Map("mode" -> "FAILFAST")).as("e"))
      .select(col("e.*"), col("e.payload.*")).persist()
    assert(parsed.count() > 0)
    assert(parsed.filter(col("event_type") =!= "service_alert").count() == 0)
    for (required <- Seq("timestamp", "ingested_at", "alert_id"))
      assert(parsed.filter(col(required).isNull).count() == 0,
        s"required field $required would KeyError in the reference consumer")
    // the producer/consumer field mismatch the reference ships with:
    // alert_type is read (ingestor.py:137) but never published
    // (poller.py:173-181 sends cause/effect) — every inserted
    // alert_type is NULL, and description still flows through
    assert(parsed.filter(col("alert_type").isNotNull).count() == 0,
      "alert_type appeared in the payload — the reference's quirk contract broke")
    assert(parsed.filter(col("description").isNotNull).count() > 0)
    parsed.unpersist()
  }

  test("the contract detects drift (negative control)") {
    import spark.implicits._
    // rename one consumer-read key: the shape assertion must fail
    val doctored = vehicle
      .withColumn("kafka_value",
        regexp_replace(col("kafka_value"), "\"vehicle_id\"", "\"vehicleId\""))
    assertThrows[org.scalatest.exceptions.TestFailedException] {
      assertShape(doctored, envelopeTop,
        Seq("vehicle_id", "trip_id", "route_id", "latitude", "longitude", "bearing", "speed"))
    }
  }
}
