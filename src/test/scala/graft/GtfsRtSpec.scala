package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions._
import graft.streaming.GtfsRt

/** S4 decoder spec: feeds are hand-encoded with a minimal protobuf
  * writer (varints, length-delimited, fixed32) so the decode is checked
  * against independently-constructed bytes, including unknown-field
  * skipping and multi-byte varint lengths.
  */
class GtfsRtSpec extends SparkSpec {
  import spark.implicits._

  // ---- minimal wire-format writer ----
  private def vi(n: Long): Array[Byte] = {
    var v = n
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    var continue = true
    while (continue) {
      var x = (v & 0x7f).toInt
      v = v >>> 7
      if (v != 0) x |= 0x80 else continue = false
      b += x.toByte
    }
    b.toArray
  }
  private def key(f: Int, wt: Int) = vi((f << 3) | wt)
  private def ld(f: Int, p: Array[Byte]) = key(f, 2) ++ vi(p.length) ++ p
  private def str(f: Int, s: String) = ld(f, s.getBytes("UTF-8"))
  private def f32(f: Int, v: Float) =
    key(f, 5) ++ ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(v).array()
  private def u64(f: Int, v: Long) = key(f, 0) ++ vi(v)
  private def fx64(f: Int) = key(f, 1) ++ Array.fill(8)(0x11.toByte)

  private val longRoute = "R" * 200 // 2-byte varint length

  private def sampleFeed: Array[Byte] = {
    val trip = str(1, "trip-7") ++ str(5, longRoute)
    val pos = f32(1, 44.43f) ++ f32(2, 26.10f) ++ f32(3, 90.5f) ++ f32(5, 13.9f)
    val veh = str(1, "bus-42")
    val vp = ld(1, trip) ++ ld(2, pos) ++ u64(5, 1700000000L) ++ ld(8, veh) ++
      fx64(99) // unknown fixed64 field — must be skipped
    val e1 = str(1, "ent-1") ++ ld(4, vp)
    val e2 = str(1, "ent-2") ++ ld(3, u64(1, 1)) // trip_update entity, no vehicle
    val vpMin = u64(5, 5L) // vehicle position with only a timestamp
    val e3 = str(1, "ent-3") ++ ld(4, vpMin)
    val header = ld(1, str(1, "2.0"))
    header ++ ld(2, e1) ++ ld(2, e2) ++ ld(2, e3) ++
      u64(77, 3) // unknown top-level varint field
  }

  test("decodes the reference poller's field set; skips unknowns and non-vehicle entities") {
    val records = GtfsRt.parseFeed(sampleFeed)
    assert(records.map(_.entity_id) == Seq("ent-1", "ent-3")) // ent-2 has no vehicle

    val r = records.head
    assert(r.vehicle_id.contains("bus-42"))
    assert(r.trip_id.contains("trip-7"))
    assert(r.route_id.contains(longRoute)) // multi-byte varint length survives
    assert(r.latitude.contains(44.43f) && r.longitude.contains(26.10f))
    assert(r.bearing.contains(90.5f) && r.speed.contains(13.9f))
    assert(r.timestamp.contains(1700000000L))

    val min = records(1)
    assert(min.vehicle_id.isEmpty && min.latitude.isEmpty && min.timestamp.contains(5L))
  }

  test("encoder round-trips through the decoder field-for-field") {
    val recs = Seq(
      GtfsRt.VehicleRecord("e1", Some("bus-1"), Some("t1"), Some("R9"),
        Some(44.1f), Some(26.2f), Some(180f), Some(8.25f), Some(1700000123L)),
      GtfsRt.VehicleRecord("e2", None, None, None, None, None, None, None, None))
    assert(GtfsRt.parseFeed(GtfsRt.encodeVehicleFeed(recs)) == recs)
  }

  test("trip-update round trip: nested stop updates, NEGATIVE int32 delays, absence") {
    val recs = Seq(
      GtfsRt.TripUpdateRecord("e1", Some("t1"), Some("R9"), Some(-120),
        Seq(
          GtfsRt.StopTimeUpdateRecord(Some("s1"), Some(-45), Some(300)),
          GtfsRt.StopTimeUpdateRecord(Some("s2"), None, Some(0)))),
      GtfsRt.TripUpdateRecord("e2", None, None, None, Nil))
    assert(GtfsRt.parseTripFeed(GtfsRt.encodeTripFeed(recs)) == recs)
    // mixed-topic feed: a vehicle decoder must not see trip entities and
    // vice versa (the HasField gates)
    assert(GtfsRt.parseFeed(GtfsRt.encodeTripFeed(recs)).isEmpty)
  }

  test("alert round trip: enum ints, TranslatedString first-translation text, null description") {
    val recs = Seq(
      GtfsRt.AlertRecord("a1", Some(6), Some(8), Some("Detour on line 9")),
      GtfsRt.AlertRecord("unknown", Some(0), Some(0), None))
    assert(GtfsRt.parseAlertFeed(GtfsRt.encodeAlertFeed(recs)) == recs)
    assert(GtfsRt.parseTripFeed(GtfsRt.encodeAlertFeed(recs)).isEmpty)
  }

  test("DataFrame decode explodes feeds to rows; validity gate composes as predicates") {
    val feeds = Seq(sampleFeed, sampleFeed).toDF("payload")
    val rows = GtfsRt.decodeVehicleFeed(feeds)
    assert(rows.count() == 4) // 2 vehicle entities × 2 feeds
    // the reference's gate (poller.py:59-85): vehicle id + valid lat/lon
    val valid = rows.filter(
      col("vehicle_id").isNotNull &&
        col("latitude").between(-90, 90) && col("longitude").between(-180, 180))
    assert(valid.count() == 2)
    assert(valid.select("vehicle_id").as[String].collect().toSet == Set("bus-42"))
  }
}
