package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GTFS-realtime wire-format decoder (SURVEY §2.1 S4): a self-contained
  * protobuf binary reader for the public gtfs-realtime FeedMessage /
  * VehiclePosition schema — no generated classes and no protobuf runtime
  * (the container has neither). Parses exactly the fields the reference
  * poller consumes (src/gtfs-realtime-poller/poller.py:73-106):
  * entity.vehicle{vehicle.id, trip.trip_id, trip.route_id,
  * position.{latitude, longitude, bearing, speed}, timestamp}.
  *
  * Wire format (the public protobuf encoding spec): every field is a
  * varint key `(field_number << 3) | wire_type`; gtfs-realtime uses wire
  * types 0 (varint), 1 (fixed64), 2 (length-delimited), 5 (fixed32).
  * Unknown fields are skipped by wire type, so feeds with extensions —
  * or future spec additions — decode cleanly instead of erroring.
  *
  * Scale shape: decode is a pure per-row function over a binary column
  * (flatMap — one feed explodes to its vehicle rows), embarrassingly
  * parallel over however many feed fetches land per micro-batch; a
  * production deployment points it at Kafka message bytes (the S5/S6
  * documented swap) with everything downstream unchanged.
  */
object GtfsRt {

  final case class VehicleRecord(
      entity_id: String,
      vehicle_id: Option[String],
      trip_id: Option[String],
      route_id: Option[String],
      latitude: Option[Float],
      longitude: Option[Float],
      bearing: Option[Float],
      speed: Option[Float],
      timestamp: Option[Long])

  /** Cursor over a byte range; all reads advance `pos`. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var res = 0L; var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        res |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | (buf(pos + 1) & 0xff) << 8 |
        (buf(pos + 2) & 0xff) << 16 | (buf(pos + 3) & 0xff) << 24
      pos += 4; v
    }
    def utf8(len: Int): String = {
      val s = new String(buf, pos, len, "UTF-8"); pos += len; s
    }
    def sub(len: Int): Reader = {
      val r = new Reader(buf, pos, pos + len); pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 =>
        // sequence explicitly: `pos += varint()` would read the OLD pos
        // before varint() advances past the length prefix
        val len = varint().toInt; pos += len
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  private def float32(bits: Int): Float = java.lang.Float.intBitsToFloat(bits)

  /** TripDescriptor: trip_id = 1 (string), route_id = 5 (string). */
  private def parseTrip(r: Reader): (Option[String], Option[String]) = {
    var tripId: Option[String] = None; var routeId: Option[String] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => tripId = Some(r.utf8(r.varint().toInt))
        case (5, 2) => routeId = Some(r.utf8(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    (tripId, routeId)
  }

  /** Position: latitude = 1, longitude = 2, bearing = 3, speed = 5 (floats). */
  private def parsePosition(r: Reader): (Option[Float], Option[Float], Option[Float], Option[Float]) = {
    var lat: Option[Float] = None; var lon: Option[Float] = None
    var bearing: Option[Float] = None; var speed: Option[Float] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 5) => lat = Some(float32(r.fixed32()))
        case (2, 5) => lon = Some(float32(r.fixed32()))
        case (3, 5) => bearing = Some(float32(r.fixed32()))
        case (5, 5) => speed = Some(float32(r.fixed32()))
        case _ => r.skip(wt)
      }
    }
    (lat, lon, bearing, speed)
  }

  /** VehicleDescriptor: id = 1 (string). */
  private def parseVehicleDesc(r: Reader): Option[String] = {
    var id: Option[String] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => id = Some(r.utf8(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    id
  }

  /** VehiclePosition: trip = 1, position = 2, timestamp = 5 (uint64),
    * vehicle = 8.
    */
  private def parseVehiclePosition(r: Reader, entityId: String): VehicleRecord = {
    var trip: (Option[String], Option[String]) = (None, None)
    var pos: (Option[Float], Option[Float], Option[Float], Option[Float]) = (None, None, None, None)
    var vehicleId: Option[String] = None
    var ts: Option[Long] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => trip = parseTrip(r.sub(r.varint().toInt))
        case (2, 2) => pos = parsePosition(r.sub(r.varint().toInt))
        case (5, 0) => ts = Some(r.varint())
        case (8, 2) => vehicleId = parseVehicleDesc(r.sub(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    VehicleRecord(entityId, vehicleId, trip._1, trip._2,
      pos._1, pos._2, pos._3, pos._4, ts)
  }

  /** FeedEntity: id = 1 (string), vehicle = 4 (VehiclePosition).
    * Entities without a vehicle field (trip updates, alerts) yield None
    * — the reference's HasField("vehicle") gate (poller.py:75-76).
    */
  private def parseEntity(r: Reader): Option[VehicleRecord] = {
    var entityId = ""
    var vehicle: Option[Reader] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => entityId = r.utf8(r.varint().toInt)
        case (4, 2) => vehicle = Some(r.sub(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    vehicle.map(parseVehiclePosition(_, entityId))
  }

  /** FeedMessage: header = 1 (skipped), entity = 2 repeated. */
  def parseFeed(bytes: Array[Byte]): Seq[VehicleRecord] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[VehicleRecord]
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (2, 2) => parseEntity(r.sub(r.varint().toInt)).foreach(out += _)
        case _ => r.skip(wt)
      }
    }
    out.result()
  }

  // ---- TripUpdate / Alert entities (the reference's other two topics,
  //      poller.py:118-189; field numbers per the public proto) ----

  final case class StopTimeUpdateRecord(
      stop_id: Option[String],
      arrival_delay: Option[Int],
      departure_delay: Option[Int])

  final case class TripUpdateRecord(
      entity_id: String,
      trip_id: Option[String],
      route_id: Option[String],
      delay_seconds: Option[Int],
      stop_updates: Seq[StopTimeUpdateRecord])

  final case class AlertRecord(
      entity_id: String,
      cause: Option[Int],
      effect: Option[Int],
      description: Option[String])

  /** StopTimeEvent: delay = 1 (int32 — negative delays arrive as
    * 10-byte sign-extended varints; the Long→Int truncation is the
    * spec-correct narrowing).
    */
  private def parseStopTimeEvent(r: Reader): Option[Int] = {
    var delay: Option[Int] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 0) => delay = Some(r.varint().toInt)
        case _ => r.skip(wt)
      }
    }
    delay
  }

  /** StopTimeUpdate: arrival = 2, departure = 3, stop_id = 4. */
  private def parseStopTimeUpdate(r: Reader): StopTimeUpdateRecord = {
    var stopId: Option[String] = None
    var arr: Option[Int] = None; var dep: Option[Int] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (2, 2) => arr = parseStopTimeEvent(r.sub(r.varint().toInt))
        case (3, 2) => dep = parseStopTimeEvent(r.sub(r.varint().toInt))
        case (4, 2) => stopId = Some(r.utf8(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    StopTimeUpdateRecord(stopId, arr, dep)
  }

  /** TripUpdate: trip = 1, stop_time_update = 2 repeated, delay = 5. */
  private def parseTripUpdate(r: Reader, entityId: String): TripUpdateRecord = {
    var trip: (Option[String], Option[String]) = (None, None)
    var delay: Option[Int] = None
    val stops = Seq.newBuilder[StopTimeUpdateRecord]
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => trip = parseTrip(r.sub(r.varint().toInt))
        case (2, 2) => stops += parseStopTimeUpdate(r.sub(r.varint().toInt))
        case (5, 0) => delay = Some(r.varint().toInt)
        case _ => r.skip(wt)
      }
    }
    TripUpdateRecord(entityId, trip._1, trip._2, delay, stops.result())
  }

  /** TranslatedString: translation = 1 repeated {text = 1, language = 2};
    * the reference takes translation[0].text (poller.py:176-179).
    */
  private def parseTranslatedString(r: Reader): Option[String] = {
    var first: Option[String] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) =>
          val tr = r.sub(r.varint().toInt)
          var text: Option[String] = None
          while (tr.hasNext) {
            val k2 = tr.varint(); val f2 = (k2 >> 3).toInt; val w2 = (k2 & 7).toInt
            (f2, w2) match {
              case (1, 2) => text = Some(tr.utf8(tr.varint().toInt))
              case _ => tr.skip(w2)
            }
          }
          if (first.isEmpty) first = text
        case _ => r.skip(wt)
      }
    }
    first
  }

  /** Alert: cause = 6 (enum), effect = 7 (enum), header_text = 10. */
  private def parseAlert(r: Reader, entityId: String): AlertRecord = {
    var cause: Option[Int] = None; var effect: Option[Int] = None
    var desc: Option[String] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (6, 0) => cause = Some(r.varint().toInt)
        case (7, 0) => effect = Some(r.varint().toInt)
        case (10, 2) => desc = parseTranslatedString(r.sub(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    AlertRecord(entityId, cause, effect, desc)
  }

  /** FeedEntity scan keyed on one message field (trip_update = 3 or
    * alert = 5); entities carrying other message types yield None —
    * the reference's HasField gates.
    */
  private def parseEntityFor[A](r: Reader, msgField: Int,
      mk: (Reader, String) => A): Option[A] = {
    var entityId = ""
    var msg: Option[Reader] = None
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => entityId = r.utf8(r.varint().toInt)
        case (`msgField`, 2) => msg = Some(r.sub(r.varint().toInt))
        case _ => r.skip(wt)
      }
    }
    msg.map(mk(_, entityId))
  }

  def parseTripFeed(bytes: Array[Byte]): Seq[TripUpdateRecord] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[TripUpdateRecord]
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (2, 2) => parseEntityFor(r.sub(r.varint().toInt), 3, parseTripUpdate).foreach(out += _)
        case _ => r.skip(wt)
      }
    }
    out.result()
  }

  def parseAlertFeed(bytes: Array[Byte]): Seq[AlertRecord] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[AlertRecord]
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (2, 2) => parseEntityFor(r.sub(r.varint().toInt), 5, parseAlert).foreach(out += _)
        case _ => r.skip(wt)
      }
    }
    out.result()
  }

  // ---- producer side (S5's payload construction) ----

  private def wVi(out: java.io.ByteArrayOutputStream, n: Long): Unit = {
    var v = n
    var more = true
    while (more) {
      var x = (v & 0x7f).toInt
      v = v >>> 7
      if (v != 0) x |= 0x80 else more = false
      out.write(x)
    }
  }
  private def wKey(out: java.io.ByteArrayOutputStream, f: Int, wt: Int): Unit =
    wVi(out, (f.toLong << 3) | wt)
  private def wBytes(out: java.io.ByteArrayOutputStream, f: Int, p: Array[Byte]): Unit = {
    wKey(out, f, 2); wVi(out, p.length); out.write(p, 0, p.length)
  }
  private def wStr(out: java.io.ByteArrayOutputStream, f: Int, s: String): Unit =
    wBytes(out, f, s.getBytes("UTF-8"))
  private def wF32(out: java.io.ByteArrayOutputStream, f: Int, v: Float): Unit = {
    wKey(out, f, 5)
    val bits = java.lang.Float.floatToIntBits(v)
    out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
    out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
  }

  /** Rows → FeedMessage bytes: the producer-side twin of [[parseFeed]]
    * (what the reference's Kafka path serializes before ingest). Field
    * numbers follow the public gtfs-realtime proto; optional fields are
    * emitted only when present, matching protobuf presence semantics.
    */
  def encodeVehicleFeed(records: Seq[VehicleRecord]): Array[Byte] = {
    val feed = new java.io.ByteArrayOutputStream()
    val header = new java.io.ByteArrayOutputStream()
    wStr(header, 1, "2.0")
    wBytes(feed, 1, header.toByteArray)
    records.foreach { rec =>
      val trip = new java.io.ByteArrayOutputStream()
      rec.trip_id.foreach(wStr(trip, 1, _))
      rec.route_id.foreach(wStr(trip, 5, _))
      val pos = new java.io.ByteArrayOutputStream()
      rec.latitude.foreach(wF32(pos, 1, _))
      rec.longitude.foreach(wF32(pos, 2, _))
      rec.bearing.foreach(wF32(pos, 3, _))
      rec.speed.foreach(wF32(pos, 5, _))
      val vdesc = new java.io.ByteArrayOutputStream()
      rec.vehicle_id.foreach(wStr(vdesc, 1, _))
      val vp = new java.io.ByteArrayOutputStream()
      if (trip.size() > 0) wBytes(vp, 1, trip.toByteArray)
      if (pos.size() > 0) wBytes(vp, 2, pos.toByteArray)
      rec.timestamp.foreach { t => wKey(vp, 5, 0); wVi(vp, t) }
      if (vdesc.size() > 0) wBytes(vp, 8, vdesc.toByteArray)
      val entity = new java.io.ByteArrayOutputStream()
      wStr(entity, 1, rec.entity_id)
      wBytes(entity, 4, vp.toByteArray)
      wBytes(feed, 2, entity.toByteArray)
    }
    feed.toByteArray
  }

  /** Binary feed column → exploded vehicle rows, with the reference's
    * validity gate applied downstream-style: rows keep every decoded
    * field; callers compose `Envelope`-shape filters (vehicle id
    * present, lat/lon in range — poller.py:59-85) as pushdown-able
    * column predicates rather than inside the decoder.
    */
  def decodeVehicleFeed(feeds: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.select(col(payloadCol).cast("binary").as("bytes"))
      .as[Array[Byte]]
      .flatMap(parseFeed)
      .toDF()
  }

  private def wI32(out: java.io.ByteArrayOutputStream, f: Int, v: Int): Unit = {
    // int32 on the wire: negative values sign-extend to 64 bits first
    // (the 10-byte varint form the spec mandates)
    wKey(out, f, 0); wVi(out, v.toLong)
  }

  /** Rows → FeedMessage bytes for the trip-update topic. */
  def encodeTripFeed(records: Seq[TripUpdateRecord]): Array[Byte] = {
    val feed = new java.io.ByteArrayOutputStream()
    val header = new java.io.ByteArrayOutputStream()
    wStr(header, 1, "2.0")
    wBytes(feed, 1, header.toByteArray)
    records.foreach { rec =>
      val trip = new java.io.ByteArrayOutputStream()
      rec.trip_id.foreach(wStr(trip, 1, _))
      rec.route_id.foreach(wStr(trip, 5, _))
      val tu = new java.io.ByteArrayOutputStream()
      if (trip.size() > 0) wBytes(tu, 1, trip.toByteArray)
      rec.stop_updates.foreach { stu =>
        val s = new java.io.ByteArrayOutputStream()
        stu.arrival_delay.foreach { d =>
          val e = new java.io.ByteArrayOutputStream(); wI32(e, 1, d); wBytes(s, 2, e.toByteArray)
        }
        stu.departure_delay.foreach { d =>
          val e = new java.io.ByteArrayOutputStream(); wI32(e, 1, d); wBytes(s, 3, e.toByteArray)
        }
        stu.stop_id.foreach(wStr(s, 4, _))
        wBytes(tu, 2, s.toByteArray)
      }
      rec.delay_seconds.foreach(wI32(tu, 5, _))
      val entity = new java.io.ByteArrayOutputStream()
      wStr(entity, 1, rec.entity_id)
      wBytes(entity, 3, tu.toByteArray)
      wBytes(feed, 2, entity.toByteArray)
    }
    feed.toByteArray
  }

  /** Rows → FeedMessage bytes for the alerts topic. */
  def encodeAlertFeed(records: Seq[AlertRecord]): Array[Byte] = {
    val feed = new java.io.ByteArrayOutputStream()
    val header = new java.io.ByteArrayOutputStream()
    wStr(header, 1, "2.0")
    wBytes(feed, 1, header.toByteArray)
    records.foreach { rec =>
      val alert = new java.io.ByteArrayOutputStream()
      rec.cause.foreach(wI32(alert, 6, _))
      rec.effect.foreach(wI32(alert, 7, _))
      rec.description.foreach { text =>
        val tr = new java.io.ByteArrayOutputStream()
        wStr(tr, 1, text); wStr(tr, 2, "en")
        val ts = new java.io.ByteArrayOutputStream()
        wBytes(ts, 1, tr.toByteArray)
        wBytes(alert, 10, ts.toByteArray)
      }
      val entity = new java.io.ByteArrayOutputStream()
      wStr(entity, 1, rec.entity_id)
      wBytes(entity, 5, alert.toByteArray)
      wBytes(feed, 2, entity.toByteArray)
    }
    feed.toByteArray
  }

  def decodeTripFeed(feeds: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.select(col(payloadCol).cast("binary").as("bytes"))
      .as[Array[Byte]]
      .flatMap(parseTripFeed)
      .toDF()
  }

  def decodeAlertFeed(feeds: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.select(col(payloadCol).cast("binary").as("bytes"))
      .as[Array[Byte]]
      .flatMap(parseAlertFeed)
      .toDF()
  }
}
