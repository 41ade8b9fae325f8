package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.GraftQueue

/** Timestamp-indexed seek (r16, VERDICT item 3 — Kafka's
  * `offsetsForTimes`): resolution to the first record-ts ≥ target
  * inside a dense segment, inside a compacted span (sparse survivor
  * offsets), at the boundaries (exact hit, past-the-end), and the
  * OffsetOutOfRange analogue when the target predates the retained log.
  */
class GraftQueueTimeSeekSpec extends SparkSpec {

  private val topic = "ts.seek"

  private val tsRe = """"ts":(\d+)""".r
  private def tsOf(k: Array[Byte], v: Array[Byte]): Long =
    tsRe.findFirstMatchIn(new String(v, "UTF-8")).get.group(1).toLong

  /** Produce one segment of (key=k{id%3}, value={"id":id,"ts":ts}) rows
    * with ts = 100·id — ids ascending within the segment.
    */
  private def produce(path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id")
      .repartition(1).sortWithinPartitions("id")
      .select(
        concat(lit("k"), (col("id") % 3).cast("string"))
          .cast("binary").as("key"),
        to_json(struct(col("id"), (col("id") * 100).as("ts")))
          .cast("binary").as("value"))
      .write.format("graftqueue").option("path", path)
      .option("topic", topic).mode("append").save()
  }

  test("dense log: resolves to the first record ts >= target; exact hit; past-end") {
    val path = Files.createTempDirectory("graft_tseek").toString
    produce(path, 0L to 9L)    // offsets 0..9,  ts 0..900
    produce(path, 10L to 19L)  // offsets 10..19, ts 1000..1900
    // strictly between records: ts 250 → first >= is id 3 at offset 3
    assert(GraftQueue.offsetForTime(path, topic, 250L, tsOf) == 3L)
    // exact hit on a record: ts 1200 → offset 12 (second segment)
    assert(GraftQueue.offsetForTime(path, topic, 1200L, tsOf) == 12L)
    // at/below the first record: earliest offset
    assert(GraftQueue.offsetForTime(path, topic, 0L, tsOf) == 0L)
    assert(GraftQueue.offsetForTime(path, topic, -5L, tsOf) == 0L)
    // past the last record: the log end — an empty replay, not an error
    assert(GraftQueue.offsetForTime(path, topic, 99999L, tsOf) == 20L)
  }

  test("compacted span: resolves to the first SURVIVOR at or past the target") {
    val path = Files.createTempDirectory("graft_tseek_c").toString
    produce(path, 0L to 9L)
    produce(path, 10L to 19L)
    GraftQueue.compact(path, topic, 20L)
    // keys cycle id % 3 → the only survivors of the prefix are the
    // latest per key: ids 17, 18, 19 at offsets 17, 18, 19
    produce(path, 20L to 24L) // live dense tail
    // ts 250 (id 3's stamp) fell in the compacted hole → the first
    // survivor past it is offset 17
    assert(GraftQueue.offsetForTime(path, topic, 250L, tsOf) == 17L)
    // inside the dense tail still resolves record-exact
    assert(GraftQueue.offsetForTime(path, topic, 2250L, tsOf) == 23L)
    // the resolved offset feeds the existing seek machinery: replay
    // from ts 250 sees exactly survivors 17.. + the tail
    val ids = spark.read.format("graftqueue").option("path", path)
      .option("topic", topic)
      .option("startingOffset",
        GraftQueue.offsetForTime(path, topic, 250L, tsOf).toString)
      .load().select(col("offset")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (17L to 24L))
  }

  test("startingTimestamp option: batch and streaming reads seek by event time") {
    val path = Files.createTempDirectory("graft_tseek_o").toString
    produce(path, 0L to 9L)
    produce(path, 10L to 19L)
    // batch: option-driven ts seek ≡ the equivalent offset seek
    def offsets(reader: org.apache.spark.sql.DataFrameReader) = reader
      .format("graftqueue").option("path", path).option("topic", topic)
      .load().select(col("offset")).collect().map(_.getLong(0)).sorted.toSeq
    val viaTs = offsets(spark.read
      .option("startingTimestamp", "1200")
      .option("tsPattern", """"ts":(\d+)"""))
    assert(viaTs == (12L to 19L),
      s"batch startingTimestamp read returned $viaTs")
    assert(viaTs == offsets(spark.read.option("startingOffset", "12")))
    // missing tsPattern fails loudly, never a silent full read
    val ex = intercept[Exception] {
      offsets(spark.read.option("startingTimestamp", "1200"))
    }
    assert(ex.getMessage.contains("tsPattern"))
    // a matching pattern with NO capture group is a descriptive
    // misconfiguration error, not an IndexOutOfBounds (r17, ADVICE r16)
    val exg = intercept[Exception] {
      offsets(spark.read.option("startingTimestamp", "1200")
        .option("tsPattern", """"ts":\d+"""))
    }
    assert(exg.getMessage.contains("capture group"))
    // startingOffset WINS over startingTimestamp, and the losing leg is
    // never resolved (r17, ADVICE r16: resolution is lazy — a missing
    // tsPattern beside a winning startingOffset must not throw)
    assert(offsets(spark.read.option("startingOffset", "14")
      .option("startingTimestamp", "1200")) == (14L to 19L))
    // streaming: the first batch of a ts-seeking consumer starts at the
    // resolved offset (a mid-segment skip-count read)
    import spark.implicits._
    val got = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", topic)
      .option("startingTimestamp", "1500")
      .option("tsPattern", """"ts":(\d+)""")
      .load().select(col("offset"))
    val q = got.writeStream.format("memory").queryName("tseek_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_tseek_ck").toString)
      .start()
    q.awaitTermination()
    val streamed = spark.table("tseek_stream")
      .as[Long].collect().sorted.toSeq
    assert(streamed == (15L to 19L),
      s"streaming startingTimestamp drain returned $streamed")
    // streaming initialOffset is lazy too (r17, ADVICE r16): with both
    // options set, startingOffset wins and the timestamp leg is never
    // resolved — no tsPattern needed, no probe, no throw
    val q2 = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", topic)
      .option("startingOffset", "18")
      .option("startingTimestamp", "1200")
      .load().select(col("offset"))
      .writeStream.format("memory").queryName("tseek_stream_lazy")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_tseek_ck2").toString)
      .start()
    q2.awaitTermination()
    val streamed2 = spark.table("tseek_stream_lazy")
      .as[Long].collect().sorted.toSeq
    assert(streamed2 == (18L to 19L),
      s"streaming startingOffset-wins drain returned $streamed2")
  }

  test("probe cost: one record per segment + a bounded boundary scan (r17)") {
    val path = Files.createTempDirectory("graft_tseek_p").toString
    produce(path, 0L to 9L)    // ts 0..900
    produce(path, 10L to 19L)  // ts 1000..1900
    produce(path, 20L to 29L)  // ts 2000..2900
    def reads(ts: Long): (Long, Long) = {
      GraftQueue.probeRecordsRead.set(0L)
      val off = GraftQueue.offsetForTime(path, topic, ts, tsOf)
      (off, GraftQueue.probeRecordsRead.get)
    }
    // mid-segment target: 3 probe reads (one per segment) + the boundary
    // segment scanned up to the match (records 10, 11, 12) — the r16
    // implementation read all 30 records here, twice over
    assert(reads(1200L) == ((12L, 3L + 3L)))
    // target at/below every record: probe + ONE boundary read
    assert(reads(0L) == ((0L, 3L + 1L)))
    // target between segments (ts 950): the boundary segment scans dry
    // (10 reads) and the NEXT segment's first record answers (1 read) —
    // the worst case is segments + boundary span + 1, never O(total)
    assert(reads(950L) == ((10L, 3L + 10L + 1L)))
    // past the end: every segment's first probed, the last scanned dry
    assert(reads(99999L) == ((30L, 3L + 10L)))
  }

  test("target below the retained log raises the OffsetOutOfRange analogue") {
    val path = Files.createTempDirectory("graft_tseek_r").toString
    produce(path, 0L to 9L)
    produce(path, 10L to 19L)
    val r = GraftQueue.retain(path, topic, 10L) // first segment truncated
    assert(r.logStartOffset == 10L)
    // the records that held ts<=900 are gone: fail loudly
    val ex = intercept[IllegalArgumentException] {
      GraftQueue.offsetForTime(path, topic, 250L, tsOf)
    }
    assert(ex.getMessage.contains("OffsetOutOfRange"))
    // targets inside the surviving suffix still resolve
    assert(GraftQueue.offsetForTime(path, topic, 1250L, tsOf) == 13L)
    // a fully-truncated log has no answer for any target
    val r2 = GraftQueue.retain(path, topic, 20L)
    assert(r2.logStartOffset == 20L)
    val ex2 = intercept[IllegalArgumentException] {
      GraftQueue.offsetForTime(path, topic, 1250L, tsOf)
    }
    assert(ex2.getMessage.contains("OffsetOutOfRange"))
  }
}
