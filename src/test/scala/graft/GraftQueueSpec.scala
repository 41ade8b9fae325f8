package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Envelope

/** The Kafka-seam swap, EXECUTED: producer envelope bytes go through a
  * V2 sink into the `graftqueue` topic emulation, come back through
  * `format("graftqueue")` with Kafka's reader schema — batch and
  * micro-batch — and feed the exact consumer parse the file-source twin
  * uses. What a real deployment changes is ONE format string + broker
  * options; everything upstream (envelope algebra) and downstream
  * (schema-on-read) is the code these tests run.
  */
class GraftQueueSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def events = TestdataAdapter.table(spark, dir, "events")

  private def freshPath = Files.createTempDirectory("graftqueue").toString

  private def produce(path: String, topic: String): Long = {
    val wire = Envelope.tripUpdateEnvelope(events)
    wire.select(
      col("kafka_key").cast("binary").as("key"),
      col("kafka_value").cast("binary").as("value"))
      .write.format("graftqueue")
      .option("path", path).option("topic", topic)
      .mode("append").save()
    wire.count()
  }

  test("batch round trip: envelope bytes survive the queue byte-for-byte") {
    val path = freshPath
    val n = produce(path, "gtfs.rt.trip_updates")
    val back = spark.read.format("graftqueue")
      .option("path", path).option("topic", "gtfs.rt.trip_updates").load()
    assert(back.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp"),
      "reader schema must match Kafka's")
    assert(back.count() == n)
    assert(back.select(countDistinct(col("offset"))).head.getLong(0) == n,
      "offsets must be unique and dense")
    val sent = Envelope.tripUpdateEnvelope(events)
      .select("kafka_key", "kafka_value").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    val got = back.select(col("key").cast("string"), col("value").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(got.toSeq == sent.toSeq)
  }

  test("micro-batch stream: offset-range planning delivers every committed record once") {
    val path = freshPath
    val n = produce(path, "gtfs.rt.trip_updates")
    val q = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", "gtfs.rt.trip_updates").load()
      .select(col("value").cast("string").as("kafka_value"), col("offset"))
      .writeStream.format("memory").queryName("queue_stream")
      .option("checkpointLocation", s"$path/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("queue_stream")
    assert(got.count() == n)
    assert(got.select(countDistinct(col("offset"))).head.getLong(0) == n)
    // the streamed bytes feed the SAME consumer parse as the batch twin
    val parsed = got.select(
      get_json_object(col("kafka_value"), "$.payload.trip_id").as("trip_id"))
    assert(parsed.filter(col("trip_id").isNull).count() == 0)
  }

  test("admission control: maxRecordsPerTrigger drains segments as offset-ordered micro-batches") {
    val path = freshPath
    // three sequential produces → three committed segments
    val rows = Seq(1L, 2L, 3L).map { seg =>
      import spark.implicits._
      Seq.tabulate(4)(i => (s"k$seg-$i", s"v$seg-$i")).toDF("k", "v")
        .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
        .coalesce(1)
        .write.format("graftqueue")
        .option("path", path).option("topic", "t").mode("append").save()
      seg
    }
    assert(rows.size == 3)
    // capture (batchId, offsets) per micro-batch
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", "t")
      .option("maxRecordsPerTrigger", "1") // < segment size → exactly one segment per trigger
      .load()
      .writeStream
      .option("checkpointLocation", s"$path/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized {
          seen += ((id, batch.select("offset").collect().map(_.getLong(0)).sorted.toSeq))
        }
        ()
      }
      .start()
    q.awaitTermination(60000)
    assert(seen.size == 3, s"expected 3 micro-batches (one per segment), got ${seen.size}")
    val ordered = seen.sortBy(_._1).map(_._2)
    assert(ordered == Seq(Seq(0L, 1L, 2L, 3L), Seq(4L, 5L, 6L, 7L), Seq(8L, 9L, 10L, 11L)),
      s"batches must drain whole segments in committed-offset order: $ordered")
  }

  test("checkpoint resume: an appended batch is delivered exactly once") {
    val path = freshPath
    // file sink (recoverable) — the memory sink refuses checkpoint resume
    def run(): Unit = {
      val q = spark.readStream.format("graftqueue")
        .option("path", path).option("topic", "t").load()
        .select(col("offset"))
        .writeStream.format("parquet")
        .option("path", s"$path/out")
        .option("checkpointLocation", s"$path/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    val n1 = produce(path, "t")
    run()
    assert(spark.read.parquet(s"$path/out").count() == n1)
    produce(path, "t") // append a second batch of segments
    run() // resumes from the committed offset
    val all = spark.read.parquet(s"$path/out")
    assert(all.count() == 2 * n1, "resume must deliver ONLY the appended batch, once")
    // every offset delivered exactly once, and the appended segments
    // took offsets strictly after the already-delivered ones
    assert(all.select(countDistinct(col("offset"))).head.getLong(0) == 2 * n1)
    assert(all.agg(max(col("offset"))).head.getLong(0) == 2 * n1 - 1)
  }

  test("segment names are a strictly increasing per-topic sequence (commit order = name order)") {
    // r11 ADVICE fix: wall-clock millisecond stamps could collide within
    // one ms (leaving batch order to a random uuid tie-break) or, on a
    // clock step, sort a new segment BEFORE one a checkpointed reader had
    // already consumed. The name stamp is now max(existing)+1 under the
    // commit lock — this pins the contract the maintained-state streams
    // key on.
    val path = freshPath
    val topic = "gtfs.rt.trip_updates"
    // several rapid sequential commits — under the old scheme these
    // could land in the same millisecond
    (1 to 5).foreach(_ => produce(path, topic))
    val dir = new java.io.File(path, topic)
    val names = dir.listFiles().map(_.getName)
      .filter(_.startsWith("segment-")).sorted.toSeq
    val stamps = names.map(n => n.split("-")(1).toLong)
    assert(stamps == (1L to stamps.length).toSeq,
      s"stamps must be the dense sequence 1..n in name order, got $stamps")
    // in-flight temp files (if any were left) must live OUTSIDE the
    // segment- namespace the offset arithmetic scans
    assert(dir.listFiles().forall(f =>
      !f.getName.startsWith("segment-") || f.getName.matches("segment-\\d+")))
  }

  test("concurrent producers commit unique, gapless stamps (atomic link claim)") {
    // the per-topic sequence is claimed by an atomic hard-link create
    // (GraftQueue.commitSegment); 8 threads racing commits must land 8
    // distinct consecutive stamps. QueueRaceSpec extends this to two
    // forked JVMs — the cross-PROCESS leg of the same contract.
    val path = freshPath
    val topic = "race.topic"
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    import spark.implicits._
    try {
      val fs = (1 to 8).map { k =>
        Future {
          Seq((s"k$k", s"v$k")).toDF("k", "v")
            .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
            .coalesce(1)
            .write.format("graftqueue")
            .option("path", path).option("topic", topic).mode("append").save()
        }
      }
      Await.result(Future.sequence(fs), Duration.Inf)
    } finally pool.shutdown()
    val stamps = new java.io.File(path, topic).listFiles()
      .map(_.getName).filter(_.startsWith("segment-"))
      .map(_.split("-")(1).toLong).sorted.toSeq
    assert(stamps == (1L to 8L).toSeq,
      s"racing commits must claim the dense sequence 1..8, got $stamps")
  }

  test("the sink rejects non-Kafka writer schemas") {
    import spark.implicits._
    val path = freshPath
    assertThrows[Exception] {
      Seq(("a", "b")).toDF("x", "y")
        .write.format("graftqueue")
        .option("path", path).option("topic", "t").mode("append").save()
    }
  }
}
