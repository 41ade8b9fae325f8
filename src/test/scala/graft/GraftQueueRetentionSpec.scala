package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.GraftQueue

/** Offset-based retention for the graftqueue broker emulation
  * (VERDICT r12 item 3 — the last un-emulated broker contract):
  * segments wholly below every registered consumer checkpoint are
  * truncated, Kafka-retention style, and the log keeps behaving as if
  * nothing moved — absolute offsets are stable, an in-flight streaming
  * consumer resumes unaffected, producer stamps never restart, and new
  * consumers begin at the earliest surviving record.
  */
class GraftQueueRetentionSpec extends SparkSpec {

  private def freshPath = Files.createTempDirectory("graftqueue_ret").toString

  /** One committed segment of 4 records (k<seg>-i / v<seg>-i). */
  private def produceSegment(path: String, topic: String, seg: Int): Unit = {
    import spark.implicits._
    Seq.tabulate(4)(i => (s"k$seg-$i", s"v$seg-$i")).toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
      .coalesce(1)
      .write.format("graftqueue")
      .option("path", path).option("topic", topic).mode("append").save()
  }

  private def segmentFiles(path: String, topic: String): Seq[String] =
    Option(new File(path, topic).listFiles()).getOrElse(Array.empty[File])
      .map(_.getName).filter(_.startsWith("segment-")).sorted.toSeq

  /** Drain the topic through a checkpointed file-sink stream. */
  private def drain(path: String, topic: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", topic).load()
      .select(col("offset"), col("value").cast("string").as("v"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  test("retention truncates consumed segments, reclaims disk, and offsets never move") {
    val path = freshPath
    (1 to 3).foreach(produceSegment(path, "t", _))
    assert(segmentFiles(path, "t").size == 3)

    drain(path, "t", s"$path/ck", s"$path/out")
    val floor = GraftQueue.consumerFloor(Seq(s"$path/ck"))
    assert(floor == 12L, s"committed consumer floor should be 12, got $floor")

    val r = GraftQueue.retain(path, "t", floor)
    assert(r.segmentsDeleted == 3 && r.recordsTruncated == 12L && r.logStartOffset == 12L)
    assert(segmentFiles(path, "t").isEmpty, "disk must be reclaimed")

    // a produce AFTER full truncation must not reuse stamps/offsets
    produceSegment(path, "t", 4)
    assert(segmentFiles(path, "t") == Seq("segment-00000000000004"),
      "stamps continue past the truncation point")
    val back = spark.read.format("graftqueue")
      .option("path", path).option("topic", "t").load()
    assert(back.select("offset").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(12L, 13L, 14L, 15L), "absolute offsets are based at the log start")
  }

  test("partial truncation: mid-segment floors only remove whole segments below them") {
    val path = freshPath
    (1 to 3).foreach(produceSegment(path, "t", _))
    // floor 5 sits inside segment 2 → only segment 1 (records 0-3) removable
    val r = GraftQueue.retain(path, "t", 5L)
    assert(r.segmentsDeleted == 1 && r.recordsTruncated == 4L && r.logStartOffset == 4L)
    val offs = spark.read.format("graftqueue")
      .option("path", path).option("topic", "t").load()
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs == (4L to 11L), s"surviving records keep offsets 4..11: $offs")
    // idempotent: re-running at the same floor is a no-op
    val r2 = GraftQueue.retain(path, "t", 5L)
    assert(r2.segmentsDeleted == 0 && r2.logStartOffset == 4L)
  }

  test("in-flight streaming consumer resumes across a truncation, exactly once") {
    val path = freshPath
    (1 to 2).foreach(produceSegment(path, "t", _))
    drain(path, "t", s"$path/ck", s"$path/out") // consumes offsets 0..7, commits
    val floor = GraftQueue.consumerFloor(Seq(s"$path/ck"))
    assert(floor == 8L)
    val r = GraftQueue.retain(path, "t", floor)
    assert(r.segmentsDeleted == 2 && r.logStartOffset == 8L)

    produceSegment(path, "t", 3)
    drain(path, "t", s"$path/ck", s"$path/out") // SAME checkpoint resumes
    val offs = spark.read.parquet(s"$path/out")
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs == (0L to 11L),
      s"resumed consumer delivers exactly the new records once: $offs")
  }

  test("a new consumer starts at the earliest available record after truncation") {
    val path = freshPath
    (1 to 3).foreach(produceSegment(path, "t", _))
    drain(path, "t", s"$path/ck1", s"$path/out1")
    GraftQueue.retain(path, "t", GraftQueue.consumerFloor(Seq(s"$path/ck1")) - 4) // keep seg 3
    drain(path, "t", s"$path/ck2", s"$path/out2") // fresh checkpoint
    val offs = spark.read.parquet(s"$path/out2")
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs == (8L to 11L),
      s"fresh consumer reads only surviving records at stable offsets: $offs")
  }

  test("consumerFloor: min across consumers; an uncommitted checkpoint pins 0") {
    val path = freshPath
    (1 to 2).foreach(produceSegment(path, "t", _))
    drain(path, "t", s"$path/ckA", s"$path/outA")
    val empty = Files.createTempDirectory("graftqueue_ck_empty").toString
    assert(GraftQueue.consumerFloor(Seq(s"$path/ckA")) == 8L)
    assert(GraftQueue.consumerFloor(Seq(s"$path/ckA", empty)) == 0L,
      "a consumer that has committed nothing blocks all truncation")
  }

  test("old-format segment files fail loudly instead of reading as an empty topic") {
    val path = freshPath
    produceSegment(path, "t", 1)
    // a pre-r12 formatted name: segment-<seq>-<uuid>-n<count>
    val foreign = new File(new File(path, "t"), "segment-001-deadbeef-n4")
    Files.createFile(foreign.toPath)
    val e = intercept[Throwable] {
      spark.read.format("graftqueue")
        .option("path", path).option("topic", "t").load().count()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("unrecognized segment files"), messages)
  }
}
