package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftQueue

/** Consumer seek / replay-from-offset (r15, VERDICT item 4 — the
  * remaining Kafka consumer lever after retention/age/compaction):
  * `startingOffset` on batch and streaming reads serves exactly the
  * records at offset ≥ X, wherever X falls — a segment boundary, inside
  * a dense segment (skip-count partial read), or inside a compacted
  * span (offset-clamped sub-range) — and a downstream latest-wins table
  * rebuilt by replay equals the one built before compaction.
  */
class GraftQueueSeekSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath = Files.createTempDirectory("graftqueue_seek").toString

  /** Segment `seg` of 4 records over the shared key set k0..k3. */
  private def produce(path: String, topic: String, seg: Int): Unit =
    Seq.tabulate(4)(i => (s"k$i", s"v$seg-$i")).toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
      .coalesce(1)
      .write.format("graftqueue")
      .option("path", path).option("topic", topic).mode("append").save()

  private def read(path: String, topic: String, from: Option[Long] = None) = {
    val r = spark.read.format("graftqueue")
      .option("path", path).option("topic", topic)
    from.fold(r)(x => r.option("startingOffset", x.toString)).load()
      .select(col("offset"), col("key").cast("string").as("k"),
        col("value").cast("string").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
  }

  test("batch seek equals full-read-filter at every offset class") {
    val path = freshPath
    (1 to 3).foreach(produce(path, "t", _)) // offsets 0..11
    val all = read(path, "t")
    assert(all.map(_._1) == (0L to 11L))
    // boundary, mid-dense (skip-count), zero, past-the-end
    for (x <- Seq(0L, 3L, 4L, 6L, 11L, 12L))
      assert(read(path, "t", Some(x)) == all.filter(_._1 >= x),
        s"seek to $x diverged from the filtered full read")
  }

  test("seek inside a compacted span serves surviving records at original offsets") {
    val path = freshPath
    (1 to 3).foreach(produce(path, "t", _))
    val full = read(path, "t")
    // compact the first two segments (offsets 0..7) — survivors are
    // seg 2's records at offsets 4..7
    val res = GraftQueue.compact(path, "t", 8L)
    assert(res.segmentsCompacted == 2 && res.recordsOut == 4)
    val compacted = read(path, "t")
    assert(compacted.map(_._1) == (4L to 11L))
    // X inside the compacted span, below every survivor, and mid-survivors
    for (x <- Seq(0L, 2L, 5L, 7L, 8L, 9L))
      assert(read(path, "t", Some(x)) == compacted.filter(_._1 >= x),
        s"seek to $x across the compacted prefix diverged")
    // the replayed records still carry the pre-compaction payloads
    assert(read(path, "t", Some(5L)).head == ((5L, "k1", "v2-1")))
  }

  test("seek below the log start is OffsetOutOfRange, not a silent gappy read") {
    val path = freshPath
    (1 to 3).foreach(produce(path, "t", _))
    GraftQueue.retain(path, "t", 4L) // truncate segment 1; base = 4
    val ex = intercept[Exception] {
      read(path, "t", Some(2L))
    }
    assert(ex.getMessage.contains("OffsetOutOfRange"),
      s"expected OffsetOutOfRange, got: ${ex.getMessage.take(200)}")
  }

  test("streaming seek: a new consumer drains exactly the suffix from X") {
    val path = freshPath
    (1 to 3).foreach(produce(path, "t", _))
    val out = Files.createTempDirectory("seek_out").toString
    val q = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", "t")
      .option("startingOffset", "6") // mid-dense: skip-count partial read
      .option("maxRecordsPerTrigger", "1") // whole-segment admission
      .load()
      .select(col("offset"), col("value").cast("string").as("v"))
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "drain did not terminate")
    val drained = spark.read.parquet(s"$out/data")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(drained.map(_._1) == (6L to 11L),
      s"streaming seek drained wrong offsets: ${drained.map(_._1)}")
    assert(drained.head._2 == "v2-2")
  }

  test("downstream latest-wins table rebuilt by replay across a compaction is identical") {
    val path = freshPath
    (1 to 3).foreach(produce(path, "t", _))
    def latestWins(rows: Seq[(Long, String, String)]): Map[String, String] =
      rows.sortBy(_._1).groupBy(_._2).map { case (k, vs) => k -> vs.last._3 }
    val before = latestWins(read(path, "t"))
    GraftQueue.compact(path, "t", 8L)
    // full rebuild: replay from the log start, post-compaction
    assert(latestWins(read(path, "t", Some(0L))) == before,
      "replaying across the compacted prefix changed the downstream table")
    // partial rebuild: state below X kept, replay from X fills the rest
    val x = 7L
    val kept = latestWins(read(path, "t").filter(_._1 < x))
    val rebuilt = kept ++ latestWins(read(path, "t", Some(x)))
    assert(rebuilt == before,
      "state-below-X + replay-from-X diverged from the full table")
  }
}
