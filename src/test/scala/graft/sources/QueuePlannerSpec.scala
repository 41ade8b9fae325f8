package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Planner-level contracts of the graftqueue micro-batch stream that the
  * integration specs cannot time-control (r14 reviewer findings): the
  * AvailableNow target pinned BEFORE a compaction must survive a
  * csegment that merges across it, and a consumer below the log start
  * must fail loudly (OffsetOutOfRange) instead of silently skipping the
  * truncated range. Lives in graft.sources for package-private access
  * to the stream class.
  */
class QueuePlannerSpec extends graft.SparkSpec {

  private def freshPath = Files.createTempDirectory("graftqueue_plan").toString

  /** One committed segment of 4 records with segment-UNIQUE keys, so
    * compaction preserves every record (content-preserving case).
    */
  private def produceSegment(path: String, topic: String, seg: Int): Unit = {
    import spark.implicits._
    Seq.tabulate(4)(i => (s"k$seg-$i", s"v$seg-$i")).toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
      .coalesce(1)
      .write.format("graftqueue")
      .option("path", path).option("topic", topic).mode("append").save()
  }

  test("AvailableNow target pinned mid-log survives a compaction merging across it") {
    val path = freshPath
    (1 to 2).foreach(produceSegment(path, "t", _)) // offsets 0..7
    val stream = new QueueMicroBatchStream(path, "t", None)
    stream.prepareForTriggerAvailableNow() // target pinned at 8
    // the race: a maintenance pass compacts EVERYTHING (incl. records
    // beyond the pinned target) into one csegment spanning [0, 12)
    produceSegment(path, "t", 3)
    val r = GraftQueue.compact(path, "t", 12L)
    assert(r.segmentsCompacted == 3 && r.recordsOut == 12L,
      s"unique keys -> content-preserving compaction: $r")
    // dense whole-segment admission could never reach 8 now (the only
    // segment ends at 12 > target); the csegment clamps to the pin
    val hi = stream.latestOffset(QueueOffset(4L), stream.getDefaultReadLimit)
      .asInstanceOf[QueueOffset].n
    assert(hi == 8L, s"csegment admission must clamp to the pinned target, got $hi")
    // and the clamped batch plans one sub-range partition over [4, 8)
    val parts = stream.planInputPartitions(QueueOffset(4L), QueueOffset(8L))
    assert(parts.length == 1, s"one clamped csegment partition: ${parts.toSeq}")
  }

  test("recordsIn counts physical records, not the logical span, on re-compaction") {
    val path = freshPath
    (1 to 2).foreach(produceSegment(path, "t", _))
    assert(GraftQueue.compact(path, "t", 8L).recordsIn == 8L)
    produceSegment(path, "t", 3)
    // re-compaction reads 8 survivors (csegment) + 4 new = 12 physical;
    // with overlapping keys the csegment would hold fewer than its span
    // and a span-based count would overreport
    val r2 = GraftQueue.compact(path, "t", 12L)
    assert(r2.recordsIn == 12L && r2.recordsOut == 12L, s"$r2")
  }

  test("a consumer below the log start fails loudly (OffsetOutOfRange), both planner entry points") {
    val path = freshPath
    (1 to 2).foreach(produceSegment(path, "t", _))
    // age retention truncates everything UNDER the (imaginary) consumer
    val r = GraftQueue.retainByAge(path, "t", maxAgeMs = 0L,
      nowMs = System.currentTimeMillis() + 3600 * 1000L)
    assert(r.logStartOffset == 8L)
    produceSegment(path, "t", 3) // offsets 8..11 survive
    val stream = new QueueMicroBatchStream(path, "t", None)
    val e1 = intercept[IllegalArgumentException] {
      stream.latestOffset(QueueOffset(4L), stream.getDefaultReadLimit)
    }
    assert(e1.getMessage.contains("below the log start"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      stream.planInputPartitions(QueueOffset(4L), QueueOffset(12L))
    }
    assert(e2.getMessage.contains("below the log start"), e2.getMessage)
  }

  test("a csegment orphaned by a crashed retain is reclaimed by the next maintenance pass") {
    val path = freshPath
    (1 to 2).foreach(produceSegment(path, "t", _))
    GraftQueue.compact(path, "t", 8L)
    val dir = GraftQueue.topicDir(path, "t")
    val cseg = new java.io.File(dir, "csegment-00000000000002")
    assert(cseg.exists())
    // simulate retain() crashing between marker and delete: the marker
    // covers the csegment but its file survives
    java.nio.file.Files.createFile(
      new java.io.File(dir, f"truncated-${2L}%014d-8").toPath)
    assert(cseg.exists(), "the crash window leaves the orphan on disk")
    // readers are consistent (snapshot excludes it)...
    assert(GraftQueue.snapshot(path, "t").segs.isEmpty)
    // ...and ANY next maintenance pass finishes the reclamation
    GraftQueue.retainByAge(path, "t", maxAgeMs = Long.MaxValue)
    assert(!cseg.exists(), "orphaned csegment must be reclaimed, not leak")
  }
}
