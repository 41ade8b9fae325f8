package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.GraftQueue

/** Kafka's remaining two maintenance levers on the graftqueue emulation
  * (VERDICT r13 item 3): age-based retention (`retention.ms`) and log
  * compaction (`cleanup.policy=compact`). The invariants offset
  * retention established must survive both: absolute offsets never
  * move, latest-per-key records survive compaction at their ORIGINAL
  * offsets, producer stamps never restart, and an in-flight
  * checkpointed consumer resumes exactly-once even when its checkpoint
  * boundary now falls inside a compacted span.
  */
class GraftQueueCompactionSpec extends SparkSpec {

  private def freshPath = Files.createTempDirectory("graftqueue_cmp").toString

  /** One committed segment of 4 records over the SAME key set k0..k3
    * (values v<seg>-i), so successive segments overwrite each other's
    * keys — the compaction workload.
    */
  private def produceOverwrites(path: String, topic: String, seg: Int): Unit = {
    import spark.implicits._
    Seq.tabulate(4)(i => (s"k$i", s"v$seg-$i")).toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
      .coalesce(1)
      .write.format("graftqueue")
      .option("path", path).option("topic", topic).mode("append").save()
  }

  private def files(path: String, topic: String): Seq[String] =
    Option(new File(path, topic).listFiles()).getOrElse(Array.empty[File])
      .map(_.getName).filter(n => n.startsWith("segment-") || n.startsWith("csegment-"))
      .sorted.toSeq

  private def readAll(path: String, topic: String): Seq[(Long, String, String)] =
    spark.read.format("graftqueue")
      .option("path", path).option("topic", topic).load()
      .select(col("offset"), col("key").cast("string").as("k"),
        col("value").cast("string").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq

  private def drain(path: String, topic: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graftqueue")
      .option("path", path).option("topic", topic).load()
      .select(col("offset"), col("value").cast("string").as("v"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "drain did not terminate")
  }

  test("compaction keeps the latest record per key at its ORIGINAL offset; offsets stable") {
    val path = freshPath
    (1 to 3).foreach(produceOverwrites(path, "t", _)) // offsets 0..11, keys k0..k3 x3
    val r = GraftQueue.compact(path, "t", 8L) // compact segments 1+2
    assert(r.segmentsCompacted == 2 && r.recordsIn == 8L && r.recordsOut == 4L,
      s"latest-per-key over 8 records with 4 keys -> 4 survivors: $r")
    assert(files(path, "t") == Seq("csegment-00000000000002", "segment-00000000000003"),
      s"one csegment replaces the prefix: ${files(path, "t")}")
    // survivors are segment 2's writes at their original offsets 4..7,
    // and segment 3 is untouched at 8..11
    val rows = readAll(path, "t")
    assert(rows.map(_._1) == (4L to 11L),
      s"offsets must be the original absolute offsets: ${rows.map(_._1)}")
    assert(rows.take(4).map(_._3) == Seq("v2-0", "v2-1", "v2-2", "v2-3"),
      s"compacted span serves the LATEST value per key: ${rows.take(4)}")
    assert(rows.drop(4).map(_._3) == Seq("v3-0", "v3-1", "v3-2", "v3-3"))
    // idempotent: the lone csegment prefix is already compacted
    val r2 = GraftQueue.compact(path, "t", 8L)
    assert(r2.segmentsCompacted == 0, s"re-compaction must be a no-op: $r2")
    assert(readAll(path, "t").map(_._1) == (4L to 11L))
  }

  test("in-flight checkpointed consumer resumes exactly-once across a compaction") {
    val path = freshPath
    (1 to 2).foreach(produceOverwrites(path, "t", _))
    drain(path, "t", s"$path/ck", s"$path/out") // consumes 0..7, commits 8
    assert(GraftQueue.consumerFloor(Seq(s"$path/ck")) == 8L)
    produceOverwrites(path, "t", 3) // offsets 8..11
    // compact PAST the consumer's checkpoint: all 3 segments merge into
    // one csegment spanning [0, 12) whose survivors are seg 3's records
    val r = GraftQueue.compact(path, "t", 12L)
    assert(r.segmentsCompacted == 3 && r.recordsIn == 12L && r.recordsOut == 4L)
    assert(files(path, "t") == Seq("csegment-00000000000003"))
    // the SAME checkpoint resumes mid-span: the sub-range read serves
    // exactly the surviving records at offsets >= 8, once
    drain(path, "t", s"$path/ck", s"$path/out")
    val offs = spark.read.parquet(s"$path/out")
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs == (0L to 11L),
      s"pre-compaction reads (0..7) plus post-resume survivors (8..11), no dupes: $offs")
  }

  test("a new consumer over a compacted log sees only survivors, at stable offsets") {
    val path = freshPath
    (1 to 3).foreach(produceOverwrites(path, "t", _))
    GraftQueue.compact(path, "t", 12L)
    drain(path, "t", s"$path/ck2", s"$path/out2")
    val offs = spark.read.parquet(s"$path/out2")
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs == (8L to 11L),
      s"fresh consumer reads the 4 latest-per-key records at original offsets: $offs")
  }

  test("producer stamps and offsets continue past a compaction") {
    val path = freshPath
    (1 to 2).foreach(produceOverwrites(path, "t", _))
    GraftQueue.compact(path, "t", 8L)
    produceOverwrites(path, "t", 3)
    assert(files(path, "t") ==
      Seq("csegment-00000000000002", "segment-00000000000003"),
      s"new segment sorts after the csegment: ${files(path, "t")}")
    assert(readAll(path, "t").map(_._1) == Seq(4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
  }

  test("compaction composes with offset retention: base offset survives both") {
    val path = freshPath
    (1 to 3).foreach(produceOverwrites(path, "t", _))
    val rr = GraftQueue.retain(path, "t", 4L) // truncate segment 1
    assert(rr.logStartOffset == 4L)
    val rc = GraftQueue.compact(path, "t", 12L) // compact segments 2+3
    assert(rc.segmentsCompacted == 2 && rc.recordsIn == 8L && rc.recordsOut == 4L
      && rc.logStartOffset == 4L)
    val rows = readAll(path, "t")
    assert(rows.map(_._1) == (8L to 11L),
      s"survivors are seg 3's records at their original offsets: ${rows.map(_._1)}")
    // and retention can then truncate the csegment itself
    val rr2 = GraftQueue.retain(path, "t", 12L)
    assert(rr2.segmentsDeleted == 1 && rr2.logStartOffset == 12L)
    assert(readAll(path, "t").isEmpty)
    produceOverwrites(path, "t", 4)
    assert(readAll(path, "t").map(_._1) == (12L to 15L),
      "offsets never restart below the truncation point")
  }

  test("age retention truncates the old prefix only, stopping at the first young segment") {
    val path = freshPath
    (1 to 3).foreach(produceOverwrites(path, "t", _))
    val dir = new File(path, "t")
    val old = System.currentTimeMillis() - 3600 * 1000L
    // segments 1 and 3 old, 2 young (a clock step / slow producer):
    // prefix-only truncation must stop at segment 2 and never punch a
    // hole at segment 3
    assert(new File(dir, "segment-00000000000001").setLastModified(old))
    assert(new File(dir, "segment-00000000000003").setLastModified(old))
    val r = GraftQueue.retainByAge(path, "t", maxAgeMs = 60 * 1000L)
    assert(r.segmentsDeleted == 1 && r.recordsTruncated == 4L && r.logStartOffset == 4L,
      s"only the old PREFIX goes: $r")
    assert(readAll(path, "t").map(_._1) == (4L to 11L))
    // everything old -> full truncation; offsets/stamps still stable
    assert(new File(dir, "segment-00000000000002").setLastModified(old))
    val r2 = GraftQueue.retainByAge(path, "t", maxAgeMs = 60 * 1000L)
    assert(r2.segmentsDeleted == 2 && r2.logStartOffset == 12L)
    produceOverwrites(path, "t", 4)
    assert(readAll(path, "t").map(_._1) == (12L to 15L))
  }

  test("crash between csegment publish and input deletion: readers are consistent, re-run reclaims") {
    val path = freshPath
    (1 to 2).foreach(produceOverwrites(path, "t", _))
    GraftQueue.compact(path, "t", 8L)
    // simulate the crash window by resurrecting a shadowed input file:
    // readers must ignore it (the csegment's stamp shadows it)...
    val dir = new File(path, "t")
    val ghost = new File(dir, "segment-00000000000001")
    val os = new java.io.DataOutputStream(new java.io.FileOutputStream(ghost))
    try { os.writeLong(0L) } finally os.close()
    val rows = readAll(path, "t")
    assert(rows.map(_._1) == (4L to 7L),
      s"shadowed segment files are invisible to readers: ${rows.map(_._1)}")
    // ...and the next compact() pass finishes the reclamation
    GraftQueue.compact(path, "t", 8L)
    assert(!ghost.exists(), "interrupted reclamation completes on the next pass")
  }
}
