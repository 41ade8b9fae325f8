package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Spark DataSource V2 connector emulating the Kafka topic seam the
  * sandbox cannot host (SURVEY §2.1 S5/S6: the reference produces to and
  * consumes from 3 broker topics; this environment ships no broker and
  * no kafka connector jars). `graftqueue` is an append-only, offset-
  * tracked record queue over a directory — one subdirectory per topic,
  * immutable segment files, offsets assigned in committed-segment order
  * — exposing KAFKA'S READER SCHEMA (key/value binary, topic, partition,
  * offset, timestamp), so the documented `format("kafka")` swap is
  * EXECUTED, not just documented: the producer writes `producerEnvelope`
  * bytes through a V2 BatchWrite, and the consumer reads them back with
  * the same `.load().select(col("value").cast("string"))` + `from_json`
  * code a Kafka source feeds, in both batch and micro-batch streaming
  * (offset-range planning, AvailableNow-compatible).
  *
  * Deliberate divergences from a real broker, for sandbox determinism:
  * `timestamp` is null (broker-assigned in Kafka), `partition` is the
  * writer task's partition id, and offsets are globally consecutive in
  * committed-segment order rather than per-partition. Segment files are
  * named `segment-<seq>` (zero-padded per-topic sequence number), so
  * lexicographic order is exactly commit order — the broker's
  * offset-assignment contract. The record count lives in a fixed 8-byte
  * header (cached after first read; segments are immutable) so the NAME
  * can be a pure function of the claimed sequence number — which is what
  * makes commit CROSS-PROCESS safe: publication is one atomic
  * `Files.createLink(segment-<seq>, tmp)` (hard link = O_EXCL create of
  * the final name), two processes claiming the same seq collide with
  * `FileAlreadyExistsException` and the loser rescans-and-retries. Claim
  * and publication being the SAME syscall is load-bearing: a separate
  * claim-marker + rename scheme would leave a window where seq 6 is
  * visible before seq 5, shifting offsets a checkpointed reader already
  * handed out (and a crashed claimant would wedge the topic). See
  * GraftQueue.commitSegment; race-proven intra-JVM (GraftQueueSpec) and
  * across two forked JVMs (QueueRaceSpec / QueueRaceMain).
  *
  * Retention (r13): [[GraftQueue.retain]] deletes whole segments below
  * the minimum committed consumer offset ([[GraftQueue.consumerFloor]]
  * derives it from streaming checkpoints), Kafka-retention style. A
  * `truncated-<stamp>-<base>` marker records the log start offset so
  * absolute offsets NEVER move: surviving segments keep the offsets
  * checkpointed readers were handed, new consumers start at the earliest
  * available record, and producer stamps never restart below the
  * truncation point. Spec-proven in GraftQueueRetentionSpec (in-flight
  * streaming consumer unaffected across a truncation; disk reclaimed).
  */
object GraftQueue {
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Writer-side schema: exactly what a Kafka producer sink accepts. */
  val WriteSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType)))

  private[sources] def topicDir(path: String, topic: String): File =
    new File(path, topic)

  private val SegmentName = "segment-(\\d+)".r
  // Retention marker (r13): `truncated-<stamp14>-<base>` records that
  // every segment with sequence number <= stamp is logically removed and
  // that <base> records preceded the first surviving segment — Kafka's
  // logStartOffset. The marker is written BEFORE the segment files are
  // deleted, so a crash between the two steps leaves a consistent log
  // (readers skip marked segments whether or not their files remain).
  private val TruncMarker = "truncated-(\\d+)-(\\d+)".r

  /** (highest truncated stamp, log start offset) for a topic dir —
    * (0, 0) when no retention has ever run.
    */
  private[sources] def truncation(dir: File): (Long, Long) = {
    val ms = Option(dir.listFiles()).getOrElse(Array.empty[File]).flatMap(f =>
      f.getName match {
        case TruncMarker(stamp, base) => Some((stamp.toLong, base.toLong))
        case _ => None
      })
    if (ms.isEmpty) (0L, 0L) else ms.maxBy(_._1)
  }

  private[sources] def segments(path: String, topic: String): Seq[File] = {
    val d = topicDir(path, topic)
    if (!d.isDirectory) Seq.empty
    else {
      val all = d.listFiles()
      // fail FAST on foreign "segment-" files (e.g. a queue dir written
      // by the retired pre-r12 `segment-<seq>-<uuid>-n<count>` format):
      // silently reading such a topic as empty/partial corrupts offset
      // arithmetic with no error signal (ADVICE r12)
      val foreign = all.filter(f => f.getName.startsWith("segment-") &&
        !SegmentName.matches(f.getName))
      require(foreign.isEmpty,
        s"graftqueue topic $d contains unrecognized segment files " +
          s"(old format?): ${foreign.take(3).map(_.getName).mkString(", ")}")
      val (truncStamp, _) = truncation(d)
      all.filter(f => SegmentName.matches(f.getName) && stampOf(f) > truncStamp)
        .sortBy(_.getName).toSeq
    }
  }

  /** Log start offset: the absolute offset of the first surviving record
    * (0 until retention runs). All offset arithmetic — batch scan starts,
    * micro-batch planning, totals — is based at this value, so committed
    * segments keep their original absolute offsets across truncation.
    */
  private[sources] def baseOffset(path: String, topic: String): Long =
    truncation(topicDir(path, topic))._2

  // Record count = the segment's fixed 8-byte header. Segments are
  // immutable once published, so one read per (JVM, segment) suffices —
  // offset arithmetic on the planning hot path stays listing-only after
  // first contact. Keyed by (path, length, mtime) so a deleted-and-
  // recreated topic dir (or a reused temp path within one JVM) can never
  // serve a stale count (ADVICE r12); retention prunes dead entries.
  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def cacheKey(f: File): String =
    s"${f.getAbsolutePath}:${f.length}:${f.lastModified}"
  private[sources] def countOf(f: File): Long =
    countCache.getOrElseUpdate(cacheKey(f), {
      val in = new DataInputStream(new FileInputStream(f))
      try in.readLong() finally in.close()
    })

  private[sources] def totalRecords(path: String, topic: String): Long =
    baseOffset(path, topic) + segments(path, topic).map(countOf).sum

  private[sources] def stampOf(f: File): Long =
    f.getName.substring("segment-".length).toLong

  /** Next commit stamp for a topic: max existing stamp + 1 — a pure
    * per-topic sequence, NOT a wall-clock read. A millisecond timestamp
    * (the earliest form) could collide when two segments committed in the
    * same ms (leaving their order to the random uuid tie-break) and, on
    * a clock step, could even sort a NEW segment before one a
    * checkpointed reader had already consumed, shifting delivered
    * offsets after the fact. max+1 makes lexicographic name order
    * exactly commit order, always.
    */
  private[sources] def nextStamp(dir: File): Long = {
    // committed segments only — never in-flight temp files. The floor is
    // the truncation marker's stamp: after a FULL truncation the dir
    // holds no segment files, and restarting at 1 would hand out stamps
    // (and therefore offsets) a checkpointed reader already consumed.
    val existing = Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => SegmentName.matches(f.getName))
    val (truncStamp, _) = truncation(dir)
    val maxExisting = if (existing.isEmpty) 0L else existing.map(stampOf).max
    math.max(maxExisting, truncStamp) + 1L
  }

  /** Result of one [[retain]] pass. */
  final case class RetentionResult(
      segmentsDeleted: Int, recordsTruncated: Long, logStartOffset: Long)

  /** Offset-based retention, Kafka-style (VERDICT r12 item 3): delete
    * every WHOLE segment whose record range lies entirely below
    * `minRetainedOffset` — the minimum committed offset across this
    * topic's consumers (see [[consumerFloor]]). Absolute offsets never
    * move: the truncation marker records the new log start offset, and
    * all planning bases itself there, so surviving segments keep the
    * offsets a checkpointed reader was already handed.
    *
    * Crash-safety: the marker is created atomically FIRST, then segment
    * files are deleted. A crash between the two leaves files that every
    * reader already skips (segments() filters stamp <= marker), and a
    * re-run finishes the deletes. Like Kafka, retention is cooperative:
    * calling it with an offset above a live consumer's position makes
    * that consumer's next fetch fail (its range no longer exists) — the
    * contract is exactly "pass the MIN over registered consumer
    * checkpoints".
    */
  def retain(path: String, topic: String, minRetainedOffset: Long): RetentionResult = {
    val dir = topicDir(path, topic)
    val (_, base) = truncation(dir)
    var acc = base
    val removable = segments(path, topic).takeWhile { f =>
      val end = acc + countOf(f)
      val below = end <= minRetainedOffset
      if (below) acc = end
      below
    }
    if (removable.isEmpty) return RetentionResult(0, 0L, base)
    val newStamp = stampOf(removable.last)
    val newBase = acc
    val marker = new File(dir, f"truncated-$newStamp%014d-$newBase")
    try java.nio.file.Files.createFile(marker.toPath)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    // marker is durable → now reclaim: segment files, their cache
    // entries, and superseded markers
    removable.foreach { f => countCache.remove(cacheKey(f)); f.delete() }
    Option(dir.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
      f.getName match {
        case TruncMarker(stamp, _) if stamp.toLong < newStamp => f.delete()
        case _ => ()
      }
    }
    RetentionResult(removable.size, newBase - base, newBase)
  }

  /** The minimum committed offset across a set of Structured Streaming
    * checkpoint locations consuming this topic — the safe
    * `minRetainedOffset` for [[retain]]. Reads each checkpoint's commit
    * log for the latest COMMITTED batch and that batch's offset entry
    * (the offsets/ file's last line is this source's QueueOffset json,
    * a plain record count). A checkpoint with no committed batch pins
    * the floor at 0 — nothing may be truncated under a consumer that
    * has not durably processed anything yet.
    */
  def consumerFloor(checkpointDirs: Seq[String]): Long =
    if (checkpointDirs.isEmpty) 0L
    else checkpointDirs.map { cp =>
      val commits = new File(cp, "commits")
      val batches = Option(commits.listFiles()).getOrElse(Array.empty[File])
        .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
      if (batches.isEmpty) 0L
      else {
        val offsetsFile = new File(new File(cp, "offsets"), batches.max.toString)
        if (!offsetsFile.isFile) 0L
        else {
          val lines = new String(
            java.nio.file.Files.readAllBytes(offsetsFile.toPath), "UTF-8")
            .linesIterator.toSeq
          // format: "v1" / metadata json / one offset json per source;
          // this source serializes QueueOffset as the bare number
          scala.util.Try(lines.last.trim.toLong).getOrElse(0L)
        }
      }
    }.min

  /** Publish a fully-written temp file as the next segment of `dir`'s
    * topic — CROSS-PROCESS safe, lock-free. The claimed name is a pure
    * function of the stamp, and the claim is a hard link (atomic O_EXCL
    * create of the final name): if two producers — threads OR separate
    * JVMs — race the same stamp, exactly one link succeeds and the other
    * sees `FileAlreadyExistsException`, rescans, and retries with the
    * next stamp. Because claim == publication, the ordering invariant
    * holds unconditionally: a claimant of stamp s observed s-1 already
    * visible, so by induction every segment sorts after everything a
    * reader could have consumed before it — the broker-assigned-offset
    * guarantee, with no window and no orphanable claim markers. A crash
    * before the link leaves only an `inflight-` temp file, never a
    * partial or misordered segment. Race-proven with 8 in-JVM producer
    * threads (GraftQueueSpec) and 2 forked JVMs × concurrent commits
    * (QueueRaceSpec).
    */
  private[sources] def commitSegment(dir: File, tmp: File): File = {
    var published: File = null
    while (published == null) {
      val stamp = f"${nextStamp(dir)}%014d"
      val target = new File(dir, s"segment-$stamp")
      try {
        java.nio.file.Files.createLink(target.toPath, tmp.toPath)
        published = target
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost the race; rescan
      }
    }
    tmp.delete()
    published
  }
}

class GraftQueueProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftqueue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftQueue.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftQueueTable(properties.get("path"), properties.get("topic"))
}

final class GraftQueueTable(path: String, topic: String) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null, "graftqueue requires option(\"path\", ...)")
  require(topic != null, "graftqueue requires option(\"topic\", ...)")
  override def name(): String = s"graftqueue:$path/$topic"
  override def schema(): StructType = GraftQueue.Schema
  override def capabilities(): util.Set[TableCapability] = util.EnumSet.of(
    TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = GraftQueue.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // one partition per segment; start offsets are the running sum
        // based at the log start offset (retention never moves offsets)
        var acc = GraftQueue.baseOffset(path, topic)
        GraftQueue.segments(path, topic).map { f =>
          val p = QueueSegmentPartition(f.getAbsolutePath, topic, acc, GraftQueue.countOf(f))
          acc += GraftQueue.countOf(f)
          p: InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = QueueReaderFactory
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new QueueMicroBatchStream(path, topic,
          Option(options.get("maxRecordsPerTrigger")).map(_.toLong))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // Spark resolves the producer frame against the table schema before
    // this point (missing nullable columns arrive null-padded), so the
    // contract check is on the two fields the sink persists
    val in = info.schema()
    require(in.length >= 2 &&
      in.head.name == "key" && in.head.dataType == BinaryType &&
      in(1).name == "value" && in(1).dataType == BinaryType,
      s"graftqueue sink expects (key BINARY, value BINARY, ...), got $in")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
            QueueWriterFactory(path, topic)
          // segments are self-committing (written to a temp name, renamed
          // into place in the task commit); nothing to do at job level
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

private case class QueueSegmentPartition(
    file: String, topic: String, startOffset: Long, count: Long) extends InputPartition

/** Offset = total committed record count (a single logical log). */
private case class QueueOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch planner with Kafka-style admission control: with
  * `maxRecordsPerTrigger` set, each trigger admits whole committed
  * segments up to (approximately) that many records — always at least
  * one segment past the start offset, the same progress guarantee
  * Kafka's maxOffsetsPerTrigger gives — so a backlog drains as a
  * SEQUENCE of offset-ordered micro-batches instead of one giant batch.
  * This is the production ordering contract the maintained-state
  * streams key on: batch order IS committed-offset order, not file
  * mtimes. Trigger.AvailableNow is supported natively (the end target
  * is pinned at prepare time, so late-arriving segments don't extend a
  * draining run).
  */
private final class QueueMicroBatchStream(
    path: String, topic: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(GraftQueue.totalRecords(path, topic))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startN = start.asInstanceOf[QueueOffset].n
    val target = availableNowTarget.getOrElse(GraftQueue.totalRecords(path, topic))
    val cap = limit match {
      case r: ReadMaxRows => startN + r.maxRows()
      case _ => Long.MaxValue
    }
    var acc = GraftQueue.baseOffset(path, topic)
    var hi = startN
    GraftQueue.segments(path, topic).foreach { f =>
      acc += GraftQueue.countOf(f)
      // whole segments only; admit the first segment past `start`
      // unconditionally (progress guarantee), further ones while under
      // the row cap, never past the pinned AvailableNow target
      if (acc > startN && acc <= target && (acc <= cap || hi == startN))
        hi = acc
    }
    QueueOffset(hi)
  }

  // a NEW consumer starts at the earliest AVAILABLE record — the log
  // start offset, which is 0 until retention has truncated a prefix
  // (Kafka's auto.offset.reset=earliest against logStartOffset)
  override def initialOffset(): Offset =
    QueueOffset(GraftQueue.baseOffset(path, topic))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, readLimit) drives this source (SupportsAdmissionControl)")
  override def deserializeOffset(json: String): Offset = QueueOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[QueueOffset].n
    val hi = end.asInstanceOf[QueueOffset].n
    // whole segments only: a segment is inside the batch iff its record
    // range lies in [lo, hi) — counts are immutable once committed, so
    // ranges never split
    var acc = GraftQueue.baseOffset(path, topic)
    val out = ArrayBuffer.empty[InputPartition]
    GraftQueue.segments(path, topic).foreach { f =>
      val n = GraftQueue.countOf(f)
      if (acc >= lo && acc + n <= hi)
        out += QueueSegmentPartition(f.getAbsolutePath, topic, acc, n)
      acc += n
    }
    out.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = QueueReaderFactory
}

private object QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QueueSegmentPartition]
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(new FileInputStream(p.file))
      in.readLong() // skip the 8-byte record-count header
      private var i = 0L
      private var row: InternalRow = _
      override def next(): Boolean =
        if (i >= p.count) false
        else {
          val part = in.readInt()
          val key = new Array[Byte](in.readInt()); in.readFully(key)
          val value = new Array[Byte](in.readInt()); in.readFully(value)
          row = new GenericInternalRow(Array[Any](
            key, value, UTF8String.fromString(p.topic), part,
            p.startOffset + i, null))
          i += 1
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

private case class QueueWriterFactory(path: String, topic: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val dir = GraftQueue.topicDir(path, topic)
      dir.mkdirs()
      // "inflight-" prefix keeps uncommitted files OUT of the
      // "segment-" namespace that segments()/nextStamp scan — the old
      // "segment-inflight-" prefix could race into a concurrent
      // committer's stamp scan (and, in principle, a reader's listing)
      private val tmp = File.createTempFile("inflight-segment-", "", dir)
      private val out = new DataOutputStream(new FileOutputStream(tmp))
      out.writeLong(0L) // count header placeholder, patched at commit
      private var n = 0L
      override def write(record: InternalRow): Unit = {
        out.writeInt(partitionId)
        val key = if (record.isNullAt(0)) Array.empty[Byte] else record.getBinary(0)
        out.writeInt(key.length); out.write(key)
        val value = if (record.isNullAt(1)) Array.empty[Byte] else record.getBinary(1)
        out.writeInt(value.length); out.write(value)
        n += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        if (n == 0) { tmp.delete() }
        else {
          // patch the 8-byte count header, then publish atomically under
          // the next free zero-padded sequence number: lexicographic
          // order IS commit order, and the hard-link claim makes that
          // hold across PROCESSES, not just this JVM — see
          // GraftQueue.commitSegment for the invariant proof.
          val raf = new java.io.RandomAccessFile(tmp, "rw")
          try { raf.seek(0L); raf.writeLong(n) } finally raf.close()
          GraftQueue.commitSegment(dir, tmp)
        }
        new WriterCommitMessage {}
      }
      override def abort(): Unit = { out.close(); tmp.delete() }
      override def close(): Unit = ()
    }
}
