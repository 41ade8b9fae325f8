package graft.sources

import java.io.{DataOutputStream, File, FileOutputStream}

/** Forked-JVM leg of the GraftQueue commit-race proof (QueueRaceSpec).
  * Writes `count` one-record segments into `dir` through the SAME
  * `GraftQueue.commitSegment` claim path the V2 sink uses — no Spark, so
  * two of these JVMs racing one topic directory exercise exactly the
  * cross-process stamp-assignment contract (atomic hard-link claim,
  * rescan on FileAlreadyExistsException). Record payload carries the
  * process tag so the reader-side spec can prove no record was lost or
  * double-published.
  */
object QueueRaceMain {
  def main(args: Array[String]): Unit = {
    val dir = new File(args(0)); dir.mkdirs()
    val count = args(1).toInt
    val tag = args(2)
    (1 to count).foreach { i =>
      val tmp = File.createTempFile("inflight-segment-", "", dir)
      val out = new DataOutputStream(new FileOutputStream(tmp))
      try {
        out.writeLong(1L) // record-count header (known up front here)
        out.writeInt(0) // partition id
        val key = s"$tag-$i".getBytes("UTF-8")
        out.writeInt(key.length); out.write(key)
        val value = s"payload-$tag-$i".getBytes("UTF-8")
        out.writeInt(value.length); out.write(value)
      } finally out.close()
      GraftQueue.commitSegment(dir, tmp)
    }
  }
}
