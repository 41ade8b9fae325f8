package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Cross-PROCESS commit-ordering proof for the graftqueue seam: two
  * forked JVMs (graft.sources.QueueRaceMain — the same
  * `GraftQueue.commitSegment` claim path the V2 sink uses, minus Spark)
  * race concurrent segment commits into ONE topic directory. A real
  * broker assigns offsets at a single serialization point; the emulation
  * must give the same guarantee without assuming all producers share a
  * JVM — which the pre-r12 JVM-monitor commit lock could not. The atomic
  * hard-link claim (O_EXCL create of the stamp-named final file) makes
  * claim == publication, so the stamps must come out dense, unique, and
  * every record readable exactly once.
  */
class QueueRaceSpec extends SparkSpec {

  test("two forked JVMs racing commits claim dense unique stamps; no record lost or duplicated") {
    val base = Files.createTempDirectory("queue-race").toString
    val topic = "race.multiproc"
    val topicDir = new java.io.File(base, topic)
    val perProc = 40

    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    def launch(tag: String): Process =
      new ProcessBuilder(
        javaBin, "-cp", cp, "graft.sources.QueueRaceMain",
        topicDir.getAbsolutePath, perProc.toString, tag)
        .redirectErrorStream(true)
        .start()

    val a = launch("A")
    val b = launch("B")
    val outA = new String(a.getInputStream.readAllBytes())
    val outB = new String(b.getInputStream.readAllBytes())
    assert(a.waitFor() == 0, s"producer JVM A failed:\n$outA")
    assert(b.waitFor() == 0, s"producer JVM B failed:\n$outB")

    // stamp contract: dense 1..2*perProc, no collisions, no gaps —
    // lexicographic name order IS commit order even across processes
    val names = topicDir.listFiles().map(_.getName).filter(_.startsWith("segment-")).sorted.toSeq
    val stamps = names.map(_.stripPrefix("segment-").toLong)
    assert(stamps == (1L to (2L * perProc)).toSeq,
      s"racing JVMs must claim the dense sequence 1..${2 * perProc}, got $stamps")
    // nothing left in-flight, nothing outside the scanned namespace
    assert(topicDir.listFiles().forall(f =>
      f.getName.matches("segment-\\d+") || f.getName.startsWith("inflight-")))

    // reader-side: every record from both processes arrives exactly once,
    // with offsets dense over the combined log
    val back = spark.read.format("graftqueue")
      .option("path", base).option("topic", topic).load()
      .select(col("key").cast("string").as("k"), col("offset"))
    val rows = back.collect()
    assert(rows.length == 2 * perProc)
    assert(rows.map(_.getLong(1)).sorted.toSeq == (0L until 2L * perProc).toSeq,
      "offsets must be dense over the combined multi-process log")
    val keys = rows.map(_.getString(0)).sorted.toSeq
    val expected = (Seq("A", "B").flatMap(t => (1 to perProc).map(i => s"$t-$i"))).sorted
    assert(keys == expected, "every record from both JVMs, exactly once")
  }
}
