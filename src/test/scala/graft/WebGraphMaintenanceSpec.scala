package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.text.{TextOps, WebGraphMaintenance}
import graft.streaming.WebGraphStream

/** The web-graph maintenance loop as running state (r16, VERDICT item
  * 1): stream ≡ batch parity, exactly-once crash recovery at the worst
  * point (between a batch's verdict write and its edge/rank state
  * writes), the convergence gate staying closed on the stationary carve
  * with real margin, and the retrain gate firing and RE-CONVERGING on
  * the engineered spam burst.
  */
class WebGraphMaintenanceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = TestdataAdapter.table(spark, sfDir, "documents")

  /** Stage the standard-carve crawl batches as mtime-pinned parquet so
    * the file source delivers them in carve order (the IvfMaintenance
    * staging pattern).
    */
  private def stage(root: String) = {
    val (corpus, b1, b2) = WebGraphMaintenance.carve(docs)
    b1.coalesce(1).write.mode("overwrite").parquet(s"$root/in/batch_a")
    b2.coalesce(1).write.mode("overwrite").parquet(s"$root/in/batch_b")
    Seq("batch_a" -> 0L, "batch_b" -> 60000L).foreach { case (n, off) =>
      val d = Paths.get(s"$root/in/$n")
      Files.list(d).forEach(p =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(1700000000000L + off)))
      Files.setLastModifiedTime(d, FileTime.fromMillis(1700000000000L + off))
    }
    (b1.schema, corpus)
  }

  private def runFileStream(schema: org.apache.spark.sql.types.StructType,
      corpus: org.apache.spark.sql.DataFrame, root: String, tag: String,
      crash: Option[Long] = None): Unit =
    WebGraphStream.runWebGraphStreamFrom(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in/batch_*"),
      WebGraphMaintenance.edgesOf(corpus), s"$root/${tag}state",
      s"$root/${tag}verdicts", s"$root/${tag}ckpt",
      crashAfterVerdictsOfBatch = crash)

  private def readSorted(path: String) =
    spark.read.parquet(path).orderBy("batch_seq", "host").collect().toSeq

  private def stateRows(stateDir: String) = Seq(
    spark.read.parquet(WebGraphMaintenance.edgesPath(stateDir, 2))
      .orderBy("src_host", "dst_host").collect().toSeq,
    spark.read.parquet(WebGraphMaintenance.ranksPath(stateDir, 2))
      .orderBy("host").collect().toSeq)

  test("web-graph maintenance: crash between verdict and state of batch 1, resume, end state identical") {
    val root = Files.createTempDirectory("graft_wgm_crash").toString
    val (schema, corpus) = stage(root)

    // --- uninterrupted reference run
    runFileStream(schema, corpus, root, "ref_")
    val refVerdicts = readSorted(s"$root/ref_verdicts/*")
    val refState = stateRows(s"$root/ref_state")
    assert(refVerdicts.nonEmpty, "reference run produced no verdicts")

    // --- crashed run: batch 0 commits; batch 1 dies half-applied
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runFileStream(schema, corpus, root, "", crash = Some(1L))
    }
    assert(ex.getMessage.contains("injected crash"),
      s"unexpected failure mode: ${ex.getMessage.take(200)}")
    // the torn-write picture: batch 1's verdict is on disk, its edge
    // merge and the v2 rank version are not
    assert(Files.exists(Paths.get(s"$root/verdicts/b1")), "b1 verdicts missing")
    assert(Files.exists(
        Paths.get(WebGraphMaintenance.edgesPath(s"$root/state", 1))),
      "batch-0 edge state missing")
    assert(!Files.exists(
        Paths.get(WebGraphMaintenance.edgesPath(s"$root/state", 2))),
      "edges_v2 must NOT exist — the crash fires between verdict and state")
    assert(!Files.exists(
        Paths.get(WebGraphMaintenance.ranksPath(s"$root/state", 2))),
      "ranks_v2 must NOT exist — the crash fires before the state advance")
    val v0Mtime = Files.getLastModifiedTime(
      Paths.get(WebGraphMaintenance.ranksPath(s"$root/state", 0)))

    // --- resume from the SAME checkpoint + state dirs, no fault injected
    runFileStream(schema, corpus, root, "")
    assert(readSorted(s"$root/verdicts/*") == refVerdicts,
      "verdicts after crash+resume differ from the uninterrupted run")
    assert(stateRows(s"$root/state") == refState,
      "final edge/rank state after crash+resume differs")
    assert(Files.getLastModifiedTime(
        Paths.get(WebGraphMaintenance.ranksPath(s"$root/state", 0))) == v0Mtime,
      "resume re-seeded the immutable v0 ranks")
  }

  test("streaming queue form ≡ in-plan batch twin, row for row") {
    val streamed = WebGraphStream.webGraphQueueStream(spark, sfDir)
      .collect().toSeq
    val batch = WebGraphMaintenance.maintenanceBatch(spark, sfDir)
      .collect().toSeq
    assert(streamed.nonEmpty, "streaming maintenance produced no verdicts")
    assert(streamed == batch,
      "graftqueue maintenance verdicts differ from the batch twin")
  }

  test("stationary carve: gate stays closed with real margin") {
    val rep = WebGraphMaintenance.maintenanceBatch(spark, sfDir)
      .collect().toSeq
    assert(rep.nonEmpty)
    assert(rep.forall(!_.getAs[Boolean]("retrain_due")),
      "stationary carve tripped the convergence gate")
    val worst = rep.map(_.getAs[Long]("residual_max")).max
    assert(worst * 2 < WebGraphMaintenance.GapThreshold,
      s"stationary residual $worst is within 2x of the gate " +
        s"${WebGraphMaintenance.GapThreshold} — threshold has no margin")
  }

  test("retrain gate: spam burst fires it, recompute re-converges, new host cold-starts") {
    val rep = WebGraphMaintenance.maintenanceRetrain(spark)
      .collect().toSeq
    val rep1 = rep.filter(_.getAs[Int]("batch_seq") == 1)
    val rep2 = rep.filter(_.getAs[Int]("batch_seq") == 2)
    assert(rep1.nonEmpty && rep1.forall(_.getAs[Boolean]("retrain_due")),
      "spam burst did not trip the convergence gate")
    assert(rep2.nonEmpty && rep2.forall(!_.getAs[Boolean]("retrain_due")),
      "small organic delta still flags after the full recompute")
    // the spam host entered the graph at the uniform cold-start rank in
    // batch 1 (it was never in ranks_v0)
    val nHosts = TextOps.HtmlHosts + 1
    val spam1 = rep1.find(_.getAs[String]("host") == "spam.example")
      .getOrElse(fail("spam.example missing from batch-1 verdict"))
    assert(spam1.getAs[Long]("rank_prior_scaled") ==
        graft.text.WebGraph.AuthorityScale / nHosts,
      "spam host did not cold-start at the uniform rank")
    // the recompute really happened: batch 2's prior ranks are the full
    // recompute on the merged graph, not the unconverged warm state
    val prior2 = rep2.map(r => r.getAs[String]("host") ->
      r.getAs[Long]("rank_prior_scaled")).toMap
    val warm1 = rep1.map(r => r.getAs[String]("host") ->
      r.getAs[Long]("rank_warm_scaled")).toMap
    assert(prior2 != warm1.view.filterKeys(prior2.contains).toMap,
      "batch-2 prior ranks equal batch-1 warm ranks — the gated " +
        "recompute never ran")
  }
}
