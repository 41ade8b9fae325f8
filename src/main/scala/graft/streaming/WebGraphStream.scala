package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.text.WebGraphMaintenance

/** The web-graph maintenance loop on REAL transport (VERDICT r15 item
  * 1): crawl-delta document batches ride a `graftqueue` topic as JSON
  * envelopes and drain as offset-ordered micro-batches (whole-segment
  * admission, so batch order IS the broker's commit order); each
  * micro-batch runs [[WebGraphMaintenance.maintenanceStep]] — extract
  * the batch's host edges, merge into the versioned edge state,
  * warm-refresh the authority ranks, emit the convergence verdict, gate
  * the full recompute — exactly the fold the in-plan batch twin
  * (`link_authority_maintenance`) runs, so the two registered queries
  * share one DuckDB oracle and stream ≡ batch is itself inside the hash
  * gate (the [[IvfStream]] discipline).
  *
  * Text transport: document text rides the envelope verbatim
  * (`to_json`/`from_json` round-trip strings exactly); the link
  * arithmetic depends only on doc_id, so the extraction chain inside
  * the fold sees byte-identical markup either way.
  */
object WebGraphStream {

  /** Stage the two standard-carve crawl batches onto a fresh graftqueue
    * topic and return (offset-ordered stream, corpus frame).
    */
  private def stageDocQueue(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (corpus, b1, b2) = WebGraphMaintenance.carve(
      graft.TestdataAdapter.table(spark, dir, "documents"))
    val qdir = Files.createTempDirectory("graft_wgq").toString
    def produce(batch: DataFrame): Unit = batch
      .select(
        col("doc_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("doc_id"), col("text"))).cast("binary").as("value"))
      .coalesce(1) // one committed segment per produce → one micro-batch each
      .write.format("graftqueue").option("path", qdir)
      .option("topic", "crawl.docs").mode("append").save()
    produce(b1)
    produce(b2)
    val wire = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val stream = spark.readStream.format("graftqueue")
      .option("path", qdir).option("topic", "crawl.docs")
      .option("maxRecordsPerTrigger", "1")
      .load()
      .select(from_json(col("value").cast("string"), wire).as("r"))
      .select("r.*")
    (stream, corpus)
  }

  /** The maintenance fold over ANY streaming source of document rows —
    * exposed for the crash-recovery spec (`crashAfterVerdictsOfBatch`
    * is the same fault-injection seam as the IVF/dedup folds: the named
    * batch dies between its verdict write and its edge/rank state
    * writes).
    */
  private[graft] def runWebGraphStreamFrom(
      stream: DataFrame, corpusEdges: DataFrame, stateDir: String,
      verdictsDir: String, checkpoint: String,
      warmIters: Int = 2, iters: Int = 5,
      gapThreshold: Long = WebGraphMaintenance.GapThreshold,
      crashAfterVerdictsOfBatch: Option[Long] = None): Unit = {
    WebGraphMaintenance.seedIfAbsent(corpusEdges, stateDir, iters)
    val q = stream
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        WebGraphMaintenance.maintenanceStep(
          batch.sparkSession, stateDir, verdictsDir,
          WebGraphMaintenance.edgesOf(batch), batchId,
          warmIters, iters, gapThreshold, crashAfterVerdictsOfBatch)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The registered streaming query: drain the two queue segments
    * through the maintenance fold, read back the per-batch convergence
    * verdicts. Hash-equal to [[WebGraphMaintenance.maintenanceBatch]]
    * under the shared oracle
    * ([[WebGraphMaintenance.maintenanceCarveSql]]).
    */
  def webGraphQueueStream(
      spark: SparkSession, dir: String,
      stateDir: Option[String] = None,
      warmIters: Int = 2, iters: Int = 5,
      gapThreshold: Long = WebGraphMaintenance.GapThreshold): DataFrame = {
    val (stream, corpus) = stageDocQueue(spark, dir)
    val staged = Files.createTempDirectory("graft_wgq_state").toString
    runWebGraphStreamFrom(stream, WebGraphMaintenance.edgesOf(corpus),
      stateDir.getOrElse(s"$staged/state"), s"$staged/verdicts",
      Files.createTempDirectory("graft_wgq_ckpt").toString,
      warmIters, iters, gapThreshold)
    spark.read.parquet(s"$staged/verdicts/*").orderBy("batch_seq", "host")
  }
}
