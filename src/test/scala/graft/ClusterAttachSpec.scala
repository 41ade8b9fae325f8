package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Incremental cluster maintenance (Dedup.attachToClusters): the
  * persisted label table + signature index must absorb a batch exactly
  * like a from-scratch recompute — including the hard case where ONE
  * batch document bridges two previously-separate clusters.
  */
class ClusterAttachSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = TestdataAdapter.table(spark, dir, "documents")

  // Deterministic bridge fixture (verified against this exact MinHash
  // construction): t1 and t2 share NO band — two separate clusters —
  // while their concatenation band-collides with BOTH.
  private val t1 = "nu xi beta iota rho pi nu kappa pi mu tau eta"
  private val t2 = "beta gamma gamma mu zeta kappa iota upsilon eta upsilon beta tau"

  private def frame(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("a bridging batch doc merges two existing clusters under the global min") {
    val corpus = frame(1L -> t1, 2L -> t1, 3L -> t2, 4L -> t2)
    val labels = Dedup.dedupClusters(corpus).select("doc_id", "cluster_id")
    // sanity: two separate clusters with min-id representatives
    assert(labels.orderBy("doc_id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
    val batch = frame(10L -> (t1 + " " + t2))
    val merged = Dedup.attachToClusters(labels, Dedup.lshIndex(corpus), batch)
    val got = merged.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 1L)),
      s"bridge did not merge: $got")
    // and it equals the from-scratch recompute over the union
    val full = Dedup.dedupClusters(corpus.unionByName(batch))
      .select("doc_id", "cluster_id")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("attach over real data equals the from-scratch clustering") {
    val d = docs.select("doc_id", "text")
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    val batch = d.filter(col("doc_id") % 3 === 0)
    val inc = Dedup.attachToClustersWithSizes(
      Dedup.dedupClusters(corpus).select("doc_id", "cluster_id"),
      Dedup.lshIndex(corpus), batch)
    val full = Dedup.dedupClusters(d)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("attach against persisted state reads no corpus text") {
    val state = Files.createTempDirectory("graft_cc_plan").toString
    val d = docs.select("doc_id", "text")
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    d.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(s"$state/batch")
    Dedup.dedupClusters(corpus).select("doc_id", "cluster_id")
      .write.mode("overwrite").parquet(s"$state/labels")
    Dedup.lshIndex(corpus).write.mode("overwrite").parquet(s"$state/sigs")
    val plan = Dedup.attachToClusters(
      spark.read.parquet(s"$state/labels"),
      spark.read.parquet(s"$state/sigs"),
      spark.read.parquet(s"$state/batch"))
      .queryExecution.executedPlan.toString
    val corpusScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(corpusScans == 0, s"corpus rescanned $corpusScans times")
  }
}
