package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The maintained dedup index (Dedup.{buildDedupIndex, mergeDedupIndex,
  * bloomNewDocsIncremental}): the incremental path must (1) give the
  * same verdicts the stateless recompute gives, batch by batch, and
  * (2) provably never rescan the corpus once the state exists — the two
  * properties that make it the 100 TB shape.
  */
class BloomIncrementalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = TestdataAdapter.table(spark, dir, "documents")

  private def persist(idx: Dedup.DedupIndex, path: String): Dedup.DedupIndex = {
    idx.hashes.write.mode("overwrite").parquet(path)
    Dedup.DedupIndex(idx.bloomBits, spark.read.parquet(path))
  }

  test("incremental classify+merge equals stateless recompute on every batch") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val b1 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    val state = Files.createTempDirectory("graft_bloom_inc").toString

    val idx0 = persist(Dedup.buildDedupIndex(corpus), s"$state/v0")
    val v1i = Dedup.bloomNewDocsIncremental(idx0, b1)
    val v1s = Dedup.bloomNewDocs(corpus, b1)
    assert(v1i.exceptAll(v1s).isEmpty && v1s.exceptAll(v1i).isEmpty)

    val idx1 = persist(Dedup.mergeDedupIndex(idx0, b1), s"$state/v1")
    val v2i = Dedup.bloomNewDocsIncremental(idx1, b2)
    val v2s = Dedup.bloomNewDocs(corpus.unionByName(b1), b2)
    assert(v2i.exceptAll(v2s).isEmpty && v2s.exceptAll(v2i).isEmpty)
  }

  test("classifying against persisted state never rescans the corpus") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val state = Files.createTempDirectory("graft_bloom_state").toString
    // stage the batch to its own parquet so corpus and batch scans are
    // distinguishable by path: the classify plan may then reference the
    // corpus location ZERO times
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(s"$state/batch")
    val batch = spark.read.parquet(s"$state/batch")
    val idx = persist(Dedup.buildDedupIndex(corpus), s"$state/v0")
    val plan = Dedup.bloomNewDocsIncremental(idx, batch)
      .queryExecution.executedPlan.toString
    val corpusScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(corpusScans == 0, s"corpus rescanned $corpusScans times:\n${plan.take(4000)}")
    assert(plan.contains("graft_bloom_state"), "state parquet absent from plan")
  }

  test("merged bloom keeps the no-false-negative contract on the new batch") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val idx1 = Dedup.mergeDedupIndex(Dedup.buildDedupIndex(corpus), b1)
    // every b1 doc re-presented must be bloom-positive (no false negatives)
    val re = Dedup.bloomNewDocsIncremental(idx1, b1)
    assert(re.filter(col("is_new_bloom") || col("is_new_exact")).isEmpty)
  }
}
