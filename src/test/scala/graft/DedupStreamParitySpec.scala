package graft

import graft.streaming.Streams

/** Parity pin for the UNREGISTERED file-staged dedup-index stream.
  * r12 retired `streaming_dedup_index` from the registry — its
  * mtime-pinned batch ordering is a test-harness device, not a
  * production contract (the queue form's broker-commit-order is) — but
  * the file-source wrapper stays as the fixture other specs build on,
  * so this spec keeps it executable and proves it yields EXACTLY the
  * verdicts of the registered production-contract queue form: same
  * batches, same state fold, different transport.
  */
class DedupStreamParitySpec extends SparkSpec {

  test("file-staged dedup index stream ≡ queue-form verdicts (transport-independent fold)") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Boolean, Int)] =
      df.selectExpr("doc_id", "is_new_exact", "CAST(batch_seq AS INT)").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2))).sortBy(_._1).toSeq
    val file = rows(Streams.dedupIndexStream(spark, dir))
    val queue = rows(Streams.dedupIndexQueueStream(spark, dir))
    assert(file.nonEmpty && file == queue,
      "file-staged and queue-transport dedup index streams must agree verdict-for-verdict")
  }
}
