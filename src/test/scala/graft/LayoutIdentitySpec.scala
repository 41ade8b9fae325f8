package graft

/** Byte-identity across partition layouts for the rows-only queries
  * (the ones DuckDB cannot twin: trained quantizers, k-means, the
  * learned quality model). The failure mode a different `local[n]`
  * exposes is never the thread count itself — it is the different
  * PARTITION LAYOUT (shuffle fan-out, input split boundaries) that a
  * different parallelism default induces, which reorders rows under
  * MLlib's per-partition seeding and non-commutative float folds. So
  * the spec forces two disjoint layouts directly — different shuffle
  * partition counts AND different input split sizes — inside the one
  * shared test JVM, and requires the full collected output (values AND
  * row order) to match exactly. semdedup/bpe carry the same claim in
  * their own suites; rf_demand_mae/ml_run_record pin layout via
  * DemandModel.pinLayout (see StreamsMlSpec).
  */
class LayoutIdentitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // plus two oracle-checked queries whose machinery is layout-sensitive
  // by construction: ccnet_buckets (zipWithIndex global numbering) and
  // search_bm25 (bounded-heap TopKPerGroup keep-set). kmeans_clusters /
  // quality_classifier were retired from the registry in r13 (their
  // trained legs live in spec coverage), so they run here as direct
  // function calls rather than registry lookups.
  private val cases: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "knn_ivf", "pq_topk", "pca_recall", "ccnet_buckets", "search_bm25")
    .map(n => n -> SparkEntry.queries(n)) ++ Seq(
    ("kmeans_clusters", (s: org.apache.spark.sql.SparkSession, d: String) =>
      graft.sim.Knn.kmeansClusterSizes(TestdataAdapter.table(s, d, "embeddings"))),
    ("quality_classifier", (s: org.apache.spark.sql.SparkSession, d: String) =>
      graft.ml.QualityClassifier.trainEval(TestdataAdapter.table(s, d, "documents"))))

  /** Run `q` under the given layout knobs and collect its rows. */
  private def run(q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      shufflePartitions: Int, splitBytes: String): Seq[String] = {
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes", splitBytes)
      q(spark, dir).collect().map(_.toString).toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
    }
  }

  for ((name, q) <- cases)
    test(s"$name output is byte-identical across partition layouts") {
      val a = run(q, 4, "134217728")  // wide splits, few reducers
      val b = run(q, 13, "262144")    // narrow splits, odd reducer count
      assert(a.length == b.length, s"$name row count differs: ${a.length} vs ${b.length}")
      val diff = a.zip(b).zipWithIndex.collect { case ((x, y), i) if x != y => (i, x, y) }
      if (diff.nonEmpty) fail(
        s"$name diverges across layouts at row ${diff.head._1}:\n  ${diff.head._2}\n  ${diff.head._3}")
    }
}
