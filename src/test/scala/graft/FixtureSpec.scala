package graft

import graft.sim.{Knn, PcaFixture, PqFixture, SemDedupFixture}

/** Provenance pin for the committed serving fixtures: retraining on the
  * sf0.01 embeddings must reproduce the committed literals BIT-FOR-BIT
  * (both trainers are layout-pinned and the fixtures are written with
  * round-tripping Double.toString), so fixture staleness — e.g. the
  * testdata changing under the fixtures — is a loud failure here, not a
  * silent oracle mismatch three queries downstream.
  */
class FixtureSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private def embs = TestdataAdapter.table(spark, dir, "embeddings")

  test("PQ codebook fixture is exactly the deterministic trainer's output") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val trained = Knn.trainPqCodebooks(embs)
    assert(trained.length == PqFixture.codebooks.length)
    for (j <- trained.indices; c <- trained(j).indices)
      assert(java.util.Arrays.equals(trained(j)(c), PqFixture.codebooks(j)(c)),
        s"codebook drift at subspace $j centroid $c — regenerate via FixtureGen")
  }

  test("semdedup centroid fixture is exactly the trained k-means output") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val trained = Knn.trainSemDedupCentroids(embs)
    assert(trained.length == SemDedupFixture.centroids.length)
    for (c <- trained.indices)
      assert(java.util.Arrays.equals(trained(c), SemDedupFixture.centroids(c)),
        s"centroid drift at cell $c — regenerate via FixtureGen")
  }

  test("BPE merge-table fixture is exactly the trained merge sequence") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val docs = TestdataAdapter.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val trained = graft.text.TextOps.bpeTrain(docs)
      .select("step", "left", "right").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(trained == graft.text.BpeFixture.merges,
      "merge-table drift — regenerate via FixtureGen")
  }

  test("quality fixture is exactly the deterministic pinned trainer's output") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val docs = TestdataAdapter.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val (thr, iE9, wE9) = graft.ml.QualityClassifier.trainPinnedQuality(docs)
    assert(thr == graft.ml.QualityFixture.labelThreshold,
      "label-threshold drift — regenerate via FixtureGen")
    assert(iE9 == graft.ml.QualityFixture.interceptE9,
      "intercept drift — regenerate via FixtureGen")
    assert(java.util.Arrays.equals(wE9, graft.ml.QualityFixture.weightsE9),
      "weight drift — regenerate via FixtureGen")
  }

  test("RF forest fixture is exactly the deterministic trainer's output") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val trained = graft.ml.DemandModel.trainPinnedForest(
      Pipelines.mlDataset(spark, dir))
    assert(trained.length == graft.ml.RfFixture.trees.length)
    for (i <- trained.indices)
      assert(trained(i).toSeq == graft.ml.RfFixture.trees(i).toSeq,
        s"tree $i drift — regenerate via FixtureGen")
  }

  test("PCA basis fixture is exactly the trained loading matrix") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val (basis, ev) = Knn.trainPcaBasis(embs)
    assert(ev == PcaFixture.explainedVariance,
      "explained-variance drift — regenerate via FixtureGen")
    assert(basis.length == PcaFixture.basis.length)
    for (kk <- basis.indices)
      assert(java.util.Arrays.equals(basis(kk), PcaFixture.basis(kk)),
        s"basis drift at component $kk — regenerate via FixtureGen")
  }
}
