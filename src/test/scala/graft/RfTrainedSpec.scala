package graft

import graft.ml.DemandModel

/** Spec coverage for the in-query-TRAINED RF legs retired from the
  * registry in r13 (`rf_demand_mae` / `ml_run_record`): MLlib ensemble
  * values are engine-specific by design (SURVEY §2.12 prescribes
  * tolerance), so the trained legs are asserted here as bands +
  * deterministic-field identities, while their oracle-exact twins
  * (`rf_pinned_mae`, `ml_run_record_pinned`) stay inside the hash gate.
  * Ref: src/ml/train_predict.py:84-95,173-195.
  */
class RfTrainedSpec extends SparkSpec {

  private lazy val ds = Pipelines.mlDataset(spark, "/root/testdata/sf0.001")
  // one training run shared by both tests (runMetrics trains eagerly)
  private lazy val metricsDf = DemandModel.runMetrics(ds, numTrees = 10)
  private lazy val metrics = metricsDf.collect().head

  test("runMetrics: trained-RF metrics row has the lineage schema and a sane MAE band") {
    assert(metricsDf.columns.toSeq == Seq("n_train", "n_test", "mae", "num_trees"))
    val (nTrain, nTest, mae) =
      (metrics.getLong(0), metrics.getLong(1), metrics.getDouble(2))
    assert(nTrain > 0 && nTest > 0)
    // 80/20 temporal split, never dividing an hour (StreamsMlSpec pins
    // the split itself); here we only pin the recorded sizes' ratio
    val frac = nTrain.toDouble / (nTrain + nTest)
    assert(frac > 0.7 && frac < 0.9)
    assert(!mae.isNaN && mae >= 0.0)
    // band: the pinned 20-tree serving forest scores ~the same data;
    // a 10-tree trained forest must land within a loose 10x of it —
    // catches a broken label/feature wiring without pinning MLlib output
    val pinned = DemandModel.pinnedMae(ds, graft.ml.RfFixture.trees)
      .collect().head.getAs[Double]("mae")
    assert(mae < pinned * 10 + 10.0)
  }

  test("runRecord: deterministic fields are content-derived and stable across retrains") {
    val aDf = DemandModel.runRecord(ds, numTrees = 10)
    val a = aDf.collect().head
    val b = DemandModel.runRecord(ds, numTrees = 10).collect().head
    assert(aDf.columns.toSeq == Seq("run_id", "model_name", "model_version",
      "rows_used", "split_ratio", "mae", "features", "num_trees"))
    // run_id is the v3 name-UUID of the run's content — recompute it here
    val featuresJson = DemandModel.FeatureCols.mkString("[\"", "\",\"", "\"]")
    val (nTrain, nTest) = (metrics.getLong(0), metrics.getLong(1))
    val wantId = java.util.UUID.nameUUIDFromBytes(
      s"rf_demand|1|10|42|$nTrain|$nTest|$featuresJson".getBytes("UTF-8")).toString
    assert(a.getString(0) == wantId)
    assert(a.getString(1) == "rf_demand" && a.getString(2) == "1")
    assert(a.getLong(3) == nTrain + nTest)
    assert(a.getDouble(4) == 0.8)
    assert(a.getString(6) == featuresJson)
    assert(a.getInt(7) == 10)
    // same seed + same data → identical record including the trained MAE
    assert(a == b)
  }
}
