package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Next-hour demand model (SURVEY.md §2.12): the reference's sklearn
  * RandomForest re-expressed with spark.ml — same 9 features, same
  * next-hour lead label (W3/A12), same temporal 80/20 split, 200 trees,
  * seed 42. Tree ensembles differ numerically from sklearn by design, so
  * quality is asserted as an MAE band (tests), and the registry exposes a
  * rows-only metrics query rather than an exact oracle.
  *
  * Ref: src/ml/train_predict.py:30-40,145-164.
  */
object DemandModel {

  val FeatureCols: Seq[String] = Seq(
    "trip_update_events", "avg_delay_seconds", "vehicle_events",
    "temperature_c", "precipitation_mm", "wind_speed_mps",
    "hour", "day_of_week", "is_peak")

  /** W3 — next-hour label per route; rows without a next hour drop
    * (pandas shift(-1) + dropna). Ref: train_predict.py:149-153.
    */
  def withLabel(mlDataset: DataFrame): DataFrame = {
    val w = Window.partitionBy("route_id").orderBy("hour_ts")
    mlDataset
      .withColumn("label", lead(col("passengers"), 1).over(w))
      .filter(col("label").isNotNull)
  }

  /** Temporal 80/20 split by global hour_ts row order (reference sorts by
    * hour_ts then slices at 0.8·n; the row_number tiebreak on route_id
    * makes our slice deterministic — SURVEY §7.4 item 6). The global
    * window is verify-scale only; at 100 TB the cutoff comes from
    * approxQuantile on hour_ts instead (same semantics, no global sort).
    */
  def temporalSplit(labeled: DataFrame, trainFraction: Double = 0.8): (DataFrame, DataFrame) = {
    val n = labeled.count()
    val cut = math.floor(trainFraction * n).toLong
    val w = Window.orderBy("hour_ts", "route_id")
    val idx = labeled.withColumn("rn", row_number().over(w))
    (idx.filter(col("rn") <= cut).drop("rn"), idx.filter(col("rn") > cut).drop("rn"))
  }

  /** Train RF(numTrees, seed) and return (test predictions, MAE, n_train,
    * n_test). The split halves are persisted: the RF fitter makes many
    * passes over the training frame, and without the cache each pass
    * re-executes the lead-window + global-sort lineage.
    * Ref: train_predict.py:155-164.
    */
  def trainPredict(
      labeled: DataFrame,
      numTrees: Int = 200,
      seed: Long = 42L): (DataFrame, Double, Long, Long) = {
    val (train0, test0) = temporalSplit(labeled)
    val train = train0.persist()
    val test = test0.persist()
    try {
      val pipeline = new Pipeline().setStages(Array(
        new VectorAssembler()
          .setInputCols(FeatureCols.toArray)
          .setOutputCol("features"),
        new RandomForestRegressor()
          .setLabelCol("label")
          .setFeaturesCol("features")
          .setNumTrees(numTrees)
          .setSeed(seed)))
      val model = pipeline.fit(train)
      val pred = model.transform(test)
      val mae = new RegressionEvaluator()
        .setLabelCol("label").setPredictionCol("prediction").setMetricName("mae")
        .evaluate(pred)
      (pred, mae, train.count(), test.count())
    } finally {
      train.unpersist(blocking = false)
      test.unpersist(blocking = false)
    }
  }

  /** Rows-only registry query: one row of run metrics (the reference's
    * ml_runs record, train_predict.py:173-195).
    */
  def runMetrics(mlDataset: DataFrame, numTrees: Int = 200): DataFrame = {
    val spark = mlDataset.sparkSession
    import spark.implicits._
    val (_, mae, nTrain, nTest) = trainPredict(withLabel(mlDataset), numTrees)
    Seq((nTrain, nTest, mae, numTrees))
      .toDF("n_train", "n_test", "mae", "num_trees")
  }
}
