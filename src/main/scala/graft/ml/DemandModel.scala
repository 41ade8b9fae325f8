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

  /** Temporal 80/20 split at an hour boundary. The cutoff hour comes from
    * the per-hour row histogram — one shuffle keyed on hour_ts producing
    * a time-bounded frame (even years of data is <100k distinct hours),
    * scanned on the driver; the split itself is then two pushdown-able
    * filters. No global single-partition sort, no full count, and the
    * result is partition-layout independent (exact integer counts, keyed
    * order). Semantics vs the reference's row-index slice: splitting at
    * the hour containing the 0.8 point means the train fraction lands
    * within one hour's row share of the target — and never splits a
    * single hour across train and test (the reference's slice can, which
    * leaks same-hour context across the temporal boundary).
    */
  def temporalSplit(labeled: DataFrame, trainFraction: Double = 0.8): (DataFrame, DataFrame) = {
    val hist = labeled.groupBy("hour_ts").agg(count(lit(1)).as("n"))
      .orderBy("hour_ts").collect()
    require(hist.nonEmpty, "temporalSplit: empty input")
    val target = trainFraction * hist.map(_.getAs[Long]("n")).sum
    var acc = 0L
    var cut = hist.head.get(0)
    for (r <- hist if acc < target) { acc += r.getAs[Long]("n"); cut = r.get(0) }
    (labeled.filter(col("hour_ts") <= lit(cut)),
      labeled.filter(col("hour_ts") > lit(cut)))
  }

  /** Train RF(numTrees, seed) and return (test predictions, MAE, n_train,
    * n_test). The split halves are persisted: the RF fitter makes many
    * passes over the training frame, and without the cache each pass
    * re-executes the lead-window + global-sort lineage.
    * Ref: train_predict.py:155-164.
    */
  /** Partition-layout pin for RF inputs: MLlib's bootstrap sampling is
    * seeded per (seed, partitionId) over the rows in partition order, so
    * the model — and its MAE — is only reproducible if the training
    * frame's layout is. A fixed-count hash repartition on the (unique)
    * key plus an in-partition sort makes the layout a pure function of
    * the data, independent of cluster size or upstream lineage. 8 here
    * is a determinism constant, not a parallelism tunable — the training
    * frame is route×hour-sized (thousands of rows however big the raw
    * feed), and tree training schedules many small jobs per iteration,
    * so fewer/fatter partitions beat scheduler overhead; at a genuinely
    * large training set raise it (any fixed value keeps reproducibility).
    */
  private val TrainPartitions = 8
  private def pinLayout(df: DataFrame): DataFrame =
    df.repartition(TrainPartitions, col("route_id"), col("hour_ts"))
      .sortWithinPartitions("route_id", "hour_ts")

  def trainPredict(
      labeled: DataFrame,
      numTrees: Int = 200,
      seed: Long = 42L): (DataFrame, Double, Long, Long) = {
    // persisted: the hour histogram, the train filter, and the test
    // filter each consume this frame — without the cache the upstream
    // pipeline (joins + aggregations + label window) executes three times
    val l = labeled.persist()
    val (train0, test0) = temporalSplit(l)
    val train = pinLayout(train0).persist()
    val test = pinLayout(test0).persist()
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
      l.unpersist(blocking = false)
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

  /** The reference's full ml_runs lineage record: run_id, model
    * name/version, rows_used, split_ratio, MAE, features JSON. run_id is
    * a deterministic name-UUID of (model, version, trees, seed, split
    * sizes, features) — the reference uses uuid4, but a content-derived
    * id is the idempotency key its ON CONFLICT (run_id) DO NOTHING
    * insert actually wants, and it keeps the rows-only check stable.
    * Ref: src/ml/train_predict.py:84-95,173-195.
    */
  def runRecord(mlDataset: DataFrame, numTrees: Int = 200, seed: Long = 42L): DataFrame = {
    val spark = mlDataset.sparkSession
    import spark.implicits._
    val (_, mae, nTrain, nTest) = trainPredict(withLabel(mlDataset), numTrees, seed)
    val featuresJson = FeatureCols.mkString("[\"", "\",\"", "\"]")
    val runId = java.util.UUID.nameUUIDFromBytes(
      s"rf_demand|1|$numTrees|$seed|$nTrain|$nTest|$featuresJson".getBytes("UTF-8")).toString
    Seq((runId, "rf_demand", "1", nTrain + nTest, 0.8, mae, featuresJson, numTrees))
      .toDF("run_id", "model_name", "model_version", "rows_used",
        "split_ratio", "mae", "features", "num_trees")
  }

  /** Predictions history → latest table: the reference keeps an
    * append-only demand_predictions_history plus a latest-wins
    * demand_predictions upserted ON CONFLICT (route_id, hour_ts); this
    * is that upsert as one deterministic window (S10 shape, newest
    * run_seq wins per key). Ref: train_predict.py:197-217.
    */
  def predictionsLatest(history: DataFrame): DataFrame = {
    val w = Window.partitionBy("route_id", "hour_ts").orderBy(col("run_seq").desc)
    history
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy("route_id", "hour_ts")
  }
}
