package graft

import org.apache.spark.sql.functions._
import graft.sim.Knn

/** The IVF retrain decision (VERDICT r13 item 2): `ivfAttachIncremental`
  * serves batches between retrains in O(batch), and [[Knn.ivfDriftReport]]
  * is what decides when a retrain is DUE — per-cell training-time vs
  * batch stats under the same centroids. The contract this spec proves:
  * a STATIONARY batch (a fresh draw from the same mixture the index was
  * trained on) does not trip `retrain_due`, while an engineered DRIFTED
  * batch (the distribution moved away from the trained cells) does.
  */
class IvfDriftSpec extends SparkSpec {

  // corpus: the first 300 clustered vectors; stationary batch: the next
  // 200 ids of the SAME md5-seeded mixture (fresh draws, same geometry)
  private lazy val all = Knn.clusteredEmbeddings(spark, n = 500).persist()
  private lazy val corpus = all.filter(col("vec_id") < 300)
  private lazy val stationary = all.filter(col("vec_id") >= 300)

  test("stationary batch: drift ratios hover near 1, no retrain flag") {
    val rep = Knn.ivfDriftReport(corpus, stationary).collect()
    assert(rep.nonEmpty)
    assert(rep.forall(!_.getAs[Boolean]("retrain_due")),
      s"a fresh draw from the trained mixture must not trip retrain: " +
        rep.map(r => (r.getAs[Int]("cell"), r.getAs[Any]("drift_ratio"),
          r.getAs[Boolean]("retrain_due"))).mkString(", "))
    // populated cells sit near ratio 1 (same noise process both sides)
    val ratios = rep.flatMap(r => Option(r.getAs[java.lang.Double]("drift_ratio")))
      .map(_.doubleValue()).filter(!_.isNaN)
    assert(ratios.nonEmpty && ratios.forall(x => x > 0.4 && x < 1.5),
      s"stationary ratios near 1: ${ratios.mkString(", ")}")
  }

  test("drifted batch: shifted distribution trips retrain_due") {
    // engineered drift: every batch vector moves by +4.0 on every
    // dimension — the cluster structure the cells were trained on no
    // longer matches, so batch mean centroid distance blows up
    val drifted = stationary.withColumn("embedding",
      transform(col("embedding"), x => (x + lit(4.0f)).cast("float")))
    val rep = Knn.ivfDriftReport(corpus, drifted).collect()
    val hit = rep.filter(_.getAs[Boolean]("retrain_due"))
    assert(hit.nonEmpty,
      s"a shifted batch must trip the retrain flag somewhere: " +
        rep.map(r => (r.getAs[Int]("cell"), r.getAs[Any]("drift_ratio"))).mkString(", "))
    // and specifically via the drift-ratio leg on populated cells
    assert(rep.exists { r =>
      val dr = Option(r.getAs[java.lang.Double]("drift_ratio"))
      dr.exists(_.doubleValue() > 1.5)
    }, "mean-distance growth is the tripping signal")
  }

  test("the loop closes: retraining on the recent window clears the flag") {
    // the distribution SHIFTED (every vector +4.0 per dim). Against the
    // stale cells the drift report demands a retrain...
    def shifted(df: org.apache.spark.sql.DataFrame) = df.withColumn("embedding",
      transform(col("embedding"), x => (x + lit(4.0f)).cast("float")))
    val window1 = shifted(stationary) // ids 300..499, shifted
    assert(Knn.ivfDriftReport(corpus, window1).collect()
      .exists(_.getAs[Boolean]("retrain_due")), "stale cells must demand retrain")
    // ...so retrain on the RECENT window (window1), then monitor the
    // NEXT window of the same shifted distribution: ratios return to ~1
    // and no cell trips — the attach/drift/retrain cycle is closed
    val window2 = shifted(
      Knn.clusteredEmbeddings(spark, n = 700).filter(col("vec_id") >= 500))
    val after = Knn.ivfDriftReport(window1, window2).collect()
    assert(after.forall(!_.getAs[Boolean]("retrain_due")),
      s"retrained cells must absorb the next same-distribution window: " +
        after.map(r => (r.getAs[Int]("cell"), r.getAs[Any]("drift_ratio"),
          r.getAs[Boolean]("retrain_due"))).mkString(", "))
  }

  test("report accounting: exact integer columns are self-consistent") {
    val rep = Knn.ivfDriftReport(corpus, stationary).collect()
    assert(rep.map(_.getAs[Long]("n_train")).sum == 300L)
    assert(rep.map(_.getAs[Long]("n_batch")).sum == 200L)
    rep.foreach { r =>
      assert(r.getAs[Long]("radius_train") * r.getAs[Long]("n_train")
        >= r.getAs[Long]("inertia_train"),
        s"radius (max d) bounds the inertia sum: $r")
    }
  }
}
