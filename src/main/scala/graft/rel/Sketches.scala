package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximations — at 100 TB the exact forms of
  * COUNT(DISTINCT) and percentile() are the expensive outliers (exact
  * distinct doubles the shuffle via expand; exact percentiles buffer
  * whole groups), and the sketch forms are what a production engine
  * actually runs:
  *
  *  - HyperLogLog++ (`approx_count_distinct`): fixed ~kB state per
  *    group regardless of cardinality, mergeable map-side — one narrow
  *    aggregation instead of an expand + wide shuffle;
  *  - t-digest (`approx_percentile`): bounded-memory mergeable quantile
  *    state instead of per-group sorted buffers.
  *
  * Sketch values are engine-specific by construction (DuckDB's HLL and
  * Spark's HLL++ disagree in the last percent), so the query is
  * registered rows-only; the accuracy contract — approx within the
  * advertised error of exact, on the same Spark plan — is what the spec
  * asserts, and the exact columns ride along for audit.
  */
object Sketches {

  /** Per-event-type exact vs sketch cardinality + median, with relative
    * errors. Exact columns are themselves deterministic (integer count,
    * sort-based percentile), so the rows-only gate still exercises them.
    */
  def sketchStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("users_exact"),
        approx_count_distinct("user_id", rsd = 0.01).as("users_approx"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"))
      .withColumn("users_rel_err",
        abs(col("users_approx") - col("users_exact")).cast("double") / col("users_exact"))
      .withColumn("p50_rel_err",
        abs(col("p50_approx") - col("p50_exact")) / abs(col("p50_exact")))
      .orderBy("event_type")
}
