package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance via mergeable partial aggregates — the
  * pattern that keeps a 100 TB hourly rollup affordable: yesterday's
  * partials are STORED (count + exact decimal sum per group), only the
  * new slice of raw data is scanned, and the refreshed view is one
  * group-by over `stored ∪ increment` — never a recompute of history.
  *
  * Exactness is the point of the decimal representation: decimal sums
  * are associative, so `merge(partial(old), partial(new))` is
  * bit-identical to `partial(old ∪ new)` on any partitioning and any
  * split point — the incremental path can be hash-verified against a
  * full recompute (which is exactly what the registered oracle does).
  * Plain double sums would NOT give this (final bits depend on add
  * order), which is why the partial carries `sum_dec`, not a double;
  * doubles only appear at [[finalizeHourly]], after all merging is done.
  *
  * All three steps are map-side-combinable hash aggregations keyed by
  * (event_type, hour_ts); the merge input is partials-sized (groups, not
  * raw rows), so refreshing a day costs one scan of the day's increment
  * plus a groups-sized shuffle.
  */
object Incremental {

  /** Partial hourly aggregate of a `userEvents`-shaped frame: per
    * (event_type, hour) the merge-able state — row count, non-null value
    * count, and the exact decimal value sum.
    */
  def hourlyPartial(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("observed_at")).as("hour_ts"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("value")).as("n_vals"),
        sum(col("value").cast("decimal(28,6)")).as("sum_dec"))

  /** Merge any number of partial-aggregate frames: one group-by summing
    * the counts and the decimal sums. Associative and exact — merging in
    * any order or grouping equals one partial over the unioned input.
    */
  def mergePartials(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy("event_type", "hour_ts")
      .agg(
        sum("n_events").as("n_events"),
        sum("n_vals").as("n_vals"),
        sum("sum_dec").as("sum_dec"))

  /** Finalize a (possibly merged) partial into the published view shape:
    * doubles appear only here, after all merging is done.
    */
  def finalizeHourly(partial: DataFrame): DataFrame =
    partial.select(
      col("event_type"),
      col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
      col("n_events").cast("long").as("n_events"),
      col("sum_dec").cast("double").as("sum_value"),
      (col("sum_dec").cast("double") / col("n_vals")).as("avg_value"))
      .orderBy("event_type", "hour_ts")

  /** The registered end-to-end scenario: the stream is split at the
    * latest hour (history = "already aggregated yesterday", the last
    * hour = "the new increment"); each side is partially aggregated
    * separately, merged, and finalized. The oracle recomputes the same
    * view from scratch over all raw rows — equality IS the incremental
    * correctness proof.
    */
  def incrementalHourlyMerge(events: DataFrame): DataFrame = {
    val cut = events.agg(date_trunc("hour", max(col("observed_at"))).as("cut_ts"))
    val tagged = events.crossJoin(broadcast(cut))
    val history = tagged.filter(col("observed_at") < col("cut_ts")).drop("cut_ts")
    val increment = tagged.filter(col("observed_at") >= col("cut_ts")).drop("cut_ts")
    finalizeHourly(mergePartials(Seq(hourlyPartial(history), hourlyPartial(increment))))
  }

  /** DuckDB twin of [[incrementalHourlyMerge]] — a FULL recompute (no
    * split): passes iff partial-merge ≡ recompute, exactly.
    */
  val incrementalHourlyMergeSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS TIMESTAMP) AS observed_at, value FROM events)
      |SELECT event_type, date_trunc('hour', observed_at) AS hour_ts,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS avg_value
      |FROM ev GROUP BY 1, 2
      |ORDER BY event_type, hour_ts""".stripMargin
}
