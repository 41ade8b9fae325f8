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

  /** Equi-width histogram of `value` with data-driven bounds — the
    * profiling pass before outlier clipping / feature binning. The
    * min/max come from a broadcast 1-row aggregate (no collect), the bin
    * assignment is a narrow projection, and the final count groups on
    * ≤ nBins keys. Bin edges use exact double arithmetic shared with the
    * oracle; the top edge folds into the last bin.
    */
  def valueHistogram(events: DataFrame, nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val bounds = events.agg(min("value").as("lo"), max("value").as("hi"))
    val bin = least(
      floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / nBins)).cast("long"),
      lit(nBins - 1L))
    events.crossJoin(broadcast(bounds))
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        min("value").as("bin_min"),
        max("value").as("bin_max"))
      .orderBy("bin")
  }

  def valueHistogramSql(nBins: Int = 10): String =
    s"""WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
       |a AS (SELECT value,
       |        LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / $nBins)) AS BIGINT),
       |              ${nBins - 1}) AS bin
       |      FROM events CROSS JOIN b)
       |SELECT bin, COUNT(*) AS n, MIN(value) AS bin_min, MAX(value) AS bin_max
       |FROM a GROUP BY bin ORDER BY bin""".stripMargin

  /** Column-profile summary — the data-quality gate a pipeline runs
    * before training ingestion: one row per profiled column with null
    * rate, distinct count, and min/max rendered as strings. Spark
    * computes all columns in ONE aggregation pass (no per-column scans);
    * the unpivot to rows is a literal stack.
    */
  def profileEvents(events: DataFrame): DataFrame = {
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_n"),
        count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val one = events.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column_name"), col(s"${c}_n").as("n_non_null"),
        col(s"${c}_nulls").as("n_null"), col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_repr"), col(s"${c}_max").as("max_repr"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

  val profileEventsSql: String = {
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT($c) AS n_non_null,
         |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_repr, CAST(MAX($c) AS VARCHAR) AS max_repr
         |FROM events""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** Heavy hitters via Count-Min Sketch — the frequency sketch that
    * completes the family (HLL++ cardinality, t-digest quantiles, Bloom
    * membership, CMS counts): fixed `O(1/eps × ln 1/δ)` counter state,
    * mergeable map-side like the others, built through the public
    * `DataFrameStatFunctions.countMinSketch` distributed aggregation.
    * The report joins the sketch estimate onto the exact top-k (the
    * audit ride-along, same contract as [[sketchStats]]): CMS
    * guarantees estimate ≥ exact, within eps·N with probability δ.
    * Counter adds are order-independent and the hash seed is fixed, so
    * the output is deterministic across any partition layout. The
    * estimate probe touches only the k retained keys on the driver.
    */
  def heavyHitters(events: DataFrame, k: Int = 10): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cms = events.stat.countMinSketch(
      col("user_id"), eps = 0.001, confidence = 0.99, seed = 42)
    val exactTop = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id"))
      .limit(k)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_exact")))
    exactTop.toSeq
      .map { case (uid, n) =>
        val est = cms.estimateCount(uid)
        (uid, n, est, (est - n).toDouble / n)
      }
      .toDF("user_id", "n_exact", "n_cms", "rel_overestimate")
  }

  /** Exact top-k frequency leg, split out of [[heavyHitters]] so it can
    * be hash-verified against a DuckDB twin (the CMS estimates in the
    * combined report are engine-specific and stay rows-only). One hash
    * aggregation + a bounded TakeOrdered — no global sort.
    */
  def heavyHittersExact(events: DataFrame, k: Int = 10): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(k)

  def heavyHittersExactSql(k: Int = 10): String =
    s"""SELECT user_id, COUNT(*) AS n_events FROM events
       |GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT $k""".stripMargin

  /** Exact cardinality + median leg, split out of [[sketchStats]] for
    * hash verification. The median goes through round(x, 6) on both
    * sides so the two engines' linear-interpolation formulas (which can
    * differ by an ulp) land on the same double — the documented
    * cross-engine-safe pattern for derived doubles.
    */
  def sketchStatsExact(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        countDistinct("user_id").as("users_exact"),
        round(expr("percentile(value, 0.5)"), 6).as("p50_exact"))
      .orderBy("event_type")

  val sketchStatsExactSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS users_exact,
      |  round(quantile_cont(value, 0.5), 6) AS p50_exact
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Per-event-type exact vs sketch cardinality + median, with relative
    * errors. Exact columns are themselves deterministic (integer count,
    * sort-based percentile), so the rows-only gate still exercises them.
    *
    * Execution shape: the exact-distinct leg and the sketch leg run as
    * SEPARATE aggregations joined on the (group-count-sized) key. Fusing
    * them into one `agg` looks cheaper but triggers Catalyst's
    * single-distinct rewrite — the non-distinct sketch aggregates get
    * partial HLL/percentile state built per (event_type, user_id) group,
    * i.e. one sketch object per DISTINCT USER, merged across two extra
    * exchanges (measured 5-10 s at sf0.1 vs ~1.5 s split). Two scans of
    * a columnar source beat millions of single-row sketch merges at any
    * scale; the join is a broadcast of a handful of rows.
    */
  def sketchStats(events: DataFrame): DataFrame = {
    val sketch = events
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", rsd = 0.01).as("users_approx"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"))
    val exact = events
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("users_exact"))
    exact.join(broadcast(sketch), Seq("event_type"))
      .select(
        col("event_type"), col("users_exact"), col("users_approx"),
        col("p50_exact"), col("p50_approx"),
        (abs(col("users_approx") - col("users_exact")).cast("double") /
          col("users_exact")).as("users_rel_err"),
        (abs(col("p50_approx") - col("p50_exact")) /
          abs(col("p50_exact"))).as("p50_rel_err"))
      .orderBy("event_type")
  }
}
