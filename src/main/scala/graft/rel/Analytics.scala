package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Time-series and product-analytics operators over the events stream:
  * dense hourly gap-fill with forward-fill, ordered funnel conversion,
  * and weekly cohort retention. All three are classic warehouse queries
  * a reference-engine user runs daily; each has an exact DuckDB oracle.
  *
  * Scale notes:
  *  - Gap-fill's dense grid is time-bounded, not data-bounded: series ×
  *    hours is ~10⁴ rows per series-year however big the raw stream, so
  *    the explode side of the left join stays trivially small while the
  *    event side aggregates BEFORE joining (map-side combinable count /
  *    decimal sum per (series, hour)). The forward-fill window partitions
  *    by series — parallel across series, never a single-partition sort.
  *  - Funnel steps are per-user MIN aggregations chained by two
  *    user_id-keyed joins — each a co-partitioned shuffle on the same
  *    key, no windows, no fan-out beyond one row per user per step.
  *  - Cohort retention is two hash aggregations (first-seen per user,
  *    then distinct users per (cohort, offset)) joined on user_id.
  */
object Analytics {

  /** Per-route hourly delay anomalies — z-score outlier detection with
    * HASH-VERIFIABLE moments: the route-level mean and E[x²] come from
    * associative decimal sums (squares computed in decimal, then rounded
    * to scale 6 so the sum stays double-representable), and every
    * double appears only in per-row arithmetic AFTER aggregation —
    * identical in both engines, so even the boolean flag hash-matches.
    * Shape: two map-side-combinable aggregations over the same scan
    * grain (hourly, then per-route) + one broadcast-sized join back
    * (routes ≪ hours); nothing shuffles twice.
    */
  def delayAnomalies(tripUpdates: DataFrame, nSigma: Double = 2.0): DataFrame = {
    val hourly = tripUpdates
      .groupBy(col("route_id"), date_trunc("hour", col("observed_at")).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"), Cols.detAvg(col("delay_seconds")).as("avg_delay"))
    val route = tripUpdates
      .groupBy(col("route_id"))
      .agg(
        count(col("delay_seconds")).as("n"),
        sum(col("delay_seconds").cast("decimal(28,6)")).cast("double").as("s1"),
        // square IN decimal (double x·x re-rounds; its decimal cast is
        // half-boundary-ambiguous cross-engine), then round each square
        // back to scale 6 before summing: a scale-12 sum's scaled integer
        // exceeds 2^53, and DuckDB's decimal→double would double-round
        // where Spark rounds once — scale 6 keeps the sum exactly
        // double-representable, so the final cast is single-rounded in
        // both engines
        sum((col("delay_seconds").cast("decimal(18,6)") *
          col("delay_seconds").cast("decimal(18,6)")).cast("decimal(28,6)"))
          .cast("double").as("s2"))
      .select(
        col("route_id"),
        (col("s1") / col("n")).as("route_mean"),
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
          .as("route_std"))
    hourly.join(broadcast(route), Seq("route_id"))
      .select(
        col("route_id"), col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        col("n_events"), col("avg_delay"), col("route_mean"), col("route_std"),
        (abs(col("avg_delay") - col("route_mean")) > lit(nSigma) * col("route_std"))
          .as("is_anomaly"))
      .orderBy("route_id", "hour_ts")
  }

  def delayAnomaliesSql(nSigma: Double = 2.0): String =
    s"""WITH t AS (
       |  SELECT event_type AS route_id, CAST(ts AS TIMESTAMP) AS observed_at,
       |         value AS delay_seconds
       |  FROM events),
       |h AS (
       |  SELECT route_id, date_trunc('hour', observed_at) AS hour_ts,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(CAST(delay_seconds AS DECIMAL(28,6))) AS DOUBLE) / COUNT(delay_seconds)
       |      AS avg_delay
       |  FROM t GROUP BY 1, 2),
       |r AS (
       |  SELECT route_id,
       |    CAST(SUM(CAST(delay_seconds AS DECIMAL(28,6))) AS DOUBLE) / COUNT(delay_seconds)
       |      AS route_mean,
       |    sqrt(
       |      CAST(SUM(CAST(CAST(delay_seconds AS DECIMAL(18,6)) * CAST(delay_seconds AS DECIMAL(18,6)) AS DECIMAL(28,6))) AS DOUBLE)
       |        / COUNT(delay_seconds)
       |      - (CAST(SUM(CAST(delay_seconds AS DECIMAL(28,6))) AS DOUBLE) / COUNT(delay_seconds))
       |        * (CAST(SUM(CAST(delay_seconds AS DECIMAL(28,6))) AS DOUBLE) / COUNT(delay_seconds)))
       |      AS route_std
       |  FROM t GROUP BY 1)
       |SELECT h.route_id, h.hour_ts, h.n_events, h.avg_delay, r.route_mean, r.route_std,
       |  abs(h.avg_delay - r.route_mean) > $nSigma * r.route_std AS is_anomaly
       |FROM h JOIN r USING (route_id)
       |ORDER BY h.route_id, h.hour_ts""".stripMargin

  /** Population-Stability-Index drift report — the standard ML-ops
    * check that a feature's distribution hasn't shifted between a
    * reference window and the current window:
    *
    *   PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
    *
    * per event_type over `value`, with the observed time range split at
    * its midpoint (ref = first half, cur = second half), 10 fixed-width
    * bins over the REFERENCE range (cur values clamp into the edge
    * bins — exactly how a deployed scorecard bins unseen values), and
    * (n + 0.5) / (N + 5) smoothing so empty bins stay defined.
    * PSI > 0.2 is the conventional "significant shift" flag.
    *
    * Scale: one scan grain — the midpoint comes from a broadcast 1-row
    * min/max aggregate, per-type reference ranges broadcast back
    * (|types| rows), bin counts are map-side combinable, and the dense
    * 10-bin grid is |types|×10 however large the stream. Cross-engine
    * exact: the time split is integer-µs arithmetic, bin assignment is
    * floor over identical doubles, ln is rounded to 9 dp at the call
    * (transcendentals are not correctly-rounded cross-engine), and the
    * 10 per-bin terms are 1e9-quantized to BIGINTs so the per-type sum
    * is order-free.
    */
  def driftPsi(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("event_type"),
      unix_micros(col("observed_at").cast("timestamp")).as("us"),
      col("value"))
    val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val sided = ev.crossJoin(broadcast(bounds))
      .withColumn("side",
        when(col("us") < expr("(lo + hi) DIV 2"), lit("ref")).otherwise(lit("cur")))
      .select("event_type", "side", "value")
    val refStats = sided.filter(col("side") === "ref")
      .groupBy("event_type")
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val binned = sided.join(broadcast(refStats), Seq("event_type"))
      .withColumn("bin",
        when(col("vmax") === col("vmin"), lit(0))
          .otherwise(greatest(lit(0L), least(lit(9L),
            floor((col("value") - col("vmin")) /
              ((col("vmax") - col("vmin")) / lit(10.0))))).cast("int")))
    val binCounts = binned.groupBy("event_type", "bin")
      .agg(
        sum(when(col("side") === "ref", 1L).otherwise(0L)).as("nr"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("nc"))
    val grid = refStats.select(col("event_type"))
      .withColumn("bin", explode(expr("sequence(0, 9)")))
    val full = grid.join(binCounts, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("nr", "nc"))
    val totals = full.groupBy("event_type")
      .agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"))
    val pRef = (col("nr") + lit(0.5)) / (col("tr") + lit(5.0))
    val pCur = (col("nc") + lit(0.5)) / (col("tc") + lit(5.0))
    full.join(broadcast(totals), Seq("event_type"))
      .withColumn("q",
        round((pCur - pRef) * round(log(pCur / pRef), 9) * lit(1e9)).cast("long"))
      .groupBy(col("event_type"), col("tr").as("n_ref"), col("tc").as("n_cur"))
      .agg((sum(col("q")) / lit(1e9)).as("psi"))
      .withColumn("drifted", col("psi") > lit(0.2))
      .orderBy("event_type")
  }

  val driftPsiSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events),
      |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
      |sided AS (
      |  SELECT e.event_type, e.value,
      |    CASE WHEN e.us < (b.lo + b.hi) // 2 THEN 'ref' ELSE 'cur' END AS side
      |  FROM ev e CROSS JOIN b),
      |rs AS (
      |  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
      |  FROM sided WHERE side = 'ref' GROUP BY 1),
      |binned AS (
      |  SELECT s.event_type, s.side,
      |    CASE WHEN r.vmax = r.vmin THEN 0
      |         ELSE CAST(GREATEST(0, LEAST(9,
      |           floor((s.value - r.vmin) / ((r.vmax - r.vmin) / 10.0)))) AS INTEGER)
      |    END AS bin
      |  FROM sided s JOIN rs r USING (event_type)),
      |bc AS (
      |  SELECT event_type, bin,
      |    SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS nr,
      |    SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS nc
      |  FROM binned GROUP BY 1, 2),
      |grid AS (
      |  SELECT r.event_type, g.bin
      |  FROM rs r CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g),
      |f AS (
      |  SELECT g.event_type, g.bin,
      |    COALESCE(bc.nr, 0) AS nr, COALESCE(bc.nc, 0) AS nc
      |  FROM grid g LEFT JOIN bc ON bc.event_type = g.event_type AND bc.bin = g.bin),
      |tot AS (SELECT event_type, SUM(nr) AS tr, SUM(nc) AS tc FROM f GROUP BY 1),
      |terms AS (
      |  SELECT f.event_type, t.tr, t.tc,
      |    CAST(round(((f.nc + 0.5) / (t.tc + 5.0) - (f.nr + 0.5) / (t.tr + 5.0))
      |      * round(ln(((f.nc + 0.5) / (t.tc + 5.0)) / ((f.nr + 0.5) / (t.tr + 5.0))), 9)
      |      * 1e9) AS BIGINT) AS q
      |  FROM f JOIN tot t USING (event_type))
      |SELECT event_type, CAST(tr AS BIGINT) AS n_ref, CAST(tc AS BIGINT) AS n_cur,
      |  SUM(q) / 1e9 AS psi, SUM(q) / 1e9 > 0.2 AS drifted
      |FROM terms GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  /** Dense per-type hourly series over the full observed range: missing
    * hours appear with n_events = 0 and carry the last seen hourly
    * average forward (`avg_value` stays null before a series' first
    * observation — nothing to carry).
    */
  def hourlyGapFill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("observed_at")).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"), Cols.detAvg(col("value")).as("avg_raw"))
    val bounds = hourly.agg(
      min(col("hour_ts")).as("min_h"), max(col("hour_ts")).as("max_h"))
    val grid = events.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(min_h, max_h, interval 1 hour)")).as("hour_ts"))
    val w = Window.partitionBy("event_type").orderBy("hour_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour_ts"), "left")
      .select(
        col("event_type"),
        col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("avg_raw"), ignoreNulls = true).over(w).as("avg_value"))
      .orderBy("event_type", "hour_ts")
  }

  val hourlyGapFillSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS TIMESTAMP) AS observed_at, value FROM events),
      |hourly AS (
      |  SELECT event_type, date_trunc('hour', observed_at) AS hour_ts,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS avg_raw
      |  FROM ev GROUP BY 1, 2),
      |bounds AS (SELECT MIN(hour_ts) AS min_h, MAX(hour_ts) AS max_h FROM hourly),
      |grid AS (
      |  SELECT t.event_type, unnest(generate_series(b.min_h, b.max_h, INTERVAL 1 HOUR)) AS hour_ts
      |  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN bounds b)
      |SELECT g.event_type, g.hour_ts,
      |  COALESCE(h.n_events, 0) AS n_events,
      |  LAST_VALUE(h.avg_raw IGNORE NULLS) OVER (
      |    PARTITION BY g.event_type ORDER BY g.hour_ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value
      |FROM grid g LEFT JOIN hourly h
      |  ON h.event_type = g.event_type AND h.hour_ts = g.hour_ts
      |ORDER BY g.event_type, g.hour_ts""".stripMargin

  /** Ordered 3-step funnel signup → view → purchase: a user converts a
    * step only with an event strictly after their previous step's first
    * qualifying event. One summary row of reach counts and rates.
    */
  def funnel(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col("user_id"), col("event_type"), col("observed_at"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("observed_at").as("t_signup"))
    val s2 = ev.filter(col("event_type") === "view").as("e")
      .join(s1.as("s"), col("e.user_id") === col("s.user_id") &&
        col("e.observed_at") > col("t_signup"))
      .groupBy(col("s.user_id")).agg(min("observed_at").as("t_view"))
    val s3 = ev.filter(col("event_type") === "purchase").as("e")
      .join(s2.as("v"), col("e.user_id") === col("v.user_id") &&
        col("e.observed_at") > col("t_view"))
      .groupBy(col("v.user_id")).agg(min("observed_at").as("t_purchase"))
    val total = ev.select("user_id").distinct().count()
    val n1 = s1.count(); val n2 = s2.count(); val n3 = s3.count()
    Seq((total, n1, n2, n3,
      n1.toDouble / total, if (n1 == 0) 0.0 else n2.toDouble / n1,
      if (n2 == 0) 0.0 else n3.toDouble / n2))
      .toDF("n_users", "n_signup", "n_view_after_signup", "n_purchase_after_view",
        "rate_signup", "rate_view", "rate_purchase")
  }

  val funnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS observed_at FROM events),
      |s1 AS (SELECT user_id, MIN(observed_at) AS t_signup FROM ev
      |       WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.observed_at) AS t_view
      |       FROM ev e JOIN s1 ON s1.user_id = e.user_id AND e.observed_at > s1.t_signup
      |       WHERE e.event_type = 'view' GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.observed_at) AS t_purchase
      |       FROM ev e JOIN s2 ON s2.user_id = e.user_id AND e.observed_at > s2.t_view
      |       WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT
      |  (SELECT COUNT(DISTINCT user_id) FROM ev) AS n_users,
      |  (SELECT COUNT(*) FROM s1) AS n_signup,
      |  (SELECT COUNT(*) FROM s2) AS n_view_after_signup,
      |  (SELECT COUNT(*) FROM s3) AS n_purchase_after_view,
      |  CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) / (SELECT COUNT(DISTINCT user_id) FROM ev) AS rate_signup,
      |  CASE WHEN (SELECT COUNT(*) FROM s1) = 0 THEN 0.0
      |       ELSE CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) / (SELECT COUNT(*) FROM s1) END AS rate_view,
      |  CASE WHEN (SELECT COUNT(*) FROM s2) = 0 THEN 0.0
      |       ELSE CAST((SELECT COUNT(*) FROM s3) AS DOUBLE) / (SELECT COUNT(*) FROM s2) END AS rate_purchase""".stripMargin

  /** Weekly cohort retention: users grouped by first-seen week; for each
    * (cohort week, week offset) the count of cohort members active that
    * week. Offsets are exact (both ends Monday-truncated).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("observed_at"))
    val cohorts = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("observed_at"))).as("cohort_week"))
    ev.withColumn("activity_week", date_trunc("week", col("observed_at")))
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"), floor(
        datediff(col("activity_week"), col("cohort_week")) / 7).cast("int")
        .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
        col("week_offset"), col("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS observed_at FROM events),
      |cohorts AS (
      |  SELECT user_id, CAST(date_trunc('week', MIN(observed_at)) AS TIMESTAMP) AS cohort_week
      |  FROM ev GROUP BY 1)
      |SELECT c.cohort_week,
      |  CAST(date_diff('day', CAST(c.cohort_week AS DATE),
      |    date_trunc('week', e.observed_at)) // 7 AS INTEGER) AS week_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM ev e JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
