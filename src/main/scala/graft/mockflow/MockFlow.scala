package graft.mockflow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic passenger-flow generator (SURVEY.md §2.10 G1-G4) — the
  * reference's per-stop/hour/minute-bucket event simulator re-expressed as
  * distributed column algebra: factor lookups are when() chains, the
  * per-(stop,hour) bucket fan-out is explode(sequence(0,99)), and every
  * stochastic term is a deterministic hash draw.
  *
  * CROSS-ENGINE EXACT (r11): the full 90k-row event table — not just its
  * noise-cancelling invariants — hash-checks against a DuckDB twin.
  * Three design rules make that possible:
  *
  *  1. draws come from md5 (both engines share the hash), first 12 hex
  *     digits over 2^48 — see [[hashUniform]];
  *  2. NO transcendental is ever evaluated at query time in either
  *     engine: normals are scaled Irwin–Hall sums of exact dyadic
  *     uniforms ([[hashNormal]]) and the within-hour bump is a 60-entry
  *     literal table precomputed on the JVM at build time
  *     ([[WithinHourTable]]) — so every query-time operation is exact
  *     IEEE arithmetic on identical bits. (The first form of this
  *     promotion used Box-Muller + round(·,9); ln/cos are not
  *     correctly-rounded, and an output within an ulp of a 0.5e-9 grid
  *     boundary could round differently per engine — at ~180k draws per
  *     verify, a small-but-real flake tail this design removes
  *     outright.);
  *  3. bucket weights are quantized to 1e-9 (stored as scaled longs), so
  *     the per-hour normalizing total is an INTEGER sum — order-free and
  *     engine-free, where a double sum would have re-introduced
  *     summation-order ulps. Weight resolution 1e-9 on weights of
  *     magnitude ~0.05-2.2 is far below the generator's own noise floor.
  *
  * Ref: src/dag/mock_passenger_flow_job.py:18-74,130-181.
  */
object MockFlow {

  val EventsPerHour = 100
  val IntervalMinutes = 1

  /** The generator's hourly context window: hourly weather LEFT JOIN the
    * per-hour average delay (the execution-hour context the reference
    * queries at mock_passenger_flow_job.py:109-121), bounded to the
    * first `limitHours` hours. ONE definition shared by the registry's
    * mockflow queries and jobs.JobRunner's generate_flow effect, so the
    * window rule cannot silently diverge between them.
    */
  def hoursContext(
      weatherHourly: DataFrame, delayHourly: DataFrame,
      limitHours: Int = 6): DataFrame =
    weatherHourly
      .join(delayHourly.groupBy("hour_ts")
        .agg(avg("avg_delay_seconds").as("avg_delay_seconds")),
        Seq("hour_ts"), "left")
      .orderBy("hour_ts").limit(limitHours)

  /** Weight quantum: weights live on a 1e-9 grid as scaled longs. */
  val WeightScale = 1000000000L

  /** G1 — time-of-day factor (6 bands). Ref: :18-25. */
  def timeFactor(hour: Column): Column =
    when(hour >= 6 && hour < 9, 1.9)
      .when(hour >= 9 && hour < 16, 1.0)
      .when(hour >= 16 && hour < 19, 2.1)
      .when(hour >= 19 && hour < 23, 0.8)
      .when(hour >= 23, 0.4)
      .otherwise(0.3) // 0-6

  /** G1 — day-of-week factor (Postgres DOW 0=Sunday). Ref: :27-30.
    * The reference keys Python weekday() (0=Monday); we take the
    * Postgres-DOW column produced by Cols.pgDow, so Saturday=6 → 0.6 maps
    * to pgDow 6=Saturday, Sunday 0 → 0.6? No: Python 5=Sat(0.75),
    * 6=Sun(0.6); pgDow: Sat=6, Sun=0.
    */
  def dowFactor(pgDow: Column): Column =
    when(pgDow === 6, 0.75) // Saturday
      .when(pgDow === 0, 0.6) // Sunday
      .otherwise(1.0)

  /** G1 — weather factor. Ref: :44-53. */
  def weatherFactor(temp: Column, rain: Column): Column =
    when(rain >= 5, 1.25)
      .when(rain >= 1, 1.15)
      .when(temp <= -5, 0.85)
      .when(temp >= 30, 0.9)
      .otherwise(1.0)

  /** G1 — delay factor. Ref: :56-63. */
  def delayFactor(delay: Column): Column =
    when(delay.isNull, 1.0)
      .when(delay > 600, 0.75)
      .when(delay > 300, 0.85)
      .otherwise(1.0)

  /** G3 — within-hour double-gaussian bump values (peaks at :00 and
    * :30) for minute 0..59, precomputed ONCE on the JVM: both engines
    * consume the same 60 double literals, so exp() never runs at query
    * time in either (cross-engine rule 2). Ref: :66-74.
    */
  private[graft] val WithinHourTable: Seq[Double] =
    (0 until 60).map { m =>
      val bump1 = math.exp((m * m) * -1.0 / (2.0 * 8 * 8))
      val m30 = m - 30
      val bump2 = math.exp((m30 * m30) * -1.0 / (2.0 * 10 * 10))
      0.7 + 0.7 * (bump1 + bump2)
    }

  def withinHourFactor(minute: Column): Column =
    element_at(typedLit(WithinHourTable), minute.cast("int") + 1)

  private def withinHourFactorSql(minuteExpr: String): String = {
    val lits = WithinHourTable
      .map(v => s"CAST('$v' AS DOUBLE)").mkString("[", ", ", "]")
    s"($lits)[CAST($minuteExpr AS BIGINT) + 1]"
  }

  /** Deterministic uniform(0,1): first 12 hex digits of
    * md5(seed|k1|k2|…) as a 48-bit integer over 2^48. md5 because BOTH
    * engines ship it — DuckDB recomputes the identical draw
    * ([[uniformSql]]), which is what lets the full event table be
    * oracle-checked instead of only aggregates the noise cancels out of
    * (the r10 form used Spark's engine-private xxhash64). Like any hash
    * draw — and unlike rand()/randn() — re-evaluation anywhere in the
    * plan and any partition layout yields the same value. The hex→int
    * conversion is explicit ascii arithmetic (TextOps.hexVal), the same
    * proven cross-engine form every HashSplit oracle uses.
    */
  private def hashUniform(seed: Long, cols: Column*): Column = {
    val h = md5(concat_ws("|", (lit(seed.toString) +: cols.map(_.cast("string"))): _*))
    // ONE md5 per draw: conv(hex12, 16, 10) is the same 48-bit integer
    // the per-digit ascii sum produces, but as a single call — the
    // 12-term substring form re-evaluated md5 per digit (codegen CSE
    // does not reach inside transform() lambdas), which cost ~2 minutes
    // on the 900k-bucket sf0.1 generate. The DuckDB twin keeps the
    // explicit digit arithmetic (no conv there); both sides land on the
    // identical integer, which the full-table oracle proves every run.
    conv(substring(h, 1, 12), 16, 10).cast("long")
      .cast("double") / lit((1L << 48).toDouble)
  }

  private[graft] def uniformSql(seed: Long, keys: Seq[String]): String = {
    val key = (s"'$seed'" +: keys.map(k => s"CAST($k AS VARCHAR)"))
      .mkString(" || '|' || ")
    val digits = (0 until 12)
      .map(j => s"CAST(${graft.text.TextOps.hexValSql(s"substr(md5($key), ${j + 1}, 1)")} AS BIGINT) * ${1L << (4 * (11 - j))}")
      .mkString(" + ")
    s"(($digits) / CAST(${1L << 48} AS DOUBLE))"
  }

  /** √2 · √(6/12)⁻¹-style scale for the 6-uniform Irwin–Hall sum: the
    * one irrational constant, computed once on the JVM and shared with
    * the SQL twin as a literal.
    */
  private val IhScale = math.sqrt(2.0)

  /** Deterministic ~N(0,1): scaled Irwin–Hall over SIX exact 48-bit
    * uniforms — (Σ uⱼ − 3) · √2. Chosen over Box-Muller because it
    * contains NO query-time transcendental: each uniform is an exact
    * dyadic rational k/2^48, every intermediate of the six-term sum is
    * exactly representable (< 2^51 scaled), the −3 is exact, and the √2
    * enters as a shared literal — so both engines compute identical
    * BITS with no round-after-transcendental seam (cross-engine rule
    * 2). Symmetric, variance 1, support [−3√2, 3√2] — the right shape
    * for synthetic demand noise, which only ever multiplies by 0.10 or
    * 0.12 before a clamp.
    */
  private def hashNormal(seed: Long, cols: Column*): Column =
    ((1 to 6).map(j => hashUniform(seed + j * 1000003L, cols: _*))
      .reduce(_ + _) - lit(3.0)) * lit(IhScale)

  private[graft] def normalSql(seed: Long, keys: Seq[String]): String = {
    val sum = (1 to 6).map(j => uniformSql(seed + j * 1000003L, keys))
      .mkString(" + ")
    s"((($sum) - CAST(3.0 AS DOUBLE)) * CAST('$IhScale' AS DOUBLE))"
  }

  /** G2+G3+G4 — generate minute-bucket passenger-flow events for each
    * (stop, hour): hourly demand = base × factors × (1 + N(0,0.10)),
    * distributed over 100 one-minute buckets by normalized noisy bump
    * weights (quantized — see object scaladoc), with a 9-key provenance
    * JSON per event AND the same provenance as typed columns (the typed
    * form is what the full-table oracle hashes; the JSON form is the
    * reference's G4 surface, verified through `mockflow_invariants`'
    * re-parse).
    *
    * @param stopBase stop_id, base_demand
    * @param hours    hour_ts (+ temperature_c, precipitation_mm,
    *                 avg_delay_seconds context columns, may be null)
    */
  def generate(stopBase: DataFrame, hours: DataFrame, seed: Long = 42L): DataFrame = {
    import graft.functions.Cols.pgDow
    val ctx = hours
      .withColumn("tf", timeFactor(hour(col("hour_ts"))))
      .withColumn("df", dowFactor(pgDow(col("hour_ts"))))
      .withColumn("wf", weatherFactor(col("temperature_c"), col("precipitation_mm")))
      .withColumn("rf", delayFactor(col("avg_delay_seconds")))
      // draws key on epoch SECONDS (hour_ts is hour-truncated): a bare
      // long renders identically in both engines' string concat, where
      // timestamp-to-text formatting would be one more seam to prove
      .withColumn("ep", unix_timestamp(col("hour_ts").cast("timestamp")))
    // ctx is hours-context-sized (small by contract) — broadcast it, else
    // the cartesian product re-evaluates the whole context pipeline once
    // per left-side partition (observed 8× wall-time at bench scale).
    val perStopHour = stopBase.crossJoin(broadcast(ctx))
      .withColumn("stop_noise",
        hashNormal(seed, col("stop_id"), col("ep")) * 0.10)
      .withColumn("hourly_demand",
        col("base_demand") * col("tf") * col("df") * col("wf") * col("rf") *
          (lit(1.0) + col("stop_noise")))
      .withColumn("hourly_passengers",
        greatest(lit(0), round(col("hourly_demand")).cast("int")))
    // Bucket weights as an ARRAY on the un-exploded row: the per-bucket
    // noisy bump weight is a pure function of (stop, hour, i), so the
    // 100 weights and their integer total are computed narrowly BEFORE
    // the fan-out and the normalizing total rides along through
    // posexplode. This keeps event synthesis a pure map end-to-end — no
    // shuffle — at any scale. minute(bucket_ts) ≡ i %% 60 (hour_ts is
    // hour-truncated and IntervalMinutes = 1). Weights are stored as
    // 1e9-scaled longs so the total is an order-free integer sum
    // (cross-engine seam rule 3).
    val wArr = transform(sequence(lit(0), lit(EventsPerHour - 1)), i =>
      round(greatest(lit(0.05),
        withinHourFactor(i % 60) *
          (lit(1.0) + hashNormal(seed + 7L, col("stop_id"), col("ep"), i) * 0.12))
        * WeightScale.toDouble).cast("long"))
    val buckets = perStopHour
      .withColumn("ws", wArr)
      .withColumn("total_w",
        aggregate(col("ws"), lit(0L), (a, x) => a + x))
      .select(col("*"), posexplode(col("ws")).as(Seq("i", "w")))
      .withColumn("bucket_ts",
        col("hour_ts") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
          col("i") * IntervalMinutes))
      // the de-quantized weight doubles (exact: scaled long → double →
      // one division, identical bits in both engines)
      .withColumn("bucket_weight",
        col("w").cast("double") / WeightScale.toDouble)
      .withColumn("total_weight",
        col("total_w").cast("double") / WeightScale.toDouble)
    buckets
      .withColumn("estimated_passengers",
        greatest(lit(0),
          round(col("hourly_passengers") *
            (col("w").cast("double") / col("total_w").cast("double"))).cast("int")))
      .select(
        col("stop_id"),
        col("bucket_ts").as("observed_at"),
        col("estimated_passengers"),
        // G4 — components provenance JSON (9 fixed keys). Ref: :172-181.
        to_json(struct(
          col("base_demand"),
          col("tf").as("time_factor"),
          col("df").as("dow_factor"),
          col("wf").as("weather_factor"),
          col("rf").as("delay_factor"),
          col("stop_noise"),
          col("hourly_passengers"),
          col("bucket_weight"),
          col("total_weight"))).as("components"),
        // typed provenance — the columns the full-table oracle hashes.
        // hour_ts rides along because (stop_id, observed_at) alone is
        // NOT a unique key: buckets 60-99 of hour H land on the same
        // minutes as buckets 0-39 of hour H+1, so a deterministic total
        // order needs the source hour
        col("hour_ts"),
        col("base_demand"),
        col("tf").as("time_factor"),
        col("df").as("dow_factor"),
        col("wf").as("weather_factor"),
        col("rf").as("delay_factor"),
        col("stop_noise"),
        col("hourly_passengers"),
        col("bucket_weight"),
        col("total_weight"))
  }

  /** DuckDB twin of [[generate]] at FULL event grain — every draw, every
    * weight, every rounding recomputed in SQL. Emitted as a CTE-chain
    * continuation: the caller supplies two preceding CTEs named `hrs`
    * (hour_ts, temperature_c, precipitation_mm, avg_delay_seconds) and
    * `base` (stop_id, base_demand) and appends this string, which adds
    * the factor/bucket CTEs and the final SELECT (same columns and order
    * as the `mockflow_events` registration).
    */
  private[graft] def eventsSqlTail(seed: Long = 42L): String = {
    val whf = withinHourFactorSql("i % 60")
    val bumpNoise = normalSql(seed + 7L, Seq("stop_id", "ep", "i"))
    val stopNoise = normalSql(seed, Seq("stop_id", "ep"))
    s"""fac AS (
       |  SELECT hour_ts, CAST(epoch(hour_ts) AS BIGINT) AS ep,
       |    ${timeFactorSql("hour_ts")} AS tf,
       |    ${dowFactorSql("hour_ts")} AS df,
       |    ${weatherFactorSql("temperature_c", "precipitation_mm")} AS wf,
       |    ${delayFactorSql("avg_delay_seconds")} AS rf
       |  FROM hrs),
       |sh AS (
       |  SELECT b.stop_id, b.base_demand, f.*,
       |    $stopNoise * CAST(0.1 AS DOUBLE) AS stop_noise
       |  FROM base b CROSS JOIN fac f),
       |shd AS (
       |  SELECT *,
       |    base_demand * tf * df * wf * rf * (CAST(1.0 AS DOUBLE) + stop_noise) AS hourly_demand
       |  FROM sh),
       |shp AS (
       |  SELECT *,
       |    CAST(GREATEST(0, CAST(round(hourly_demand) AS INTEGER)) AS INTEGER) AS hourly_passengers
       |  FROM shd),
       |bw AS (
       |  SELECT shp.*, r.i,
       |    CAST(round(GREATEST(CAST(0.05 AS DOUBLE),
       |      $whf * (CAST(1.0 AS DOUBLE) + $bumpNoise * CAST(0.12 AS DOUBLE)))
       |      * CAST($WeightScale AS DOUBLE)) AS BIGINT) AS w
       |  FROM shp CROSS JOIN (SELECT CAST(range AS BIGINT) AS i
       |                       FROM range(0, $EventsPerHour)) r),
       |tw AS (
       |  SELECT *, SUM(w) OVER (PARTITION BY stop_id, ep) AS total_w
       |  FROM bw)
       |SELECT stop_id,
       |  hour_ts + to_minutes(CAST(i * $IntervalMinutes AS BIGINT)) AS observed_at,
       |  CAST(GREATEST(0, CAST(round(hourly_passengers *
       |    (CAST(w AS DOUBLE) / CAST(total_w AS DOUBLE))) AS INTEGER)) AS INTEGER)
       |    AS estimated_passengers,
       |  hour_ts,
       |  base_demand,
       |  tf AS time_factor, df AS dow_factor, wf AS weather_factor, rf AS delay_factor,
       |  stop_noise,
       |  hourly_passengers,
       |  CAST(w AS DOUBLE) / CAST($WeightScale AS DOUBLE) AS bucket_weight,
       |  CAST(total_w AS DOUBLE) / CAST($WeightScale AS DOUBLE) AS total_weight
       |FROM tw
       |ORDER BY stop_id, hour_ts, observed_at""".stripMargin
  }

  // G1 factor tables as SQL (same CASE bodies the invariants oracle has
  // always used — kept here so the full-table twin shares one source)
  private[graft] def timeFactorSql(ts: String): String =
    s"""CAST(CASE WHEN EXTRACT(HOUR FROM $ts) >= 6 AND EXTRACT(HOUR FROM $ts) < 9 THEN 1.9
       |          WHEN EXTRACT(HOUR FROM $ts) >= 9 AND EXTRACT(HOUR FROM $ts) < 16 THEN 1.0
       |          WHEN EXTRACT(HOUR FROM $ts) >= 16 AND EXTRACT(HOUR FROM $ts) < 19 THEN 2.1
       |          WHEN EXTRACT(HOUR FROM $ts) >= 19 AND EXTRACT(HOUR FROM $ts) < 23 THEN 0.8
       |          WHEN EXTRACT(HOUR FROM $ts) >= 23 THEN 0.4
       |          ELSE 0.3 END AS DOUBLE)""".stripMargin

  private[graft] def dowFactorSql(ts: String): String =
    s"""CAST(CASE WHEN EXTRACT(dow FROM $ts) = 6 THEN 0.75
       |          WHEN EXTRACT(dow FROM $ts) = 0 THEN 0.6
       |          ELSE 1.0 END AS DOUBLE)""".stripMargin

  private[graft] def weatherFactorSql(temp: String, rain: String): String =
    s"""CAST(CASE WHEN $rain >= 5 THEN 1.25
       |          WHEN $rain >= 1 THEN 1.15
       |          WHEN $temp <= -5 THEN 0.85
       |          WHEN $temp >= 30 THEN 0.9
       |          ELSE 1.0 END AS DOUBLE)""".stripMargin

  private[graft] def delayFactorSql(delay: String): String =
    s"""CAST(CASE WHEN $delay IS NULL THEN 1.0
       |          WHEN $delay > 600 THEN 0.75
       |          WHEN $delay > 300 THEN 0.85
       |          ELSE 1.0 END AS DOUBLE)""".stripMargin

  /** A8 — base-demand seeding from observed stop activity:
    * LEAST(50, GREATEST(5, n*3)). Ref: initdb/init-postgis.sql:170-176.
    */
  def seedBaseDemand(events: DataFrame): DataFrame =
    events.groupBy("stop_id")
      .agg(count(lit(1)).as("n"))
      .select(col("stop_id"),
        least(lit(50L), greatest(lit(5L), col("n") * 3)).as("base_demand"))
}
