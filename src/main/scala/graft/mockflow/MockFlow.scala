package graft.mockflow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synthetic passenger-flow generator (SURVEY.md §2.10 G1-G4) — the
  * reference's per-stop/hour/minute-bucket event simulator re-expressed as
  * distributed column algebra: factor lookups are when() chains, the
  * per-(stop,hour) bucket fan-out is explode(sequence(0,99)), the bucket
  * weight normalization is a window sum over the bucket partition, and the
  * noise terms are seeded randn/rand (deterministic per partition layout —
  * pin partitioning before generating when reproducibility matters,
  * SURVEY §7.4 item 7).
  *
  * Ref: src/dag/mock_passenger_flow_job.py:18-74,130-181.
  */
object MockFlow {

  val EventsPerHour = 100
  val IntervalMinutes = 1

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

  /** G3 — within-hour double-gaussian bump (peaks at :00 and :30).
    * Ref: :66-74.
    */
  def withinHourFactor(minute: Column): Column = {
    val bump1 = exp((minute * minute) * -1.0 / (2.0 * 8 * 8))
    val m30 = minute - 30
    val bump2 = exp((m30 * m30) * -1.0 / (2.0 * 10 * 10))
    lit(0.7) + lit(0.7) * (bump1 + bump2)
  }

  /** G2+G3+G4 — generate minute-bucket passenger-flow events for each
    * (stop, hour): hourly demand = base × factors × (1 + N(0,0.10)),
    * distributed over 100 one-minute buckets by normalized noisy bump
    * weights, with a 9-key provenance JSON per event.
    *
    * @param stopBase stop_id, base_demand
    * @param hours    hour_ts (+ temperature_c, precipitation_mm,
    *                 avg_delay_seconds context columns, may be null)
    */
  /** Deterministic uniform(0,1) from a hashed key: 48 bits of
    * xxhash64 — unlike rand()/randn(), re-evaluation anywhere in the plan
    * (projection vs. window aggregate) and any partition layout yield the
    * same draw, which both fixes the classic non-deterministic-expression
    * double-evaluation hazard and makes fixtures reproduce exactly
    * (SURVEY §7.4 item 7). xxhash64 is codegen'd and hashes native values
    * directly (no md5-hex string round-trip in the hot path).
    */
  private def hashUniform(seed: Long, cols: Column*): Column =
    pmod(xxhash64((lit(seed) +: cols): _*), lit(1L << 48)).cast("double") /
      lit((1L << 48).toDouble)

  /** Deterministic N(0,1) via Box-Muller over two hash uniforms. */
  private def hashNormal(seed: Long, cols: Column*): Column = {
    val u1 = hashUniform(seed, cols: _*)
    val u2 = hashUniform(seed + 1000003L, cols: _*)
    sqrt(lit(-2.0) * log(greatest(u1, lit(1e-12)))) *
      cos(lit(2.0 * math.Pi) * u2)
  }

  def generate(stopBase: DataFrame, hours: DataFrame, seed: Long = 42L): DataFrame = {
    import graft.functions.Cols.{pgDow, clamp => _, _}
    val ctx = hours
      .withColumn("tf", timeFactor(hour(col("hour_ts"))))
      .withColumn("df", dowFactor(pgDow(col("hour_ts"))))
      .withColumn("wf", weatherFactor(col("temperature_c"), col("precipitation_mm")))
      .withColumn("rf", delayFactor(col("avg_delay_seconds")))
    // ctx is hours-context-sized (small by contract) — broadcast it, else
    // the cartesian product re-evaluates the whole context pipeline once
    // per left-side partition (observed 8× wall-time at bench scale).
    val perStopHour = stopBase.crossJoin(broadcast(ctx))
      .withColumn("stop_noise",
        hashNormal(seed, col("stop_id"), col("hour_ts")) * 0.10)
      .withColumn("hourly_demand",
        col("base_demand") * col("tf") * col("df") * col("wf") * col("rf") *
          (lit(1.0) + col("stop_noise")))
      .withColumn("hourly_passengers",
        greatest(lit(0), round(col("hourly_demand")).cast("int")))
    // Bucket weights as an ARRAY on the un-exploded row: the per-bucket
    // noisy bump weight is a pure function of (stop, hour, i), so the
    // 100 weights and their sum are computed narrowly (transform +
    // aggregate, ascending-i left-assoc — the same addition order the
    // old window sum produced) BEFORE the fan-out, and the normalizing
    // total rides along through posexplode. This removes the generator's
    // only shuffle (the (stop,hour) window): event synthesis is now a
    // pure map end-to-end, at any scale. minute(bucket_ts) ≡ i %% 60
    // (hour_ts is hour-truncated and IntervalMinutes = 1).
    val wArr = transform(sequence(lit(0), lit(EventsPerHour - 1)), i =>
      greatest(lit(0.05),
        withinHourFactor(i % 60) *
          (lit(1.0) + hashNormal(seed + 7L, col("stop_id"), col("hour_ts"), i) * 0.12)))
    val buckets = perStopHour
      .withColumn("ws", wArr)
      .withColumn("total_w",
        aggregate(col("ws"), lit(0.0), (a, x) => a + x))
      .select(col("*"), posexplode(col("ws")).as(Seq("i", "w")))
      .withColumn("bucket_ts",
        col("hour_ts") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
          col("i") * IntervalMinutes))
    buckets
      .withColumn("estimated_passengers",
        greatest(lit(0),
          round(col("hourly_passengers") * (col("w") / col("total_w"))).cast("int")))
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
          col("w").as("bucket_weight"),
          col("total_w").as("total_weight"))).as("components"))
  }

  /** A8 — base-demand seeding from observed stop activity:
    * LEAST(50, GREATEST(5, n*3)). Ref: initdb/init-postgis.sql:170-176.
    */
  def seedBaseDemand(events: DataFrame): DataFrame =
    events.groupBy("stop_id")
      .agg(count(lit(1)).as("n"))
      .select(col("stop_id"),
        least(lit(50L), greatest(lit(5L), col("n") * 3)).as("base_demand"))
}
