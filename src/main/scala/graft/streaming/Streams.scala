package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.Trigger

import graft.views.Hourly

/** Open-session state for [[Streams.closedSessionsStream]]: value sum
  * kept in exact integer micro-units so emission order can never perturb
  * it. Top-level (not nested in the object) so the state encoder's
  * generated code can construct it.
  */
private[streaming] case class OpenSess(startUs: Long, lastUs: Long, n: Long, sumMicros: Long)

/** Structured-Streaming re-expression of the reference's realtime path
  * (SURVEY.md §2.11, §3.2): file-source micro-batches stand in for the
  * Kafka topics (same envelope → normalize → aggregate/upsert shape; a
  * production deployment swaps `readStream.parquet` for
  * `readStream.format("kafka")` + from_json — everything downstream is
  * unchanged).
  *
  * Delivery semantics: checkpointed sources + idempotent/latest-wins
  * foreachBatch sinks reproduce the reference's at-least-once + PK-upsert
  * behavior (ingestor.py:38,71,100-133) with exactly-once file output.
  *
  * The streaming aggregations run with Trigger.AvailableNow and complete
  * output into a memory sink so they can be verified against the *batch*
  * DuckDB oracle — the strongest check available: stream and batch answers
  * must be bit-identical. At 100 TB the same pipelines run in update mode
  * with watermarks into a keyed store; the transformation code is shared.
  */
object Streams {

  // One staged copy per source dir per JVM: repeated stream queries over
  // the same testdata (Bench runs two streaming queries; Verify may rerun)
  // must not pay — or time — a fresh multi-GB file copy each call.
  private val stagedDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Streaming read of the events table (schema pinned from a batch read —
    * file streams require an explicit schema).
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file source requires a directory; stage the single parquet file
    // into a temp dir once (a production pipeline streams a landing
    // directory or Kafka — this is test plumbing only).
    val staged = stagedDirs.getOrElseUpdate(dir, {
      val d = Files.createTempDirectory("graft_events_stream")
      Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
        d.resolve("events.parquet"))
      d.toString
    })
    spark.readStream.schema(schema).parquet(staged)
  }

  private def ntzFromNanos(c: org.apache.spark.sql.Column) =
    graft.functions.Cols.ntzFromNanos(c)

  /** Stateful-shuffle width for streaming queries. Stateful operators
    * (stream-stream joins, windowed aggs, dedup, [flat]MapGroupsWithState)
    * instantiate one state store PER shuffle partition PER operator —
    * stream-stream joins four of them — and every micro-batch pays each
    * store's fixed cost (delta-file commit, snapshot maintenance,
    * version bookkeeping) regardless of how many rows it holds. Sizing
    * this to the batch `shuffle.partitions` (= cores) is wrong in both
    * directions: the keyed state here is hour-bucket / user-grained
    * (bounded cardinality), so extra partitions add store overhead
    * without parallelism — measured 8.1 s → 3.2 s on the sf0.1
    * stream-stream join going 32 → 8. On a real cluster this is the
    * knob you size to state VOLUME (rows × bytes per partition), not to
    * core count; override via SPARK_GRAFT_STREAM_PARTS.
    */
  private val StreamParts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")

  /** The session's batch shuffle width, captured before any streaming
    * override so concurrent runToTable calls (Verify's thread pool)
    * restore the true baseline rather than each other's override.
    */
  private val batchParts = new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Run a streaming DF to completion (AvailableNow) into a memory sink
    * and return the final table. Shuffle width is pinned to
    * [[StreamParts]] for the duration (a streaming query locks its
    * state partitioning at first start, so the narrow setting follows
    * the stream; concurrent batch planning meanwhile sees at worst the
    * narrower width, which affects layout only, never results).
    */
  private[streaming] def runToTable(df: DataFrame, mode: String): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val base = batchParts.computeIfAbsent(spark, s => s.conf.get(key))
    val name = "graft_stream_" + UUID.randomUUID.toString.replace("-", "")
    spark.conf.set(key, StreamParts)
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, base)
    spark.table(name)
  }

  /** A3 as a stream: hourly vehicle-event counts — identical to the batch
    * view (same Hourly.vehicleHourly code), verified against the same
    * oracle SQL.
    */
  def vehicleHourlyStream(spark: SparkSession, dir: String): DataFrame = {
    val veh = eventsStream(spark, dir).select(
      col("event_type").as("route_id"),
      col("user_id").cast("string").as("vehicle_id"),
      ntzFromNanos(col("ts")).as("observed_at"))
    runToTable(Hourly.vehicleHourly(veh), mode = "complete")
      .select(col("route_id"), col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        col("vehicle_events"))
      .orderBy("route_id", "hour_ts")
  }

  /** S5 as a stream: the Kafka producer's JSON wire record built on a
    * live stream — stateless per-row column algebra in APPEND mode (no
    * state at all: the cheapest streaming shape; a production deploy
    * points the same plan at `writeStream.format("kafka")` with
    * kafka_key/kafka_value as key/value). Identical code to the batch
    * envelope ([[Envelope.producerEnvelopeCols]]), verified against the
    * same byte-level oracle.
    */
  def kafkaEnvelopeStream(spark: SparkSession, dir: String): DataFrame =
    runToTable(Envelope.producerEnvelopeCols(eventsStream(spark, dir)), mode = "append")
      .orderBy("event_id")

  /** S7 as a stream: the Open-Meteo render→parse leg running append-mode
    * over the event stream — stateless schema-on-read, so the streaming
    * result is row-identical to the batch twin (which is the oracle).
    */
  def weatherIngestStream(spark: SparkSession, dir: String): DataFrame =
    runToTable(graft.ingest.OpenMeteo.weatherIngestCols(eventsStream(spark, dir)),
      mode = "append")
      .orderBy("event_id")

  /** A3 with event-time windows + watermark in update mode — the bounded-
    * state streaming shape for 100 TB feeds: the watermark lets Spark
    * evict window state older than the lateness bound instead of keeping
    * every window forever (the complete-mode twin keeps all state), and
    * update mode emits per-batch deltas. Counts are monotone, so the
    * final answer per window is its largest emission — reduced with a
    * deterministic max. With the testdata's in-order feed nothing is
    * late-dropped, so the result equals the batch aggregation, which is
    * the oracle.
    */
  def vehicleHourlyWindowedStream(spark: SparkSession, dir: String): DataFrame = {
    val veh = eventsStream(spark, dir).select(
      col("event_type").as("route_id"),
      ntzFromNanos(col("ts")).cast("timestamp").as("observed_at"))
    val agg = veh
      .withWatermark("observed_at", "2 hours")
      .groupBy(col("route_id"), window(col("observed_at"), "1 hour"))
      .agg(count(lit(1)).as("vehicle_events"))
      .select(col("route_id"), col("window.start").as("hour_ts"), col("vehicle_events"))
    runToTable(agg, mode = "update")
      .groupBy("route_id", "hour_ts")
      .agg(max("vehicle_events").as("vehicle_events"))
      .select(col("route_id"), col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        col("vehicle_events"))
      .orderBy("route_id", "hour_ts")
  }

  /** Stream-stream inner join with watermark-bounded state — the shape a
    * realtime enrichment (vehicle positions ⋈ co-temporal weather
    * extremes) takes when BOTH inputs are unbounded feeds: watermarks on
    * the two event-time columns plus an hour-bucket equality AND a ±1 h
    * range condition let Spark key the join state by hour bucket and
    * evict a bucket once both watermarks pass it, so state stays bounded
    * no matter how long the streams run. Inner joins emit eagerly (no
    * watermark-finalization delay), so the AvailableNow pass over the
    * in-order test feed yields exactly the batch join — the oracle. The
    * ±1 h range predicate is implied by hour-bucket equality, so it
    * changes no results; it exists to hand the state-eviction bound to
    * the stream planner.
    */
  def vehicleWeatherJoinStream(spark: SparkSession, dir: String): DataFrame = {
    val veh = eventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(
        col("user_id").cast("string").as("vehicle_id"),
        ntzFromNanos(col("ts")).cast("timestamp").as("observed_at"))
      .withWatermark("observed_at", "2 hours")
    val wea = eventsStream(spark, dir)
      .filter(col("value") > 200.0)
      .select(
        ntzFromNanos(col("ts")).cast("timestamp").as("weather_at"),
        col("value").as("temperature_c"))
      .withWatermark("weather_at", "2 hours")
    val joined = veh.join(
      wea,
      date_trunc("hour", col("observed_at")) === date_trunc("hour", col("weather_at")) &&
        col("weather_at") >= col("observed_at") - expr("INTERVAL 1 HOUR") &&
        col("weather_at") <= col("observed_at") + expr("INTERVAL 1 HOUR"))
    runToTable(joined, mode = "append")
      .select(
        col("vehicle_id"),
        col("observed_at").cast("timestamp_ntz").as("observed_at"),
        col("weather_at").cast("timestamp_ntz").as("weather_at"),
        col("temperature_c"))
      .orderBy("vehicle_id", "observed_at", "weather_at", "temperature_c")
  }

  /** §2.11 custom state: per-user running profile (event count + latest
    * event time) via KeyValueGroupedDataset.mapGroupsWithState — the
    * arbitrary-state operator for logic windowed aggs can't express.
    * State per key is one (count, max_ts) pair; both updates are
    * order-independent, so emissions are deterministic whatever the
    * within-group iterator order. Update-mode emissions accumulate in the
    * sink; the final per-user row is the emission with the largest count
    * (monotone), which for a single availableNow pass equals the batch
    * GROUP BY — the oracle.
    */
  def userStateStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val ev = eventsStream(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        ntzFromNanos(col("ts")).cast("timestamp").as("ts"))
      .as[(Long, java.sql.Timestamp)]
    val updated = ev
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, java.sql.Timestamp), (Long, Long, java.sql.Timestamp)](
        GroupStateTimeout.NoTimeout) { (user, events, state) =>
        var (n, maxTs) = state.getOption.getOrElse((0L, new java.sql.Timestamp(0L)))
        events.foreach { e =>
          n += 1
          if (e._2.after(maxTs)) maxTs = e._2
        }
        state.update((n, maxTs))
        (user, n, maxTs)
      }
      .toDF("user_id", "n_events", "last_ts")
    runToTable(updated, mode = "update")
      .groupBy("user_id")
      // n_events is monotone per user; max(struct) picks the newest
      // emission and its timestamp together
      .agg(max(struct(col("n_events"), col("last_ts"))).as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"),
        col("s.last_ts").cast("timestamp_ntz").as("last_ts"))
      .orderBy("user_id")
  }

  /** Gap-based sessionization as a STREAM via the native session_window
    * operator — the stateful form of rel.Sessionize: Spark keeps one
    * mergeable window per (user, open session), extends it while events
    * arrive within the gap, and the watermark bounds how long a session
    * can stay open (state eviction — the property that makes this run
    * forever on an unbounded feed, where the batch form needs the whole
    * timeline).
    *
    * session_window closes a session when the next event is ≥ gap after
    * the previous (batch Sessionize uses strict >); the oracle SQL below
    * mirrors the ≥ form exactly, so the check does not depend on the two
    * conventions agreeing on boundary-exact gaps.
    */
  def sessionizedStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Cols.detSum
    val ev = eventsStream(spark, dir).select(
      col("user_id"),
      ntzFromNanos(col("ts")).cast("timestamp").as("ts"),
      col("value"))
    val agg = ev
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        detSum(col("value")).as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
    // session_window aggregations stream in append (watermark-finalized —
    // the unbounded production mode) or complete; update is unsupported.
    // Complete over the finite AvailableNow input yields exactly the
    // final sessions; on an unbounded feed switch to append and let the
    // watermark close sessions.
    runToTable(agg, mode = "complete")
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** A1 as a stream-static join: the streaming passenger-flow events are
    * enriched against the (static, broadcast-sized) stop→route mapping
    * BEFORE the demand aggregation — the canonical enrichment shape for
    * unbounded feeds. The static side is a plain batch frame: Spark
    * re-resolves it per micro-batch, so a dim refresh is picked up
    * without restarting the stream, and at fact scale the join stays a
    * broadcast-hash join with no shuffle of the stream. Transformation
    * code is the batch view itself (Hourly.passengerDemandHourly), so
    * stream and batch answers are bit-identical — the batch demand
    * oracle checks the streaming result.
    */
  def demandHourlyStream(spark: SparkSession, dir: String): DataFrame = {
    val flow = eventsStream(spark, dir).select(
      col("user_id").cast("string").as("stop_id"),
      ntzFromNanos(col("ts")).as("observed_at"),
      col("value").as("estimated_passengers"))
    val s2r = graft.TestdataAdapter.stopToRouteMapping(spark, dir)
    runToTable(graft.views.Hourly.passengerDemandHourly(flow, s2r), mode = "complete")
      .select(col("route_id"), col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        col("passengers"))
      .orderBy("route_id", "hour_ts")
  }

  /** S9 as a true stream: at-least-once delivery deduplicated to
    * exactly-once output. The same events file is staged TWICE into the
    * source directory — a redelivered batch — and streaming
    * dropDuplicates keyed on event_id suppresses the second copy
    * (keyed state; at 100 TB bound it with
    * dropDuplicatesWithinWatermark so state ages out with event time).
    * The per-type counts over the deduped output equal the batch GROUP
    * BY over the ORIGINAL single-copy table — the oracle — proving
    * redelivery doubled nothing. Ref: ingestor.py:38,71 (ON CONFLICT DO
    * NOTHING under at-least-once Kafka delivery).
    */
  def exactlyOnceDedupStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val staged = Files.createTempDirectory("graft_dup_stream")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events_a.parquet"))
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events_b.parquet"))
    val deduped = spark.readStream.schema(schema).parquet(staged.toString)
      .select(col("event_id"), col("event_type"))
      .dropDuplicates("event_id")
    runToTable(deduped, mode = "append")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** The 100 TB form of [[exactlyOnceDedupStream]]: dedup state BOUNDED
    * by an event-time watermark instead of growing forever. Plain
    * streaming dropDuplicates keeps every seen key in state for the
    * life of the query — untenable on an unbounded stream;
    * dropDuplicatesWithinWatermark ages keys out once the watermark
    * passes them, so state size tracks the delay window (here 2 h of
    * event time), not stream history. Redelivered copies land within
    * the window, so the exactly-once contract — per-type counts equal
    * the batch GROUP BY over the single-copy table — holds unchanged,
    * and the oracle is the same.
    */
  def dedupWatermarkStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val staged = Files.createTempDirectory("graft_dupwm_stream")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events_a.parquet"))
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events_b.parquet"))
    val deduped = spark.readStream.schema(schema).parquet(staged.toString)
      .select(col("event_id"), col("event_type"),
        ntzFromNanos(col("ts")).cast("timestamp").as("observed_at"))
      .withWatermark("observed_at", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    runToTable(deduped, mode = "append")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** S10 as a stream: latest-wins upsert via checkpointed foreachBatch
    * merge-by-rewrite — each micro-batch unions the sink state with the
    * batch, keeps row_number()=1 per PK ordered by recency, and rewrites.
    * Returns the final sink state. Ref: ingestor.py:100-103,128-133.
    */
  def upsertLatestWinsStream(spark: SparkSession, dir: String): DataFrame = {
    val sink = Files.createTempDirectory("graft_upsert_sink").toString
    val checkpoint = Files.createTempDirectory("graft_upsert_ckpt").toString
    val ev = eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
    // Driver-side pointer to the current state version: each batch reads
    // version N, writes N+1 (never overwriting what it reads). A durable
    // deployment persists this pointer (e.g. a _latest marker file or a
    // table catalog); the checkpoint already makes batch replay safe since
    // the merge is idempotent.
    var current: Option[String] = None
    val q = ev.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val existing = current
          .map(p => s.read.parquet(p))
          .getOrElse(s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema))
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)
        val next = s"$sink/v$batchId"
        existing.unionByName(batch)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
          .write.mode("overwrite").parquet(next)
        current = Some(next)
        ()
      }
      .start()
    q.awaitTermination()
    val state = spark.read.parquet(current.getOrElse(
      sys.error("streaming upsert produced no batches")))
    state.select(col("user_id"), col("event_type"), col("event_id"),
      ntzFromNanos(col("ts")).as("ts"), col("value"))
      .orderBy("user_id", "event_type")
  }

  /** Incremental view maintenance as a TRUE multi-batch stream
    * (rel.Incremental exercised the way a 100 TB deployment runs it):
    * the events are staged as two disjoint files, consumed one file per
    * micro-batch, and foreachBatch STORES each batch's partial aggregate
    * (count + exact decimal sum per (event_type, hour)) as its own
    * delta; the published view merges the deltas — history is never
    * rescanned and per-batch state writes are batch-sized (see the
    * write-strategy comment below for the design space). The final
    * view must equal a from-scratch recompute over all raw rows — the
    * same oracle SQL the in-plan `incremental_hourly_merge` twin
    * verifies against, so batch-split associativity is proven across
    * REAL micro-batch boundaries, not just a planner-internal split.
    * Ref contrast: build-kpi-job.py:194 recomputes views from full
    * history every read — this is the scale path it lacks.
    */
  def incrementalHourlyStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.rel.Incremental
    val ev = graft.TestdataAdapter.userEvents(spark, dir)
      .select(col("event_type"), col("observed_at"), col("value"))
    val staged = Files.createTempDirectory("graft_incr_stream").toString
    // two disjoint halves (parity of the value in thousandths mixes hours
    // across batches, so merging is exercised on shared group keys, not
    // disjoint ones). coalesce() null-safes the split key: a NULL value
    // would make BOTH parity predicates null and silently drop the row
    // from both halves while the oracle's COUNT(*) still counts it.
    val parity = coalesce(col("value") * 1000 % 2, lit(0))
    ev.filter(parity === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$staged/half_a")
    ev.filter(parity =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$staged/half_b")
    val sink = Files.createTempDirectory("graft_incr_state").toString
    // State write strategy (r10): each batch appends ONLY its own partial
    // aggregate as `delta_b{N}` — O(batch-groups) written per batch —
    // and the published view is a merge-on-read over the deltas
    // (mergePartials is associative, so delta-sum ≡ one partial over all
    // raw rows, which is what the oracle proves). The two rejected
    // alternatives, for the record: a versioned FULL partials rewrite
    // per batch is replay-safe but pays O(state) per batch (the shape
    // this replaced); an IN-PLACE merge via dynamic partition overwrite
    // (rel.Scale.overwriteHourPartitions — the batch-compaction writer)
    // is the cheapest read path but is NOT replay-idempotent on plain
    // parquet — a redelivered batch would double-merge into partitions
    // that already absorbed it, the exact hazard a transactional table
    // format exists to close. Delta-append is replay-idempotent for
    // free: a redelivered batch N just overwrites its own delta_b{N}
    // with identical content. A deployment periodically compacts deltas
    // into the hour-partitioned serving table with
    // overwriteHourPartitions(merged touched hours) — the same
    // mergePartials doing the folding.
    val q = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staged/half_*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_incr_ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Incremental.hourlyPartial(batch)
          .coalesce(1) // partials are groups-sized; one file per batch
          .write.mode("overwrite").parquet(s"$sink/delta_b$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    val deltas = Option(new java.io.File(sink).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("delta_b"))
      .map(_.getAbsolutePath).sorted
    require(deltas.nonEmpty, "incremental stream produced no batches")
    Incremental.finalizeHourly(
      Incremental.mergePartials(Seq(spark.read.parquet(deltas: _*))))
  }

  /** Continuous-ingest dedup: the maintained exact-dedup index
    * (dedup.Dedup.{buildDedupIndex, bloomNewDocsIncremental,
    * mergeDedupIndex}) driven by a REAL micro-batch stream — each
    * arriving document batch is classified against the persisted
    * bloom + hash state and then folded into it, exactly the shape a
    * 100 TB ingest pipeline runs (per-batch cost never rescans the
    * corpus; state grows by the batch's distinct hashes). Two staged
    * files with pinned modification times make the batch order — and
    * therefore the verdicts — deterministic; the oracle recomputes
    * both classifications from the raw table.
    */
  def dedupIndexStream(
      spark: SparkSession, dir: String,
      stateDir: Option[String] = None): DataFrame = {
    import graft.dedup.Dedup
    val docs = graft.TestdataAdapter.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val staged = Files.createTempDirectory("graft_dedup_stream").toString
    docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$staged/in/batch_a")
    docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$staged/in/batch_b")
    // the file source orders batches by modification time — pin it so
    // batch_a is always micro-batch 0. TEST-HARNESS DEVICE ONLY: mtime +
    // maxFilesPerTrigger is not a production ordering contract (mtimes
    // are writer-controlled and clock-skewed across a fleet); a real
    // deployment orders on the queue offsets it already has (GraftQueue
    // exposes them), where batch order is the broker's commit order.
    import java.nio.file.attribute.FileTime
    Seq("batch_a" -> 0L, "batch_b" -> 60000L).foreach { case (n, off) =>
      val d = java.nio.file.Paths.get(s"$staged/in/$n")
      java.nio.file.Files.list(d).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p, FileTime.fromMillis(1700000000000L + off)))
      java.nio.file.Files.setLastModifiedTime(d, FileTime.fromMillis(1700000000000L + off))
    }
    // stateDir may be a caller-provided CACHED dir (registry: one per
    // scale dir per query per JVM): v0 — the corpus bootstrap, the one
    // expensive part — seeds only if absent, so repeated runs time the
    // per-batch classify/merge steady state, exactly like a deployment
    // that maintains the index instead of rebuilding it. v1+/verdicts
    // are deterministic overwrites, checkpoint is fresh per run.
    runDedupIndexStream(spark, docs.schema, corpus, s"$staged/in/batch_*",
      stateDir.getOrElse(s"$staged/state"), s"$staged/verdicts",
      Files.createTempDirectory("graft_dedup_ckpt").toString)
    spark.read.parquet(s"$staged/verdicts/*")
      .drop("is_new_bloom", "h")
      .orderBy("doc_id")
  }

  /** [[dedupIndexStream]] under the PRODUCTION ordering contract: the
    * document batches are produced to a `graftqueue` topic (two
    * committed segments), and the consumer drains them as offset-ordered
    * micro-batches via the source's Kafka-style admission control
    * (`maxRecordsPerTrigger` — each trigger admits whole segments, so
    * batch order IS the broker's commit order; no mtime pinning
    * anywhere). The docs ride the queue as JSON envelopes and round-trip
    * exactly (strings escape-roundtrip, BIGINTs are lossless), so the
    * verdicts — and the oracle — are the SAME as the file-staged form.
    * Produce calls are sequential Spark jobs, so segment commit stamps
    * strictly increase; offsets follow committed-segment order.
    */
  /** Stage the two-batch continuous-ingest split onto a fresh
    * `graftqueue` topic — SHARED by the exact-hash and LSH index
    * streams, so the envelope JSON, wire schema, admission-control
    * option and batch predicates (which must stay in lockstep with BOTH
    * registered oracles' predicates) live in exactly one place.
    * Returns (offset-ordered document stream, corpus, staged root).
    */
  private def stageDocQueue(
      spark: SparkSession, dir: String, prefix: String): (DataFrame, DataFrame, String) = {
    val docs = graft.TestdataAdapter.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val qdir = Files.createTempDirectory(s"${prefix}_q").toString
    val staged = Files.createTempDirectory(s"${prefix}_q_state").toString
    def produce(batch: DataFrame): Unit = batch
      .select(
        col("doc_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).cast("binary").as("value"))
      .coalesce(1) // one committed segment per produce → one micro-batch each
      .write.format("graftqueue").option("path", qdir)
      .option("topic", "docs.ingest").mode("append").save()
    produce(docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0))
    produce(docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0))
    val wire = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    val stream = spark.readStream.format("graftqueue")
      .option("path", qdir).option("topic", "docs.ingest")
      .option("maxRecordsPerTrigger", "1")
      .load()
      .select(from_json(col("value").cast("string"), wire).as("r"))
      .select("r.*")
    (stream, corpus, staged)
  }

  def dedupIndexQueueStream(
      spark: SparkSession, dir: String,
      stateDir: Option[String] = None): DataFrame = {
    val (stream, corpus, staged) = stageDocQueue(spark, dir, "graft_dedup")
    runDedupIndexStreamFrom(stream, corpus,
      stateDir.getOrElse(s"$staged/state"), s"$staged/verdicts",
      Files.createTempDirectory("graft_dedup_q_ckpt").toString)
    spark.read.parquet(s"$staged/verdicts/*")
      .drop("is_new_bloom", "h")
      .orderBy("doc_id")
  }

  /** The maintained-dedup-index micro-batch loop itself, factored so the
    * crash-recovery spec can run it twice against the SAME checkpoint +
    * state dirs.
    *
    * State layout — DELTA-STRUCTURED for 100 TB write amplification
    * (r10): `base/` is the one-time corpus hash table; each batch N
    * appends ONLY its genuinely-new distinct hashes as `delta_b{N}/`
    * ([[graft.dedup.Dedup.dedupIndexDelta]] — batch-sized, broadcast-
    * bounded), and the small (~1.2 MB) cumulative bloom is versioned as
    * `v{N}.bloom` (the bloom AFTER batches < N). base ∪ deltas is the
    * exact distinct hash table because deltas exclude everything already
    * in state. Per-batch state WRITE cost is O(batch); the earlier form
    * re-materialized the corpus-sized table every batch — a full state
    * rewrite per micro-batch, which does not survive 100 TB.
    *
    * Replay-idempotent by construction: the state BEFORE batch N (bloom
    * v{N} + base + deltas of batches < N) is re-read from disk at the
    * top of every foreachBatch — never from driver memory — so a
    * redelivered micro-batch N classifies against exactly that state
    * (its own half-written delta_b{N}, if any, is simply not unioned)
    * and overwrites verdicts/b{N}, delta_b{N} and v{N+1}.bloom with
    * identical content. `buildDedupIndex(corpus)` seeds base/v0 only if
    * absent (a resumed run must not rebuild over a moved corpus).
    *
    * `crashAfterVerdictsOfBatch` is a FAULT-INJECTION seam for the
    * crash-recovery spec only: the named batch throws after its verdict
    * write but before its state persist — the worst crash point, a
    * half-applied batch — so the spec can prove a checkpoint resume
    * replays it to the identical end state. Production callers leave it
    * None.
    */
  private[graft] def runDedupIndexStream(
      spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      corpus: DataFrame, inGlob: String, stateDir: String,
      verdictsDir: String, checkpoint: String,
      crashAfterVerdictsOfBatch: Option[Long] = None): Unit =
    runDedupIndexStreamFrom(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inGlob),
      corpus, stateDir, verdictsDir, checkpoint, crashAfterVerdictsOfBatch)

  /** Hash table of the state BEFORE batch `batchId`: base ∪ existing
    * deltas of earlier batches, read as ONE multi-path parquet relation —
    * a union chain here would grow the plan linearly with the number of
    * folded batches (thousands deep on a long-running stream); the
    * multi-path scan stays one flat node regardless. Exposed for the
    * crash-recovery spec's end-state comparison.
    */
  private[graft] def dedupStateHashes(
      s: SparkSession, stateDir: String, batchId: Long): DataFrame = {
    val parts = (Seq(s"$stateDir/base") ++
      (0L until batchId).map(b => s"$stateDir/delta_b$b"))
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    s.read.parquet(parts: _*)
  }

  /** The fold itself over ANY streaming source of document rows —
    * shared by the file-staged form above and the offset-ordered
    * graftqueue form ([[dedupIndexQueueStream]]).
    */
  private[graft] def runDedupIndexStreamFrom(
      stream: DataFrame, corpus: DataFrame, stateDir: String,
      verdictsDir: String, checkpoint: String,
      crashAfterVerdictsOfBatch: Option[Long] = None): Unit = {
    import graft.dedup.Dedup
    def bloomPath(v: Long) = java.nio.file.Paths.get(s"$stateDir/v$v.bloom")
    def writeBloom(bits: Array[Byte], v: Long): Unit =
      if (bits != null) java.nio.file.Files.write(bloomPath(v), bits)
    def readBloom(v: Long): Array[Byte] =
      if (java.nio.file.Files.exists(bloomPath(v)))
        java.nio.file.Files.readAllBytes(bloomPath(v))
      else null
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$stateDir/base"))) {
      val idx = Dedup.buildDedupIndex(corpus)
      idx.hashes.write.mode("overwrite").parquet(s"$stateDir/base")
      writeBloom(idx.bloomBits, 0L)
    }
    val q = stream
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val state = Dedup.DedupIndex(
          readBloom(batchId), dedupStateHashes(s, stateDir, batchId))
        // verdicts carry the content hash, so the state increment below
        // derives from THIS one classify pass — no second state scan
        Dedup.bloomNewDocsIncrementalWithHash(state, batch)
          .withColumn("batch_seq", (lit(batchId) + 1).cast("int"))
          .write.mode("overwrite").parquet(s"$verdictsDir/b$batchId")
        if (crashAfterVerdictsOfBatch.contains(batchId))
          throw new RuntimeException(
            s"injected crash after verdicts of batch $batchId (recovery spec)")
        // delta = the batch's genuinely-new distinct hashes (batch-
        // internal duplicates collapse; everything already in state was
        // classified is_new_exact=false and stays out — deltas disjoint)
        s.read.parquet(s"$verdictsDir/b$batchId")
          .filter(col("is_new_exact")).select("h").distinct()
          .coalesce(1) // batch-sized; one bloom partial, one delta file
          .write.mode("overwrite").parquet(s"$stateDir/delta_b$batchId")
        writeBloom(
          Dedup.mergeBloomBits(state.bloomBits,
            Dedup.bloomBitsOfHashes(
              s.read.parquet(s"$stateDir/delta_b$batchId").coalesce(1))),
          batchId + 1)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Signature state BEFORE batch `batchId`: base ∪ earlier deltas read
    * as ONE multi-path scan (same flat-plan argument as
    * [[dedupStateHashes]]). Exposed for the crash-recovery spec.
    */
  private[graft] def lshStateSigs(
      s: SparkSession, stateDir: String, batchId: Long): DataFrame = {
    val parts = (Seq(s"$stateDir/base") ++
      (0L until batchId).map(b => s"$stateDir/delta_b$b"))
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    s.read.parquet(parts: _*)
  }

  /** The NEAR-dup sibling of [[runDedupIndexStreamFrom]]: continuous
    * maintenance of the LSH signature index (8 min-hashes + 4 band keys
    * per doc — bounded per-doc state) under the same delta-structured
    * contract. Per micro-batch: classify the batch against the state
    * BEFORE it (band joins + signature-agreement Jaccard — the corpus
    * text is never touched after the one base build), write verdicts,
    * then append ONLY the batch's own signatures as `delta_b{N}` —
    * per-doc rows keyed by doc_id, so deltas are disjoint by
    * construction and base ∪ deltas IS [[graft.dedup.Dedup
    * .mergeLshIndex]]'s plain union, bit-for-bit. State WRITE cost is
    * O(batch); no bloom versioning is needed because the signature
    * index has no residual-membership prefilter. Replay-idempotent for
    * the same reason as the exact-index fold: state is re-read from
    * disk at the top of every batch, and a redelivered batch overwrites
    * verdicts/b{N} and delta_b{N} with identical content.
    * `crashAfterVerdictsOfBatch` is the same fault-injection seam.
    */
  private[graft] def runLshIndexStreamFrom(
      stream: DataFrame, corpus: DataFrame, stateDir: String,
      verdictsDir: String, checkpoint: String,
      crashAfterVerdictsOfBatch: Option[Long] = None): Unit = {
    import graft.dedup.Dedup
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$stateDir/base")))
      Dedup.lshIndex(corpus).write.mode("overwrite").parquet(s"$stateDir/base")
    val q = stream
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        Dedup.classifyNearDupIncremental(
          lshStateSigs(s, stateDir, batchId), batch)
          .withColumn("batch_seq", (lit(batchId) + 1).cast("int"))
          .write.mode("overwrite").parquet(s"$verdictsDir/b$batchId")
        if (crashAfterVerdictsOfBatch.contains(batchId))
          throw new RuntimeException(
            s"injected crash after verdicts of batch $batchId (recovery spec)")
        Dedup.lshIndex(batch)
          .coalesce(1) // batch-sized; one delta file
          .write.mode("overwrite").parquet(s"$stateDir/delta_b$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** File-staged entry for the crash-recovery spec (mirrors
    * [[runDedupIndexStream]]).
    */
  private[graft] def runLshIndexStream(
      spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      corpus: DataFrame, inGlob: String, stateDir: String,
      verdictsDir: String, checkpoint: String,
      crashAfterVerdictsOfBatch: Option[Long] = None): Unit =
    runLshIndexStreamFrom(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inGlob),
      corpus, stateDir, verdictsDir, checkpoint, crashAfterVerdictsOfBatch)

  /** The near-dup index maintained under the PRODUCTION ordering
    * contract, like [[dedupIndexQueueStream]]: batches ride a
    * `graftqueue` topic as JSON envelopes and drain as offset-ordered
    * micro-batches (admission control, whole committed segments per
    * trigger), the fold is [[runLshIndexStreamFrom]], and the verdicts
    * are hash-equal to the two-batch in-plan `lsh_incremental_newdocs`
    * — which is what the shared DuckDB oracle recomputes.
    */
  def lshIndexQueueStream(
      spark: SparkSession, dir: String,
      stateDir: Option[String] = None): DataFrame = {
    val (stream, corpus, staged) = stageDocQueue(spark, dir, "graft_lsh")
    runLshIndexStreamFrom(stream, corpus,
      stateDir.getOrElse(s"$staged/state"), s"$staged/verdicts",
      Files.createTempDirectory("graft_lsh_q_ckpt").toString)
    spark.read.parquet(s"$staged/verdicts/*")
      .orderBy("doc_id")
  }

  /** Frozen-model STREAMING INFERENCE: the committed quality model
    * ([[graft.ml.QualityFixture]]) served over `graftqueue` micro-batches
    * — the production shape of a curation filter in a continuous-ingest
    * pipeline (model ships frozen; every arriving batch is scored with
    * the same weights). Scoring is STATELESS (per-doc md5-BoW dot
    * product + frozen threshold), so the drained union is exactly the
    * batch scorer on the full corpus and the DuckDB oracle is the SAME
    * twin `quality_score_pinned` verifies against — batch ≡ streaming,
    * proven by hash. Three committed segments drain as three
    * offset-ordered micro-batches under admission control.
    */
  def qualityScoreQueueStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ml.{QualityClassifier, QualityFixture}
    val docs = graft.TestdataAdapter.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val qdir = Files.createTempDirectory("graft_qscore_q").toString
    val outDir = Files.createTempDirectory("graft_qscore_out").toString
    def produce(batch: DataFrame): Unit = batch
      .select(
        col("doc_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).cast("binary").as("value"))
      .coalesce(1)
      .write.format("graftqueue").option("path", qdir)
      .option("topic", "docs.score").mode("append").save()
    produce(docs.filter(col("doc_id") % 3 === 0))
    produce(docs.filter(col("doc_id") % 3 === 1))
    produce(docs.filter(col("doc_id") % 3 === 2))
    val wire = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    val stream = spark.readStream.format("graftqueue")
      .option("path", qdir).option("topic", "docs.score")
      .option("maxRecordsPerTrigger", "1")
      .load()
      .select(from_json(col("value").cast("string"), wire).as("r"))
      .select("r.*")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_qscore_ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        QualityClassifier.scorePinned(batch, QualityFixture.labelThreshold,
            QualityFixture.interceptE9, QualityFixture.weightsE9)
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir).orderBy("doc_id")
  }

  /** S9 as a stream: idempotent append (DO NOTHING) — anti-join each batch
    * against the sink before appending. Ref: ingestor.py:71. Used by the
    * streaming spec; same rewrite pattern as above.
    */
  def appendDoNothing(existing: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(batch.join(existing, keys, "left_anti"))

  /** Gap sessions via `flatMapGroupsWithState` — the fully-custom state
    * machine Structured Streaming offers when `session_window`'s built-in
    * shape isn't enough (here: emit each COMPLETED session exactly once,
    * zero or many rows per invocation — `mapGroupsWithState`'s
    * one-row-per-group contract can't express it). A session closes —
    * and emits — either when a later event arrives more than the gap
    * after it (gap-close) or when the event-time watermark passes
    * last-event + gap (timeout-close via
    * `GroupStateTimeout.EventTimeTimeout`; state is removed, which is
    * what bounds state size on an unbounded feed — each user holds ONE
    * open session, evicted by watermark).
    *
    * Determinism contract mirrored by the oracle: gap-closed sessions
    * (every session that has a successor) always emit; a user's final
    * session emits iff `watermark > last + gap`, with the watermark
    * tracked in event-time MILLISECONDS (Spark floors event times to ms
    * in its stats) — i.e. `max_ms − delay_ms > last_ms + gap_ms`,
    * strictly. Value sums fold in integer micro-units in event-time
    * order (exact, associative), matching the oracle's decimal sum. The
    * per-(user, batch) sort buffer is batch-bounded; a 100 TB deployment
    * pre-sorts with `repartitionAndSortWithinPartitions` feeding the
    * state function instead.
    */
  def closedSessionsStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = graft.rel.Sessionize.GapUs
    val gapMs = gapUs / 1000
    val ev = eventsStream(spark, dir)
      .select(
        col("user_id").cast("long").as("user_id"),
        graft.functions.Cols.microsFromNanos(col("ts")).as("ts_us"),
        col("value"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .as[(Long, Long, Double, java.sql.Timestamp)]
    val closed = ev
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSess, (Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user, events, state: GroupState[OpenSess]) =>
          def row(s: OpenSess) = (user, s.startUs, s.lastUs, s.n, s.sumMicros)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(row(s))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
            var s = state.getOption.orNull
            for (e <- events.toArray.sortBy(_._2)) {
              val m = math.rint(e._3 * 1e6).toLong // ≤6-dp source → exact
              if (s == null) s = OpenSess(e._2, e._2, 1L, m)
              else if (e._2 - s.lastUs > gapUs) {
                out += row(s); s = OpenSess(e._2, e._2, 1L, m)
              } else s = OpenSess(s.startUs, e._2, s.n + 1L, s.sumMicros + m)
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastUs / 1000 + gapMs)
            out.iterator
          }
      }
    runToTable(closed.toDF("user_id", "start_us", "end_us", "n_events", "sum_micros"),
      mode = "append")
      .select(
        col("user_id"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz").as("session_start"),
        timestamp_micros(col("end_us")).cast("timestamp_ntz").as("session_end"),
        col("n_events"),
        (col("sum_micros").cast("double") / 1e6).as("total_value"))
      .orderBy("user_id", "session_start")
  }
}
