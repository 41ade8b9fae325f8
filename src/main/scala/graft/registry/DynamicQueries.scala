package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

private[graft] trait DynamicQueries extends RegistryBase {
  import Pipelines._
  import graft.rel.{Analytics, Relational, Sessionize, Sketches}
  import graft.export.Export

  /** Streaming + ML + generator queries. The streaming aggregations are
    * checked against the SAME batch oracle SQL — stream and batch answers
    * must be identical. RF metrics and the seeded generator are rows-only
    * (tree ensembles and rand() are engine-specific by design).
    */
  val dynamic: Seq[Q] = {
    import graft.streaming.Streams
    import graft.ml.DemandModel
    import graft.mockflow.MockFlow
    Seq(
      Q("streaming_vehicle_hourly",
        (s, d) => Streams.vehicleHourlyStream(s, d),
        Some(s"WITH v AS ($VEH) $VEHICLE_BODY ORDER BY 1, 2")),

      // S5 producer wire record as a stateless append-mode stream —
      // same code and same byte-level JSON oracle as the batch twin
      Q("streaming_kafka_envelope",
        (s, d) => Streams.kafkaEnvelopeStream(s, d),
        Some(graft.streaming.Envelope.producerEnvelopeSql)),

      // S7 weather render→parse as a stateless append-mode stream —
      // same code and same oracle as the batch weather_ingest twin
      Q("streaming_weather_ingest",
        (s, d) => Streams.weatherIngestStream(s, d),
        Some(graft.ingest.OpenMeteo.weatherIngestSql)),

      // A3 windowed + watermarked (bounded state, update mode) — same
      // batch oracle as the complete-mode twin
      Q("streaming_windowed_vehicle",
        (s, d) => Streams.vehicleHourlyWindowedStream(s, d),
        Some(s"WITH v AS ($VEH) $VEHICLE_BODY ORDER BY 1, 2")),

      // A1 as a stream-static broadcast enrichment join — same batch
      // demand oracle as the batch view
      Q("streaming_demand_hourly",
        (s, d) => Streams.demandHourlyStream(s, d),
        Some(s"WITH s2r AS ($S2R), f AS ($FLOW) $DEMAND_BODY ORDER BY 1, 2")),

      // S9 streaming: redelivered input deduped to exactly-once counts
      Q("streaming_exactly_once",
        (s, d) => Streams.exactlyOnceDedupStream(s, d),
        Some(
          """SELECT event_type, COUNT(*) AS n_events
            |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
      // watermark-bounded dedup state (the unbounded-stream form of
      // exactly-once; same redelivery setup, same batch oracle)
      Q("streaming_dedup_watermark",
        (s, d) => Streams.dedupWatermarkStream(s, d),
        Some(
          """SELECT event_type, COUNT(*) AS n_events
            |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

      // mapGroupsWithState custom state, oracle = batch GROUP BY
      // Gap sessionization as a stream: native session_window (mergeable
      // keyed state, watermark-bounded) vs a window-function oracle with
      // session_window's ≥-gap split convention
      Q("streaming_sessions",
        (s, d) => Streams.sessionizedStream(s, d),
        Some(
          s"""WITH e AS (
             |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events),
             |f AS (
             |  SELECT *, CASE WHEN LAG(ts_us) OVER w IS NULL
             |                   OR ts_us - LAG(ts_us) OVER w >= ${graft.rel.Sessionize.GapUs}
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
             |g AS (
             |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id,
             |  make_timestamp(MIN(ts_us)) AS session_start,
             |  make_timestamp(MAX(ts_us)) AS session_end,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
             |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

      // flatMapGroupsWithState custom state machine: completed sessions
      // emitted exactly once (gap-close on a successor event;
      // timeout-close when the ms-floored watermark strictly passes
      // last + gap — the oracle mirrors both rules)
      Q("streaming_closed_sessions",
        (s, d) => Streams.closedSessionsStream(s, d),
        Some(
          s"""WITH e AS (
             |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events),
             |mx AS (SELECT MAX(ts_us) // 1000 AS max_ms FROM e),
             |f AS (
             |  SELECT *, CASE WHEN LAG(ts_us) OVER w IS NULL
             |                   OR ts_us - LAG(ts_us) OVER w > ${graft.rel.Sessionize.GapUs}
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
             |g AS (
             |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f),
             |s AS (
             |  SELECT user_id, sid,
             |    MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
             |    COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
             |    sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
             |  FROM g GROUP BY user_id, sid)
             |SELECT user_id,
             |  make_timestamp(start_us) AS session_start,
             |  make_timestamp(end_us) AS session_end,
             |  n_events, total_value
             |FROM s, mx
             |WHERE NOT is_last
             |   OR mx.max_ms - 3600000 > end_us // 1000 + ${graft.rel.Sessionize.GapUs / 1000}
             |ORDER BY user_id, session_start""".stripMargin)),

      // Stream-stream inner join (watermarked both sides): AvailableNow
      // over the in-order feed equals the batch join — the oracle. The
      // hour-bucket equality makes the Spark-side ±1 h range condition a
      // no-op on results (state-eviction bound only), so it is absent
      // from the SQL.
      Q("streaming_join_enrich",
        (s, d) => Streams.vehicleWeatherJoinStream(s, d),
        Some(
          """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS vehicle_id, CAST(ts AS TIMESTAMP) AS observed_at
            |           FROM events WHERE event_type = 'click'),
            |w AS (SELECT CAST(ts AS TIMESTAMP) AS weather_at, value AS temperature_c
            |      FROM events WHERE value > 200)
            |SELECT vehicle_id, observed_at, weather_at, temperature_c
            |FROM v JOIN w ON date_trunc('hour', observed_at) = date_trunc('hour', weather_at)
            |ORDER BY vehicle_id, observed_at, weather_at, temperature_c""".stripMargin)),

      Q("streaming_user_state",
        (s, d) => Streams.userStateStream(s, d),
        Some(
          """SELECT user_id, COUNT(*) AS n_events, MAX(CAST(ts AS TIMESTAMP)) AS last_ts
            |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

      Q("streaming_upsert_latest",
        (s, d) => Streams.upsertLatestWinsStream(s, d),
        Some(
          """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
            |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
            |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

      // Incremental view maintenance across REAL micro-batch boundaries:
      // foreachBatch merges each batch's partial aggregate with a stored
      // partials table (no history rescan); the finalized state must
      // equal the from-scratch recompute — the SAME oracle SQL the
      // in-plan incremental_hourly_merge verifies against (VERDICT r8
      // item 6: two-batch ≡ one-batch, proven by hash)
      Q("streaming_incremental_hourly",
        (s, d) => Streams.incrementalHourlyStream(s, d),
        Some(graft.rel.Incremental.incrementalHourlyMergeSql)),

      // §3.2 lifecycle as ONE chain: protobuf feed bytes → wire decode →
      // producer envelope → graftqueue V2 sink → micro-batch consumers →
      // KPI views → suggestion engine. The oracle is the SAME SQL the
      // batch `suggestions` query verifies against — hash-equality
      // proves every hop of the realtime path preserves the analytics
      // bit-for-bit (streaming/EndToEnd.scala for the fidelity
      // contract). Ref lifecycle: poller.py:196-218 → ingestor.py:171-190
      // → kpi_views.sql:19-98 → generate_suggestions.py:106-191.
      Q("streaming_suggestions_e2e",
        (s, d) => suggestionsProjection(
          graft.streaming.EndToEnd.suggestionsE2E(s, d)),
        Some(SUGGESTIONS_SQL)),

      // The lifecycle's last hop (VERDICT r9 item 1): the SAME streaming
      // chain continued through the frontend export shaping — snapshot
      // join, status/message, headway deltas — hash-equal to the batch
      // `export_rows` oracle, so the reference's full
      // poller → ingestor → kpi → suggest → export-json lifecycle
      // (export_suggestions_json.py:204-252 being the final leg) is now
      // covered by ONE oracle-checked plan that consumes the
      // streaming-fed frames.
      Q("streaming_export_e2e",
        (s, d) => graft.streaming.EndToEnd.exportRowsE2E(s, d)
          .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz")),
        Some(EXPORT_ROWS_SQL)),

      // The in-query-trained 200-tree RF (`DemandModel.runMetrics`) is
      // SPEC coverage (retired r13): MLlib ensemble values are
      // engine-specific by design (SURVEY §2.12 prescribes tolerance).
      // RfTrainedSpec asserts the MAE band + split sizes; FixtureSpec pins
      // retrain == committed forest; `rf_pinned_mae` below is the
      // oracle-exact serving twin.

      // MAE of the COMMITTED serving forest (RfFixture: 20 trees as
      // preorder literal triples) — ORACLE-EXACT: the forest is one
      // shared CASE expression evaluated identically by both engines,
      // the temporal cut is computed in-plan, and per-row errors go
      // through round(.,6) before the exact decimal sum. The
      // in-query-trained 200-tree form stays rows-only above;
      // FixtureSpec pins retrain == fixture.
      Q("rf_pinned_mae",
        (s, d) => DemandModel.pinnedMae(mlDataset(s, d),
          graft.ml.RfFixture.trees),
        Some(DemandModel.pinnedMaeSql(ML_DATASET_SQL,
          graft.ml.RfFixture.trees))),

      // The trained-RF ml_runs lineage record (`DemandModel.runRecord`)
      // is SPEC coverage (retired r13): its MAE field comes from the
      // engine-specific trained forest. RfTrainedSpec asserts the record's
      // deterministic fields (run_id derivation, split sizes, features
      // JSON) and the MAE band; `ml_run_record_pinned` below is the
      // oracle-exact twin.

      // the lineage record at the PINNED forest — ORACLE-EXACT down to
      // the run_id: nameUUIDFromBytes is a v3 (md5) UUID, rebuilt in
      // both engines by hex surgery on md5(name) (digit 13 -> '3',
      // digit 17 -> (v AND 3) OR 8), with the name composed in-plan
      // from the split sizes
      Q("ml_run_record_pinned",
        (s, d) => DemandModel.pinnedRunRecord(mlDataset(s, d),
          graft.ml.RfFixture.trees),
        Some(DemandModel.pinnedRunRecordSql(ML_DATASET_SQL,
          graft.ml.RfFixture.trees))),

      // predictions history → latest upsert, oracle-checked over two
      // deterministic pseudo-runs (run 2 re-predicts afternoon hours
      // only, so the latest table mixes both runs per the upsert rule)
      Q("predictions_latest",
        (s, d) => {
          val base = predictions(s, d) // route_id, hour_ts, y_pred=0.95x, y_true
          def run(seq: Long, factor: Double, version: String) =
            base.select(col("route_id"), col("hour_ts"), col("y_true"),
              (col("y_true") * factor).as("y_pred"), lit(seq).as("run_seq"),
              lit("rf_demand").as("model_name"), lit(version).as("model_version"))
          val history = run(1L, 0.9, "1")
            .unionByName(run(2L, 0.95, "2").filter(hour(col("hour_ts")) >= 12))
          DemandModel.predictionsLatest(history)
            .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz"))
        },
        Some(
          s"""WITH s2r AS ($S2R), f AS ($FLOW), d AS ($DEMAND_BODY),
             |hist AS (
             |  SELECT route_id, hour_ts, passengers AS y_true, passengers * 0.9 AS y_pred,
             |    CAST(1 AS BIGINT) AS run_seq, 'rf_demand' AS model_name, '1' AS model_version
             |  FROM d
             |  UNION ALL
             |  SELECT route_id, hour_ts, passengers, passengers * 0.95,
             |    CAST(2 AS BIGINT), 'rf_demand', '2'
             |  FROM d WHERE EXTRACT(HOUR FROM hour_ts) >= 12)
             |SELECT route_id, hour_ts, y_true, y_pred, run_seq, model_name, model_version
             |FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY route_id, hour_ts ORDER BY run_seq DESC) AS rn
             |  FROM hist) WHERE rn = 1
             |ORDER BY route_id, hour_ts""".stripMargin)),

      // MLlib k-means|| over embeddings (`Knn.kmeansClusterSizes`) is
      // SPEC coverage (retired r13): k-means|| centroids are
      // seed+layout-dependent, never SQL-expressible. KnnSpec asserts the
      // partition-count/size invariants; the operator stays inside the
      // hash gate twice over — `kmeans_sizes_pinned` (frozen trained
      // artifact) and `kmeans_lloyd_train` (the in-engine trainer itself).

      // the k-means reporting surface at PINNED centroids
      // (SemDedupFixture — the committed trained artifact), ORACLE-EXACT:
      // literal-centroid argmin assignment + plain size/norm rollup
      Q("kmeans_sizes_pinned",
        (s, d) => graft.sim.Knn.kmeansSizesPinned(
          TestdataAdapter.table(s, d, "embeddings"),
          graft.sim.SemDedupFixture.centroids),
        Some(graft.sim.Knn.kmeansSizesPinnedSql(
          graft.sim.SemDedupFixture.centroids))),

      // cluster-QUALITY report for the same frozen cluster model:
      // per-cluster simplified silhouette (point-to-centroid a/b — one
      // narrow scan, no all-pairs), oracle-exact off the shared sorted
      // centroid-distance list
      Q("kmeans_silhouette_pinned",
        (s, d) => graft.sim.Knn.kmeansSilhouettePinned(
          TestdataAdapter.table(s, d, "embeddings"),
          graft.sim.SemDedupFixture.centroids),
        Some(graft.sim.Knn.kmeansSilhouettePinnedSql(
          graft.sim.SemDedupFixture.centroids))),

      // k-means trained FROM SCRATCH inside the engine, ORACLE-EXACT: a
      // deterministic Lloyd loop in pure BIGINT arithmetic (floor(x·1e6)
      // quantization, md5-ranked seeds, integer argmin, exactly-divisible
      // floor-means) that the DuckDB twin replays iteration-for-iteration
      // as unrolled CTE blocks — the trainer itself inside the hash gate,
      // where the MLlib leg above can only ever be rows-only
      Q("kmeans_lloyd_train",
        (s, d) => graft.sim.Knn.kmeansLloydTrain(
          TestdataAdapter.table(s, d, "embeddings")),
        Some(graft.sim.Knn.kmeansLloydTrainSql())),

      // the convergence trace of the same trainer: per-iteration
      // assigned/moved/inertia/nonempty-clusters diagnostics — the
      // training log itself inside the hash gate
      Q("kmeans_lloyd_trace",
        (s, d) => graft.sim.Knn.kmeansLloydTrace(
          TestdataAdapter.table(s, d, "embeddings")),
        Some(graft.sim.Knn.kmeansLloydTraceSql())),

      // IVF whose coarse quantizer is the in-engine Lloyd trainer: the
      // whole trained-ANN pipeline — training, probe selection, pruned
      // cell-restricted search — oracle-exact at a genuinely sub-linear
      // nprobe < cells point (knn_ivf's MLlib centroids force its
      // oracle to the degenerate nprobe = numCells configuration)
      Q("ivf_lloyd_topk",
        (s, d) => graft.sim.Knn.ivfLloydTopK(
          TestdataAdapter.table(s, d, "embeddings")),
        Some(graft.sim.Knn.ivfLloydTopKSql())),

      // the nprobe operating-point experiment for the same trained
      // index: pruned-vs-exhaustive recall@k, one training pass, one
      // row, fully in-plan (completes the pca_recall/sq8_recall
      // measurement-query pattern for the IVF path)
      Q("ivf_lloyd_recall",
        (s, d) => graft.sim.Knn.ivfLloydRecall(
          TestdataAdapter.table(s, d, "embeddings")),
        Some(graft.sim.Knn.ivfLloydRecallSql())),

      // SQ8 scalar-quantized ANN — the third compression path next to
      // IVF (cell pruning) and PQ (codebook ADC): SYMMETRIC int8 of the
      // normalized vector, code = round(x/‖x‖·127) — pure-integer
      // dot-product scoring (4× memory cut, SIMD-shaped, zero rounding
      // anywhere → hash-exact). An affine per-dim [min,max] draft was
      // killed by the sq8_recall experiment at 0.04 recall (r12).
      Q("sq8_topk",
        (s, d) => graft.sim.Knn.sq8TopK(
          TestdataAdapter.table(s, d, "embeddings")),
        Some(graft.sim.Knn.sq8TopKSql())),

      // the switch-to-SQ8 experiment: recall@k of the quantized ranking
      // vs the exact cosine top-k, one row, fully in-plan — both legs
      // ARE the registered operators, so the number measures the
      // production path
      Q("sq8_recall",
        (s, d) => graft.sim.Knn.sq8Recall(
          TestdataAdapter.table(s, d, "embeddings")),
        Some(graft.sim.Knn.sq8RecallSql())),

      // The SAME recall experiments over a deterministically CLUSTERED
      // embedding table (VERDICT r12 item 4): the testdata embeddings
      // are structureless random vectors, so `ivf_lloyd_recall` reads
      // 0.44 at nprobe=2/16 — no cluster structure to find. Real
      // embedding corpora are clustered (why IVF works at all); the
      // generator (Knn.clusteredEmbeddings — md5-seeded axis-block
      // mixture, MockFlow style, exact in both engines down to the one
      // float cast) makes the trade-off the operator exists to measure
      // visible: high recall at nprobe << cells. The DuckDB prelude CTE
      // shadows the `embeddings` table, so the oracle replays generator,
      // trainer and both search legs end to end.
      Q("ivf_lloyd_recall_clustered",
        (s, _) => graft.sim.Knn.ivfLloydRecall(
          graft.sim.Knn.clusteredEmbeddings(s), cells = 8, nprobe = 2),
        Some(graft.sim.Knn.ivfLloydRecallSql(cells = 8, nprobe = 2,
          prelude = graft.sim.Knn.clusteredEmbeddingsCte()))),
      // The clustered table is SQ8's HARD case, and the experiment says
      // so: intra-cluster candidates are near-ties below the 1/127
      // quantization step, so raw int8 ranking reads ~0.2 here vs 0.98
      // on the random table — the measurement that motivates two-stage
      // serving (both values oracle-exact; the operator family's full
      // operating envelope is now inside the gate).
      Q("sq8_recall_clustered",
        (s, _) => graft.sim.Knn.sq8Recall(
          graft.sim.Knn.clusteredEmbeddings(s)),
        Some(graft.sim.Knn.sq8RecallSql(
          prelude = graft.sim.Knn.clusteredEmbeddingsCte()))),
      // ...and the production mitigation, proven on the same table:
      // int8 retrieve at R=100 (covers the near-dup set — cluster-level
      // separation survives int8 trivially) + full-precision rescore of
      // only those candidates restores recall to 1.0.
      Q("sq8_rescore_recall_clustered",
        (s, _) => graft.sim.Knn.sq8RescoreRecall(
          graft.sim.Knn.clusteredEmbeddings(s)),
        Some(graft.sim.Knn.sq8RescoreRecallSql(
          prelude = graft.sim.Knn.clusteredEmbeddingsCte()))),
      // Residual vs no-residual IVF-PQ at EQUAL nprobe on the clustered
      // table (r14, VERDICT item 1's experiment): after coarse
      // assignment every in-cell candidate shares the centroid, so
      // no-residual codes collapse to near-identical values (the code
      // budget re-describes the centroid — the PQ analogue of SQ8's
      // near-tie failure) while residual codes spend the same budget on
      // the within-cell geometry the ranking needs. Both variants train
      // their codebooks in-engine; both rows are oracle-exact;
      // ClusteredRecallSpec pins residual >= no_residual.
      Q("ivfpq_residual_recall_clustered",
        // r17: both variants off ONE coarse train + ONE exact ranking
        // (they share them by construction; the two-call form duplicated
        // the identical Lloyd chain and brute-force leg) — rows unchanged
        (s, _) => graft.sim.Knn.ivfPqResidualRecallBoth(
          graft.sim.Knn.clusteredEmbeddings(s))
          .orderBy("variant"),
        Some(graft.sim.Knn.ivfPqResidualRecallBothSql(
          prelude = graft.sim.Knn.clusteredEmbeddingsCte()))),
      // ...and the refine stage's recovery on the same table: compressed
      // retrieval at R=50 covers the true neighbors (cluster-level
      // separation survives 64-bit residual codes easily), exact rescore
      // of only those candidates restores recall@5 to 1.0 — the sq8
      // two-stage story, one level up the ANN stack.
      Q("ivfpq_rescore_recall_clustered",
        (s, _) => graft.sim.Knn.ivfPqResidualRescoreRecall(
          graft.sim.Knn.clusteredEmbeddings(s)),
        Some(graft.sim.Knn.ivfPqResidualRescoreRecallSql(
          prelude = graft.sim.Knn.clusteredEmbeddingsCte()))),

      // G1+A8 pinned by ORACLE through the generator's own output: the
      // per-event provenance JSON is re-parsed and the de-noised demand
      // expectation base × tf × df × wf × rf is recomputed per
      // (stop, factor-combo) group — every factor table (time-of-day
      // band, Postgres-DOW weekend, weather bands, delay bands), the
      // base-demand clamp, and the 100-events-per-hour fan-out are
      // hash-checked against DuckDB computing the same from the raw
      // tables. Only the xxhash-seeded noise terms stay engine-side
      // (they cancel out of this aggregate by construction).
      // Ref: mock_passenger_flow_job.py:18-63,136-166.
      Q("mockflow_invariants",
        (s, d) =>
          // r14: the invariant reads the generator's TYPED provenance
          // columns directly — the former from_json re-parse of the
          // `components` rendering of the SAME values cost a JSON parse
          // at event grain (~90k rows) and made this the suite's
          // slowest, noisiest query (7.8 s trimmed median, 46.8 s
          // scatter max in r13). The JSON rendering stays pinned:
          // MockFlowGtfsSpec asserts parsed-components ≡ typed columns
          // row-for-row, and the typed values themselves are
          // hash-checked here and in `mockflow_events`.
          mockflowGenerated(s, d)
            .groupBy(col("stop_id"), col("time_factor"), col("dow_factor"),
              col("weather_factor"), col("delay_factor"), col("base_demand"))
            .agg(count(lit(1)).as("n_events"))
            .withColumn("expected_demand",
              col("base_demand") * col("time_factor") * col("dow_factor") *
                col("weather_factor") * col("delay_factor"))
            .orderBy("stop_id", "time_factor", "dow_factor",
              "weather_factor", "delay_factor"),
        Some(
          s"""WITH t AS ($TRIP), wx AS ($WEA),
             |dl AS ($DELAY_BODY),
             |wh AS ($WEATHER_BODY),
             |hrs AS (
             |  SELECT wh.hour_ts, wh.temperature_c, wh.precipitation_mm, d.avg_delay_seconds
             |  FROM wh LEFT JOIN (
             |    SELECT hour_ts, AVG(avg_delay_seconds) AS avg_delay_seconds
             |    FROM dl GROUP BY 1) d USING (hour_ts)
             |  ORDER BY hour_ts LIMIT 6),
             |hf AS (
             |  SELECT
             |    CAST(CASE WHEN EXTRACT(HOUR FROM hour_ts) >= 6 AND EXTRACT(HOUR FROM hour_ts) < 9 THEN 1.9
             |              WHEN EXTRACT(HOUR FROM hour_ts) >= 9 AND EXTRACT(HOUR FROM hour_ts) < 16 THEN 1.0
             |              WHEN EXTRACT(HOUR FROM hour_ts) >= 16 AND EXTRACT(HOUR FROM hour_ts) < 19 THEN 2.1
             |              WHEN EXTRACT(HOUR FROM hour_ts) >= 19 AND EXTRACT(HOUR FROM hour_ts) < 23 THEN 0.8
             |              WHEN EXTRACT(HOUR FROM hour_ts) >= 23 THEN 0.4
             |              ELSE 0.3 END AS DOUBLE) AS time_factor,
             |    CAST(CASE WHEN EXTRACT(dow FROM hour_ts) = 6 THEN 0.75
             |              WHEN EXTRACT(dow FROM hour_ts) = 0 THEN 0.6
             |              ELSE 1.0 END AS DOUBLE) AS dow_factor,
             |    CAST(CASE WHEN precipitation_mm >= 5 THEN 1.25
             |              WHEN precipitation_mm >= 1 THEN 1.15
             |              WHEN temperature_c <= -5 THEN 0.85
             |              WHEN temperature_c >= 30 THEN 0.9
             |              ELSE 1.0 END AS DOUBLE) AS weather_factor,
             |    CAST(CASE WHEN avg_delay_seconds IS NULL THEN 1.0
             |              WHEN avg_delay_seconds > 600 THEN 0.75
             |              WHEN avg_delay_seconds > 300 THEN 0.85
             |              ELSE 1.0 END AS DOUBLE) AS delay_factor
             |  FROM hrs),
             |hg AS (SELECT time_factor, dow_factor, weather_factor, delay_factor,
             |         COUNT(*) AS nh
             |       FROM hf GROUP BY 1, 2, 3, 4),
             |base AS (
             |  SELECT CAST(user_id AS VARCHAR) AS stop_id,
             |    LEAST(50, GREATEST(5, COUNT(*) * 3)) AS base_demand
             |  FROM events GROUP BY 1)
             |SELECT b.stop_id, h.time_factor, h.dow_factor, h.weather_factor, h.delay_factor,
             |  b.base_demand,
             |  CAST(100 * h.nh AS BIGINT) AS n_events,
             |  b.base_demand * h.time_factor * h.dow_factor * h.weather_factor * h.delay_factor
             |    AS expected_demand
             |FROM base b CROSS JOIN hg h
             |ORDER BY stop_id, time_factor, dow_factor, weather_factor, delay_factor"""
            .stripMargin)),

      // The FULL event table, oracle-exact (promoted r11 — it was the
      // largest rows-only query): every md5-seeded draw, 9-dp rounded
      // transcendental, quantized bucket weight and rounding rule is
      // recomputed in DuckDB at stop × hour × minute-bucket grain and
      // hash-compared, typed-column for typed-column (the JSON
      // `components` rendering of the same values stays verified through
      // `mockflow_invariants`' re-parse). See MockFlow's object scaladoc
      // for the three cross-engine design rules that make this possible.
      Q("mockflow_events",
        (s, d) => mockflowGenerated(s, d)
          .select(col("stop_id"), col("observed_at").cast("timestamp_ntz").as("observed_at"),
            col("estimated_passengers"),
            col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
            col("base_demand"), col("time_factor"), col("dow_factor"),
            col("weather_factor"), col("delay_factor"), col("stop_noise"),
            col("hourly_passengers"), col("bucket_weight"), col("total_weight"))
          // hour_ts in the key: buckets 60-99 of hour H collide with
          // buckets 0-39 of hour H+1 on observed_at alone
          .orderBy("stop_id", "hour_ts", "observed_at"),
        Some(
          s"""WITH t AS ($TRIP), wx AS ($WEA),
             |dl AS ($DELAY_BODY),
             |wh AS ($WEATHER_BODY),
             |hrs AS (
             |  SELECT wh.hour_ts, wh.temperature_c, wh.precipitation_mm, d.avg_delay_seconds
             |  FROM wh LEFT JOIN (
             |    SELECT hour_ts, AVG(avg_delay_seconds) AS avg_delay_seconds
             |    FROM dl GROUP BY 1) d USING (hour_ts)
             |  ORDER BY hour_ts LIMIT 6),
             |base AS (
             |  SELECT CAST(user_id AS VARCHAR) AS stop_id,
             |    LEAST(50, GREATEST(5, COUNT(*) * 3)) AS base_demand
             |  FROM events GROUP BY 1),
             |""".stripMargin + graft.mockflow.MockFlow.eventsSqlTail())),
    )
  }

}
