package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Index maintenance decisions and the clustered fixture: incremental
  * IVF attach, the drift report, and the generated clustered
  * embedding corpus (r15 split, zero behavior change).
  */
private[sim] trait KnnMaintenance extends KnnQuant {
  // ────────── incremental IVF index maintenance (r13) ───────────────────

  /** The ANN half of the maintained-index-as-running-state family (the
    * exact/LSH dedup indexes already live there): the IVF index — cells
    * trained by the in-engine Lloyd trainer, one (vec_id, cell, vector)
    * row per corpus vector — is RUNNING STATE, and a new batch attaches
    * to it without retraining or rescanning: each batch vector is
    * assigned to its nearest EXISTING cell (the home cell its index row
    * joins the state under — an O(batch) delta append, exactly how
    * production IVF serves between periodic retrains) and searched
    * against the state-before-batch restricted to its nprobe nearest
    * cells. Output: one row per (batch vector, top-k state neighbor)
    * with the home cell and the integer L2 distance.
    *
    * Scale shape: training and state touch only the corpus; the batch
    * side is bounded by construction (probes broadcast, candidates ≈
    * nprobe/cells of the state per batch vector); nothing rescans the
    * corpus per batch and nothing is all-pairs.
    */
  def ivfAttachIncremental(
      embeddings: DataFrame, cells: Int = 8, iters: Int = 2,
      nprobe: Int = 2, k: Int = 3): DataFrame = {
    // the same corpus/batch carve the LSH incremental twin uses
    val corpus = embeddings.filter(col("vec_id") % 3 =!= 0)
    val batch = embeddings.filter(col("vec_id") % 3 === 0)
    val e0 = lloydQuantized(corpus)
    var cen = lloydSeeds(e0, cells)
    for (_ <- 1 to iters) cen = lloydUpdate(cen, lloydAssign(e0, cen))
    // the index STATE: cell-keyed corpus vectors under the trained cells
    val index = lloydAssign(e0, cen)
      .select(col("vec_id"), col("j").as("cell"), col("q"))
      .localCheckpoint()
    val eb = lloydQuantized(batch)
    // eager: batch × cells rows — probes and home both read it, and once
    // it is materialized neither quantized cache has a reader (r14 sweep)
    val ranked = lloydAssign(eb, cen)
      .select(col("vec_id").as("batch_id"), col("q").as("bq"),
        posexplode(col("ds")).as(Seq("cell", "cd")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("batch_id").orderBy(col("cd"), col("cell"))))
      .localCheckpoint()
    e0.unpersist(blocking = false)
    eb.unpersist(blocking = false)
    val probes = ranked.filter(col("pr") <= nprobe).select("batch_id", "bq", "cell")
    val home = ranked.filter(col("pr") === 1)
      .select(col("batch_id"), col("cell").as("home_cell"))
    val w = Window.partitionBy("batch_id").orderBy(col("d"), col("vec_id"))
    index.join(broadcast(probes), Seq("cell"))
      .withColumn("d",
        aggregate(zip_with(col("bq"), col("q"), (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(broadcast(home), Seq("batch_id"))
      .select(col("batch_id"), col("home_cell"),
        col("vec_id").as("neighbor_id"), col("rank"), col("d"))
      .orderBy("batch_id", "rank")
  }

  /** DuckDB twin of [[ivfAttachIncremental]]: the Lloyd prefix trains on
    * the CORPUS carve only (the `where` filter on e0), the batch
    * quantizes in its own CTE, and attach/probe/search replay term for
    * term.
    */
  def ivfAttachIncrementalSql(
      cells: Int = 8, iters: Int = 2, nprobe: Int = 2, k: Int = 3): String = {
    val d1 = Dim + 1
    s"""WITH ${lloydSqlCtes(cells, iters, where = "vec_id % 3 <> 0")},
       |fcx AS (
       |  SELECT e.vec_id, c.j, SUM((e.q[t.i] - c.cd) * (e.q[t.i] - c.cd)) AS d
       |  FROM e0 e CROSS JOIN range(1, $d1) t(i) JOIN c$iters c ON c.i = t.i
       |  GROUP BY 1, 2),
       |fca AS (
       |  SELECT vec_id, j AS cell FROM (
       |    SELECT vec_id, j,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
       |    FROM fcx) WHERE rk = 1),
       |e0b AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * $LloydScale.0) AS BIGINT)) AS q
       |  FROM e WHERE vec_id % 3 = 0),
       |bx AS (
       |  SELECT b.vec_id AS batch_id, c.j, SUM((b.q[t.i] - c.cd) * (b.q[t.i] - c.cd)) AS d
       |  FROM e0b b CROSS JOIN range(1, $d1) t(i) JOIN c$iters c ON c.i = t.i
       |  GROUP BY 1, 2),
       |br AS (
       |  SELECT batch_id, j AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY batch_id ORDER BY d, j) AS pr
       |  FROM bx),
       |home AS (SELECT batch_id, cell AS home_cell FROM br WHERE pr = 1),
       |cand AS (
       |  SELECT p.batch_id, a.vec_id AS neighbor_id
       |  FROM br p JOIN fca a ON a.cell = p.cell
       |  WHERE p.pr <= $nprobe),
       |sc AS (
       |  SELECT c.batch_id, c.neighbor_id,
       |    CAST(SUM((bq.q[t.i] - cq.q[t.i]) * (bq.q[t.i] - cq.q[t.i]))
       |         AS BIGINT) AS d
       |  FROM cand c
       |    JOIN e0b bq ON bq.vec_id = c.batch_id
       |    JOIN e0 cq ON cq.vec_id = c.neighbor_id
       |    CROSS JOIN range(1, $d1) t(i)
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT batch_id, neighbor_id, d,
       |    ROW_NUMBER() OVER (PARTITION BY batch_id ORDER BY d, neighbor_id) AS rn
       |  FROM sc)
       |SELECT r.batch_id, h.home_cell, r.neighbor_id,
       |  CAST(r.rn AS INTEGER) AS "rank", r.d
       |FROM r JOIN home h ON h.batch_id = r.batch_id
       |WHERE r.rn <= $k ORDER BY r.batch_id, "rank"""".stripMargin
  }

  // ────────── IVF drift report: the retrain decision (r14) ─────────────

  /** The maintenance half [[ivfAttachIncremental]] was missing (VERDICT
    * r13 item 2): serving between retrains is O(batch), but production
    * IVF also has to decide WHEN the trained cells have drifted enough
    * to retrain. This report compares, per trained cell, the
    * training-time population against the attached batch under the SAME
    * centroids — sizes, integer inertia and radius (max centroid
    * distance), population shares — and derives the decision inputs:
    * `drift_ratio` (batch mean centroid distance / training mean — ≈1
    * for a stationary batch, ≫1 when the batch no longer matches the
    * trained geometry) and `retrain_due`, true when the ratio crosses
    * `driftRatio` or a cell's batch share outgrows `shareRatio` × its
    * training share (the imbalance signal: traffic is piling into cells
    * the quantizer carved small). IvfDriftSpec proves the contract: an
    * engineered drifted batch trips the flag, a stationary fresh draw
    * from the same mixture does not.
    *
    * Everything upstream of the two ratio columns is exact BIGINT
    * (counts, inertia sums, radii in micro-unit² domain); the ratios are
    * single IEEE divisions of those integers — deterministic in both
    * engines, so the whole report is hash-exact. Scale shape: train as
    * [[kmeansLloydTrain]]; the batch side is one narrow argmin pass +
    * one cells-sized aggregate; the report is cells rows.
    */
  def ivfDriftReport(
      corpus: DataFrame, batch: DataFrame, cells: Int = 8, iters: Int = 2,
      driftRatio: Double = 1.5, shareRatio: Double = 2.0): DataFrame = {
    def nullifZero(c: Column): Column =
      when(c === 0, lit(null)).otherwise(c)
    val e0 = lloydQuantized(corpus)
    var cen = lloydSeeds(e0, cells)
    for (_ <- 1 to iters) cen = lloydUpdate(cen, lloydAssign(e0, cen))
    val trainAsg = lloydAssign(e0, cen)
      .withColumn("d", array_min(col("ds")))
      .select(col("vec_id"), col("j").as("cell"), col("d"))
      .localCheckpoint()
    e0.unpersist(blocking = false)
    val eb = lloydQuantized(batch)
    val batchAsg = lloydAssign(eb, cen)
      .withColumn("d", array_min(col("ds")))
      .select(col("vec_id"), col("j").as("cell"), col("d"))
      .localCheckpoint()
    eb.unpersist(blocking = false)
    val ts = trainAsg.groupBy("cell").agg(
      count(lit(1)).as("n_train"), sum("d").as("inertia_train"),
      max("d").as("radius_train"))
    val bs = batchAsg.groupBy("cell").agg(
      count(lit(1)).as("n_batch"), sum("d").as("inertia_batch"),
      max("d").as("radius_batch"))
    // 1-row totals, broadcast (the trailing_context crossJoin rule)
    val totals = trainAsg.agg(count(lit(1)).as("nt_total"))
      .crossJoin(batchAsg.agg(count(lit(1)).as("nb_total")))
    cen.select(col("j").as("cell"))
      .join(ts, Seq("cell"), "left")
      .join(bs, Seq("cell"), "left")
      .crossJoin(broadcast(totals))
      .select(col("cell"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"),
        coalesce(col("inertia_train"), lit(0L)).as("inertia_train"),
        coalesce(col("inertia_batch"), lit(0L)).as("inertia_batch"),
        coalesce(col("radius_train"), lit(0L)).as("radius_train"),
        coalesce(col("radius_batch"), lit(0L)).as("radius_batch"),
        col("nt_total"), col("nb_total"))
      .withColumn("mean_d_train",
        col("inertia_train").cast("double") / nullifZero(col("n_train")))
      .withColumn("mean_d_batch",
        col("inertia_batch").cast("double") / nullifZero(col("n_batch")))
      .withColumn("share_train",
        col("n_train").cast("double") / nullifZero(col("nt_total")))
      .withColumn("share_batch",
        col("n_batch").cast("double") / nullifZero(col("nb_total")))
      .withColumn("drift_ratio",
        col("mean_d_batch") / nullifZero(col("mean_d_train")))
      .withColumn("retrain_due",
        coalesce(col("drift_ratio") > lit(driftRatio), lit(false)) ||
          coalesce(col("share_batch") > lit(shareRatio) * col("share_train"),
            lit(false)))
      .drop("nt_total", "nb_total")
      .orderBy("cell")
  }

  /** [[ivfDriftReport]] over the registry's standard corpus/batch carve
    * (vec_id % 3 — the same split [[ivfAttachIncremental]] and the LSH
    * incremental twin use), so `ivf_drift_report` measures drift for
    * exactly the state `ivf_attach_incremental` maintains.
    */
  def ivfDriftReportCarve(
      embeddings: DataFrame, cells: Int = 8, iters: Int = 2): DataFrame =
    ivfDriftReport(
      embeddings.filter(col("vec_id") % 3 =!= 0),
      embeddings.filter(col("vec_id") % 3 === 0), cells, iters)

  /** DuckDB twin of [[ivfDriftReportCarve]]: Lloyd prefix on the corpus
    * carve, train/batch argmin assignments with their min distances,
    * per-cell integer aggregates, scalar totals, and the same NULLIF'd
    * ratio/flag algebra.
    */
  def ivfDriftReportCarveSql(
      cells: Int = 8, iters: Int = 2,
      driftRatio: Double = 1.5, shareRatio: Double = 2.0): String = {
    val d1 = Dim + 1
    s"""WITH ${lloydSqlCtes(cells, iters, where = "vec_id % 3 <> 0")},
       |fcx AS (
       |  SELECT e.vec_id, c.j, SUM((e.q[t.i] - c.cd) * (e.q[t.i] - c.cd)) AS d
       |  FROM e0 e CROSS JOIN range(1, $d1) t(i) JOIN c$iters c ON c.i = t.i
       |  GROUP BY 1, 2),
       |fa AS (
       |  SELECT vec_id, j AS cell, d FROM (
       |    SELECT vec_id, j, d,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
       |    FROM fcx) WHERE rk = 1),
       |e0b AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * $LloydScale.0) AS BIGINT)) AS q
       |  FROM e WHERE vec_id % 3 = 0),
       |bx AS (
       |  SELECT b.vec_id, c.j, SUM((b.q[t.i] - c.cd) * (b.q[t.i] - c.cd)) AS d
       |  FROM e0b b CROSS JOIN range(1, $d1) t(i) JOIN c$iters c ON c.i = t.i
       |  GROUP BY 1, 2),
       |ba AS (
       |  SELECT vec_id, j AS cell, d FROM (
       |    SELECT vec_id, j, d,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
       |    FROM bx) WHERE rk = 1),
       |ts AS (
       |  SELECT cell, COUNT(*) AS n_train, CAST(SUM(d) AS BIGINT) AS inertia_train,
       |    CAST(MAX(d) AS BIGINT) AS radius_train
       |  FROM fa GROUP BY 1),
       |bsx AS (
       |  SELECT cell, COUNT(*) AS n_batch, CAST(SUM(d) AS BIGINT) AS inertia_batch,
       |    CAST(MAX(d) AS BIGINT) AS radius_batch
       |  FROM ba GROUP BY 1),
       |cl AS (SELECT DISTINCT j AS cell FROM c$iters),
       |tot AS (SELECT (SELECT COUNT(*) FROM fa) AS nt_total,
       |               (SELECT COUNT(*) FROM ba) AS nb_total),
       |rep AS (
       |  SELECT c.cell,
       |    COALESCE(ts.n_train, 0) AS n_train,
       |    COALESCE(bsx.n_batch, 0) AS n_batch,
       |    COALESCE(ts.inertia_train, 0) AS inertia_train,
       |    COALESCE(bsx.inertia_batch, 0) AS inertia_batch,
       |    COALESCE(ts.radius_train, 0) AS radius_train,
       |    COALESCE(bsx.radius_batch, 0) AS radius_batch,
       |    tot.nt_total, tot.nb_total
       |  FROM cl c LEFT JOIN ts USING (cell) LEFT JOIN bsx USING (cell)
       |    CROSS JOIN tot),
       |rep2 AS (
       |  SELECT *,
       |    CAST(inertia_train AS DOUBLE) / NULLIF(n_train, 0) AS mean_d_train,
       |    CAST(inertia_batch AS DOUBLE) / NULLIF(n_batch, 0) AS mean_d_batch,
       |    CAST(n_train AS DOUBLE) / NULLIF(nt_total, 0) AS share_train,
       |    CAST(n_batch AS DOUBLE) / NULLIF(nb_total, 0) AS share_batch
       |  FROM rep)
       |SELECT cell, n_train, n_batch, inertia_train, inertia_batch,
       |  radius_train, radius_batch, mean_d_train, mean_d_batch,
       |  share_train, share_batch,
       |  mean_d_batch / NULLIF(mean_d_train, 0.0) AS drift_ratio,
       |  COALESCE(mean_d_batch / NULLIF(mean_d_train, 0.0) > $driftRatio, FALSE)
       |    OR COALESCE(share_batch > $shareRatio * share_train, FALSE) AS retrain_due
       |FROM rep2 ORDER BY cell""".stripMargin
  }

  // ─────────────── clustered-embedding fixture (r13) ───────────────────

  /** Deterministic CLUSTERED embedding table — the honest input for ANN
    * operating-point experiments (VERDICT r12 item 4): the testdata
    * embeddings are structureless random vectors, on which
    * `ivf_lloyd_recall` reads 0.44 at nprobe=2/16 — not because the
    * operator is weak but because there is no cluster structure for the
    * coarse quantizer to find. Real embedding corpora ARE clustered
    * (that's why IVF works in production), so the recall trade-off the
    * operator exists to measure needs a clustered table to be visible.
    *
    * Generator (MockFlow's md5-draw style — both engines share the hash,
    * [[clusteredEmbeddingsCte]] is the verbatim DuckDB twin):
    *   - vec_id 0..n-1; true cluster g = int(md5("cg|"+id)[0:6 hex]) % k;
    *   - embedding[i] = center + noise, center = 8.0 iff i % k == g else
    *     0 (k disjoint axis blocks — separated by construction), noise =
    *     (u48("ce|"+id+"|"+i) − 0.5)·0.5 ∈ [−0.25, 0.25);
    *   - label = g (same role as the testdata's label column).
    * Every arithmetic step is exact in double (48-bit dyadic uniforms,
    * power-of-two scales, 8+noise fits 52 mantissa bits), and the one
    * rounding — the final float cast — is the same IEEE operation in
    * both engines, so the TABLE ITSELF is oracle-exact, not just the
    * queries over it.
    */
  def clusteredEmbeddings(spark: org.apache.spark.sql.SparkSession,
      n: Int = 500, kTrue: Int = 8): DataFrame = {
    def u48(key: Column): Column =
      conv(substring(md5(key), 1, 12), 16, 10).cast("long")
        .cast("double") / lit((1L << 48).toDouble)
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("g",
        (conv(substring(md5(concat(lit("cg|"), col("vec_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % kTrue).cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(Dim - 1)), i =>
          (when(pmod(i, lit(kTrue)) === col("g"), lit(8.0d)).otherwise(lit(0.0d))
            + (u48(concat(lit("ce|"), col("vec_id").cast("string"),
                lit("|"), i.cast("string"))) - lit(0.5d)) * lit(0.5d))
            .cast("float")))
      .select(col("vec_id"), col("embedding"), col("g").as("label"))
  }

  /** DuckDB twin of [[clusteredEmbeddings]], as a WITH prelude that
    * SHADOWS the `embeddings` table (CTE names take precedence), so any
    * existing oracle SQL runs unchanged over the generated table. Ends
    * with a comma — splice as the `prelude` of [[ivfLloydRecallSql]] /
    * [[sq8RecallSql]].
    */
  def clusteredEmbeddingsCte(n: Int = 500, kTrue: Int = 8): String = {
    def hexSum(key: String, digits: Int): String =
      (0 until digits).map(j =>
        s"CAST(${graft.text.TextOps.hexValSql(s"substr(md5($key), ${j + 1}, 1)")} AS BIGINT) * ${1L << (4 * (digits - 1 - j))}")
        .mkString("(", " + ", ")")
    def u48(key: String): String =
      s"(${hexSum(key, 12)} / CAST(${1L << 48} AS DOUBLE))"
    val gExpr =
      s"CAST(${hexSum("'cg|' || CAST(t.vec_id AS VARCHAR)", 6)} % $kTrue AS INTEGER)"
    val dimKey = "'ce|' || CAST(vec_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)"
    val noise = s"(${u48(dimKey)} - 0.5) * 0.5"
    // AS MATERIALIZED is load-bearing: a plain CTE gets INLINED into
    // every one of the Lloyd chain's ~10 references to the source table,
    // and DuckDB's optimizer loses the cardinality of the computed
    // subquery — the inlined plan exhausted memory where the same chain
    // over a base table runs in seconds. Materializing restores
    // base-table behavior (measured: OOM → 1.8 s).
    s"""embeddings AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(range(0, $Dim), i ->
       |      CAST((CASE WHEN i % $kTrue = g THEN 8.0 ELSE 0.0 END + $noise) AS REAL)) AS embedding,
       |    g AS label
       |  FROM (SELECT t.vec_id, $gExpr AS g FROM range(0, $n) t(vec_id))),
       |""".stripMargin
  }
}
