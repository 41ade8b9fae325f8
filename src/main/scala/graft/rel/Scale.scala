package graft.rel

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale mechanics that don't exist in the reference (single-node pandas
  * never needed them) but are load-bearing at 100 TB:
  *
  *  - salted equi-joins for skewed keys: AQE's skew-join handles sort-merge
  *    skew automatically, but a pathologically hot key joined against a
  *    non-broadcastable dim still serializes one reducer — salting splits
  *    the hot key across `salts` reducers deterministically;
  *  - date-partitioned storage layout: the reference's btree indexes on
  *    observed_at/route_id become hive-style event_date partitions +
  *    parquet min/max pruning, so time-bounded queries (every hourly view)
  *    scan only the touched partitions.
  */
object Scale {

  /** Inner equi-join where `fact`'s `key` may be heavily skewed: the fact
    * side gets a deterministic salt in [0, salts), the dim side is
    * replicated once per salt value, and the join key becomes (key, salt).
    * Result is exactly the plain join (salting only changes partitioning).
    * The fact salt hashes all fact columns so a hot key spreads evenly and
    * the plan stays deterministic (no rand()).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val factCols = fact.columns.map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(salts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Events written as hive-partitioned parquet by event date — the scan
    * layout every hourly view wants: partition pruning on date, min/max
    * row-group pruning within a day.
    */
  def writePartitionedByDay(events: DataFrame, tsCol: String, path: String): Unit =
    events
      .withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(path)

  /** Read back one day; the date predicate must show up as a partition
    * filter (no full scan).
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day))

  /** Write a table bucketed (and sorted) by the join key — the layout
    * that makes repeated fact⋈fact joins exchange-free: both sides
    * pre-hashed into the same bucket count means the sort-merge join
    * reads co-located buckets with NO shuffle at query time. At 100 TB
    * this converts the nightly "re-shuffle both tables" cost into a
    * one-time write-layout cost amortized over every subsequent join;
    * it is Spark's equivalent of the reference's btree-indexed join
    * columns.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Inner equi-join of two tables bucketed on `key` with the same bucket
    * count — plans as a zero-exchange sort-merge join (asserted by spec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Small-file compaction — the maintenance pass every long-running
    * ingestion layout needs: streaming/hourly writers leave thousands of
    * tiny files per partition, and scan throughput dies on open/seek
    * overhead (at 100 TB the NameNode/listing cost alone matters). Rewrite
    * into ~`targetRecordsPerFile`-row files, range-clustered by `key` so
    * the compacted files also carry min/max pruning on the clustering key.
    * Two passes by design (count, then write) — exactly what table-format
    * OPTIMIZE jobs do.
    */
  def compact(spark: SparkSession, path: String, key: String,
              targetRecordsPerFile: Long): Unit = {
    val df = spark.read.parquet(path)
    val files = math.max(1, math.ceil(df.count().toDouble / targetRecordsPerFile).toInt)
    val tmp = path.stripSuffix("/") + "__compacting"
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (same filesystem): a production table format makes
    // this a metadata commit instead
    val fs = new java.io.File(path)
    val bak = new java.io.File(path + "__old")
    require(fs.renameTo(bak), s"could not stage $path aside")
    require(new java.io.File(tmp).renameTo(fs), s"could not activate $tmp")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(bak)
  }

  /** Dense global row numbering in sort order WITHOUT a single-partition
    * window — `ROW_NUMBER() OVER (ORDER BY key)` funnels the entire table
    * through one task; this is the distributed form every sharding/
    * example-numbering step of a training pipeline uses instead:
    * range-repartition on the key (distributed total sort), then RDD
    * `zipWithIndex` (one lightweight count job for per-partition offsets,
    * then a narrow index stamp). The key must be unique — ties crossing
    * range boundaries would make the order, and thus the index,
    * layout-dependent. One of the two sanctioned RDD drops in the repo
    * (genuine per-partition imperative logic: the offset stamp).
    */
  def globalIndex(df: DataFrame, key: String, partitions: Int = 32): DataFrame =
    globalIndex(df, Seq(key), partitions)

  /** Multi-key form: the keys together must be a total order (append a
    * unique tiebreak column), for the same layout-independence reason as
    * the single-key contract.
    */
  def globalIndex(df: DataFrame, keys: Seq[String], partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, sorted.schema.add("global_idx", LongType, nullable = false))
  }

  /** Distributed global prefix sum + budgeted sharding — the
    * sequence-packing step of a training pipeline: walk the corpus in
    * key order, accumulate per-row weights (token counts), cut a new
    * shard every `budget` tokens. `SUM(w) OVER (ORDER BY key)` plans to
    * a single-partition window; this is the classic two-pass distributed
    * form instead: range-partition on the key, per-partition local
    * cumsum (window keyed by the physical partition id), then add each
    * partition's broadcast running offset. The only global window runs
    * over the `partitions`-row totals frame — driver-sized by
    * construction. Key must be a unique total order; weights must be
    * non-negative.
    */
  def prefixSumShards(
      df: DataFrame, key: String, valueCol: String,
      budget: Long, partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(key)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(key)
    val localSum = local.withColumn("__local_cum", sum(col(valueCol)).over(w))
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy("__pid").agg(sum(col(valueCol)).as("__ptotal"))
      .withColumn("__offset", coalesce(sum("__ptotal").over(wo), lit(0L)))
      .select("__pid", "__offset")
    localSum.join(broadcast(offs), "__pid")
      .withColumn("cum_tokens", (col("__local_cum") + col("__offset")).cast("long"))
      .withColumn("shard_id",
        expr(s"(cum_tokens - $valueCol) DIV $budget"))
      .drop("__pid", "__local_cum", "__offset")
  }

  /** Exact `NTILE(n) OVER (ORDER BY keys)` without the single-partition
    * window that plan shape funnels into: distributed range-sort global
    * numbering ([[globalIndex]]) plus one broadcast 1-row total, then the
    * positional NTILE rule computed per row (the first `count % n`
    * buckets hold one extra row). Matches SQL NTILE bit-for-bit while
    * every step stays distributed — the shape quality-tier bucketing of
    * a corpus needs (curriculum buckets, per-tier sampling rates), where
    * `ntile().over(Window.orderBy(...))` would drag 100 TB through one
    * task. Keys must be a total order (include a unique tiebreak), which
    * the window form needs for determinism anyway.
    */
  def ntileExact(df: DataFrame, n: Int, keys: Seq[String], partitions: Int = 32): DataFrame = {
    // persisted: the total aggregate and the final projection would each
    // re-run the range sort + index stamp otherwise
    val indexed = globalIndex(df, keys, partitions).persist()
    val total = indexed.agg(count(lit(1)).as("__total"))
    indexed
      .crossJoin(broadcast(total))
      .withColumn("__q", expr(s"__total DIV $n"))
      .withColumn("__m", expr(s"__total % $n"))
      // rows where __q = 0 all land in the first branch (global_idx <
      // __m = __total), so the __q divisor below is never 0 when used
      .withColumn("tier",
        when(col("global_idx") < col("__m") * (col("__q") + 1),
          expr("global_idx DIV (__q + 1) + 1"))
          .otherwise(expr("(global_idx - __m * (__q + 1)) DIV __q + __m + 1")))
      .drop("__total", "__q", "__m")
  }

  /** Exact `NTILE(n) OVER (PARTITION BY group ORDER BY keys)` with the
    * same distributed shape as [[ntileExact]]: one group-major range
    * sort for the global numbering, then each group's own zero-based
    * index is recovered by subtracting the group's minimum global index
    * (a groups-sized broadcast aggregate — no per-group single-reducer
    * window anywhere). The positional NTILE rule then runs per row with
    * per-group totals. Matches the window form bit-for-bit; `group ++
    * keys` must be a total order (unique tiebreak in `keys`). The join
    * back onto the group aggregate is null-SAFE (`<=>`), so rows with a
    * NULL group key tier as their own partition exactly like
    * `PARTITION BY` treats them; `indexed` is persisted because three
    * actions (offset count job, group aggregate, final join) would
    * otherwise each re-run the range sort + index stamp.
    */
  def ntileExactBy(df: DataFrame, n: Int, group: Seq[String], keys: Seq[String],
      partitions: Int = 32): DataFrame = {
    val indexed = globalIndex(df, group ++ keys, partitions).persist()
    val g = indexed.groupBy(group.map(col): _*)
      .agg(min("global_idx").as("__g0"), count(lit(1)).as("__total"))
    val gAliased = g.select(
      group.map(c => col(c).as(s"__gk_$c")) ++ Seq(col("__g0"), col("__total")): _*)
    val joinCond = group.map(c => col(c) <=> col(s"__gk_$c")).reduce(_ && _)
    indexed
      .join(broadcast(gAliased), joinCond)
      .drop(group.map(c => s"__gk_$c"): _*)
      .withColumn("__idx", col("global_idx") - col("__g0"))
      .withColumn("__q", expr(s"__total DIV $n"))
      .withColumn("__m", expr(s"__total % $n"))
      .withColumn("tier",
        when(col("__idx") < col("__m") * (col("__q") + 1),
          expr("__idx DIV (__q + 1) + 1"))
          .otherwise(expr("(__idx - __m * (__q + 1)) DIV __q + __m + 1")))
      .drop("__g0", "__idx", "__total", "__q", "__m", "global_idx")
  }

  /** Morton interleave of two `bits`-bit bucket columns: bit b of x
    * lands at position 2b, bit b of y at 2b+1 — locality in z-value
    * implies locality in BOTH dimensions.
    */
  private def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Z-order clustered write — multi-column data skipping for the
    * filters partitioning can't serve. Partitioning prunes on ONE
    * hierarchy (date); min/max stats prune within it, but only if the
    * layout makes per-file ranges tight. Sorting by a single column
    * gives tight ranges on that column and full-span ranges on every
    * other; clustering by the Morton interleave of two columns gives
    * each file a small bounding BOX, so selective predicates on EITHER
    * column skip most files at the footer level — the OPTIMIZE ZORDER
    * lever of lakehouse tables, as a plain parquet write.
    *
    * Buckets are QUANTILE-based (approxQuantile boundaries), not linear
    * min/max bins: real columns are skewed, and equal-width bins would
    * pile the mass into a few cells and cluster nothing — rank
    * normalization is what production z-ordering does. Shape: two
    * driver-side quantile sketches (one distributed pass each), then
    * narrow codegen bucketing + interleave, then one range repartition
    * on the z-value — the same machinery as any global sort, parallel
    * at any scale.
    */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
      nFiles: Int = 8, bits: Int = 4): Unit = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    def boundaries(c: String): Array[Double] =
      df.select(col(c).cast("double").as("__v"))
        .stat.approxQuantile("__v", probs, 0.001)
    def bucket(c: String, bs: Array[Double]): Column =
      bs.foldLeft(lit(0L))((acc, th) =>
        acc + when(col(c).cast("double") > lit(th), 1L).otherwise(0L))
    val cols = df.columns
    df.withColumn("__z", morton(
        bucket(c1, boundaries(c1)), bucket(c2, boundaries(c2)), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Incremental hourly-view refresh — the reference's hourly DAG
    * semantics (recompute the recent window, upsert into the serving
    * table) on parquet: DYNAMIC partition overwrite replaces exactly the
    * hour partitions present in `slice` and leaves every other partition
    * byte-untouched. At 100 TB this is the difference between an hourly
    * job that rewrites one hour and one that rewrites the table.
    * The caller computes `slice` (e.g. the trailing 2 hours of a view);
    * this function owns only the layout contract.
    */
  def overwriteHourPartitions(slice: DataFrame, tsCol: String, path: String): Unit =
    slice
      .withColumn("hour_part", date_format(col(tsCol), "yyyy-MM-dd-HH"))
      .repartition(col("hour_part"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("hour_part")
      .parquet(path)
}
