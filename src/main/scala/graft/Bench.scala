package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric","value","unit","queries",...}.
  *
  * Each query is forced through the noop sink — a bare count() lets
  * Catalyst prune projections, so it under-measures expression-heavy
  * plans; noop materializes every output row/column. One untimed warmup
  * query absorbs JVM/codegen/filesystem warmup so per-query numbers
  * reflect steady state.
  *
  * Per-query time is the MEDIAN of SPARK_GRAFT_BENCH_RUNS (default 3)
  * back-to-back runs: single-run numbers on a shared machine have
  * swung ~13× round-over-round, which made every cross-round
  * comparison noise-bound; the median absorbs one arbitrarily bad run
  * per query while staying honest about steady-state cost.
  *
  * Spread reporting (r11): queries whose 3-run median lands at ≥ 3 s
  * get topped up to SPARK_GRAFT_BENCH_SLOW_RUNS (default 5) reps — two
  * identical-code sweeps 23 min apart once differed 3× on one such
  * query, so the expensive tail is exactly where per-query regression
  * tracking needs more samples. The full results file carries
  * min/median/max per query plus a `variance_flags` list (max/min > 2×
  * — "this number is noise-bound, re-bench isolated before calling it
  * a regression") and, since r12, a `variance_causes` map classifying
  * each flag: `first_rep` (the slow sample is rep 1 and the rest are
  * tight — per-query warmup / memoized state seeding; the median is
  * already steady-state) vs `scatter` (spread persists past rep 1 —
  * box contention, re-bench isolated).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val slowRuns = math.max(runs,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW_RUNS", "5").toInt)
    val slowThresholdSec = 3.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // local-mode broadcast/shuffle state is only reclaimed on GC; 49
      // sequential queries otherwise degrade from heap pressure
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    def cleanup(): Unit = {
      // untimed between-run cleanup: drop caches persisted by library
      // pipelines and nudge the cleaner, so one run's leftovers don't
      // tax the next run's GC
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    try force("q1_pricing") catch { case _: Throwable => () } // warmup, untimed

    // dev-only subsetting: `runMain graft.Bench name1 name2` times just
    // those queries; the driver passes no args → full sweep, unchanged
    val only = args.toSet
    // Locale.ROOT: under a comma-decimal default locale (e.g. de_DE) an
    // f-interpolator "%.3f" would emit "0,123" and corrupt the JSON
    def fmt(v: Double): String =
      if (v < 0) "-1.0"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    case class R(name: String, median: Double, min: Double, max: Double,
        ok: Int, attempts: Int, reps: Seq[Double])
    def medianOf(s: Seq[Double]): Double =
      if (s.isEmpty) -1.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n)).map { name =>
      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        val ok = try { force(name); true } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.toString.take(300)}"); false
        }
        val secs = (System.nanoTime() - t0) / 1e9
        cleanup()
        if (ok) secs else -1.0
      }
      val base = (1 to runs).map(_ => timeOnce())
      // expensive tail → more samples: top up to slowRuns reps when the
      // base median already sits at ≥ the slow threshold (bounded cost —
      // only the handful of multi-second queries pay the extra reps)
      val extra =
        if (medianOf(base.filter(_ >= 0).sorted) >= slowThresholdSec)
          ((runs + 1) to slowRuns).map(_ => timeOnce())
        else Seq.empty
      val times = base ++ extra
      // stats over the runs that succeeded; -1 only when every run
      // failed — one transient failure shouldn't discard usable timings
      val s = times.filter(_ >= 0).sorted
      val median = medianOf(s)
      // per-query progress line: survives stdout tail-truncation even when
      // the final one-line JSON does not (190 queries ≈ several KB on one
      // line; the driver's tail capture has chopped it two rounds running)
      println(s"[bench] q=$name median=${fmt(median)} " +
        s"min=${fmt(if (s.isEmpty) -1.0 else s.head)} " +
        s"max=${fmt(if (s.isEmpty) -1.0 else s.last)} ok=${s.length}/${times.length}")
      R(name, median, if (s.isEmpty) -1.0 else s.head,
        if (s.isEmpty) -1.0 else s.last, s.length, times.length,
        times.filter(_ >= 0))
    }
    val qs = results.map(r => "\"" + r.name + "\":" + fmt(r.median)).mkString("{", ",", "}")
    val total = results.collect { case r if r.median >= 0 => r.median }.sum
    // flaky queries (some but not all runs failed) are reported, not
    // hidden — a lone surviving sample on a ~13×-noise box is not a
    // healthy median, and the -1 convention only covers total failure
    val partial = results.collect { case r if r.ok > 0 && r.ok < r.attempts =>
      "\"" + r.name + "\":" + r.ok
    }.mkString("{", ",", "}")
    // per-query spread (min/median/max over the reps) + the noise-bound
    // list: max/min > 2× means the sample band alone spans a factor the
    // round-over-round gate would otherwise misread as a regression
    val spread = results.map(r =>
      "\"" + r.name + "\":{\"min\":" + fmt(r.min) + ",\"median\":" + fmt(r.median) +
        ",\"max\":" + fmt(r.max) + ",\"runs\":" + r.ok + "}").mkString("{", ",", "}")
    val flagged = results.filter(r => r.min > 0 && r.max / r.min > 2.0)
    val varianceFlags = flagged
      .map(r => "\"" + r.name + "\"").mkString("[", ",", "]")
    // r12: flags carry an automated CAUSE, so a wide band reads as a
    // diagnosis instead of a to-investigate. "first_rep": the slow
    // sample is rep 1 and the remaining reps sit in a tight band —
    // per-query warmup (codegen, scan cache, memoized state seeding for
    // the maintained-index queries), not instability; the median already
    // reflects steady state. "scatter": the spread persists past rep 1 —
    // suite/box contention (the r11 isolated re-benches pinned this for
    // dedup_containment), re-bench isolated before calling a regression.
    val varianceCauses = flagged.map { r =>
      val rest = r.reps.drop(1)
      val cause =
        if (rest.size >= 2 && r.reps.head == r.max &&
          rest.max / rest.min <= 1.5) "first_rep"
        else "scatter"
      "\"" + r.name + "\":\"" + cause + "\""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"variance_flags":$varianceFlags,"variance_causes":$varianceCauses,"sf":"$sfDir","runs":$runs,"slow_runs":$slowRuns,"stat":"median","partial_ok":$partial}"""
    // persist the FULL results object (all ~200 per-query timings) to a
    // file; at 200+ queries the one-line form is ~5 KB, which the driver's
    // stdout tail-capture front-truncates into unparseable JSON
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json"))
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
      System.err.println(s"[bench] full results written to ${out.toAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist results file: $e")
    }
    // the LAST stdout line is a COMPACT (<2 KB) JSON object that survives
    // tail truncation intact: total + the slowest queries only, with a
    // pointer to the full artifact. The per-query `[bench] q=...` progress
    // lines above carry the rest of the detail in stdout form.
    val slowest = results.filter(_.median >= 0).sortBy(-_.median).take(40)
      .map(r => "\"" + r.name + "\":" + fmt(r.median)).mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$slowest,"n_queries":${results.length},"queries_shown":"slowest40","variance_flags":$varianceFlags,"variance_causes":$varianceCauses,"full_results":"bench_results.json","sf":"$sfDir","runs":$runs,"slow_runs":$slowRuns,"stat":"median","partial_ok":$partial}"""
    println("=== BENCH_JSON ===")
    println(compact)
    spark.stop()
  }
}
