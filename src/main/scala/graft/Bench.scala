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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    try force("q1_pricing") catch { case _: Throwable => () } // warmup, untimed

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val ok = try { force(name); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.toString.take(300)}"); false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // untimed between-query cleanup: drop caches persisted by library
      // pipelines and nudge the cleaner, so one query's leftovers don't
      // tax the next query's GC
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      name -> (if (ok) secs else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
