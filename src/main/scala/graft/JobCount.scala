package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling main (r17 optimization round): run named queries
  * once through the noop sink and print how many Spark JOBS, STAGES and
  * TASKS each one launched, plus wall seconds. Iterative operators
  * (Lloyd chains, beam searches, power iterations) hide their structure
  * from `explain` behind localCheckpoint leaves — job/stage counts are
  * the honest shape evidence for those, committed next to the plan
  * files under plans/r17/.
  *
  *   sbt "runMain graft.JobCount /root/testdata/sf0.1 q1 q2 ..."
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    // one untimed warmup absorbs codegen/filesystem cold start
    try SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      // settle async listener events from the previous query (the bus
      // is private[spark]; a short sleep is enough for a dev tool)
      Thread.sleep(1000)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[jobcount] q=$name%-34s jobs=${jobs.get}%4d stages=${stages.get}%5d tasks=${tasks.get}%7d secs=$secs%8.3f")
    }
    spark.stop()
  }
}
