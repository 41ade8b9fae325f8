package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def events = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map(i => ((i % 37).toLong, i.toLong, rnd.nextInt(1000).toDouble))
      .toDF("user_id", "event_id", "value")
  }

  test("custom operator matches the window+filter phrasing exactly") {
    GraftExtensions.register(spark)
    val df = events
    val custom = TopKPerGroup.topK(df, Seq("user_id"),
        Seq("value" -> true, "event_id" -> false), k = 3)
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
      .collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
      .collect().toSeq
    assert(custom == viaWindow)
  }

  test("plan contains the custom exec, one exchange, and NO sort") {
    GraftExtensions.register(spark)
    val q = TopKPerGroup.topK(events, Seq("user_id"),
      Seq("value" -> true, "event_id" -> false), k = 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Sort"), s"unexpected sort:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, s"plan:\n$plan")
  }

  test("k larger than group size keeps whole groups; k=1 keeps the best row") {
    GraftExtensions.register(spark)
    val tiny = Seq((1L, 1L, 5.0), (1L, 2L, 7.0), (2L, 3L, 1.0))
      .toDF("user_id", "event_id", "value")
    val all = TopKPerGroup.topK(tiny, Seq("user_id"),
      Seq("value" -> true, "event_id" -> false), k = 10).count()
    assert(all == 3)
    val best = TopKPerGroup.topK(tiny, Seq("user_id"),
      Seq("value" -> true, "event_id" -> false), k = 1)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(best == Map(1L -> 2L, 2L -> 3L))
  }
}
