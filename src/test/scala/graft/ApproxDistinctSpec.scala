package graft

import org.apache.spark.sql.functions._
import graft.plans.ApproxDistinctRule

class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 20000)
    .map(i => (s"u${i % 3777}", i % 5)).toDF("user", "grp")

  test("approx mode off: exact distinct plan and exact result") {
    GraftExtensions.register(spark)
    val q = df.groupBy("grp").agg(countDistinct("user").as("n"))
    assert(q.collect().map(_.getAs[Long]("n")).forall(_ > 0))
    assert(q.queryExecution.optimizedPlan.toString.contains("count(distinct"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    val exact = q.orderBy("grp").as[(Int, Long)].collect()
    assert(exact.forall(_._2 == 3777L)) // every grp sees all users
  }

  test("approx mode on: COUNT(DISTINCT) rewrites to HLL++ within its error bound") {
    GraftExtensions.register(spark)
    spark.conf.set(ApproxDistinctRule.ConfKey, "true")
    try {
      val q = df.groupBy("grp").agg(countDistinct("user").as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), s"not rewritten:\n$plan")
      assert(!plan.contains("count(distinct"), s"exact distinct survived:\n$plan")
      for (n <- q.collect().map(_.getAs[Long]("n")))
        assert(math.abs(n - 3777.0) / 3777.0 < 0.05, s"HLL estimate $n off >5%")
      // multi-column distinct has no sketch equivalent — untouched
      val multi = df.groupBy("grp").agg(countDistinct(col("user"), col("grp")).as("n"))
      assert(multi.queryExecution.optimizedPlan.toString.contains("count(distinct"))
      assert(multi.collect().map(_.getAs[Long]("n")).forall(_ == 3777L))
    } finally spark.conf.unset(ApproxDistinctRule.ConfKey)
  }

  test("flag resets cleanly: exact semantics restored for the rest of the session") {
    GraftExtensions.register(spark)
    val q = df.groupBy("grp").agg(countDistinct("user").as("n"))
    assert(q.collect().map(_.getAs[Long]("n")).forall(_ == 3777L))
  }
}
