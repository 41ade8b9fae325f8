package graft

import org.apache.spark.sql.functions._
import graft.rel.Relational

/** Relational.rangeJoinHourly — the bucketed interval-overlap join.
  * Semantics pinned against the naive inequality join (which Spark plans
  * as a nested-loop — fine at spec scale, the thing the operator exists
  * to avoid at 100 TB), plus [start, end) boundary exclusivity and a
  * plan-shape check that the bucketed form really is equality-joined.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private lazy val points = Seq(
    (1L, "2024-01-01 05:14:59"),
    (2L, "2024-01-01 05:15:00"), // == start: inclusive
    (3L, "2024-01-01 06:30:00"),
    (4L, "2024-01-01 06:45:00"), // == end: exclusive
    (5L, "2024-01-01 12:00:00"), // no window
    (6L, "2024-01-02 05:59:59")
  ).toDF("id", "t").select(col("id"), to_timestamp(col("t")).as("t"))

  private lazy val intervals = Seq(
    ("w1", "2024-01-01 05:15:00", "2024-01-01 06:45:00"),
    ("w2", "2024-01-02 05:00:00", "2024-01-02 06:00:00"),
    ("w3", "2024-01-03 09:00:00", "2024-01-03 09:00:00") // empty [x, x)
  ).toDF("wid", "s", "e").select(col("wid"),
    to_timestamp(col("s")).as("s"), to_timestamp(col("e")).as("e"))

  test("matches the naive inequality join exactly, [start, end) boundaries included") {
    val bucketed = Relational.rangeJoinHourly(points, "t", intervals, "s", "e")
      .select("id", "wid").as[(Long, String)].collect().toSet
    val naive = points.join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .select("id", "wid").as[(Long, String)].collect().toSet
    assert(bucketed === naive)
    assert(bucketed === Set((2L, "w1"), (3L, "w1"), (6L, "w2")))
  }

  test("each match surfaces exactly once (point hour-bucket is unique)") {
    val out = Relational.rangeJoinHourly(points, "t", intervals, "s", "e")
      .groupBy("id", "wid").count().filter(col("count") > 1)
    assert(out.isEmpty)
  }

  test("plans as an equality join on the hour bucket, not a nested loop") {
    val plan = Relational.rangeJoinHourly(points, "t", intervals, "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
