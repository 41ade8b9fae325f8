package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProductFloat.dotProduct

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)((rnd.nextFloat() - 0.5f) * 10f),
      Array.fill(dim)((rnd.nextFloat() - 0.5f) * 10f)))
      .toDF("id", "a", "b")
  }

  test("native expression is bit-identical to the composed 64-term sum") {
    val df = vecs(500, 64)
    val composed = (0 until 64).map(i =>
      col("a").getItem(i).cast("double") * col("b").getItem(i).cast("double"))
      .reduceLeft(_ + _)
    val r = df.select(dotProduct(col("a"), col("b")).as("native"), composed.as("composed"))
      .as[(Double, Double)].collect()
    // exact bit equality, not tolerance — same order, same arithmetic
    assert(r.forall { case (n, c) => java.lang.Double.doubleToRawLongBits(n) ==
      java.lang.Double.doubleToRawLongBits(c) })
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),          // 11.0
      (2L, null.asInstanceOf[Array[Float]], Array(3f, 4f)),
      (3L, Array(1f, 2f), Array(3f)))              // length mismatch
      .toDF("id", "a", "b")
      .union(Seq((4L, Seq(Some(1f), None), Seq(Some(1f), Some(1f))))
        .toDF("id", "a", "b"))                     // null element
    val r = df.select(col("id"), dotProduct(col("a"), col("b")).as("d"))
      .collect().map(row => row.getLong(0) -> (if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    assert(r(1L) == 11.0)
    assert(r(2L) == null && r(3L) == null && r(4L) == null)
  }

  test("the fused loop runs inside whole-stage codegen") {
    // a real scan (not LocalTableScan, which constant-folds projections)
    val dir = java.nio.file.Files.createTempDirectory("graft_dot").toString
    vecs(10, 8).write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select(dotProduct(col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen marker in the plan string; the
    // projection carrying graft_dot must sit inside such a span
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")),
      s"graft_dot not inside a codegen span:\n$plan")
    assert(q.collect().length == 10)
  }

  test("graft_dot is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    vecs(3, 4).createOrReplaceTempView("dot_vecs")
    val r = spark.sql(
      "SELECT id, graft_dot(a, b) AS d FROM dot_vecs ORDER BY id").collect()
    assert(r.length == 3 && r.forall(!_.isNullAt(1)))
    // registration is idempotent
    GraftExtensions.register(spark)
  }
}
