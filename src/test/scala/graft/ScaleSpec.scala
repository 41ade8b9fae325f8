package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.rel.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    // hot key: 5000 of 5100 fact rows share key "hot"
    val fact = ((1 to 5000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dim_v")
    val plain = fact.join(dim, "key")
    val salted = Scale.saltedJoin(fact, dim, "key", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salted fact side spreads the hot key across several salt values
    val spread = fact.withColumn("__salt",
      pmod(xxhash64(col("key"), col("v")), lit(8)).cast("int"))
      .filter(col("key") === "hot").select("__salt").distinct().count()
    assert(spread > 4)
  }

  test("date-partitioned layout prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val ev = TestdataAdapter.vehiclePositions(spark, "/root/testdata/sf0.001")
    Scale.writePartitionedByDay(ev, "observed_at", dir)
    val day = Scale.readDay(spark, dir, "2024-01-05")
    val expected = ev.filter(to_date(col("observed_at")) === "2024-01-05").count()
    assert(day.count() == expected && expected > 0)
    // the date predicate must reach the scan as a partition filter
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"no partition pruning in plan:\n$plan")
  }
}
