package graft

import org.apache.spark.sql.functions._

import graft.sim.{Knn, KnnGraph}

/** Graph-based ANN (r16, VERDICT item 2): the round-batched NSW build,
  * the beam-search serving path, and the operating-point claim — graph
  * recall at or above IVF recall at a comparable candidate budget on
  * the clustered fixture.
  */
class KnnGraphSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("graphTopK: k self-free neighbors per query, deterministically ranked") {
    val out = KnnGraph.graphTopK(
      TestdataAdapter.table(spark, sfDir, "embeddings")).collect()
    assert(out.length == 50, s"expected 10 queries x 5 rows, got ${out.length}")
    assert(out.forall(r =>
      r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")),
      "self returned as its own neighbor")
    val perQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.values.forall(_.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5)),
      "ranks are not 1..5 per query")
    perQ.values.foreach { rows =>
      val ds = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("d"))
      assert(ds.sorted.toSeq == ds.toSeq, "distances not ascending in rank")
    }
  }

  test("clustered fixture: graph recall >= IVF recall at a comparable budget") {
    val rows = KnnGraph.graphRecall(Knn.clusteredEmbeddings(spark)).collect()
    val g = rows.find(_.getAs[String]("method") == "graph")
      .getOrElse(fail("graph row missing"))
    val i = rows.find(_.getAs[String]("method") == "ivf")
      .getOrElse(fail("ivf row missing"))
    val (gr, ir) = (g.getAs[Double]("recall"), i.getAs[Double]("recall"))
    val (gb, ib) =
      (g.getAs[Double]("avg_candidates"), i.getAs[Double]("avg_candidates"))
    assert(gr >= ir,
      s"graph recall $gr below IVF recall $ir (budgets: graph $gb, ivf $ib)")
    assert(gb <= ib * 1.25,
      s"graph budget $gb not matched to IVF budget $ib — the recall " +
        "would be bought with candidates, not the index")
    assert(gr >= 0.95, s"graph recall $gr too weak on the clustered fixture")
  }
}
