package graft

import graft.text.TextOps

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "apple banana apple"),
    (1L, "banana cherry"),
    (2L, "cherry cherry cherry apple")).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Robertson score and ranks by it") {
    // N=3, avgdl=3.0; query "apple zzz": df(apple)=2, idf=ln(1.6);
    // doc0 tf=2 dl=3 -> idf*2*2.2/(2+1.2*1.0); doc2 tf=1 dl=4 ->
    // idf*2.2/(1+1.2*(0.25+0.75*4/3)); the absent term contributes nothing.
    val out = TextOps.searchBm25(docs, queries = Seq(1 -> "apple zzz"), k = 10).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(4))).toSeq == Seq((0L, 1L), (2L, 2L)))
    val idf = math.log(1.6)
    val exp0 = BigDecimal(idf * 2.0 * 2.2 / (2.0 + 1.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(idf * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.find(_.getLong(1) == 0L).get.getAs[Double]("score") == exp0)
    assert(out.find(_.getLong(1) == 2L).get.getAs[Double]("score") == exp2)
    assert(out.forall(_.getAs[Long]("n_terms") == 1L))
  }

  test("multi-term queries sum contributions and all-absent queries return no rows") {
    val out = TextOps.searchBm25(docs,
      queries = Seq(1 -> "apple banana", 2 -> "zzz"), k = 10).collect()
    assert(!out.exists(_.getInt(0) == 2))
    // doc0 matches both terms and must outrank the single-term docs.
    val q1 = out.filter(_.getInt(0) == 1).sortBy(_.getLong(4))
    assert(q1.head.getLong(1) == 0L && q1.head.getAs[Long]("n_terms") == 2L)
    assert(q1.map(_.getLong(1)).toSet == Set(0L, 1L, 2L))
  }

  test("k bounds the per-query result and ties break by doc_id") {
    // Both docs score identically for "same": tf=1, equal dl.
    val twin = Seq((10L, "same one"), (11L, "same two")).toDF("doc_id", "text")
    val out = TextOps.searchBm25(twin, queries = Seq(7 -> "same"), k = 1).collect()
    assert(out.length == 1 && out.head.getLong(1) == 10L)
  }
}
