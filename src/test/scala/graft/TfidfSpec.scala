package graft

import graft.text.TextOps

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf ranks a rare repeated term above ubiquitous ones") {
    // "zebra" appears twice in doc 0 only; "the" appears in all 3 docs.
    val docs = Seq(
      (0L, "the zebra zebra runs"),
      (1L, "the cat sits"),
      (2L, "the dog barks")).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(docs, k = 1).collect()
    assert(top.length == 3)
    val d0 = top.find(_.getLong(0) == 0L).get
    assert(d0.getAs[String]("term") == "zebra")
    assert(d0.getAs[Long]("tf") == 2L && d0.getAs[Long]("df") == 1L)
    // smoothed idf, N=3: 2 * (ln(4/2) + 1)
    assert(math.abs(d0.getAs[Double]("tfidf") - 2.0 * (math.log(2.0) + 1.0)) < 1e-12)
  }

  test("equal scores tie-break alphabetically and rank is dense per doc") {
    val docs = Seq((0L, "b a"), (1L, "c d")).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(docs, k = 2).collect()
    val d0 = top.filter(_.getLong(0) == 0L).sortBy(_.getAs[Long]("rank"))
    assert(d0.map(_.getAs[String]("term")).toSeq == Seq("a", "b"))
    assert(d0.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
  }
}
