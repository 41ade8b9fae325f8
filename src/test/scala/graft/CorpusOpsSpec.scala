package graft

import graft.text.TextOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramTopK counts adjacent pairs, handles short docs, tie-breaks alphabetically") {
    val docs = Seq(
      (0L, "a b a b"),      // "a b" ×2, "b a" ×1
      (1L, "a b"),          // "a b" ×1
      (2L, "solo"),         // no bigrams
      (3L, "")).toDF("doc_id", "text")
    val r = TextOps.bigramTopK(docs, k = 10).as[(String, Long)].collect().toSeq
    assert(r == Seq(("a b", 3L), ("b a", 1L)))
  }

  test("redactDigits masks digit runs and counts them") {
    val ev = Seq((1L, """{"k": 69, "v": 1234}"""), (2L, """{"k": null}"""))
      .toDF("event_id", "props")
    val r = TextOps.redactDigits(ev, "props").collect()
    assert(r(0).getAs[String]("redacted") == """{"k": #, "v": #}""")
    assert(r(0).getAs[Long]("n_redacted") == 2L)
    assert(r(1).getAs[Long]("n_redacted") == 0L)
    assert(r(1).getAs[String]("redacted") == """{"k": null}""")
  }
}
