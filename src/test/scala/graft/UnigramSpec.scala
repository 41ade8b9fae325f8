package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

/** Unigram-LM tokenizer trainer (r16, VERDICT item 4): vocabulary
  * totality, the prune cap, score monotonicity, and the encoder's
  * compression invariants.
  */
class UnigramSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = TestdataAdapter.table(spark, sfDir, "documents")

  test("trained vocab: char totality, cap respected, scores consistent") {
    val rows = Unigram.unigramTrain(docs).collect()
    assert(rows.nonEmpty)
    val multi = rows.filter(_.getAs[Int]("piece_len") >= 2)
    assert(multi.length <= Unigram.VocabCap,
      s"${multi.length} multi-char pieces exceed the cap ${Unigram.VocabCap}")
    // every char of every trained word is itself a piece (totality)
    val pieces = rows.map(_.getAs[String]("piece")).toSet
    val chars = docs
      .select(explode(graft.text.TextOps.toks(col("text"))).as("w"))
      .filter(length(col("w")).between(1, Unigram.MaxWordLen))
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces),
      s"chars missing from vocab: ${(chars -- pieces).take(5)}")
    // scores are log-probs: higher count => higher (less negative) score
    val byCnt = rows.sortBy(_.getAs[Long]("cnt"))
    assert(byCnt.zip(byCnt.tail).forall { case (a, b) =>
      a.getAs[Long]("score_scaled") <= b.getAs[Long]("score_scaled") },
      "score not monotone in count")
    assert(rows.forall(_.getAs[Long]("score_scaled") < 0L),
      "a log-prob score is non-negative")
  }

  test("EM improves segmentation: multi-char pieces dominate frequent words") {
    val enc = Unigram.unigramEncodeStats(docs).collect()
    assert(enc.nonEmpty)
    // pieces-per-word strictly below chars-per-word: the model learned
    // something beyond character fallback
    val totPieces = enc.map(_.getAs[Long]("n_pieces")).sum
    val totChars = enc.map(_.getAs[Long]("n_chars")).sum
    val totWords = enc.map(_.getAs[Long]("n_words")).sum
    assert(totPieces < totChars,
      s"encoder is at character fallback ($totPieces pieces / $totChars chars)")
    assert(totPieces >= totWords,
      "fewer pieces than words — impossible segmentation")
    enc.foreach { r =>
      assert(r.getAs[Double]("pieces_per_word") ==
        r.getAs[Long]("n_pieces").toDouble / r.getAs[Long]("n_words"))
    }
  }
}
