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

  test("minCount/maxWords bound the working set BEFORE the driver sees it (r17)") {
    // the bounded word set, computed independently: frequency floor 2,
    // then top-30 by (f DESC, word) — exactly wordTable's distributed
    // bound (filter + TakeOrdered, nothing corpus-sized collected)
    val bounded = docs
      .select(explode(graft.text.TextOps.toks(col("text"))).as("word"))
      .filter(length(col("word")).between(1, Unigram.MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("f"))
      .filter(col("f") >= 2L)
      .orderBy(col("f").desc, col("word")).limit(30)
      .collect().map(_.getString(0)).toSet
    assert(bounded.nonEmpty && bounded.size <= 30)
    val rows = Unigram.unigramTrain(docs, minCount = 2L, maxWords = 30)
      .collect()
    // every trained piece is a substring of a KEPT word: the floor/cap
    // really gates what the trainer (seed, EM, prune) ever touches
    val pieces = rows.map(_.getAs[String]("piece"))
    assert(pieces.nonEmpty)
    pieces.foreach { p =>
      assert(bounded.exists(_.contains(p)),
        s"piece '$p' derives from a word the bound should have dropped")
    }
    // the cap binds on this corpus: the bounded vocabulary differs from
    // the unbounded one (otherwise the knob test is vacuous)
    val unboundedPieces =
      Unigram.unigramTrain(docs).collect().map(_.getAs[String]("piece")).toSet
    assert(pieces.toSet != unboundedPieces,
      "bound did not bind — pick a smaller maxWords for this corpus")
    // explicit no-op knobs are byte-identical to the defaults
    val viaDefaults = Unigram.unigramTrain(docs).collect().toSeq
    val viaNoopKnobs =
      Unigram.unigramTrain(docs, minCount = 1L, maxWords = Int.MaxValue)
        .collect().toSeq
    assert(viaDefaults == viaNoopKnobs)
    // the SQL twins thread the same knobs (active → bounded wd CTE;
    // default → the r16 string, so registered oracles are unchanged)
    assert(Unigram.unigramTrainSql(minCount = 2L, maxWords = 30)
      .contains("wrk <= 30"))
    assert(Unigram.unigramTrainSql(minCount = 2L, maxWords = 30)
      .contains("HAVING COUNT(*) >= 2"))
    assert(!Unigram.unigramTrainSql().contains("HAVING"))
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
