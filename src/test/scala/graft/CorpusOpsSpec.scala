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

  test("bpeMergePairs: char pairs weighted by word frequency; 1-char words drop") {
    val docs = Seq(
      (0L, "abc abc ab"), // "ab": 3 (2×abc + 1×ab), "bc": 2
      (1L, "abc a"))      // +1 "ab","bc"; "a" too short
      .toDF("doc_id", "text")
    val r = TextOps.bpeMergePairs(docs, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("ab", 4L), ("bc", 3L)))
  }

  test("bpeTrain: merges the most frequent pair each step, ties lexicographic") {
    val docs = Seq((0L, "abab abab abab ab ab")).toDF("doc_id", "text")
    // vocab: abab×3 (pairs ab,ba,ab), ab×2 → counts: ab=8, ba=3
    val m = TextOps.bpeTrain(docs, numMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m.head == ((1, "a", "b", 8L)))
    // after merging "ab": abab→[ab,ab]×3 → pair (ab,ab)=3; ab→[ab] done
    assert(m(1) == ((2, "ab", "ab", 3L)))
    // after merging "abab": no adjacent pairs remain anywhere
    assert(m.length == 2)
  }

  test("bpeEncode: trained words collapse to one token; accounting reconciles") {
    // merges on this corpus: 1:(a,b)→ab, 2:(ab,ab)→abab (see bpeTrain spec)
    val docs = Seq((0L, "abab abab abab ab ab"), (1L, "ab ba")).toDF("doc_id", "text")
    // numMerges=2 stops before (b,a) would merge, leaving "ba" split
    val r = TextOps.bpeEncodeStats(docs, numMerges = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("n_chars_tok"),
          x.getAs[Long]("n_bpe_tokens"))).toMap
    // doc 0: abab→[abab] (1 tok ×3), ab→[ab] (1 tok ×2) → 5 words, 16 chars, 5 toks
    assert(r(0L) == ((5L, 16L, 5L)))
    // doc 1: ab→[ab]=1, ba has no merge → [b,a]=2 → 2 words, 4 chars, 3 toks
    assert(r(1L) == ((2L, 4L, 3L)))
  }

  test("pinned-merge apply (leftmost, rescan) equals the batch-pass apply on real vocab") {
    // the oracle-backed pinned form merges ONE leftmost occurrence per
    // iteration (what a recursive CTE can replay); the trained form
    // merges all non-overlapping occurrences per pass — for BPE both
    // reach the same fixpoint tokenization, asserted here over the
    // whole sf0.001 vocabulary plus an overlap-heavy synthetic corpus
    val real = TestdataAdapter.table(spark, "/root/testdata/sf0.001", "documents")
    // 901 is whitespace-only: its single empty token must encode to 0
    // BPE tokens while the document row itself survives (the SQL twin
    // once dropped such rows via a len filter + inner join)
    val overlap = Seq((900L, "aaaa aaa aaaaa abab ababab bbbb"), (901L, "   "))
      .toDF("doc_id", "text")
    for (docs <- Seq(real, overlap)) {
      val merges = TextOps.bpeTrain(docs, numMerges = 8)
        .select("step", "left", "right").as[(Int, String, String)].collect().toSeq
      val batch = TextOps.bpeEncodeStats(docs, numMerges = 8)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val pinned = TextOps.bpeEncodeStatsPinned(docs, merges)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(batch == pinned, "leftmost-rescan apply diverged from batch-pass apply")
    }
  }

  test("bpeTrain step 1 equals the distributed merge-pair argmax on testdata") {
    val d = TestdataAdapter.table(spark, "/root/testdata/sf0.001", "documents")
    val top = TextOps.bpeMergePairs(d, topK = 1)
      .as[(String, Long)].collect().head
    val first = TextOps.bpeTrain(d, numMerges = 1)
      .as[(Int, String, String, Long)].collect().head
    assert(first._2 + first._3 == top._1)
    assert(first._4 == top._2)
  }

  test("bpeTrain minCount/maxVocab bound the driver working set deterministically") {
    // vocab: abab×3, ab×2, cd×2, xy×1 — pair votes: ab=8, ba=3, cd=2, xy=1
    val docs = Seq((0L, "abab abab abab ab ab cd"), (1L, "cd xy")).toDF("doc_id", "text")
    def merges(minCount: Long, maxVocab: Int) =
      TextOps.bpeTrain(docs, numMerges = 20, minCount = minCount, maxVocab = maxVocab)
        .as[(Int, String, String, Long)].collect().toSeq
    val full = merges(1L, Int.MaxValue)
    assert(full == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L), (3, "c", "d", 2L), (4, "x", "y", 1L)))
    // frequency floor: words below it stop voting — the hapax "xy" and
    // its would-be merge disappear; surviving merges are unchanged
    assert(merges(2L, Int.MaxValue) == full.take(3))
    // vocab cap keeps the top-K words by (n desc, word asc): at K=2 the
    // n=2 tie between "ab" and "cd" resolves to "ab", so "cd" drops too
    assert(merges(1L, 2) == full.take(2))
    // a generous cap is a no-op
    assert(merges(1L, 100) == full)
  }

  test("vocabCoverage: ranks by frequency, cumulative share reaches 1.0") {
    val docs = Seq(
      (0L, "a a a b b c"),
      (1L, "a b")).toDF("doc_id", "text")
    val r = TextOps.vocabCoverage(docs, topK = 10).collect()
      .map(x => (x.getAs[Int]("rank"), x.getAs[String]("token"),
        x.getAs[Long]("n"), x.getAs[Long]("cum_tokens"), x.getAs[Double]("cum_share")))
    assert(r.toSeq == Seq(
      (1, "a", 4L, 4L, 0.5),
      (2, "b", 3L, 7L, 0.875),
      (3, "c", 1L, 8L, 1.0)))
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

  test("chunking plan is shuffle-free (narrow explode, no Exchange)") {
    val docs = Seq((1L, (1 to 80).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    // drop the presentation orderBy: the operator body itself must not shuffle
    val body = TextOps.chunkDocuments(docs).queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    }
    val plan = TextOps.chunkDocuments(docs)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    // the only exchange allowed is the final presentation sort's range
    // partitioning; nothing upstream of it may shuffle
    assert(exchanges <= 1, s"chunking shuffled more than the final sort:\n$plan")
    assert(body.nonEmpty) // the one sort is the declared presentation order
  }

  test("normalizeText: quotes/dashes/control/zero-width cleaned, whitespace collapsed") {
    val dirty = Seq(
      (0L, "\u201Chello\u201D \u2014 it\u2019s  fine\u200B here"),
      (1L, "tabs\tand\u0007bells"),
      (2L, "already clean"))
      .toDF("doc_id", "text")
    val r = TextOps.normalizeText(dirty).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("clean_text"), x.getAs[Boolean]("changed"))).toMap
    assert(r(0L) == (("\"hello\" - it's fine here", true)))
    assert(r(1L) == (("tabs and bells", true)))
    assert(r(2L) == (("already clean", false)))
  }

  test("bigram LM: hand-computed add-1 cross-entropy; repeated text scores lower") {
    // tokens: a×3 b×2 c×1 → V=3, c1(a)=3; bigrams: (a,b)×2, (a,c)×1
    // P(b|a)=(2+1)/(3+3)=1/2 → nll=ln 2;  P(c|a)=(1+1)/6=1/3 → nll=ln 3
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextOps.bigramLmScore(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_nll"))).toMap
    assert(r(0L)._1 == 1L)
    assert(math.abs(r(0L)._2 - math.log(2.0)) < 1e-6)
    assert(math.abs(r(2L)._2 - math.log(3.0)) < 1e-6)
    assert(r(0L)._2 < r(2L)._2) // the repeated transition is less surprising
  }

  test("packed sequences: placement, fragmentation flags, offsets reconcile") {
    // token counts 5, 5, 4, 10 with seqLen 8:
    // doc 0 [0,5) seq 0; doc 1 [5,10) seqs 0-1 (split);
    // doc 2 [10,14) seq 1; doc 3 [14,24) seqs 1-2 (split)
    val docs = Seq(
      (0L, (1 to 5).map("a" + _).mkString(" ")),
      (1L, (1 to 5).map("b" + _).mkString(" ")),
      (2L, (1 to 4).map("c" + _).mkString(" ")),
      (3L, (1 to 10).map("d" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextOps.packedSequences(docs, seqLen = 8).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("start_tok"), x.getAs[Int]("first_seq"),
          x.getAs[Int]("last_seq"), x.getAs[Boolean]("crosses_boundary")))
      .toMap
    assert(r(0L) == ((0L, 0, 0, false)))
    assert(r(1L) == ((5L, 0, 1, true)))
    assert(r(2L) == ((10L, 1, 1, false)))
    assert(r(3L) == ((14L, 1, 2, true)))
  }

  test("decontamination plan broadcasts the benchmark side") {
    val tr = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val ev = Seq((9L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val plan = graft.dedup.Dedup.contaminationReport(tr, ev)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
  }
}
