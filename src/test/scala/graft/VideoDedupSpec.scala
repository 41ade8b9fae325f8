package graft

import graft.multimodal.VideoDedup

/** Video near-dup (r16, VERDICT item 5): the planted trim is caught at
  * full containment WITHOUT sequence identity (the case byte dedup
  * misses), exact replays at containment 1.0 WITH it.
  */
class VideoDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("planted trims and replays surface with the right verdicts") {
    val docs = TestdataAdapter.table(spark, sfDir, "documents")
    val out = VideoDedup.videoNearDup(VideoDedup.nearDupCorpus(docs))
      .collect()
    assert(out.nonEmpty, "no near-dup pairs found over the planted corpus")
    def pair(a: Long, b: Long) = out.find(r =>
      r.getAs[Long]("video_a") == a && r.getAs[Long]("video_b") == b)
    // doc 10 (%7==3) trims doc 7: 7's spec is (9w, 1h, 3 frames), the
    // trim keeps frames 1..2 — containment 1.0, different sequence
    val trim = pair(7L, 10L).getOrElse(fail("trim pair (7,10) missing"))
    assert(trim.getAs[Double]("containment") == 1.0)
    assert(!trim.getAs[Boolean]("same_sequence"),
      "a TRIMMED clip cannot be sequence-identical to its source")
    assert(trim.getAs[Long]("n_a") == 3L && trim.getAs[Long]("n_b") == 2L)
    // doc 15 (%11==4) replays doc 11 exactly: containment 1.0, same seq
    val dup = pair(11L, 15L).getOrElse(fail("replay pair (11,15) missing"))
    assert(dup.getAs[Double]("containment") == 1.0)
    assert(dup.getAs[Boolean]("same_sequence"),
      "an exact replay must be sequence-identical")
    // every reported pair clears the containment floor
    assert(out.forall(_.getAs[Double]("containment") >= 0.8))
  }
}
