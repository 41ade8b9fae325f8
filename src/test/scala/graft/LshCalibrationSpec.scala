package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** LSH banding calibration (`lsh_band_calibration`). The oracle proves
  * the numbers; these specs pin the semantics: the exact S-curve
  * numerators, the structural invariants (the shipping banding captures
  * its own pair frame by construction; more-bands-shorter-rows is
  * monotonically more permissive), and the identical-document corner.
  */
class LshCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("captureNumerator: exact S-curve values at denominator 8^8") {
    val full = 16777216L // 8^8
    for ((b, r) <- Dedup.BandConfigs) {
      assert(Dedup.captureNumerator(8, b, r) == full) // s=1 -> p=1
      assert(Dedup.captureNumerator(0, b, r) == 0L) // s=0 -> p=0
    }
    // (4,2) at k=4: 8^8 - (8^2 - 4^2)^4 = 16777216 - 48^4
    assert(Dedup.captureNumerator(4, 4, 2) == full - 5308416L)
    // (1,8) at k=4: p = (4/8)^8 exactly -> numerator 4^8
    assert(Dedup.captureNumerator(4, 1, 8) == 65536L)
    // (8,1) at k=4: 1 - (1/2)^8 -> numerator 8^8 - 8^8/2^8
    assert(Dedup.captureNumerator(4, 8, 1) == full - full / 256)
    // monotone in k for every config
    for ((b, r) <- Dedup.BandConfigs; k <- 1 to 8)
      assert(Dedup.captureNumerator(k, b, r) >= Dedup.captureNumerator(k - 1, b, r))
    intercept[IllegalArgumentException](Dedup.captureNumerator(9, 4, 2))
    intercept[IllegalArgumentException](Dedup.captureNumerator(4, 4, 3))
  }

  private val docs = Seq(
    // an identical pair (all 8 hashes agree)
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    // a near pair (most shingles shared)
    (3L, "alpha beta gamma delta epsilon eta"),
    // unrelated docs
    (4L, "one two three four five six seven"),
    (5L, "completely different words entirely here now"))
    .toDF("doc_id", "text")

  test("report invariants: pair frame fixed, shipping banding captures all, permissiveness monotone") {
    val rep = Dedup.lshBandCalibration(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rep.keySet == Dedup.BandConfigs.toSet)
    val nPairs = rep.values.map(_._1).toSet
    assert(nPairs.size == 1 && nPairs.head >= 1) // same pair universe everywhere
    // the shipping (4,2) banding generated the frame -> captures all of it;
    // (8,1) is implied by any multi-hash band agreement
    assert(rep((4, 2))._2 == rep((4, 2))._1)
    assert(rep((8, 1))._2 == rep((8, 1))._1)
    // more bands with shorter rows is monotonically more permissive
    val order = Seq((8, 1), (4, 2), (2, 4), (1, 8))
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rep(a)._2 >= rep(b)._2, s"captured($a) < captured($b)")
      assert(rep(a)._4 >= rep(b)._4, s"expected($a) < expected($b)")
    }
    // expected capture is a probability mass over the pair frame
    rep.values.foreach { case (n, cap, rate, exp) =>
      assert(exp >= 0.0 && exp <= n.toDouble)
      assert(rate == cap.toDouble / n)
    }
  }

  test("an identical-document pair survives even the strictest banding") {
    val twins = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val rep = Dedup.lshBandCalibration(twins).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    // (1,8) requires ALL 8 hashes to agree — only the identical pair does
    assert(rep((1, 8)) >= 1L)
  }

  test("layout independence: repartitioned input yields the identical report") {
    val a = Dedup.lshBandCalibration(docs).collect().toSeq
    val b = Dedup.lshBandCalibration(docs.repartition(7)).collect().toSeq
    assert(a == b)
  }
}
