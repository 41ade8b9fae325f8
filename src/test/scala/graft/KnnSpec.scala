package graft

import graft.sim.Knn

class KnnSpec extends SparkSpec {
  import spark.implicits._

  // dim-64 helpers
  private def unit(i: Int): Array[Float] = {
    val a = Array.fill(64)(0f); a(i) = 1f; a
  }
  private def scaled(i: Int, s: Float): Array[Float] = {
    val a = Array.fill(64)(0f); a(i) = s; a
  }

  test("brute-force top-k ranks parallel=1.0 > partial > orthogonal, ties by id") {
    val e = Seq(
      (0L, unit(0), 0),               // query
      (1L, scaled(0, 2f), 0),         // parallel → cosine 1.0
      (2L, {
        val a = Array.fill(64)(0f); a(0) = 1f; a(1) = 1f; a
      }, 0),                          // 45° → ~0.707
      (3L, unit(1), 0))               // orthogonal → 0.0
      .toDF("vec_id", "embedding", "label")
    val r = Knn.bruteForceTopK(e, nQueries = 1, k = 3)
      .select("neighbor_id", "rank", "cosine")
      .as[(Long, Int, Double)].collect()
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(r(0)._3 == 1.0)
    assert(math.abs(r(1)._3 - math.sqrt(0.5)) < 1e-12)
    assert(r(2)._3 == 0.0)
  }

  test("zero-norm vectors are excluded (cosine undefined)") {
    val e = Seq((0L, unit(0), 0), (1L, Array.fill(64)(0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Knn.bruteForceTopK(e, nQueries = 1, k = 5).count()
    assert(r == 0) // only the zero vector would be a neighbor; it is dropped
  }

  test("bucketed ANN only searches the query's sign-bucket") {
    val pos = unit(0)                          // bucket: dim0 positive
    val neg = { val a = Array.fill(64)(0f); a(0) = -1f; a(1) = 0.1f; a }
    val posNbr = { val a = Array.fill(64)(0f); a(0) = 0.9f; a(2) = 0.1f; a }
    val e = Seq((0L, pos, 0), (1L, posNbr, 0), (2L, neg, 0))
      .toDF("vec_id", "embedding", "label")
    val r = Knn.bucketedTopK(e, nQueries = 1, k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(r == Set(1L)) // the negative-bucket vector is never considered
  }

  test("near-dup pairs threshold and symmetry (a<b once)") {
    val e = Seq((0L, unit(0), 0), (1L, scaled(0, 3f), 0), (2L, unit(5), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Knn.nearDupPairs(e, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 1L)))
  }
}
