package graft

import graft.sim.{Knn, SemDedupFixture}
import org.apache.spark.sql.functions._

/** Cluster labeling (`cluster_keywords`). The oracle proves the numbers
  * at sf0.01; these specs pin the contract on the sf0.001 tables: rank
  * structure, the smoothed-idf formula (recomputed per row), the
  * ubiquitous-term identity (df = n_cells ⇒ tfidf = tf exactly), and
  * layout independence.
  */
class ClusterKeywordsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = TestdataAdapter.table(spark, dir, "embeddings")
  private lazy val docs = TestdataAdapter.table(spark, dir, "documents")
  private lazy val rows = Knn.clusterKeywords(
    embs, docs, SemDedupFixture.centroids).collect()

  test("per-cell ranks are 1..m, m <= 5, terms distinct, tfidf non-increasing") {
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (cell, rs) =>
      val byRank = rs.sortBy(_.getLong(5))
      assert(byRank.map(_.getLong(5)).toSeq == (1L to rs.length).toSeq, s"cell $cell ranks")
      assert(rs.length <= 5)
      assert(rs.map(_.getString(1)).distinct.length == rs.length)
      val scores = byRank.map(_.getDouble(4))
      scores.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"cell $cell tfidf not sorted")
        case _ =>
      }
    }
  }

  test("tfidf recomputes from tf, df and the occupied-cell count; ubiquitous terms score tf exactly") {
    val nCells = Knn.kmeansSizesPinned(embs, SemDedupFixture.centroids).count()
    rows.foreach { r =>
      val (tf, df, tfidf) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(df >= 1 && df <= nCells)
      val expected = tf.toDouble * (math.log((1.0 + nCells) / (1.0 + df)) + 1.0)
      assert(tfidf == expected, s"row $r: $tfidf != $expected")
      if (df == nCells) assert(tfidf == tf.toDouble) // idf term is exactly ln(1)=0
    }
  }

  test("layout independence: repartitioned inputs yield the identical labeling") {
    val b = Knn.clusterKeywords(
      embs.repartition(7), docs.repartition(5), SemDedupFixture.centroids).collect()
    assert(rows.toSeq == b.toSeq)
  }
}
