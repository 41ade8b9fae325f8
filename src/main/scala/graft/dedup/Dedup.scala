package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication family for a training-data pipeline over `documents`:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), n-gram Jaccard verification of candidates, and SimHash banding.
  *
  * Scale design: nothing here compares all pairs. Exact dedup is one
  * hash aggregation on the fingerprint; MinHash/SimHash turn near-dup
  * search into equality joins on band/bucket keys (shuffle on small keys,
  * candidate sets ~linear for non-adversarial corpora); Jaccard runs only
  * over LSH candidates. All hashing is md5-hex (engine-agnostic,
  * lexicographic min is well-defined) so every stage has an exact DuckDB
  * oracle twin.
  */
object Dedup {

  private val NumHashes = 8
  private val Bands = 4 // 2 hashes per band

  /** Exact dedup groups: md5 of raw text → representative (min doc_id) +
    * multiplicity. `filter(n > 1)` of this is the dup report; the full
    * frame doubles as the dedup-keep list.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_md5")

  val exactSql: String =
    """SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** doc_id → exploded 3-word shingles (docs with ≥3 tokens). */
  def shingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("w", TextOps.toks(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))
        .as("shingle"))

  private val SHINGLES_CTE =
    """toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM toks))""".stripMargin

  /** MinHash signatures (8 md5-min hashes) + 4 LSH band keys per doc. */
  def minhashSignatures(documents: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(k =>
      min(md5(concat(lit(s"$k|"), col("shingle")))).as(s"mh$k"))
    val sigs = shingles(documents).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    (0 until Bands).foldLeft(sigs) { (df, j) =>
      df.withColumn(s"band$j", concat(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}")))
    }.orderBy("doc_id")
  }

  private val SIG_CTE = {
    val mh = (0 until NumHashes)
      .map(k => s"MIN(md5('$k|' || shingle)) AS mh$k").mkString(", ")
    val bands = (0 until Bands)
      .map(j => s"mh${2 * j} || mh${2 * j + 1} AS band$j").mkString(", ")
    s"""$SHINGLES_CTE,
       |sig0 AS (SELECT doc_id, $mh FROM sh GROUP BY doc_id),
       |sig AS (SELECT *, $bands FROM sig0)""".stripMargin
  }

  val minhashSignaturesSql: String =
    s"WITH $SIG_CTE SELECT * FROM sig ORDER BY doc_id"

  /** LSH candidate pairs: docs sharing any of the 4 band keys (a < b).
    * The signature frame is persisted before the four band self-joins —
    * otherwise the whole shingle→minhash pipeline re-executes once per
    * join side (8×).
    */
  def minhashPairs(documents: DataFrame): DataFrame = {
    val sigs = minhashSignatures(documents).persist()
    (0 until Bands).map { j =>
      sigs.as("x").join(sigs.as("y"),
        col(s"x.band$j") === col(s"y.band$j") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    }.reduce(_ unionByName _).distinct().orderBy("doc_a", "doc_b")
  }

  private val PAIRS_CTE = {
    val sels = (0 until Bands).map(j =>
      s"SELECT x.doc_id AS doc_a, y.doc_id AS doc_b FROM sig x JOIN sig y ON x.band$j = y.band$j AND x.doc_id < y.doc_id")
      .mkString(" UNION ALL ")
    s"""$SIG_CTE,
       |cand AS (SELECT DISTINCT doc_a, doc_b FROM ($sels))""".stripMargin
  }

  val minhashPairsSql: String =
    s"WITH $PAIRS_CTE SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b"

  /** n-gram Jaccard similarity, computed only for LSH candidate pairs
    * (the scalable shape: candidates are near-linear, so the set
    * intersection join never goes quadratic).
    */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    val ss = shingles(documents).distinct().persist()
    val sizes = ss.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val cand = minhashPairs(documents).persist()
    val inter = cand
      .join(ss.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(ss.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardSql: String =
    s"""WITH $PAIRS_CTE,
       |ss AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sz AS (SELECT doc_id, COUNT(*) AS nsh FROM ss GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN ss a ON a.doc_id = c.doc_a
       |  JOIN ss b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, i.n_inter, sa.nsh AS n_a, sb.nsh AS n_b,
       |  CAST(i.n_inter AS DOUBLE) / (sa.nsh + sb.nsh - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN sz sa ON sa.doc_id = i.doc_a
       |JOIN sz sb ON sb.doc_id = i.doc_b
       |ORDER BY i.doc_a, i.doc_b""".stripMargin

  /** SimHash near-dup candidates via byte banding: docs sharing any of the
    * four 8-bit bytes of their 32-bit SimHash are candidates; report pairs
    * with Hamming distance ≤ maxHamming. Equality joins on byte buckets —
    * never all-pairs.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 10): DataFrame = {
    // persist: the signature aggregation (32 bit-sums over exploded
    // tokens) would otherwise re-execute once per side of each of the
    // four band self-joins
    val sig = TextOps.simhash(documents).persist()
    val withBytes = (0 until 4).foldLeft(sig) { (df, j) =>
      df.withColumn(s"byte$j", shiftright(col("simhash32"), 8 * j).bitwiseAND(255))
    }
    val cand = (0 until 4).map { j =>
      withBytes.as("x").join(withBytes.as("y"),
        col(s"x.byte$j") === col(s"y.byte$j") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash32").as("sig_a"), col("y.simhash32").as("sig_b"))
    }.reduce(_ unionByName _).distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  def simhashPairsSql(maxHamming: Int = 10): String = {
    val sels = (0 until 4).map(j =>
      s"SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.simhash32 AS sig_a, y.simhash32 AS sig_b " +
        s"FROM bytes x JOIN bytes y ON x.byte$j = y.byte$j AND x.doc_id < y.doc_id")
      .mkString(" UNION ALL ")
    s"""WITH ${TextOps.simhashCteBody},
       |bytes AS (SELECT doc_id, simhash32,
       |  (simhash32 >> 0) & 255 AS byte0, (simhash32 >> 8) & 255 AS byte1,
       |  (simhash32 >> 16) & 255 AS byte2, (simhash32 >> 24) & 255 AS byte3
       |FROM simsel),
       |cand AS (SELECT DISTINCT doc_a, doc_b, sig_a, sig_b FROM ($sels))
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Exact-dedup keep list applied back to the corpus: one representative
    * row per distinct content (P4-style dropDuplicates but deterministic —
    * min doc_id wins, not "whichever partition arrives first").
    */
  def dedupKeep(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    documents
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  val dedupKeepSql: String =
    """SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin
}
