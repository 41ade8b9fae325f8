package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication family for a training-data pipeline over `documents`:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), n-gram Jaccard verification of candidates, and SimHash banding.
  *
  * Scale design: nothing here compares all pairs, and nothing hashes a
  * shingle more than once.
  *  - Exact dedup is one hash aggregation on the fingerprint.
  *  - MinHash computes ONE md5 per distinct (doc, shingle) and derives
  *    the 8 permutation hashes arithmetically (hex-string rotations — a
  *    bijection of the hash space per permutation, so each induces an
  *    independent-enough ordering); the old shape paid 8 md5 calls per
  *    shingle, which was the dominant pipeline cost.
  *  - The hashed-shingle frame is ONE persisted lineage threaded through
  *    signatures → LSH pairs → Jaccard verification; nothing re-derives
  *    shingles from raw text twice.
  *  - SimHash banding is 16-bit bands over a 64-bit signature: 65,536
  *    buckets per band, so per-bucket candidate lists stay tiny as the
  *    corpus grows (8-bit bands cap at 256 buckets → quadratic at 100 TB).
  * All hashing is md5-hex (engine-agnostic, lexicographic min is
  * well-defined) so every stage has an exact DuckDB oracle twin.
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

  /** Distinct (doc_id, shingle) + its md5 — the single hashed-shingle
    * lineage every MinHash/Jaccard stage derives from. Distinct BEFORE
    * hashing so duplicate shingles within a doc are hashed once (the
    * MinHash min over distinct shingles equals the min over all).
    */
  def hashedShingles(documents: DataFrame): DataFrame =
    shingles(documents).distinct().withColumn("h", md5(col("shingle")))

  private val RAW_SHINGLES_CTE =
    """toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM toks))""".stripMargin

  private val SHINGLES_CTE =
    s"""$RAW_SHINGLES_CTE,
       |hs AS (SELECT doc_id, shingle, md5(shingle) AS h
       |       FROM (SELECT DISTINCT doc_id, shingle FROM sh))""".stripMargin

  /** Permutation k of a 32-hex-char md5: rotate left by 4k characters.
    * One md5 per shingle; the 8 orderings come from these rotations.
    */
  private def perm(k: Int, h: Column): Column =
    if (k == 0) h
    else concat(substring(h, 4 * k + 1, 32 - 4 * k), substring(h, 1, 4 * k))

  private def permSql(k: Int): String =
    if (k == 0) "h" else s"(substr(h, ${4 * k + 1}) || substr(h, 1, ${4 * k}))"

  /** MinHash signatures + 4 LSH band keys from a hashed-shingle frame. */
  private def minhashSignaturesFrom(hashed: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(k => min(perm(k, col("h"))).as(s"mh$k"))
    val sigs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    (0 until Bands).foldLeft(sigs) { (df, j) =>
      df.withColumn(s"band$j", concat(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}")))
    }
  }

  /** MinHash signatures (8 rotation-permuted min-hashes) + 4 LSH band
    * keys per doc.
    */
  def minhashSignatures(documents: DataFrame): DataFrame =
    minhashSignaturesFrom(hashedShingles(documents)).orderBy("doc_id")

  private val SIG_CTE = {
    val mh = (0 until NumHashes)
      .map(k => s"MIN(${permSql(k)}) AS mh$k").mkString(", ")
    val bands = (0 until Bands)
      .map(j => s"mh${2 * j} || mh${2 * j + 1} AS band$j").mkString(", ")
    s"""$SHINGLES_CTE,
       |sig0 AS (SELECT doc_id, $mh FROM hs GROUP BY doc_id),
       |sig AS (SELECT *, $bands FROM sig0)""".stripMargin
  }

  val minhashSignaturesSql: String =
    s"WITH $SIG_CTE SELECT * FROM sig ORDER BY doc_id"

  /** LSH candidate pairs from a signature frame. The caller must persist
    * the signature frame — otherwise the whole shingle→minhash pipeline
    * re-executes once per side of each of the four band self-joins (8×).
    */
  private def minhashPairsFrom(sigs: DataFrame): DataFrame =
    (0 until Bands).map { j =>
      sigs.as("x").join(sigs.as("y"),
        col(s"x.band$j") === col(s"y.band$j") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    }.reduce(_ unionByName _).distinct().orderBy("doc_a", "doc_b")

  /** LSH candidate pairs: docs sharing any of the 4 band keys (a < b).
    * The signature frame is persisted HERE, in the bare entry, so the
    * shingle→minhash pipeline runs once regardless of caller — the 8×
    * recompute the [[minhashPairsFrom]] contract warns about cannot
    * reach a cluster (PlanBudgetSpec pins the single source scan).
    */
  def minhashPairs(documents: DataFrame): DataFrame =
    minhashPairsFrom(minhashSignaturesFrom(hashedShingles(documents)).persist())

  private val PAIRS_CTE = {
    val sels = (0 until Bands).map(j =>
      s"SELECT x.doc_id AS doc_a, y.doc_id AS doc_b FROM sig x JOIN sig y ON x.band$j = y.band$j AND x.doc_id < y.doc_id")
      .mkString(" UNION ALL ")
    s"""$SIG_CTE,
       |cand AS (SELECT DISTINCT doc_a, doc_b FROM ($sels))""".stripMargin
  }

  val minhashPairsSql: String =
    s"WITH $PAIRS_CTE SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b"

  // ---- LSH banding calibration (r14) ----------------------------------

  /** The (bands, rows-per-band) factorizations of the 8-hash signature —
    * every banding a pipeline could redeploy without recomputing
    * signatures. The shipping config is (4, 2).
    */
  val BandConfigs: Seq[(Int, Int)] = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  /** EXACT capture-probability numerator at denominator 8^8: for a pair
    * whose signatures agree on `k` of the 8 min-hashes, the
    * signature-agreement Jaccard estimate is ŝ = k/8 and the classic LSH
    * S-curve gives P(captured | b bands × r rows) = 1 − (1 − ŝ^r)^b
    * = (8^8 − (8^r − k^r)^b · 8^(8−rb)) / 8^8 — all-integer for every
    * config with r·b = 8, so the expected-capture SUM crosses engines as
    * a BIGINT and only ONE double division happens at the end.
    */
  def captureNumerator(k: Int, b: Int, r: Int): Long = {
    require(k >= 0 && k <= NumHashes && b * r == NumHashes,
      s"need 0<=k<=8 and b*r=8, got k=$k b=$b r=$r")
    def ipow(base: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * base)
    ipow(8, 8) - ipow(ipow(8, r) - ipow(k.toLong, r), b)
  }

  /** LSH banding calibration report — the parameter-tuning pass a 100 TB
    * dedup pipeline runs before changing its banding: over the pair
    * frame the SHIPPING banding surfaces (never all-pairs), how many
    * pairs would each alternative (b × r) factorization of the same
    * 8-hash signatures still capture (recomputed from the per-hash
    * agreement pattern — a pair is captured iff ANY of the b bands
    * agrees on ALL its r hashes), and what capture count does the LSH
    * S-curve predict from each pair's agreement estimate
    * ([[captureNumerator]] — exact rational, BIGINT-summed). Actual vs
    * expected per config exposes banding miscalibration; the
    * more-bands-shorter-rows configs are monotonically more permissive.
    *
    * Scale shape: two id-keyed joins of the candidate frame onto the
    * signature frame, then ONE aggregation per config over a
    * pairs-sized frame; output is |configs| rows.
    */
  def lshBandCalibration(documents: DataFrame): DataFrame = {
    val sigs = minhashSignaturesFrom(hashedShingles(documents)).persist()
    val pairs = minhashPairsFrom(sigs)
    val aSig = sigs.select(col("doc_id").as("doc_a") +:
      (0 until NumHashes).map(k => col(s"mh$k").as(s"a$k")): _*)
    val bSig = sigs.select(col("doc_id").as("doc_b") +:
      (0 until NumHashes).map(k => col(s"mh$k").as(s"b$k")): _*)
    val agree = pairs.join(aSig, Seq("doc_a")).join(bSig, Seq("doc_b"))
      .select((0 until NumHashes).map(k =>
        (col(s"a$k") === col(s"b$k")).cast("int").as(s"ag$k")): _*)
      .withColumn("k_agree",
        (0 until NumHashes).map(k => col(s"ag$k")).reduce(_ + _))
      .persist()
    val perConfig = BandConfigs.map { case (b, r) =>
      val captured = (0 until b).map { j =>
        (0 until r).map(i => col(s"ag${j * r + i}") === 1).reduce(_ && _)
      }.reduce(_ || _)
      val pNum = (0 to NumHashes).foldLeft(lit(null).cast("long")) { (acc, k) =>
        when(col("k_agree") === k, lit(captureNumerator(k, b, r))).otherwise(acc)
      }
      agree.agg(
        count(lit(1)).as("n_pairs"),
        sum(captured.cast("long")).as("n_captured"),
        sum(pNum).as("p_num"))
        .select(
          lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("n_pairs"),
          coalesce(col("n_captured"), lit(0L)).as("n_captured"),
          when(col("n_pairs") === 0, lit(0.0))
            .otherwise(col("n_captured") / col("n_pairs")).as("capture_rate"),
          (coalesce(col("p_num"), lit(0L)) / lit(16777216L) / lit(1.0))
            .as("expected_captured"))
    }
    // |configs| rows total — eagerly materialize the union so both cached
    // frames can be released here rather than leaking to the caller
    // (ADVICE r14). coalesce(1) first: the raw union carries 4×shuffle-
    // partitions near-empty partitions, and checkpointing them all cost
    // ~1.3 s of empty-task overhead per call (r15 sweep 1).
    val out = perConfig.reduce(_ unionByName _).coalesce(1).localCheckpoint()
    sigs.unpersist()
    agree.unpersist()
    out.orderBy(col("bands").desc)
  }

  /** DuckDB twin of [[lshBandCalibration]]: the shared signature/pair
    * CTEs, the same per-hash agreement pattern, the same band-AND/OR
    * recompute per config, and the same exact BIGINT capture numerators
    * (inlined from the same [[captureNumerator]] arithmetic).
    */
  val lshBandCalibrationSql: String = {
    val agreeCols = (0 until NumHashes)
      .map(k => s"CAST(a.mh$k = b.mh$k AS INTEGER) AS ag$k").mkString(", ")
    val kAgree = (0 until NumHashes).map(k => s"ag$k").mkString(" + ")
    val legs = BandConfigs.map { case (b, r) =>
      val captured = (0 until b).map { j =>
        "(" + (0 until r).map(i => s"ag${j * r + i} = 1").mkString(" AND ") + ")"
      }.mkString(" OR ")
      val pNum = "CASE k_agree " + (0 to NumHashes)
        .map(k => s"WHEN $k THEN CAST(${captureNumerator(k, b, r)} AS BIGINT)")
        .mkString(" ") + " END"
      s"""SELECT $b AS bands, $r AS rows_per_band,
         |  COUNT(*) AS n_pairs,
         |  CAST(COALESCE(SUM(CAST($captured AS BIGINT)), 0) AS BIGINT) AS n_captured,
         |  CASE WHEN COUNT(*) = 0 THEN 0.0
         |       ELSE CAST(COALESCE(SUM(CAST($captured AS BIGINT)), 0) AS BIGINT) / COUNT(*) END AS capture_rate,
         |  CAST(COALESCE(SUM($pNum), 0) AS BIGINT) / 16777216 / 1.0 AS expected_captured
         |FROM agree""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $PAIRS_CTE,
       |agree0 AS (
       |  SELECT $agreeCols
       |  FROM cand c
       |  JOIN sig a ON a.doc_id = c.doc_a
       |  JOIN sig b ON b.doc_id = c.doc_b),
       |agree AS (SELECT *, $kAgree AS k_agree FROM agree0)
       |SELECT * FROM ($legs) u ORDER BY bands DESC""".stripMargin
  }

  /** n-gram Jaccard similarity for LSH candidate pairs, computed over ONE
    * shared lineage: the persisted hashed-shingle frame feeds the
    * signatures (→ candidates) AND the per-doc shingle sets. The
    * intersection is size(array_intersect) over the two docs' collected
    * hash sets — two narrow joins of compact arrays onto the candidate
    * frame — instead of re-exploding every shingle of every candidate
    * doc through a (doc, shingle)-keyed shuffle (which materializes
    * |pairs|×|shingles/doc| rows and was the measured cost center). Set
    * sizes are bounded by document length, candidates are near-linear,
    * so nothing here scales super-linearly in the corpus.
    */
  /** Shared pair-scoring block for the shingle-set operators
    * ([[ngramJaccard]], [[containmentPairs]]): join each (doc_a, doc_b)
    * candidate onto per-doc collect_set arrays — one compact array per
    * doc (persisted; both sides of every pair reuse it) — and emit
    * intersection/set sizes plus Jaccard. Callers layer their own extra
    * scores and filters on top.
    */
  private def pairSetScores(cand: DataFrame, ss: DataFrame): DataFrame = {
    // collect_set over the md5s (distinct by construction): one compact
    // array per doc, reused for both sides of every candidate pair
    val sets = ss.groupBy("doc_id").agg(collect_set(col("h")).as("sh")).persist()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_inter"),
        size(col("sa")).cast("long").as("n_a"),
        size(col("sb")).cast("long").as("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  def ngramJaccard(documents: DataFrame): DataFrame = {
    val ss = hashedShingles(documents).persist()
    val cand = minhashPairsFrom(minhashSignaturesFrom(ss).persist())
    pairSetScores(cand, ss)
      // the exploded-join formulation only surfaced pairs sharing ≥1
      // shingle; keep that contract (and the oracle) unchanged
      .filter(col("n_inter") > 0)
      .orderBy("doc_a", "doc_b")
  }

  /** Asymmetric containment (overlap coefficient) for quote/excerpt
    * detection: `n_inter / min(n_a, n_b)`. Symmetric Jaccard — and the
    * MinHash bands tuned for it — miss a short document quoted wholesale
    * inside a long one (the intersection is ~all of the short doc but
    * small relative to the union, so no band fires). Candidates here come
    * from a rare-shingle inverted index instead: docs sharing any shingle
    * with document frequency in [2, maxDf] pair up. A contained quote
    * shares ALL its shingles, including its rare ones, so the bucket
    * fires regardless of how lopsided the pair is.
    *
    * Scale shape: the posting self-join is bounded by construction —
    * per-shingle bucket ≤ maxDf rows, so pairs-per-shingle ≤ maxDf²/2;
    * ubiquitous (boilerplate) shingles are excluded by the df ceiling,
    * which is also what keeps the join sub-quadratic (their mass is the
    * [[boilerplateScrub]] operator's job). Intersections reuse the
    * compact collect_set arrays of the shared hashed-shingle lineage,
    * exactly like [[ngramJaccard]]. Pairs whose overlap clears
    * `minOverlap` while Jaccard does not are flagged `asymmetric`.
    */
  def containmentPairs(documents: DataFrame, minOverlap: Double = 0.5,
      maxDf: Int = 8): DataFrame = {
    val ss = hashedShingles(documents).persist()
    val rare = ss.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h")
    val posting = ss.join(rare, "h")
    val cand = posting.select(col("doc_id").as("doc_a"), col("h"))
      .join(posting.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    pairSetScores(cand, ss)
      .withColumn("overlap",
        col("n_inter").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("overlap") >= minOverlap)
      .withColumn("asymmetric", (col("jaccard") < lit(minOverlap)).cast("boolean"))
      .orderBy("doc_a", "doc_b")
  }

  def containmentPairsSql(minOverlap: Double = 0.5, maxDf: Int = 8): String =
    s"""WITH $SHINGLES_CTE,
       |dfreq AS (SELECT h, COUNT(*) AS df FROM hs GROUP BY 1),
       |rare AS (SELECT h FROM dfreq WHERE df BETWEEN 2 AND $maxDf),
       |post AS (SELECT doc_id, h FROM hs WHERE h IN (SELECT h FROM rare)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS nsh FROM hs GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN hs a ON a.doc_id = c.doc_a
       |  JOIN hs b ON b.doc_id = c.doc_b AND b.h = a.h
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT i.doc_a, i.doc_b, i.n_inter, sa.nsh AS n_a, sb.nsh AS n_b,
       |    CAST(i.n_inter AS DOUBLE) / (sa.nsh + sb.nsh - i.n_inter) AS jaccard,
       |    CAST(i.n_inter AS DOUBLE) / LEAST(sa.nsh, sb.nsh) AS overlap
       |  FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.doc_a
       |  JOIN sz sb ON sb.doc_id = i.doc_b)
       |SELECT doc_a, doc_b, n_inter, n_a, n_b, jaccard, overlap,
       |  jaccard < $minOverlap AS asymmetric
       |FROM j WHERE overlap >= $minOverlap
       |ORDER BY doc_a, doc_b""".stripMargin

  val ngramJaccardSql: String =
    s"""WITH $PAIRS_CTE,
       |sz AS (SELECT doc_id, COUNT(*) AS nsh FROM hs GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN hs a ON a.doc_id = c.doc_a
       |  JOIN hs b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, i.n_inter, sa.nsh AS n_a, sb.nsh AS n_b,
       |  CAST(i.n_inter AS DOUBLE) / (sa.nsh + sb.nsh - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN sz sa ON sa.doc_id = i.doc_a
       |JOIN sz sb ON sb.doc_id = i.doc_b
       |ORDER BY i.doc_a, i.doc_b""".stripMargin

  /** Split-leakage audit — the check a training pipeline runs after
    * splitting: near-duplicate document pairs (LSH candidates verified
    * at `jaccard ≥ minJaccard`) that STRADDLE the train/val/test
    * boundary. A test doc with a near-twin in train silently inflates
    * eval scores; this reports, per unordered split pair, how many
    * verified near-dup pairs cross it (`leaks = true` rows are the
    * problem; the diagonal rows are benign duplication inside one
    * split). Composes [[ngramJaccard]] with
    * [[graft.ml.HashSplit.splitAssign]]: the pair frame is near-linear
    * (LSH-bounded), the split assignment is a narrow hash — two
    * doc_id-keyed joins of a small frame against a narrow projection,
    * then a |splits|²-bounded aggregate. Nothing here re-shuffles the
    * corpus text.
    */
  def splitLeakage(documents: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val dups = ngramJaccard(documents)
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b")
    val splits = graft.ml.HashSplit.splitAssign(documents)
      .select(col("doc_id"), col("split"))
    dups
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .select(
        least(col("sa"), col("sb")).as("split_x"),
        greatest(col("sa"), col("sb")).as("split_y"))
      .groupBy("split_x", "split_y")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaks", col("split_x") =!= col("split_y"))
      .orderBy("split_x", "split_y")
  }

  /** DuckDB twin of [[splitLeakage]]. */
  def splitLeakageSql(minJaccard: Double = 0.5): String = {
    val b = graft.ml.HashSplit.hashBucketSql("doc_id", 100)
    s"""WITH $PAIRS_CTE,
       |sz AS (SELECT doc_id, COUNT(*) AS nsh FROM hs GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN hs a ON a.doc_id = c.doc_a
       |  JOIN hs b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2),
       |dup AS (
       |  SELECT i.doc_a, i.doc_b
       |  FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.doc_a
       |  JOIN sz sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.n_inter AS DOUBLE) / (sa.nsh + sb.nsh - i.n_inter) >= $minJaccard),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN ($b) < 80 THEN 'train' WHEN ($b) < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents)
       |SELECT LEAST(pa.split, pb.split) AS split_x,
       |  GREATEST(pa.split, pb.split) AS split_y,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  LEAST(pa.split, pb.split) <> GREATEST(pa.split, pb.split) AS leaks
       |FROM dup d
       |JOIN sp pa ON pa.doc_id = d.doc_a
       |JOIN sp pb ON pb.doc_id = d.doc_b
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** SimHash near-dup candidates via 16-bit banding of the 64-bit
    * signature: docs sharing any of the four 16-bit bands are candidates
    * (65,536 buckets per band); report pairs with Hamming distance ≤
    * maxHamming over all 64 bits. Equality joins on band buckets — never
    * all-pairs, and per-bucket populations stay sub-linear at scale.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 20): DataFrame = {
    // persist: the signature aggregation (64 bit-sums over exploded
    // tokens) would otherwise re-execute once per side of each of the
    // four band self-joins
    val sig = TextOps.simhash64(documents).persist()
    val withBands = sig
      .withColumn("band0", col("sim_lo").bitwiseAND(65535))
      .withColumn("band1", shiftright(col("sim_lo"), 16))
      .withColumn("band2", col("sim_hi").bitwiseAND(65535))
      .withColumn("band3", shiftright(col("sim_hi"), 16))
    val cand = (0 until 4).map { j =>
      withBands.as("x").join(withBands.as("y"),
        col(s"x.band$j") === col(s"y.band$j") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.sim_hi").as("hi_a"), col("x.sim_lo").as("lo_a"),
          col("y.sim_hi").as("hi_b"), col("y.sim_lo").as("lo_b"))
    }.reduce(_ unionByName _).distinct()
    cand
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  def simhashPairsSql(maxHamming: Int = 20): String = {
    val sels = (0 until 4).map(j =>
      s"SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sim_hi AS hi_a, x.sim_lo AS lo_a, " +
        s"y.sim_hi AS hi_b, y.sim_lo AS lo_b " +
        s"FROM bands x JOIN bands y ON x.band$j = y.band$j AND x.doc_id < y.doc_id")
      .mkString(" UNION ALL ")
    s"""WITH ${TextOps.simhash64CteBody},
       |bands AS (SELECT doc_id, sim_hi, sim_lo,
       |  sim_lo & 65535 AS band0, sim_lo >> 16 AS band1,
       |  sim_hi & 65535 AS band2, sim_hi >> 16 AS band3
       |FROM simsel64),
       |cand AS (SELECT DISTINCT doc_a, doc_b, hi_a, lo_a, hi_b, lo_b FROM ($sels))
       |SELECT doc_a, doc_b,
       |  CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS INTEGER) AS hamming
       |FROM cand
       |WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= $maxHamming
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

  /** Connected components over an undirected edge list via distributed
    * min-label propagation (the DataFrame form of the classic map-reduce
    * algorithm): every vertex starts labeled with its own id; each round
    * every vertex adopts the minimum label among itself and its
    * neighbors; the fixpoint label is the per-component minimum id. The
    * driver loop runs O(component diameter) rounds — near-dup clusters
    * are shallow — and each round is two key-partitioned shuffles, fully
    * distributed; the driver sees only a 1-row convergence aggregate per
    * round (the label sum, strictly decreasing until fixpoint), never
    * the data.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    // localCheckpoint (not persist) everywhere in the loop: persist
    // truncates re-EXECUTION but not the LOGICAL plan, so an iterative
    // join would grow the plan every round and each job event would pay
    // an ever-larger plan-string rendering (measured: minutes of driver
    // CPU at 50 rounds). Checkpointing makes every round's frame a leaf.
    val e = edges.localCheckpoint() // materializes the LSH pipeline once
    val bidir = e
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("cluster_id"))).head.getLong(0)
    var labels = vertices
      .select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint()
    var cur = labelSum(labels)
    var prev = cur + 1
    var rounds = 0
    while (cur != prev && rounds < 50) {
      val msgs = bidir.join(labels, bidir("src") === labels("doc_id"))
        .groupBy(bidir("dst"))
        .agg(min(col("cluster_id")).as("nbr_min"))
        .withColumnRenamed("dst", "doc_id")
      val adopted = labels.join(msgs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jumping: also follow my label's label, halving chain
      // depth every round — O(log diameter) rounds instead of O(diameter)
      val ptr = adopted
        .select(col("doc_id").as("pid"), col("cluster_id").as("plabel"))
      val next = adopted.join(ptr, adopted("cluster_id") === ptr("pid"), "left")
        .select(adopted("doc_id"),
          least(adopted("cluster_id"), coalesce(col("plabel"), adopted("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      prev = cur
      cur = labelSum(next)
      labels = next
      rounds += 1
    }
    require(cur == prev, s"connectedComponents: no fixpoint after $rounds rounds")
    labels
  }

  /** Benchmark decontamination — the train/test-leakage check a training
    * pipeline runs before any corpus ships: flag training documents that
    * share word 3-grams with a held-out benchmark set. Same hashed
    * 3-shingle lineage as the minhash family; the benchmark side is the
    * small one by construction (eval suites are thousands of docs, the
    * corpus is billions), so its distinct shingle set broadcasts and the
    * check is one narrow broadcast-hash join + one aggregation — no
    * all-pairs anything.
    */
  def contaminationReport(training: DataFrame, benchmark: DataFrame): DataFrame = {
    val tr = hashedShingles(training).select(col("doc_id"), col("h"))
    val ev = hashedShingles(benchmark).select(col("h")).distinct()
    tr.join(broadcast(ev), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of the registered contamination query (benchmark =
    * doc_id % 100 = 7 — a stand-in for a real eval-suite table; the
    * operator itself takes any two frames).
    */
  val contaminationReportSql: String =
    s"""WITH $SHINGLES_CTE,
       |ev AS (SELECT DISTINCT h FROM hs WHERE doc_id % 100 = 7),
       |tr AS (SELECT doc_id, h FROM hs WHERE doc_id % 100 <> 7)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
       |FROM tr JOIN ev USING (h)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** [[contaminationReport]] at an arbitrary gram width — registered at
    * n = 13, the published exact-collision decontamination standard
    * (GPT-3's 13-gram filter; the 3-shingle form above is the
    * near-dup-grade sensitivity, this is the exact-overlap-grade one).
    * Grams are built in-row (transform over an index sequence + slice —
    * no explode-then-window), hashed, per-doc distinct; the benchmark
    * side broadcasts exactly like the 3-gram form, so the check stays
    * one narrow broadcast join at any corpus size.
    */
  def contaminationReportNgram(
      training: DataFrame, benchmark: DataFrame, n: Int = 13): DataFrame = {
    def hashedGrams(df: DataFrame): DataFrame = {
      val w = TextOps.toks(col("text"))
      df.select(col("doc_id"), w.as("w"))
        .withColumn("i", explode(
          when(size(col("w")) >= n, sequence(lit(1), size(col("w")) - (n - 1)))
            .otherwise(array().cast("array<int>"))))
        .select(col("doc_id"),
          md5(array_join(slice(col("w"), col("i"), lit(n)), " ")).as("h"))
        .distinct()
    }
    val tr = hashedGrams(training)
    val ev = hashedGrams(benchmark).select("h").distinct()
    tr.join(broadcast(ev), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of the registered 13-gram contamination query (same
    * benchmark stand-in slice as the 3-gram form).
    */
  def contaminationReportNgramSql(n: Int = 13): String =
    raw"""WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
       |              FROM documents),
       |gs AS (SELECT doc_id, md5(array_to_string(w[i:i+${n - 1}], ' ')) AS h
       |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${n - 1})) AS i
       |             FROM toks)),
       |g AS (SELECT DISTINCT doc_id, h FROM gs),
       |ev AS (SELECT DISTINCT h FROM g WHERE doc_id % 100 = 7),
       |tr AS (SELECT doc_id, h FROM g WHERE doc_id % 100 <> 7)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
       |FROM tr JOIN ev USING (h)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Duplicate CLUSTERS — the step after candidate pairs that a real
    * dedup pipeline needs before it can keep one representative per
    * duplicate group: LSH pair (a,b) and (b,c) must collapse to ONE
    * cluster {a,b,c} even though (a,c) never surfaced as a pair.
    * Transitive closure via [[connectedComponents]]; cluster_id is the
    * minimum doc_id of the cluster (the kept representative), and
    * singletons keep themselves.
    */
  def dedupClusters(documents: DataFrame): DataFrame = {
    val labels = connectedComponents(
      documents.select("doc_id"), minhashPairs(documents))
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[dedupClusters]]: transitive closure as a recursive
    * CTE (per-node set of reaching roots; MIN root = component id).
    */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $PAIRS_CTE,
       |e AS (SELECT doc_a AS a, doc_b AS b FROM cand UNION ALL SELECT doc_b, doc_a FROM cand),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS root FROM documents
       |  UNION
       |  SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.node),
       |lab AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY 1),
       |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, cs.cluster_size
       |FROM lab l JOIN cs USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** LEAKAGE-FREE train/val/test split: the standard per-document md5
    * split (ml.HashSplit.splitAssign) hashes doc_id, so two NEAR-
    * DUPLICATE documents can land in train and test — exactly the
    * contamination [[splitLeakage]] audits. This operator closes that
    * loop structurally: the split key is the near-dup CLUSTER
    * representative, so every member of a transitive near-dup cluster
    * lands in the same split by construction and cross-split leakage is
    * zero — not audited-small, impossible (spec-asserted over the LSH
    * pair frame). Fractions stay ~80/10/10 in cluster units (the
    * population is singleton-dominated). Same determinism contract as
    * the doc-level split: rerun-, layout- and append-stable.
    *
    * Scale: the labels come from the soaked CC pipeline; the split
    * itself is a narrow hash over the label frame — no extra shuffle.
    */
  def clusterSplitAssign(documents: DataFrame): DataFrame =
    clusterSplitAssignFrom(dedupClusters(documents))

  /** The split tail over an existing label frame (doc_id, cluster_id,
    * cluster_size) — lets callers amortize the clustering itself (the
    * registry persists the labels once per scale dir; a deployment keeps
    * them as maintained state via [[attachToClustersWithSizes]]).
    */
  def clusterSplitAssignFrom(labels: DataFrame): DataFrame = {
    val b = graft.ml.HashSplit.hashBucket(col("cluster_id"), 100)
    labels
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        b.as("bucket"),
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[clusterSplitAssign]] (the full recursive closure
    * nests as a subquery; plain concatenation, no stripMargin over the
    * spliced SQL).
    */
  val clusterSplitAssignSql: String = {
    val b = graft.ml.HashSplit.hashBucketSql("cluster_id", 100)
    s"WITH cl AS (SELECT * FROM ($dedupClustersSql))\n" +
      s"SELECT doc_id, cluster_id, cluster_size, $b AS bucket,\n" +
      s"  CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END AS split\n" +
      "FROM cl ORDER BY doc_id"
  }

  /** Quality-max representative per near-dup cluster: [[nearDedupKeep]]
    * keeps the minimum doc_id — fine for dedup bookkeeping, wasteful
    * for training data, where the cluster's BEST-quality member should
    * survive. Per cluster, keep the document with the highest
    * [[graft.text.TextOps.qualityScore]] (doc_id tie-break); singleton
    * clusters trivially keep themselves. One cluster_id window over the
    * label frame plus a narrow per-doc score join — no text ever
    * shuffles.
    */
  def clusterBestKeep(documents: DataFrame): DataFrame =
    clusterBestKeepFrom(dedupClusters(documents), documents)

  /** The keep tail over an existing label frame (see
    * [[clusterSplitAssignFrom]] for the amortization contract).
    */
  def clusterBestKeepFrom(labels: DataFrame, documents: DataFrame): DataFrame = {
    val scored = documents.select(col("doc_id"),
      graft.text.TextOps.qualityScore(col("text")).as("quality_score"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    labels
      .join(scored, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("quality_score"), (col("rn") === 1).as("keep"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[clusterBestKeep]]. */
  val clusterBestKeepSql: String =
    s"WITH cl AS (SELECT * FROM ($dedupClustersSql)),\n" +
      s"q AS (SELECT doc_id, ${TextOps.qualityScoreSqlExpr} AS quality_score FROM documents)\n" +
      "SELECT cl.doc_id, cl.cluster_id, cl.cluster_size, q.quality_score,\n" +
      "  (ROW_NUMBER() OVER (PARTITION BY cl.cluster_id\n" +
      "     ORDER BY q.quality_score DESC, cl.doc_id) = 1) AS keep\n" +
      "FROM cl JOIN q USING (doc_id) ORDER BY doc_id"

  /** Cross-source near-duplicate overlap matrix — the curation
    * diagnostic that tells you WHICH sources copy from each other
    * (mirrors, scrapes of the same upstream, license-text commons):
    * count of near-dup pairs per unordered source pair, including the
    * within-source diagonal. Composes [[dedupClusters]], but never
    * materializes a doc pair: the cluster membership collapses to
    * per-(cluster, source) COUNTS first, and pair counts fall out of
    * combinatorics — `n_a · n_b` across two sources, `n·(n-1)/2` on the
    * diagonal. The self-join therefore runs on the count table
    * (|clusters| × |sources| rows), so a degenerate mega-cluster — one
    * boilerplate string shared by 10⁶ docs — costs one aggregation row
    * instead of 10¹² join rows. Output is |sources|²-sized (tiny).
    */
  /** Per-source corpus governance report — the one-row-per-source
    * dashboard a data platform publishes before a training run: document
    * count, exact-duplicate exposure (docs whose content hash occurs ≥2
    * anywhere in the corpus), near-duplicate exposure (docs in a
    * transitive near-dup cluster of size ≥2 — the supplied labels, i.e.
    * maintained state, not a recompute), language spread, rounded-mean
    * quality, and total whitespace-token volume. Quality doubles go
    * through round(·, 6) before the decimal-exact mean — the
    * cross-engine-safe summation contract (see Verify notes).
    *
    * Scale shape: one content-hash aggregation + one hash join back
    * (both on the corpus, the unavoidable exact-dup pass), a doc_id join
    * against the label state, and one per-source rollup. No text ever
    * shuffles — hashes, labels, and per-doc scalars do.
    */
  def sourceGovernanceReport(documents: DataFrame, labels: DataFrame): DataFrame = {
    import graft.functions.Cols.detAvg
    val perDoc = documents.select(
      col("doc_id"), col("source"), col("lang"),
      md5(col("text")).as("h"),
      round(TextOps.qualityScore(col("text")), 6).as("q"),
      size(TextOps.toks(col("text"))).cast("long").as("toks"))
    val hashCounts = perDoc.groupBy("h").agg(count(lit(1)).as("h_count"))
    perDoc
      .join(hashCounts, Seq("h"))
      .join(labels.select("doc_id", "cluster_size"), Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("h_count") >= 2, 1).otherwise(0)).as("n_exact_dup_docs"),
        sum(when(col("cluster_size") >= 2, 1).otherwise(0)).as("n_near_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        detAvg(col("q")).as("avg_quality"),
        sum(col("toks")).as("total_ws_tokens"))
      .orderBy("source")
  }

  /** DuckDB twin of [[sourceGovernanceReport]] (cluster closure nested). */
  val sourceGovernanceReportSql: String =
    s"WITH cl AS (SELECT doc_id, cluster_size FROM ($dedupClustersSql)),\n" +
      raw"""per AS (
        |  SELECT doc_id, source, lang, md5(text) AS h,
        |    round(${TextOps.qualityScoreSqlExpr}, 6) AS q,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS toks
        |  FROM documents),
        |hc AS (SELECT h, COUNT(*) AS h_count FROM per GROUP BY 1)
        |SELECT per.source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN hc.h_count >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs,
        |  CAST(SUM(CASE WHEN cl.cluster_size >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup_docs,
        |  COUNT(DISTINCT per.lang) AS n_langs,
        |  CAST(SUM(CAST(per.q AS DECIMAL(28,6))) AS DOUBLE) / COUNT(per.q) AS avg_quality,
        |  CAST(SUM(per.toks) AS BIGINT) AS total_ws_tokens
        |FROM per JOIN hc USING (h) JOIN cl USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The ACTING half of [[sourceGovernanceReport]] — the weekly curation
    * pass a training-data platform runs off the report: a global token
    * budget is split into per-source quotas proportional to each
    * source's CLEAN token volume (tokens of its near-dup-cluster
    * best-quality representatives — the same maintained labels the
    * report reads, so exact/near-dup exposure never buys budget), and
    * each source then keeps its highest-quality representatives in
    * (quality DESC, doc_id) order until its quota is spent. One plan:
    * diagnose → quota → enforce.
    *
    * Determinism/cross-engine: quotas are pure BIGINT arithmetic
    * (budget × src_toks ÷ total, floor — no doubles), the within-source
    * running total is an integer window sum over a total order
    * (quality, doc_id), and quality rides the same score expression
    * every other oracle proves exact.
    *
    * Scale shape: representatives come from the label state (no text
    * shuffles beyond the per-doc score projection), the quota table is
    * |sources|-sized (broadcast), and the enforcement window partitions
    * by source. A corpus dominated by ONE source would skew that
    * window; the two-pass distributed prefix sum
    * ([[graft.rel.Scale.prefixSumShards]]) is the drop-in replacement
    * per source at that point — the cut rule is unchanged.
    */
  def governedCap(
      documents: DataFrame, labels: DataFrame,
      budgetTokens: Long = 100000L): DataFrame = {
    // ONE per-doc projection carries quality AND tokens, so the corpus
    // shuffles onto doc_id once — the [[clusterBestKeepFrom]] rule is
    // inlined over it rather than composed (composition would scan and
    // shuffle documents a second time just to re-attach source/n_toks)
    val perDoc = documents.select(col("doc_id"), col("source"),
      TextOps.qualityScore(col("text")).as("quality_score"),
      size(TextOps.toks(col("text"))).cast("long").as("n_toks"))
    val wk = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val eligible = labels.select("doc_id", "cluster_id")
      .join(perDoc, Seq("doc_id"))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") === 1)
      .select("doc_id", "source", "quality_score", "n_toks")
    val srcTot = eligible.groupBy("source").agg(sum("n_toks").as("src_toks"))
    val total = srcTot.agg(sum("src_toks").as("total_toks"))
    val quota = srcTot.crossJoin(broadcast(total))
      .select(col("source"),
        expr(s"CAST(($budgetTokens * src_toks) DIV total_toks AS BIGINT)")
          .as("quota_toks"))
    val w = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    eligible
      .join(broadcast(quota), Seq("source"))
      .withColumn("cum_toks", sum("n_toks").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("keep_rank", row_number().over(w))
      .filter(col("cum_toks") <= col("quota_toks"))
      .select(col("doc_id"), col("source"),
        round(col("quality_score"), 6).as("quality_score"),
        col("n_toks"), col("cum_toks"), col("quota_toks"),
        col("keep_rank").cast("int").as("keep_rank"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[governedCap]] (cluster closure nested, the same
    * best-keep ROW_NUMBER rule as [[clusterBestKeepSql]]).
    */
  def governedCapSql(budgetTokens: Long = 100000L): String =
    s"WITH cl AS (SELECT * FROM ($dedupClustersSql)),\n" +
      raw"""q AS (SELECT doc_id, ${TextOps.qualityScoreSqlExpr} AS qs FROM documents),
        |bk AS (
        |  SELECT cl.doc_id, q.qs,
        |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY q.qs DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id)),
        |el AS (
        |  SELECT bk.doc_id, bk.qs, d.source,
        |    CAST(len(string_split_regex(trim(lower(d.text)), '\s+')) AS BIGINT) AS n_toks
        |  FROM bk JOIN documents d USING (doc_id) WHERE bk.rn = 1),
        |st AS (SELECT source, SUM(n_toks) AS src_toks FROM el GROUP BY 1),
        |tt AS (SELECT SUM(src_toks) AS total_toks FROM st),
        |qu AS (SELECT st.source,
        |         CAST(($budgetTokens * st.src_toks) // tt.total_toks AS BIGINT) AS quota_toks
        |       FROM st CROSS JOIN tt),
        |w AS (
        |  SELECT el.*, qu.quota_toks,
        |    CAST(SUM(n_toks) OVER (PARTITION BY el.source ORDER BY el.qs DESC, el.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks,
        |    ROW_NUMBER() OVER (PARTITION BY el.source
        |      ORDER BY el.qs DESC, el.doc_id) AS keep_rank
        |  FROM el JOIN qu USING (source))
        |SELECT doc_id, source, round(qs, 6) AS quality_score, n_toks, cum_toks,
        |  quota_toks, CAST(keep_rank AS INTEGER) AS keep_rank
        |FROM w WHERE cum_toks <= quota_toks ORDER BY doc_id""".stripMargin

  def sourceOverlap(documents: DataFrame): DataFrame =
    sourceOverlapFrom(dedupClusters(documents), documents)

  /** The overlap matrix over an EXISTING label frame (see
    * [[nearDedupKeepFrom]] for the amortization contract).
    */
  def sourceOverlapFrom(labels: DataFrame, documents: DataFrame): DataFrame = {
    val counts = labels
      .filter(col("cluster_size") > 1)
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    val a = counts.select(col("cluster_id"), col("source").as("source_x"), col("n").as("na"))
    val b = counts.select(col("cluster_id"), col("source").as("source_y"), col("n").as("nb"))
    a.join(b, Seq("cluster_id"))
      .filter(col("source_x") <= col("source_y"))
      // n·(n-1) is even and cluster counts are far below 2^52, so the
      // double division is exact; cast restores the BIGINT contract
      .select(col("source_x"), col("source_y"),
        when(col("source_x") === col("source_y"),
          (col("na") * (col("na") - 1) / 2).cast("long"))
          .otherwise(col("na") * col("nb")).as("pairs"))
      // a single doc of a source inside a cluster contributes no
      // within-source pair — drop the 0 rows the pair join never emitted
      .filter(col("pairs") > 0)
      .groupBy("source_x", "source_y")
      .agg(sum("pairs").as("n_pairs"))
      .orderBy("source_x", "source_y")
  }

  val sourceOverlapSql: String =
    s"""WITH RECURSIVE $PAIRS_CTE,
       |e AS (SELECT doc_a AS a, doc_b AS b FROM cand UNION ALL SELECT doc_b, doc_a FROM cand),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS root FROM documents
       |  UNION
       |  SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.node),
       |lab AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY 1),
       |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1),
       |m AS (
       |  SELECT l.doc_id, l.cluster_id, d.source
       |  FROM lab l JOIN cs USING (cluster_id) JOIN documents d USING (doc_id)
       |  WHERE cs.cluster_size > 1)
       |SELECT LEAST(a.source, b.source) AS source_x,
       |  GREATEST(a.source, b.source) AS source_y,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM m a JOIN m b ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The shipped corpus filter — the end-to-end composition a
    * training-data run applies before tokenization: one representative
    * per distinct content (min doc_id wins), a quality floor, a language
    * allowlist. Shape at scale: one window over the content hash plus one
    * narrow codegen'd projection (the quality and language scores are
    * shared Column expressions, not re-joined stages), so the whole
    * filter is a single shuffle regardless of corpus size.
    */
  def corpusFilter(
      documents: DataFrame, minQuality: Double = 0.2,
      langs: Seq[String] = Seq("en")): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val scores = TextOps.langScoreCols(col("text"))
    // every text-derived value materializes in ONE projection BELOW the
    // dedup window: the filter above then references plain attributes,
    // which predicate pushdown cannot substitute past a Window keyed on
    // another column — without this, the optimizer inlines the score
    // trees back into the Filter and every regex count evaluates two to
    // three times per row (and, pre-factoring, overflowed Janino's
    // method limit entirely — see TextOps.langScoreCols)
    documents
      .select(
        col("doc_id") +: col("text") +: col("source") +: col("n_chars") +:
          size(TextOps.toks(col("text"))).cast("long").as("n_tokens") +:
          TextOps.qualityScore(col("text")).as("quality_score") +:
          scores.map { case (n, c) => c.cast("long").as("__" + n) }: _*)
      .withColumn("rn", row_number().over(w))
      .withColumn("predicted_lang", TextOps.langCaseFromScores("__"))
      .filter(col("rn") === 1 && col("quality_score") >= minQuality &&
        col("predicted_lang").isInCollection(langs))
      .drop("text" +: "rn" +: scores.map("__" + _._1): _*)
      .orderBy("doc_id")
  }

  /** Boilerplate / duplicated-span hotspot report: the word 3-grams that
    * appear in the most distinct documents (site chrome, license headers,
    * template text — the spans a curation pass strips before training).
    * One explode + one hash aggregation + a bounded TakeOrdered top-k:
    * per-shingle cardinality is what shrinks here, so the aggregate
    * output is vocabulary-sized, not corpus-sized, and the top-k never
    * materializes a global sort. Order is fully deterministic (shingle
    * is unique per group, so the three-key sort has no ties).
    */
  def duplicateShingles(documents: DataFrame, minDocs: Int = 2, topK: Int = 100): DataFrame =
    shingles(documents)
      .groupBy("shingle")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("shingle"))
      .limit(topK)

  def duplicateShinglesSql(minDocs: Int = 2, topK: Int = 100): String =
    s"""WITH $RAW_SHINGLES_CTE
       |SELECT shingle,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_occurrences
       |FROM sh GROUP BY 1
       |HAVING COUNT(DISTINCT doc_id) >= $minDocs
       |ORDER BY n_docs DESC, n_occurrences DESC, shingle
       |LIMIT $topK""".stripMargin

  /** Near-dedup KEEP list — the final artifact of the approximate-dedup
    * pipeline (pairs → transitive clusters → one representative per
    * cluster): the minimum doc_id of each cluster survives, tagged with
    * how many near-duplicates it stands for. Composes
    * [[dedupClusters]]; no extra shuffle beyond it (the representative
    * filter is cluster_id == doc_id on the already-labeled frame).
    */
  def nearDedupKeep(documents: DataFrame): DataFrame =
    nearDedupKeepFrom(dedupClusters(documents))

  /** The keep list over an EXISTING label frame — the deployment shape
    * (keep lists derive from the maintained cluster state, they don't
    * re-cluster the corpus; the registry's amortization contract, same
    * as `cluster_split_assign`/`cluster_best_keep`).
    */
  def nearDedupKeepFrom(labels: DataFrame): DataFrame =
    labels
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_size"))
      .orderBy("doc_id")

  val nearDedupKeepSql: String =
    s"""WITH RECURSIVE $PAIRS_CTE,
       |e AS (SELECT doc_a AS a, doc_b AS b FROM cand UNION ALL SELECT doc_b, doc_a FROM cand),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS root FROM documents
       |  UNION
       |  SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.node),
       |lab AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY 1),
       |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, cs.cluster_size
       |FROM lab l JOIN cs USING (cluster_id)
       |WHERE l.doc_id = l.cluster_id
       |ORDER BY doc_id""".stripMargin

  /** Incremental dedup at corpus scale: classify an incoming batch
    * against a corpus WITHOUT joining the batch against 100 TB. The
    * corpus side collapses to a Bloom filter — built by the internal
    * `BloomFilterAggregate`, a distributed mergeable-sketch aggregation
    * (per-partition bitsets OR-merged up a tree), sized
    * `expectedItems × ~10 bits` — and the batch-side probe is the
    * codegen'd `BloomFilterMightContain` expression over `xxhash64` of
    * the content md5 (no Scala UDF anywhere on the path).
    *
    * The bloom's no-false-negative guarantee makes the composite result
    * EXACT, not approximate: a bloom-NEGATIVE doc is definitely absent
    * from the corpus (trusted new, no join at all — the overwhelming
    * majority of a mostly-novel batch), and only the bloom-POSITIVE
    * slice — true duplicates plus the ≤fpp false positives — pays the
    * exact membership join. `is_new_exact` therefore equals the plain
    * anti-join verdict row-for-row (the DuckDB oracle twin). What
    * shrinks is the BATCH side of the residual join (and with it the
    * join's shuffle volume and the risk of a skewed build side) — the
    * corpus side still scans and distinct-shuffles ONCE here to build
    * the [[DedupIndex]] this stateless convenience wraps — an
    * incremental deployment persists that index and calls
    * [[bloomNewDocsIncremental]] / [[mergeDedupIndex]] per batch
    * instead, never rescanning the corpus. `is_new_bloom` rides along
    * for the spec-asserted sketch contracts (is_new_bloom ⟹
    * is_new_exact; false-positive rate ≤ fpp). Bit positions are ORs of
    * per-item hashes, so the output is independent of partition layout
    * and insertion order.
    */
  def bloomNewDocs(
      corpus: DataFrame, batch: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    bloomNewDocsIncremental(buildDedupIndex(corpus, expectedItems, fpp), batch)

  /** Running incremental-dedup state: the corpus Bloom bytes (mergeable
    * fixed-size sketch) plus the EXACT distinct content-hash table. A
    * deployment persists `hashes` (parquet/table) and the bloom bytes
    * between batches; [[bloomNewDocsIncremental]] then classifies a new
    * batch without ever touching corpus text again, and
    * [[mergeDedupIndex]] folds an accepted batch into the state — the
    * maintained-index design [[bloomNewDocs]]'s scaladoc names as the
    * corpus-scale path.
    */
  final case class DedupIndex(bloomBits: Array[Byte], hashes: DataFrame)

  /** Distributed bloom build over a distinct-hash frame; null for an
    * empty frame (BloomFilterAggregate's empty-input result).
    */
  private def bloomOf(
      hashes: DataFrame, expectedItems: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.GraftSqlShims.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val bfAgg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col("h")))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // the finished sketch is a driver-sized object by construction
    // (~1.2 MB at 1M items / 1% fpp) and embeds as a foldable literal,
    // so the probe stays inside whole-stage codegen
    hashes.select(column(bfAgg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** One corpus pass → the persistent index: distinct content hashes +
    * their bloom. Duplicate hashes OR the same bloom bits, so building
    * over the distinct frame equals building over raw rows.
    */
  def buildDedupIndex(
      corpus: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DedupIndex = {
    val hashes = corpus.select(md5(col("text")).as("h")).distinct()
    DedupIndex(bloomOf(hashes, expectedItems, fpp), hashes)
  }

  /** OR-merge two bloom byte arrays (Spark's sketch format is mergeable
    * given identical sizing — the same (expectedItems, fpp) MUST be used
    * for every increment); null-safe on either side.
    */
  def mergeBloomBits(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    if (a == null) b
    else if (b == null) a
    else {
      val m = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
      m.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
      val out = new java.io.ByteArrayOutputStream()
      m.writeTo(out)
      out.toByteArray
    }
  }

  /** Bloom bytes over an `h`-column hash frame — the increment that
    * OR-folds into the running state bloom. Callers with a SMALL frame
    * (a batch delta) should coalesce(1) first: the partial aggregation
    * allocates the full numBits sketch per input partition.
    */
  def bloomBitsOfHashes(
      hashes: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Array[Byte] =
    bloomOf(hashes, expectedItems, fpp)

  /** Fold an accepted batch into the running index WITHOUT rescanning
    * the corpus: the batch's own bloom is OR-merged into the state bloom,
    * and the hash table is a distinct union of state ∪ batch. NOTE the
    * returned frame re-materializes the corpus-sized table — the right
    * shape for the IN-PLAN two-batch verification, but a maintained
    * deployment persists [[dedupIndexDelta]] increments instead (O(batch)
    * state writes, never an O(corpus) rewrite).
    */
  def mergeDedupIndex(
      index: DedupIndex, accepted: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DedupIndex = {
    val newHashes = accepted.select(md5(col("text")).as("h")).distinct()
    DedupIndex(
      mergeBloomBits(index.bloomBits, bloomOf(newHashes, expectedItems, fpp)),
      index.hashes.unionByName(newHashes).distinct())
  }


  /** Classify a batch against the RUNNING index — the incremental form
    * of [[bloomNewDocs]]: identical verdict semantics (bloom-negative →
    * trusted new with no join; bloom-positive → exact membership join
    * against the state hash table), but the corpus side is the
    * persisted index, so the plan contains no corpus scan at all
    * (spec-asserted). This is the shape that makes per-batch cost
    * O(batch + bloom-positive ⋈ index) at 100 TB corpus size.
    */
  def bloomNewDocsIncremental(index: DedupIndex, batch: DataFrame): DataFrame =
    bloomNewDocsIncrementalWithHash(index, batch).drop("h")

  /** [[bloomNewDocsIncremental]] retaining the content-hash column: the
    * maintained-state stream persists this shape so the batch's state
    * increment (DISTINCT h WHERE is_new_exact) derives from the
    * already-written verdicts — no second classify pass, no second scan
    * of the state.
    */
  def bloomNewDocsIncrementalWithHash(index: DedupIndex, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftSqlShims.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    // an EMPTY corpus has a null sketch; might_contain(null) is null,
    // which would silently drop every batch row — the correct verdict
    // is "nothing is in the corpus, everything is new"
    val bloomSeen =
      if (index.bloomBits == null) lit(false)
      else column(BloomFilterMightContain(
        Literal.create(index.bloomBits, BinaryType),
        new XxHash64(Seq(expression(col("h"))))))

    val flagged = batch
      .withColumn("h", md5(col("text")))
      .withColumn("bloom_seen", bloomSeen)
    val trustedNew = flagged.filter(!col("bloom_seen"))
      .withColumn("is_new_exact", lit(true))
    // residual membership WITHOUT shuffling the corpus-sized index: the
    // bloom-positive hash set is batch-bounded, so it broadcasts into a
    // semi-join that filters the index at its scan (no index exchange),
    // and the surviving hashes — ≤ the positive set — broadcast back
    // onto the batch. Both joins are broadcast by construction at every
    // scale; a plain left join here made Spark sort-merge the whole
    // persisted index per batch once it outgrew the broadcast threshold.
    val posHashes = flagged.filter(col("bloom_seen")).select("h").distinct()
    val inCorpus = index.hashes
      .join(broadcast(posHashes), Seq("h"), "left_semi")
      .withColumn("in_corpus", lit(true))
    val residual = flagged.filter(col("bloom_seen"))
      .join(broadcast(inCorpus), Seq("h"), "left")
      .withColumn("is_new_exact", col("in_corpus").isNull)
      .drop("in_corpus")
    trustedNew.unionByName(residual)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("h"), (!col("bloom_seen")).as("is_new_bloom"), col("is_new_exact"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[bloomNewDocs]]'s exact verdict (the bloom column
    * is dropped at registration — sketch bits are engine-specific).
    */
  def bloomNewDocsSql(corpusPred: String, batchPred: String): String =
    s"""WITH c AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE $corpusPred),
       |b AS (SELECT doc_id, lang, source, n_chars, md5(text) AS h
       |      FROM documents WHERE $batchPred)
       |SELECT doc_id, lang, source, n_chars,
       |  (c.h IS NULL) AS is_new_exact
       |FROM b LEFT JOIN c USING (h)
       |ORDER BY doc_id""".stripMargin

  def corpusFilterSql(minQuality: Double = 0.2, langs: Seq[String] = Seq("en")): String = {
    val langList = langs.map(l => s"'$l'").mkString(", ")
    raw"""WITH kept AS (
       |  SELECT doc_id, text, source, n_chars FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM documents) WHERE rn = 1),
       |s AS (SELECT doc_id, source, n_chars,
       |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
       |  ${TextOps.qualityScoreSqlExpr} AS quality_score,
       |  ${TextOps.langScoreColsSql}
       |FROM kept)
       |SELECT doc_id, source, n_chars, n_tokens, quality_score,
       |  ${TextOps.langCaseSql} AS predicted_lang
       |FROM s
       |WHERE quality_score >= $minQuality
       |  AND (${TextOps.langCaseSql}) IN ($langList)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- incremental NEAR-dup: the LSH signature table as running state
  //      (the near-dup sibling of the exact-hash DedupIndex above) ----

  /** The LSH index IS the MinHash signature frame (doc_id, mh0..mh7,
    * band0..band3): 8 fixed-width hashes + 4 band keys per doc —
    * BOUNDED per-doc state (~0.3 KB), unlike the raw shingle sets, which
    * is what makes it persistable at corpus scale. A deployment writes
    * it to a table and feeds it back to [[classifyNearDupIncremental]] /
    * [[mergeLshIndex]] per batch.
    */
  def lshIndex(corpus: DataFrame): DataFrame =
    minhashSignaturesFrom(hashedShingles(corpus))

  /** Fold a processed batch into the running index: signatures are
    * per-doc rows, so the merge is a plain union — no recompute of the
    * existing state, no corpus rescan.
    */
  def mergeLshIndex(index: DataFrame, batch: DataFrame): DataFrame =
    index.unionByName(lshIndex(batch))

  /** Classify a batch against the RUNNING index: batch docs →
    * signatures; four band-equality joins against the index surface
    * candidates (the standard LSH recall set); each candidate's
    * signature agreement (matching min-hashes / NumHashes) estimates Jaccard
    * WITHOUT touching any corpus text — the per-batch cost is
    * O(batch + candidates), state-bounded like
    * [[bloomNewDocsIncremental]] but for NEAR duplicates.
    *
    * Output: one row per batch doc (shingle-less docs included) with
    * candidate count, the best-agreeing index doc (ties broken by
    * lowest doc_id — deterministic), its agreement estimate, and the
    * near-dup verdict (any band collision). Batch-internal duplicates
    * are the existing pair pipeline's job, not this classifier's.
    */
  def classifyNearDupIncremental(index: DataFrame, batch: DataFrame): DataFrame = {
    val bsig = minhashSignaturesFrom(hashedShingles(batch)).persist()
    val nAgree = (0 until NumHashes)
      .map(k => when(col(s"x.mh$k") === col(s"y.mh$k"), 1).otherwise(0))
      .reduce(_ + _)
    // broadcast the BATCH side: an incremental batch is bounded by
    // contract while the index is corpus-sized — the index must never
    // shuffle on band keys, and the explicit hint keeps the plan
    // broadcast-stable at every scale (soak-asserted)
    val cand = (0 until Bands).map { j =>
      broadcast(bsig).as("x")
        .join(index.as("y"), col(s"x.band$j") === col(s"y.band$j"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("match_id"),
          nAgree.as("n_agree"))
    }.reduce(_ unionByName _).distinct()
    val part = Window.partitionBy("doc_id")
    val ranked = cand
      .withColumn("n_candidates", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(
        part.orderBy(col("n_agree").desc, col("match_id"))))
      .filter(col("rn") === 1)
    batch.select(col("doc_id"))
      .join(ranked, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("match_id").as("best_match_id"),
        (col("n_agree").cast("double") / NumHashes).as("best_agreement"),
        col("match_id").isNotNull.as("is_near_dup"))
      .orderBy("doc_id")
  }

  /** Incremental TRANSITIVE-cluster maintenance — the last leg of the
    * maintained-index family (exact: [[DedupIndex]]; near-dup pairs:
    * [[lshIndex]]; clusters: here). Given the persisted label table
    * (doc_id, cluster_id — cluster_id is the member minimum, as
    * [[dedupClusters]] emits) and the persisted signature index, attach
    * a new batch EXACTLY:
    *
    *  1. cross edges: batch signatures band-join the index (batch side
    *     broadcast — the index never shuffles), then contract each
    *     matched corpus doc to its cluster representative;
    *  2. internal edges: the ordinary LSH pairs within the batch;
    *  3. run connected components on the CONTRACTED subgraph only —
    *     batch ids ∪ TOUCHED representatives, a batch-bounded vertex
    *     set — so per-batch cost is O(batch + touched), independent of
    *     corpus size;
    *  4. remap: corpus labels whose representative landed in a merged
    *     component adopt the component label (an id-table join — no
    *     text, no signatures); untouched clusters pass through.
    *
    * Exactness: each representative IS its cluster's minimum doc_id, so
    * the contracted component minimum equals the true member minimum —
    * the incremental labels are bit-identical to a from-scratch
    * [[dedupClusters]] over corpus ∪ batch (oracle- and spec-checked),
    * including the case where one batch doc BRIDGES two existing
    * clusters (they merge under the smaller representative).
    */
  def attachToClusters(
      labels: DataFrame, index: DataFrame, batch: DataFrame): DataFrame = {
    val bsig = minhashSignaturesFrom(hashedShingles(batch)).persist()
    val cross = (0 until Bands).map { j =>
      broadcast(bsig).as("x")
        .join(index.as("y"), col(s"x.band$j") === col(s"y.band$j"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    }.reduce(_ unionByName _).distinct()
    val crossToRep = cross
      .join(labels.select(col("doc_id").as("doc_b"), col("cluster_id")), Seq("doc_b"))
      .select(col("doc_a"), col("cluster_id").as("doc_b"))
    val edges = crossToRep.unionByName(minhashPairsFrom(bsig)).distinct()
    val verts = batch.select("doc_id")
      .unionByName(crossToRep.select(col("doc_b").as("doc_id")))
      .distinct()
    val comp = connectedComponents(verts, edges)
    val remap = comp
      .select(col("doc_id").as("old_rep"), col("cluster_id").as("new_label"))
    val corpusLabels = labels
      .join(remap, labels("cluster_id") === remap("old_rep"), "left")
      .select(labels("doc_id"),
        coalesce(col("new_label"), labels("cluster_id")).as("cluster_id"))
    val batchLabels = comp.join(batch.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"))
    corpusLabels.unionByName(batchLabels)
  }

  /** [[attachToClusters]] finalized to the [[dedupClusters]] output
    * shape (labels + recomputed cluster sizes, ordered).
    */
  def attachToClustersWithSizes(
      labels: DataFrame, index: DataFrame, batch: DataFrame): DataFrame = {
    val l = attachToClusters(labels, index, batch)
    val sizes = l.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    l.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Signature CTE chain over a filtered slice of `documents`, with
    * prefixed CTE names so several slices coexist in one oracle query.
    */
  private def sigCtesSql(n: String, pred: String): String = {
    val mh = (0 until NumHashes).map(k => s"MIN(${permSql(k)}) AS mh$k").mkString(", ")
    val bands = (0 until Bands).map(j => s"mh${2 * j} || mh${2 * j + 1} AS band$j").mkString(", ")
    raw"""${n}_toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
       |            FROM documents WHERE $pred),
       |${n}_hs AS (SELECT DISTINCT doc_id, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
       |          FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM ${n}_toks)),
       |${n}_sig0 AS (SELECT doc_id, $mh FROM ${n}_hs GROUP BY doc_id),
       |${n}_sig AS (SELECT *, $bands FROM ${n}_sig0)""".stripMargin
  }

  /** Classification SQL of batch-slice `b` against index CTE `idx`
    * (columns like sig), emitting the [[classifyNearDupIncremental]]
    * row shape tagged with `seq`.
    */
  private def classifySql(b: String, idx: String, seq: Int): String = {
    val agree = (0 until NumHashes)
      .map(k => s"CASE WHEN x.mh$k = y.mh$k THEN 1 ELSE 0 END").mkString(" + ")
    val bandJoins = (0 until Bands).map(j =>
      s"SELECT x.doc_id, y.doc_id AS match_id, $agree AS n_agree FROM ${b}_sig x JOIN $idx y ON x.band$j = y.band$j")
      .mkString(" UNION ALL ")
    s"""SELECT r.doc_id,
       |  CAST(COALESCE(k.n_candidates, 0) AS BIGINT) AS n_candidates,
       |  k.match_id AS best_match_id,
       |  CAST(k.n_agree AS DOUBLE) / $NumHashes AS best_agreement,
       |  k.match_id IS NOT NULL AS is_near_dup,
       |  $seq AS batch_seq
       |FROM (SELECT doc_id FROM ${b}_toks) r
       |LEFT JOIN (
       |  SELECT doc_id, match_id, n_agree,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n_candidates,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_agree DESC, match_id) AS rn
       |  FROM (SELECT DISTINCT doc_id, match_id, n_agree FROM ($bandJoins))) k
       |ON r.doc_id = k.doc_id AND k.rn = 1""".stripMargin
  }

  /** DuckDB twin of the two-batch incremental scenario: batch 1 vs the
    * corpus index, batch 2 vs corpus ∪ batch 1.
    */
  def lshIncrementalSql(
      corpusPred: String, b1Pred: String, b2Pred: String): String =
    s"""WITH ${sigCtesSql("c", corpusPred)},
       |${sigCtesSql("b1", b1Pred)},
       |${sigCtesSql("b2", b2Pred)},
       |idx1 AS (SELECT * FROM c_sig UNION ALL SELECT * FROM b1_sig)
       |SELECT * FROM (
       |  ${classifySql("b1", "c_sig", 1).replace("\n", "\n  ")}
       |  UNION ALL
       |  ${classifySql("b2", "idx1", 2).replace("\n", "\n  ")})
       |ORDER BY doc_id""".stripMargin

  /** [[shingles]] with the 1-based token position each shingle starts at
    * (shingle i covers tokens i..i+2) — the positional lineage span-level
    * scrubbing needs that plain shingles discard.
    */
  def positionedShingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("w", TextOps.toks(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), i -> struct(i AS i, concat_ws(' ', w[i-1], w[i], w[i+1]) AS shingle))"))
        .as("s"))
      .select(col("doc_id"), col("s.i").as("i"), col("s.shingle").as("shingle"))

  /** Span-level boilerplate REMOVAL — the curation step after
    * [[duplicateShingles]]'s report: rewrite every document with the
    * tokens covered by any cross-document duplicated 3-gram stripped out
    * (site chrome, license headers, template text — the repeated-substring
    * scrub of training corpora, at shingle granularity instead of suffix
    * arrays). A token survives iff NO duplicated shingle covers its
    * position.
    *
    * Scale shape: one aggregation finds the duplicated-shingle set
    * (vocabulary-sized output), one equality join marks the covered
    * shingle starts, one aggregation folds them into a per-doc covered
    * position set (positions-within-doc-sized, never corpus-wide), and
    * the rewrite itself is NARROW per-row list algebra over the token
    * array — no explode of the corpus at reconstruction time. Nothing is
    * all-pairs; everything keys on shingle or doc_id.
    */
  def boilerplateScrub(documents: DataFrame, minDocs: Int = 2): DataFrame = {
    val st = positionedShingles(documents)
    val dup = st.groupBy("shingle")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("shingle")
    // covered positions = union of [i, i+2] over duplicated-shingle starts;
    // collect_set dedups overlapping spans inside the aggregation buffers
    val cov = st.join(dup, "shingle")
      .select(col("doc_id"), explode(expr("sequence(i, i + 2)")).as("p"))
      .groupBy("doc_id")
      .agg(collect_set(col("p")).as("cov"))
    documents.select(col("doc_id"), TextOps.toks(col("text")).as("w"))
      .join(cov, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), expr("CAST(array() AS ARRAY<INT>)")))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        size(col("cov")).cast("long").as("n_removed"),
        (size(col("w")) - size(col("cov"))).cast("long").as("n_kept"),
        expr("""array_join(
                 filter(
                   transform(sequence(1, size(w)),
                     p -> IF(array_contains(cov, p), CAST(NULL AS STRING), element_at(w, p))),
                   t -> t IS NOT NULL), ' ')""").as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[boilerplateScrub]] (string_agg reconstruction;
    * COALESCE('') matches Spark's empty-array → '' join for fully-scrubbed
    * docs).
    */
  def boilerplateScrubSql(minDocs: Int = 2): String =
    raw"""WITH $RAW_SHINGLES_CTE,
       |stp AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle, i
       |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM toks)),
       |dup AS (SELECT shingle FROM stp GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       |cov AS (SELECT DISTINCT stp.doc_id, stp.i + d.d AS p
       |        FROM stp JOIN dup USING (shingle)
       |        CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) d),
       |covn AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY 1),
       |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p FROM toks),
       |kept AS (SELECT pos.doc_id, pos.p, pos.w[pos.p] AS tok
       |         FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
       |         WHERE cov.p IS NULL),
       |cleaned AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS cleaned_text
       |            FROM kept GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_toks,
       |  CAST(COALESCE(c.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(len(t.w) - COALESCE(c.n_removed, 0) AS BIGINT) AS n_kept,
       |  COALESCE(cl.cleaned_text, '') AS cleaned_text
       |FROM toks t
       |LEFT JOIN covn c USING (doc_id)
       |LEFT JOIN cleaned cl USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** Headline corpus accounting — the one-row report a curation run
    * prints before/after shipping: document and token mass, how much of
    * it exact dedup removes, and how much survives the quality floor and
    * language allowlist. All counts reduce map-side (two aggregations
    * over one scan lineage: per-doc flags first, then the global fold);
    * the output is 1 row regardless of corpus size.
    */
  def corpusStats(
      documents: DataFrame, minQuality: Double = 0.2,
      langs: Seq[String] = Seq("en")): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val scores = TextOps.langScoreCols(col("text"))
    documents
      .withColumn("rn", row_number().over(w))
      .select(
        col("doc_id") +:
          size(TextOps.toks(col("text"))).cast("long").as("n_toks") +:
          (col("rn") === 1).as("is_rep") +:
          (TextOps.qualityScore(col("text")) >= minQuality).as("q_ok") +:
          scores.map { case (n, c) => c.cast("long").as("__" + n) }: _*)
      .withColumn("lang_ok",
        TextOps.langCaseFromScores("__").isInCollection(langs))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("is_rep"), 1L).otherwise(0L)).as("n_unique_docs"),
        sum(when(col("is_rep"), col("n_toks")).otherwise(0L)).as("unique_token_mass"),
        sum(when(col("is_rep") && col("q_ok") && col("lang_ok"), 1L).otherwise(0L))
          .as("n_shippable_docs"),
        sum(when(col("is_rep") && col("q_ok") && col("lang_ok"), col("n_toks"))
          .otherwise(0L)).as("shippable_token_mass"))
      .withColumn("dedup_savings_pct",
        lit(100.0) * (col("n_tokens") - col("unique_token_mass")) / col("n_tokens"))
  }

  def corpusStatsSql(
      minQuality: Double = 0.2, langs: Seq[String] = Seq("en")): String = {
    val langList = langs.map(l => s"'$l'").mkString(", ")
    raw"""WITH d AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_toks,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS is_rep
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, n_toks, is_rep,
       |    (${TextOps.qualityScoreSqlExpr}) >= $minQuality AS q_ok,
       |    ${TextOps.langScoreColsSql}
       |  FROM d),
       |h AS (
       |  SELECT doc_id, n_toks, is_rep, q_ok,
       |    (${TextOps.langCaseSql}) IN ($langList) AS lang_ok
       |  FROM f),
       |g AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN is_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_docs,
       |    CAST(SUM(CASE WHEN is_rep THEN n_toks ELSE 0 END) AS BIGINT) AS unique_token_mass,
       |    CAST(SUM(CASE WHEN is_rep AND q_ok AND lang_ok THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_shippable_docs,
       |    CAST(SUM(CASE WHEN is_rep AND q_ok AND lang_ok THEN n_toks ELSE 0 END) AS BIGINT)
       |      AS shippable_token_mass
       |  FROM h)
       |SELECT *, 100.0 * (n_tokens - unique_token_mass) / n_tokens AS dedup_savings_pct
       |FROM g""".stripMargin
  }

  /** The full curation pass, end to end in ONE declarative chain:
    * boilerplate-span scrub → minimum-surviving-length floor → exact
    * dedup of the CLEANED text (scrubbing can make near-copies exact —
    * dedup after scrub catches what dedup before it would miss) →
    * quality floor and language allowlist scored on the cleaned text.
    * This is the composition a reference-engine user actually ships:
    * every stage is one of this library's audited operators, fused by
    * Catalyst into a single plan — no intermediate materialization, and
    * the whole chain keeps the per-stage scale shapes (shingle-keyed
    * joins, one dedup window partitioned by content hash, narrow
    * scoring).
    */
  def curateCorpus(
      documents: DataFrame, minQuality: Double = 0.2,
      langs: Seq[String] = Seq("en"), minTokens: Int = 5,
      minDocs: Int = 2): DataFrame = {
    val cleaned = boilerplateScrub(documents, minDocs)
      .filter(col("n_kept") >= minTokens)
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("cleaned_text").as("text"), col("source"))
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val scores = TextOps.langScoreCols(col("text"))
    // same plan shape as corpusFilter: one text-derived projection below
    // the dedup window, attribute-only filter above (see the note there)
    cleaned
      .select(
        col("doc_id") +: col("text") +: col("source") +:
          size(TextOps.toks(col("text"))).cast("long").as("n_tokens") +:
          TextOps.qualityScore(col("text")).as("quality_score") +:
          scores.map { case (n, c) => c.cast("long").as("__" + n) }: _*)
      .withColumn("rn", row_number().over(w))
      .withColumn("predicted_lang", TextOps.langCaseFromScores("__"))
      .filter(col("rn") === 1 && col("quality_score") >= minQuality &&
        col("predicted_lang").isInCollection(langs))
      .drop("text" +: "rn" +: scores.map("__" + _._1): _*)
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[curateCorpus]] — the scrub oracle nested as a CTE,
    * then the same dedup window / scoring / filters over the cleaned
    * text.
    */
  def curateCorpusSql(
      minQuality: Double = 0.2, langs: Seq[String] = Seq("en"),
      minTokens: Int = 5, minDocs: Int = 2): String = {
    val langList = langs.map(l => s"'$l'").mkString(", ")
    raw"""WITH scrub AS (${boilerplateScrubSql(minDocs)}),
       |cl AS (
       |  SELECT s.doc_id, s.cleaned_text AS text, d.source
       |  FROM scrub s JOIN documents d USING (doc_id)
       |  WHERE s.n_kept >= $minTokens),
       |kept AS (
       |  SELECT doc_id, text, source FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM cl) WHERE rn = 1),
       |sc AS (SELECT doc_id, source,
       |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
       |  ${TextOps.qualityScoreSqlExpr} AS quality_score,
       |  ${TextOps.langScoreColsSql}
       |FROM kept)
       |SELECT doc_id, source, n_tokens, quality_score,
       |  ${TextOps.langCaseSql} AS predicted_lang
       |FROM sc
       |WHERE quality_score >= $minQuality
       |  AND (${TextOps.langCaseSql}) IN ($langList)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- exact duplicate-SPAN dedup (substring-level, keep-first) -----

  /** All n-gram span starts: (doc_id, start position i, gram hash). */
  private def spanStarts(documents: DataFrame, n: Int): DataFrame = {
    val w = TextOps.toks(col("text"))
    documents.select(col("doc_id"), w.as("w"))
      .withColumn("i", explode(
        when(size(col("w")) >= n, sequence(lit(1), size(col("w")) - (n - 1)))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("i"),
        md5(array_join(slice(col("w"), col("i"), lit(n)), " ")).as("h"))
  }

  /** Removable span starts — every occurrence of a duplicated n-gram
    * EXCEPT the corpus-first one, first = (doc_id, position)
    * lexicographic. The rank window runs per gram hash over
    * occurrence-count-sized groups; the gram-keyed shuffle is the
    * inherent cost of substring-level dedup at any scale.
    */
  private def removableStarts(documents: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("h").orderBy("doc_id", "i")
    spanStarts(documents, n)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select("doc_id", "i")
  }

  private def spanStartsSqlCtes(n: Int): String =
    raw"""toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
       |          FROM documents),
       |gs AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
       |         md5(array_to_string(w[i:i+${n - 1}], ' ')) AS h
       |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${n - 1})) AS i
       |             FROM toks)),
       |rem AS (SELECT doc_id, i FROM (
       |          SELECT doc_id, i,
       |            ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
       |          FROM gs) WHERE rn > 1)""".stripMargin

  /** Substring-level exact dedup — the published span-dedup pass for
    * LLM training corpora: every n-token span that occurs more than
    * once in the corpus keeps exactly its FIRST occurrence; all later
    * occurrences' token positions (union of [i, i+n−1] over removable
    * starts) are scrubbed from their documents. Contrast
    * [[boilerplateScrub]], which removes high-df template shingles from
    * EVERY document — here one copy of each duplicated passage always
    * survives, so no corpus content is lost, only repetition.
    */
  def dupSpanScrub(documents: DataFrame, n: Int = 8): DataFrame =
    scrubByCoverage(documents,
      removableStarts(documents, n)
        .select(col("doc_id"), explode(expr(s"sequence(i, i + ${n - 1})")).as("p"))
        .groupBy("doc_id").agg(collect_set(col("p")).as("cov")))

  /** Shared scrub tail: documents joined to their per-doc covered
    * position sets, uncovered tokens re-joined in order.
    */
  private def scrubByCoverage(documents: DataFrame, cov: DataFrame): DataFrame =
    documents.select(col("doc_id"), TextOps.toks(col("text")).as("w"))
      .join(cov, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), expr("CAST(array() AS ARRAY<INT>)")))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        size(col("cov")).cast("long").as("n_removed"),
        (size(col("w")) - size(col("cov"))).cast("long").as("n_kept"),
        expr("""array_join(
                 filter(
                   transform(sequence(1, size(w)),
                     p -> IF(array_contains(cov, p), CAST(NULL AS STRING), element_at(w, p))),
                   t -> t IS NOT NULL), ' ')""").as("cleaned_text"))
      .orderBy("doc_id")

  /** [[dupSpanScrub]] at the PUBLISHED ExactSubstr operating point (r15,
    * VERDICT item 5): overlapping duplicated n-grams merge into MAXIMAL
    * spans first ([[dupSpanReport]]'s gaps-and-islands), and only spans
    * of at least `minLen` tokens are scrubbed — short incidental
    * repeats (a 49-token quote at the default threshold) survive, long
    * verbatim duplication (50+) is removed keep-first. The island merge
    * runs per (doc, ordered starts) — the same gram-keyed shuffle as the
    * base scrub, plus one doc-keyed window over removable starts.
    */
  def dupSpanScrubMinLen(
      documents: DataFrame, n: Int = 8, minLen: Int = 50): DataFrame = {
    val wD = Window.partitionBy("doc_id").orderBy("i")
    val lagI = lag(col("i"), 1).over(wD)
    val spans = removableStarts(documents, n)
      .withColumn("brk",
        when(lagI.isNull || col("i") > lagI + n, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("i").as("s"), (max(col("i")) + (n - 1)).as("e"))
      .filter(col("e") - col("s") + 1 >= minLen)
    scrubByCoverage(documents,
      spans.select(col("doc_id"), explode(expr("sequence(s, e)")).as("p"))
        .groupBy("doc_id").agg(collect_set(col("p")).as("cov")))
  }

  /** DuckDB twin of [[dupSpanScrubMinLen]]: the shared span-start CTEs,
    * the report's island merge with a HAVING length floor, per-span
    * position fan-out, and the same uncovered-token rejoin.
    */
  def dupSpanScrubMinLenSql(n: Int = 8, minLen: Int = 50): String =
    raw"""WITH ${spanStartsSqlCtes(n)},
       |brks AS (SELECT doc_id, i,
       |           CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
       |                  OR i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + $n
       |                THEN 1 ELSE 0 END AS brk
       |         FROM rem),
       |isl AS (SELECT doc_id, i,
       |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |        FROM brks),
       |spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + ${n - 1} AS e
       |          FROM isl GROUP BY doc_id, island
       |          HAVING MAX(i) + ${n - 1} - MIN(i) + 1 >= $minLen),
       |cov AS (SELECT DISTINCT doc_id, p FROM (
       |          SELECT doc_id, unnest(generate_series(s, e)) AS p FROM spans)),
       |covn AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY 1),
       |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p FROM toks),
       |kept AS (SELECT pos.doc_id, pos.p, pos.w[pos.p] AS tok
       |         FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
       |         WHERE cov.p IS NULL),
       |cleaned AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS cleaned_text
       |            FROM kept GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_toks,
       |  CAST(COALESCE(c.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(len(t.w) - COALESCE(c.n_removed, 0) AS BIGINT) AS n_kept,
       |  COALESCE(cl.cleaned_text, '') AS cleaned_text
       |FROM toks t
       |LEFT JOIN covn c USING (doc_id)
       |LEFT JOIN cleaned cl USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  def dupSpanScrubSql(n: Int = 8): String =
    raw"""WITH ${spanStartsSqlCtes(n)},
       |cov AS (SELECT DISTINCT rem.doc_id, rem.i + d.d AS p
       |        FROM rem CROSS JOIN (SELECT unnest(generate_series(0, ${n - 1})) AS d) d),
       |covn AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY 1),
       |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p FROM toks),
       |kept AS (SELECT pos.doc_id, pos.p, pos.w[pos.p] AS tok
       |         FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
       |         WHERE cov.p IS NULL),
       |cleaned AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS cleaned_text
       |            FROM kept GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_toks,
       |  CAST(COALESCE(c.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(len(t.w) - COALESCE(c.n_removed, 0) AS BIGINT) AS n_kept,
       |  COALESCE(cl.cleaned_text, '') AS cleaned_text
       |FROM toks t
       |LEFT JOIN covn c USING (doc_id)
       |LEFT JOIN cleaned cl USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** The maximal duplicated spans behind [[dupSpanScrub]], merged per
    * document (gaps-and-islands: a removable start extends the current
    * span iff it begins within n tokens of the previous start — interval
    * overlap or adjacency). The audit view: where the repeated passages
    * sit and how long they run.
    */
  def dupSpanReport(documents: DataFrame, n: Int = 8): DataFrame = {
    val wD = Window.partitionBy("doc_id").orderBy("i")
    val lagI = lag(col("i"), 1).over(wD)
    removableStarts(documents, n)
      .withColumn("brk",
        when(lagI.isNull || col("i") > lagI + n, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(
        min("i").as("span_start"),
        (max(col("i")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_starts"))
      .select("doc_id", "span_start", "span_end", "n_starts")
      .orderBy("doc_id", "span_start")
  }

  def dupSpanReportSql(n: Int = 8): String =
    raw"""WITH ${spanStartsSqlCtes(n)},
       |brks AS (SELECT doc_id, i,
       |           CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
       |                  OR i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + $n
       |                THEN 1 ELSE 0 END AS brk
       |         FROM rem),
       |isl AS (SELECT doc_id, i,
       |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |        FROM brks)
       |SELECT doc_id, MIN(i) AS span_start, MAX(i) + ${n - 1} AS span_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_starts
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin
}
