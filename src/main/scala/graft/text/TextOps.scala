package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: token counting, quality scoring, language-ID
  * (n-gram/marker heuristic), fingerprinting, and 32-bit SimHash.
  *
  * Every operator is pure narrow column algebra (no UDFs, no shuffle except
  * the SimHash token aggregation) — embarrassingly parallel over document
  * partitions at any scale. Each ships with a DuckDB oracle twin
  * (the *Sql vals) built from the same arithmetic so results are
  * bit-identical cross-engine:
  *  - counts are integers (exact);
  *  - ratios are single IEEE divisions of integers (deterministic);
  *  - hashes are md5 hex strings (lexicographic min is engine-agnostic).
  */
object TextOps {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  private def occurrencesChars(padded: Column, marker: String): Column =
    length(padded) - length(regexp_replace(padded, marker, " "))

  private def occurrencesCharsSql(padded: String, marker: String): String =
    s"length($padded) - length(replace($padded, '$marker', ' '))"

  // marker n-grams per language (space-padded so they only match whole
  // words); scores are total characters matched — integer-exact.
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " los ", " y "))

  /** Quality score of a text column, inside [0,1]: rewards length up to
    * 100 tokens and penalizes punctuation/digit-heavy text. Shared by
    * [[textStats]] and the corpus filter so both stages score
    * identically.
    */
  def qualityScore(t: Column): Column = {
    val nChars = length(t)
    val nTokens = size(toks(t))
    val punct = length(t) - length(regexp_replace(t, "[.,!?;:]", ""))
    val digit = length(t) - length(regexp_replace(t, "[0-9]", ""))
    least(lit(1.0), nTokens.cast("double") / 100.0)
      .multiply(lit(1.0) - least(lit(1.0), punct.cast("double") / nChars * 5.0))
      .multiply(lit(1.0) - least(lit(1.0), digit.cast("double") / nChars * 5.0))
  }

  /** DuckDB twin of [[qualityScore]] over a column named `text`. */
  private[graft] val qualityScoreSqlExpr: String =
    raw"""LEAST(1.0, CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0)
       |    * (1.0 - LEAST(1.0, CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) * 5.0))
       |    * (1.0 - LEAST(1.0, CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) * 5.0))""".stripMargin

  /** Token/character statistics + a deterministic quality score.
    * Cheap single-pass heuristics (length, punctuation/digit ratios,
    * stopword density) of the kind used to filter web corpora.
    */
  def textStats(documents: DataFrame): DataFrame = {
    val t = col("text")
    val padded = concat(lit(" "), lower(t), lit(" "))
    val nChars = length(t).cast("long")
    val nTokens = size(toks(t)).cast("long")
    val noSpace = length(regexp_replace(trim(t), "\\s+", "")).cast("long")
    val punct = (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("long")
    val digit = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long")
    val stopChars = occurrencesChars(padded, " the ") + occurrencesChars(padded, " a ") +
      occurrencesChars(padded, " and ")
    documents.select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      nChars.as("n_chars_computed"),
      (noSpace.cast("double") / nTokens).as("avg_token_len"),
      punct.as("punct_count"),
      (punct.cast("double") / nChars).as("punct_ratio"),
      digit.as("digit_count"),
      (digit.cast("double") / nChars).as("digit_ratio"),
      stopChars.cast("long").as("stopword_chars"),
      (stopChars.cast("double") / nChars).as("stopword_density"),
      qualityScore(t).as("quality_score"))
      .orderBy("doc_id")
  }

  val textStatsSql: String = {
    val padded = "(' ' || lower(text) || ' ')"
    val stop = Seq(" the ", " a ", " and ")
      .map(m => s"(${occurrencesCharsSql(padded, m)})").mkString(" + ")
    raw"""SELECT doc_id,
       |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_computed,
       |  CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
       |    / len(string_split_regex(trim(lower(text)), '\s+')) AS avg_token_len,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS punct_count,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digit_count,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
       |  CAST($stop AS BIGINT) AS stopword_chars,
       |  CAST($stop AS DOUBLE) / length(text) AS stopword_density,
       |  LEAST(1.0, CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0)
       |    * (1.0 - LEAST(1.0, CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) * 5.0))
       |    * (1.0 - LEAST(1.0, CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) * 5.0))
       |    AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens plus a BPE-ish subword proxy —
    * letter runs, single digits, and single other-marks (the
    * pre-tokenization classes BPE vocabularies split on). The regex count
    * is a deterministic, engine-agnostic approximation of tokenizer load
    * (the number a corpus token budget is planned in); chars_per_token is
    * the usual compression diagnostic.
    */
  def tokenCounts(documents: DataFrame): DataFrame = {
    val t = col("text")
    val bpe = regexp_count(t, lit("\\p{L}+|\\p{N}|[^\\s\\p{L}\\p{N}]"))
    documents.select(
      col("doc_id"),
      size(toks(t)).cast("long").as("n_ws_tokens"),
      bpe.cast("long").as("n_bpe_tokens"),
      when(bpe > 0, length(t).cast("double") / bpe).as("chars_per_token"))
      .orderBy("doc_id")
  }

  val tokenCountsSql: String = {
    val bpe = raw"len(regexp_extract_all(text, '\p{L}+|\p{N}|[^\s\p{L}\p{N}]'))"
    raw"""SELECT doc_id,
       |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_ws_tokens,
       |  CAST($bpe AS BIGINT) AS n_bpe_tokens,
       |  CASE WHEN $bpe > 0 THEN CAST(length(text) AS DOUBLE) / $bpe END AS chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** The marker-score columns behind [[predictedLang]], materialized
    * once: CJK codepoint count plus one summed marker count per
    * language. Use with [[langCaseFromScores]] in a TWO-projection plan
    * instead of the single-expression [[predictedLang]] whenever the
    * prediction feeds a real query: inside the inlined CASE every score
    * sits in a conditional branch, where codegen's subexpression
    * elimination cannot hoist it (branches evaluate lazily), so the
    * generated method repeats every regexp count up to ~8×, exceeds
    * Janino's method limits, and the operator silently falls back to
    * interpreted evaluation with the duplication intact — measured
    * 5-10× on corpus_filter/lang_id at sf0.1. Materializing the five
    * scores as aliases computes each count exactly once
    * (CollapseProject never inlines a non-cheap alias referenced more
    * than once) and the downstream CASE is integer comparisons.
    */
  def langScoreCols(t: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(t), lit(" "))
    ("cjk_chars" -> (length(t) - length(regexp_replace(t, "[一-鿿]", "")))) +:
      Markers.map { case (lang, ms) =>
        s"${lang}_score" -> ms.map(m => occurrencesChars(padded, m)).reduceLeft(_ + _)
      }
  }

  /** The [[predictedLang]] decision tree over already-materialized
    * [[langScoreCols]] attributes (optionally name-prefixed).
    */
  def langCaseFromScores(prefix: String = ""): Column = {
    def s(n: String) = col(prefix + n)
    val cjk = s("cjk_chars"); val en = s("en_score"); val de = s("de_score")
    val fr = s("fr_score"); val es = s("es_score")
    when(cjk > 0, "zh")
      .when(de > en && de > fr && de > es, "de")
      .when(fr > en && fr >= de && fr > es, "fr")
      .when(es > en && es >= de && es >= fr, "es")
      .when(en + de + fr + es > 0, "en")
      .otherwise("und")
  }

  /** Append `predicted_lang` to `df` (which must carry `text`) via the
    * factored two-projection plan of [[langScoreCols]] — the form every
    * query-side consumer should use.
    */
  def withPredictedLang(df: DataFrame, out: String = "predicted_lang"): DataFrame = {
    val scores = langScoreCols(col("text"))
    val scored = df.select(
      col("*") +: scores.map { case (n, c) => c.cast("long").as("__" + n) }: _*)
    scored.withColumn(out, langCaseFromScores("__"))
      .drop(scores.map("__" + _._1): _*)
  }

  /** Predicted language of a text column (fixed-priority decision tree
    * over the marker scores; CJK first via codepoint-range count).
    * Shared single-expression form — semantics reference for specs and
    * for contexts where the value lands in exactly one projection;
    * query plans should prefer [[langScoreCols]] + [[langCaseFromScores]]
    * (see the codegen note there).
    */
  def predictedLang(t: Column): Column = {
    val padded = concat(lit(" "), lower(t), lit(" "))
    val cjk = length(t) - length(regexp_replace(t, "[一-鿿]", ""))
    val scores = Markers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrencesChars(padded, m)).reduceLeft(_ + _)
    }.toMap
    val en = scores("en"); val de = scores("de"); val fr = scores("fr"); val es = scores("es")
    when(cjk > 0, "zh")
      .when(de > en && de > fr && de > es, "de")
      .when(fr > en && fr >= de && fr > es, "fr")
      .when(es > en && es >= de && es >= fr, "es")
      .when(en + de + fr + es > 0, "en")
      .otherwise("und")
  }

  /** DuckDB twins of [[predictedLang]]: the score projections (over a
    * column named `text`) and the decision CASE (over the score names).
    */
  private[graft] val langScoreColsSql: String = {
    val padded = "(' ' || lower(text) || ' ')"
    def sc(lang: String) = Markers.toMap.apply(lang)
      .map(m => s"(${occurrencesCharsSql(padded, m)})").mkString(" + ")
    s"""CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS BIGINT) AS cjk_chars,
       |  CAST(${sc("en")} AS BIGINT) AS en_score,
       |  CAST(${sc("de")} AS BIGINT) AS de_score,
       |  CAST(${sc("fr")} AS BIGINT) AS fr_score,
       |  CAST(${sc("es")} AS BIGINT) AS es_score""".stripMargin
  }

  private[graft] val langCaseSql: String =
    """CASE WHEN cjk_chars > 0 THEN 'zh'
      |       WHEN de_score > en_score AND de_score > fr_score AND de_score > es_score THEN 'de'
      |       WHEN fr_score > en_score AND fr_score >= de_score AND fr_score > es_score THEN 'fr'
      |       WHEN es_score > en_score AND es_score >= de_score AND es_score >= fr_score THEN 'es'
      |       WHEN en_score + de_score + fr_score + es_score > 0 THEN 'en'
      |       ELSE 'und' END""".stripMargin

  /** Marker-word language identification (fixed-priority decision tree;
    * CJK detection first via codepoint-range count). The testdata's `lang`
    * labels are synthetic — the prediction is compared for determinism,
    * not accuracy.
    */
  def languageId(documents: DataFrame): DataFrame = {
    documents.select(
      col("doc_id") +: col("lang") +:
        langScoreCols(col("text")).map { case (n, c) => c.cast("long").as(n) }: _*)
      .withColumn("predicted_lang", langCaseFromScores())
      .withColumn("is_match", (col("predicted_lang") === col("lang")).cast("boolean"))
      .orderBy("doc_id")
  }

  val languageIdSql: String =
    s"""WITH s AS (SELECT doc_id, lang,
       |  $langScoreColsSql
       |FROM documents)
       |SELECT doc_id, lang, cjk_chars, en_score, de_score, fr_score, es_score,
       |  $langCaseSql AS predicted_lang,
       |  ($langCaseSql) = lang AS is_match
       |FROM s ORDER BY doc_id""".stripMargin

  /** Content fingerprint: md5 of whitespace-normalized lower-cased text
    * (plus a short prefix for bucketing/sharding).
    */
  def fingerprint(documents: DataFrame): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    documents.select(
      col("doc_id"),
      md5(norm).as("fingerprint"),
      substring(md5(norm), 1, 8).as("fp_prefix"))
      .orderBy("doc_id")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 8) AS fp_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TF-IDF top-k terms per document (smoothed sklearn-style idf:
    * ln((1+N)/(1+df)) + 1) — the classic keyword/topic signal a corpus
    * pipeline derives per document for search, clustering labels, and
    * near-topic dedup.
    *
    * Scale shape: explode → tf groupBy (shuffle on (doc_id, term)) →
    * df groupBy (shuffle on term, map-side partials first) → tf⋈df on
    * term (shuffle join — the term dictionary is NOT broadcastable at
    * corpus scale) → per-doc window (shuffle on doc_id). Four exchanges,
    * each on a high-cardinality key: the canonical distributed TF-IDF
    * plan. N arrives as a broadcast 1-row aggregate, not a collect.
    *
    * Determinism: tf/df are exact longs; Java's Math.log and DuckDB's ln
    * are bit-identical over these rational inputs (verified for the whole
    * df range); ties broken by term.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents.select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + lit(1.0)))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf", "rank")
      .orderBy("doc_id", "rank")
  }

  def tfidfTopTermsSql(k: Int = 3): String =
    raw"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
       |      FROM scored)
       |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= $k
       |ORDER BY doc_id, rank""".stripMargin

  /** Corpus bigram statistics: top-k word bigrams by frequency — the
    * vocabulary/corpus-statistics pass of tokenizer training and n-gram
    * LM estimation.
    *
    * Scale shape: bigram generation is a NARROW per-row list transform
    * (no posexplode+window — adjacent pairs come straight from the token
    * array), then one count aggregation (map-side partials on the
    * high-cardinality bigram key) and a TakeOrderedAndProject top-k (per
    * partition top-k, driver merge of k·partitions rows — never a global
    * sort).
    */
  def bigramTopK(documents: DataFrame, k: Int = 50): DataFrame = {
    // Materialize the token array BEFORE the pair transform: higher-order
    // functions are interpreted (no codegen), so a non-lambda subexpression
    // inside the lambda body re-evaluates once PER ELEMENT — with the regex
    // split inline that is O(n_tokens · split cost) = quadratic per doc.
    // zip_with over two slices of the materialized array touches each token
    // once (observed 6.8 s → sub-second at sf0.1 on this change alone).
    val t = col("t")
    val bigrams = when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    documents
      .select(toks(col("text")).as("t"))
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }

  /** BM25 full-text retrieval (Robertson-Spärck Jones / Lucene form):
    * score a fixed multi-term query set against the corpus and return the
    * top-k documents per query,
    * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf = ln(1 + (N−df+0.5)/(df+0.5))` (always positive). The
    * standard retrieval pass a curation pipeline uses for targeted corpus
    * probes (benchmark leakage lookups, topical subset pulls).
    *
    * Scale shape: the query-term allowlist is broadcast and applied to the
    * exploded token stream BEFORE any aggregation, so the per-(doc,term)
    * tf shuffle carries only query-term postings — output is bounded by
    * |matching docs|·|query terms|, never corpus-vocabulary-sized. Doc
    * length is a narrow `size(tokens)` per row (no second corpus shuffle);
    * N and avgdl are one broadcast row; df is a vocab-of-the-query-sized
    * aggregate of the pruned tf frame. Final top-k is a per-query
    * row_number over the bounded score set. Cross-engine exactness: each
    * term contribution is identical IEEE arithmetic on integer counts
    * (same parenthesization both sides), rounded to 6 dp, then summed per
    * doc in decimal(28,6) — the [[bigramLmScore]] recipe.
    */
  def searchBm25(documents: DataFrame, queries: Seq[(Int, String)] = Bm25Queries,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = documents.sparkSession
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    // The query set is a literal KB-scale list: tokenize it driver-side so
    // the plan carries no distinct/aggregate nodes for it — just one
    // broadcast relation and an In-list filter on the token stream.
    val qterms = queries
      .flatMap { case (id, q) => q.trim.toLowerCase.split("\\s+").map(id -> _) }
      .distinct
    val qterm = qterms.toDF("query_id", "term")
    // dl rides the explode as a grouping key (functionally dependent on
    // doc_id), so no second corpus scan / doc_id join is ever needed
    val tok = documents.select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("dl"),
      explode(toks(col("text"))).as("term"))
    val tf = tok
      .filter(col("term").isInCollection(qterms.map(_._2).distinct))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = documents.agg(
      count(lit(1)).as("n"), avg(size(toks(col("text"))).cast("long")).as("avgdl"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val scored = broadcast(qterm).join(tf, "term")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c", round(
        idf * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
        6))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("c").cast("decimal(28,6)")).cast("double").as("score"))
    // bounded-heap top-k per query (no per-query sort of the full matched
    // set), then rank/order over the k·|queries|-row survivor set
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    graft.plans.TopKPerGroup.topK(scored,
      groupCols = Seq("query_id"),
      orderCols = Seq("score" -> true, "doc_id" -> false),
      k = k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("query_id", "doc_id", "n_terms", "score", "rank")
      .orderBy("query_id", "rank")
  }

  /** Fixed query set for [[searchBm25]]: corpus-vocabulary terms plus one
    * absent term (`zzzmissing`) so the zero-posting path is exercised.
    */
  val Bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "spark join shuffle",
    2 -> "hash table scan",
    3 -> "window agg order",
    4 -> "customer query zzzmissing")

  def searchBm25Sql(queries: Seq[(Int, String)] = Bm25Queries,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): String = {
    val values = queries.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
    raw"""WITH q(query_id, qtext) AS (VALUES $values),
       |qterm AS (SELECT DISTINCT CAST(query_id AS INTEGER) AS query_id,
       |    unnest(string_split_regex(trim(lower(qtext)), '\s+')) AS term FROM q),
       |tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
       |        FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       |       WHERE term IN (SELECT term FROM qterm) GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS dl
       |       FROM documents),
       |st AS (SELECT COUNT(*) AS n,
       |         AVG(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)) AS avgdl
       |       FROM documents),
       |contrib AS (
       |  SELECT qterm.query_id, tf.doc_id,
       |    ROUND(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |      * (tf.tf * ${k1 + 1.0}) / (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl)),
       |      6) AS c
       |  FROM qterm JOIN tf USING (term) JOIN df USING (term)
       |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
       |s AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |        CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS score
       |      FROM contrib GROUP BY 1, 2),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, doc_id, n_terms, score, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  def bigramTopKSql(k: Int = 50): String =
    raw"""WITH b AS (
       |  SELECT unnest(list_transform(
       |    generate_series(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
       |    i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
       |         string_split_regex(trim(lower(text)), '\s+')[i + 1])) AS bigram
       |  FROM documents)
       |SELECT bigram, COUNT(*) AS n FROM b GROUP BY 1
       |ORDER BY n DESC, bigram LIMIT $k""".stripMargin

  /** CCNet-style LM quality scoring (Wenzek et al. 2020 uses a trained
    * Kneser-Ney model; this is the self-contained corpus-trained
    * variant): score every document by its per-bigram cross-entropy
    * under the corpus' own add-1-smoothed bigram model,
    * P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). Low avg_nll = the corpus has
    * seen these transitions many times (boilerplate, template text,
    * spam repeats — prune-or-downweight candidates); high avg_nll =
    * rare content. The standard LM-perplexity quality filter with the
    * model training and the scoring as ONE distributed pipeline.
    *
    * Scale shape: model "training" is two map-side-combinable
    * aggregations (unigram + bigram counts — vocabulary-sized outputs);
    * scoring joins each bigram instance to its two counts by key
    * (equality joins, never all-pairs) and folds per doc. Cross-engine
    * exactness: each instance's -ln P is computed identically per row
    * (same IEEE division + libm log on identical integer counts), then
    * ROUNDED to 6 dp before the per-doc decimal sum — the rounded value
    * sits on the 6-dp grid, so the decimal cast is unambiguous in both
    * engines and the sum is associative (partition-order independent),
    * per the detSum rule that raw double sums can never be
    * hash-verified.
    */
  def bigramLmScore(documents: DataFrame): DataFrame =
    bigramNllCore(documents, carry = Nil).orderBy("doc_id")

  /** Shared core of [[bigramLmScore]] / [[ccnetBuckets]]: per-doc
    * add-1-smoothed bigram NLL, with optional extra per-doc columns
    * (functionally dependent on doc_id) computed in the base projection
    * and carried through the instance explode as grouping keys — no
    * doc_id re-join for enrichment columns.
    */
  private def bigramNllCore(documents: DataFrame,
      carry: Seq[(String, Column)]): DataFrame = {
    val carryCols = carry.map { case (n, _) => col(n) }
    val keyCols = col("doc_id") +: carryCols
    val base = documents.select(
      col("doc_id") +: carry.map { case (n, c) => c.as(n) } :+
        toks(col("text")).as("w"): _*)
    val inst = base
      .filter(size(col("w")) >= 2)
      .select(keyCols :+ explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as("b"): _*)
      .select(keyCols :+ col("b.w1").as("w1") :+ col("b.w2").as("w2"): _*)
    val tokens = base.select(explode(col("w")).as("tok"))
    val uni = tokens.groupBy(col("tok").as("w1")).agg(count(lit(1)).as("c1"))
    val vocab = tokens.agg(countDistinct(col("tok")).as("v"))
    val scored = inst
      .join(inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12")), Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll", round(
        -log((col("c12") + lit(1).cast("double")) / (col("c1") + col("v"))), 6))
    scored.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("nll").cast("decimal(28,6)")).cast("double") / count(lit(1)))
          .as("avg_nll"))
  }

  val bigramLmScoreSql: String =
    raw"""WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
       |           FROM documents),
       |inst AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |         FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
       |               FROM tk WHERE len(w) >= 2)),
       |toke AS (SELECT unnest(w) AS tok FROM tk),
       |uni AS (SELECT tok AS w1, COUNT(*) AS c1 FROM toke GROUP BY 1),
       |vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toke),
       |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM inst GROUP BY 1, 2),
       |scored AS (
       |  SELECT inst.doc_id,
       |    ROUND(-ln((big.c12 + CAST(1 AS DOUBLE)) / (uni.c1 + vocab.v)), 6) AS nll
       |  FROM inst JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_nll
       |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** CCNet-style head/middle/tail quality tiers (Wenzek et al. 2020 —
    * public paper): language-ID every document, score it with the corpus
    * bigram LM ([[bigramLmScore]]'s core), then cut each language's
    * documents into perplexity terciles — `head` = lowest avg NLL. The
    * standard curation split that decides what is trained on, sampled
    * down, or dropped, as ONE distributed plan.
    *
    * Scale shape: predicted_lang is computed once in the base projection
    * and carried through the NLL pipeline as a grouping key (no doc_id
    * re-join); the tercile cut is [[graft.rel.Scale.ntileExactBy]] — a
    * group-major range sort plus a groups-sized broadcast of per-group
    * offsets — NOT `ntile().over(partitionBy(lang))`, which would drag
    * each language through a single reducer at 100 TB. Docs with <2
    * tokens have no LM score and are excluded (CCNet drops them too).
    */
  def ccnetBuckets(documents: DataFrame): DataFrame = {
    val docsScored = documents.select(
      col("doc_id") +: col("text") +:
        langScoreCols(col("text")).map { case (n, c) => c.cast("long").as("__" + n) }: _*)
    val perDoc = bigramNllCore(docsScored,
      carry = Seq("predicted_lang" -> langCaseFromScores("__")))
    graft.rel.Scale.ntileExactBy(perDoc, n = 3,
      group = Seq("predicted_lang"), keys = Seq("avg_nll", "doc_id"))
      .withColumn("bucket",
        when(col("tier") === 1, "head")
          .when(col("tier") === 2, "middle")
          .otherwise("tail"))
      .select("doc_id", "predicted_lang", "avg_nll", "bucket")
      .orderBy("doc_id")
  }

  val ccnetBucketsSql: String =
    raw"""WITH s AS (SELECT doc_id, text,
       |  $langScoreColsSql
       |FROM documents),
       |d AS (SELECT doc_id, $langCaseSql AS predicted_lang,
       |        string_split_regex(trim(lower(text)), '\s+') AS w
       |      FROM s),
       |inst AS (SELECT doc_id, predicted_lang, w[i] AS w1, w[i+1] AS w2
       |         FROM (SELECT doc_id, predicted_lang, w,
       |                 unnest(generate_series(1, len(w) - 1)) AS i
       |               FROM d WHERE len(w) >= 2)),
       |toke AS (SELECT unnest(w) AS tok FROM d),
       |uni AS (SELECT tok AS w1, COUNT(*) AS c1 FROM toke GROUP BY 1),
       |vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toke),
       |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM inst GROUP BY 1, 2),
       |scored AS (
       |  SELECT inst.doc_id, inst.predicted_lang,
       |    ROUND(-ln((big.c12 + CAST(1 AS DOUBLE)) / (uni.c1 + vocab.v)), 6) AS nll
       |  FROM inst JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab),
       |perdoc AS (
       |  SELECT doc_id, predicted_lang,
       |    CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_nll
       |  FROM scored GROUP BY 1, 2),
       |t AS (SELECT *, NTILE(3) OVER (
       |        PARTITION BY predicted_lang ORDER BY avg_nll, doc_id) AS tier
       |      FROM perdoc)
       |SELECT doc_id, predicted_lang, avg_nll,
       |  CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM t ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals (Rae et al. 2021, appendix A —
    * public paper): the repetition family of web-corpus quality filters.
    * Documents dominated by a few repeated phrases are boilerplate/spam
    * and get dropped before training. The synthetic corpus carries no
    * line structure, so the signals are token-level: duplicate-token
    * fraction, the share of bigram occurrences taken by the single most
    * frequent bigram, and the share of bigram occurrences that are
    * repeats.
    *
    * Scale shape: token stats are NARROW per-row list algebra
    * (size/array_distinct — zero shuffle); bigram stats are one explode
    * plus two map-side-combinable aggregations keyed by (doc_id, bigram)
    * then doc_id — linear and fully distributed at 100 TB, no windows,
    * no driver loops. Docs with <2 tokens surface NULL bigram columns
    * (left join) rather than fabricated zeros.
    */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val w = toks(col("text"))
    val base = documents.select(col("doc_id"), w.as("w"))
    val tokenStats = base.select(
      col("doc_id"),
      size(col("w")).cast("long").as("n_tokens"),
      size(array_distinct(col("w"))).cast("long").as("distinct_tokens"))
    val bigrams = when(size(col("w")) >= 2,
      transform(sequence(lit(0), size(col("w")) - 2),
        i => concat(element_at(col("w"), i + 1), lit(" "), element_at(col("w"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val perBigram = base
      .select(col("doc_id"), explode(bigrams).as("bigram"))
      .groupBy("doc_id", "bigram")
      .agg(count(lit(1)).as("cnt"))
    val bigramStats = perBigram
      .groupBy("doc_id")
      .agg(
        sum("cnt").cast("long").as("n_bigrams"),
        max("cnt").cast("long").as("top_bigram_n"),
        coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).cast("long")
          .as("dup_bigram_occ"))
    tokenStats
      .join(bigramStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("distinct_tokens"),
        ((col("n_tokens") - col("distinct_tokens")).cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        col("n_bigrams"),
        col("top_bigram_n"),
        (col("top_bigram_n").cast("double") / col("n_bigrams")).as("top_bigram_frac"),
        (col("dup_bigram_occ").cast("double") / col("n_bigrams")).as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Document chunking into overlapping token windows — the step that
    * turns variable-length documents into trainable context-window
    * pieces (chunk k covers tokens [k·stride+1, k·stride+chunkTokens],
    * stride = chunkTokens − overlap, until the document is consumed).
    * Pure NARROW per-row list algebra: one sequence explode + slice/join
    * per chunk, no shuffle anywhere — the shape that matters when the
    * corpus is 100 TB and chunking must not cost a repartition.
    */
  def chunkDocuments(
      documents: DataFrame, chunkTokens: Int = 50, overlap: Int = 10): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    documents.select(col("doc_id"), toks(col("text")).as("w"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"CAST((size(w) - 1) DIV $stride AS BIGINT)"))))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        expr(s"CAST(LEAST($chunkTokens, size(w) - chunk_idx * $stride) AS BIGINT)")
          .as("n_chunk_tokens"),
        array_join(
          slice(col("w"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Sequence-packing accounting — the concat-and-cut packing step that
    * turns a tokenized corpus into fixed-length training sequences
    * (documents concatenated in doc_id order, a cut every `seqLen`
    * tokens): per document, which sequences it lands in and whether a
    * context-window boundary splits it. `n_seqs > 1` is the
    * document-fragmentation signal a pipeline tunes seqLen / shuffling
    * against (a split document bleeds context across training examples);
    * `sum(n_toks)/ (max(last_seq)+1)·seqLen` is the packing efficiency.
    * The global token offsets come from [[graft.rel.Scale.prefixSumShards]]'s
    * two-pass distributed prefix sum — no single-partition window
    * anywhere, so the accounting itself runs at corpus scale.
    */
  def packedSequences(documents: DataFrame, seqLen: Int = 128): DataFrame = {
    val counts = documents.select(
      col("doc_id"), size(toks(col("text"))).cast("long").as("n_toks"))
    graft.rel.Scale.prefixSumShards(counts, "doc_id", "n_toks", budget = seqLen.toLong)
      .select(
        col("doc_id"), col("n_toks"),
        (col("cum_tokens") - col("n_toks")).as("start_tok"),
        col("shard_id").cast("int").as("first_seq"),
        expr(s"CAST((cum_tokens - 1) DIV $seqLen AS INT)").as("last_seq"))
      .withColumn("n_seqs", (col("last_seq") - col("first_seq") + 1).cast("long"))
      .withColumn("crosses_boundary", col("last_seq") > col("first_seq"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[packedSequences]]. */
  def packedSequencesSql(seqLen: Int = 128): String =
    raw"""WITH t AS (SELECT doc_id,
       |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_toks
       |  FROM documents),
       |c AS (SELECT doc_id, n_toks,
       |  CAST(SUM(n_toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM t)
       |SELECT doc_id, n_toks, CAST(cum - n_toks AS BIGINT) AS start_tok,
       |  CAST((cum - n_toks) // $seqLen AS INTEGER) AS first_seq,
       |  CAST((cum - 1) // $seqLen AS INTEGER) AS last_seq,
       |  CAST((cum - 1) // $seqLen - (cum - n_toks) // $seqLen + 1 AS BIGINT) AS n_seqs,
       |  ((cum - 1) // $seqLen) > ((cum - n_toks) // $seqLen) AS crosses_boundary
       |FROM c ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[chunkDocuments]]. */
  def chunkDocumentsSql(chunkTokens: Int = 50, overlap: Int = 10): String = {
    val stride = chunkTokens - overlap
    raw"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
       |ch AS (SELECT doc_id, w,
       |  unnest(generate_series(0, (len(w) - 1) // $stride)) AS chunk_idx FROM tk)
       |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       |  CAST(LEAST($chunkTokens, len(w) - chunk_idx * $stride) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(
       |    list_slice(w, chunk_idx * $stride + 1,
       |               LEAST(chunk_idx * $stride + $chunkTokens, len(w))), ' ') AS chunk_text
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Domain-mixture statistics — the per-source token accounting a
    * corpus mixer needs: document/token counts per source, each source's
    * share of the total token budget, and the resampling weight that
    * would equalize the mixture (weight > 1 ⇒ upsample). One map-side-
    * combinable aggregation keyed by source plus a broadcast 1-row total
    * — the per-source frame is domains-sized (tiny), so the share/weight
    * arithmetic never shuffles the corpus again.
    */
  def domainMixture(documents: DataFrame): DataFrame = {
    val per = documents
      .select(col("source"), size(toks(col("text"))).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
    val tot = per.agg(
      sum("n_tokens").as("total_tokens"), count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens")).as("token_share"),
        ((col("total_tokens").cast("double") / col("n_sources")) / col("n_tokens"))
          .as("resample_weight"))
      .orderBy("source")
  }

  /** DuckDB twin of [[domainMixture]]. */
  val domainMixtureSql: String =
    raw"""WITH per AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, COUNT(*) AS n_sources FROM per)
       |SELECT source, n_docs, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
       |  (CAST(total_tokens AS DOUBLE) / n_sources) / n_tokens AS resample_weight
       |FROM per, tot ORDER BY source""".stripMargin

  /** Temperature-scaled mixture weights — the standard multi-domain
    * sampling rule for LM training corpora (sample source i with
    * probability q_i ∝ p_i^α, where p_i is its natural token share):
    * α = 1 keeps the natural mix, α → 0 approaches uniform, and the
    * usual α ≈ 0.3 boosts low-resource sources without letting them
    * dominate. Emits p_i, q_i, and the up/down-sampling factor
    * q_i/p_i a resampler would apply. Same execution shape as
    * [[domainMixture]]: one map-side-combinable aggregation keyed by
    * source + a broadcast 1-row total; the power/normalization
    * arithmetic runs on the domains-sized frame, never re-shuffling the
    * corpus. Outputs round to 9 dp so both engines' `pow` land on the
    * same double (the [[graft.ml.HashSplit.weightedSample]] convention).
    */
  def temperatureMixture(documents: DataFrame, alpha: Double = 0.3): DataFrame = {
    // ONE corpus aggregation; the totals and the normalizer come from
    // whole-frame windows over the domains-sized result (sources are
    // bounded by construction, so the single window partition is tiny) —
    // the naive agg-crossJoin-agg-crossJoin chain re-executed the corpus
    // aggregation once per normalization level (8 Exchanges vs 3). The
    // ordered unbounded frame pins the double-sum order for z, so the
    // normalizer is layout-deterministic; the oracle sums in the same
    // source order.
    val wAll = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val p = col("n_tokens").cast("double") / col("total_tokens")
    documents
      .select(col("source"), size(toks(col("text"))).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(sum("n_toks").as("n_tokens"))
      .withColumn("total_tokens", sum("n_tokens").over(wAll))
      .select(col("source"), col("n_tokens"), p.as("p"), pow(p, alpha).as("pa"))
      .withColumn("z", sum("pa").over(wAll))
      .select(
        col("source"), col("n_tokens"),
        round(col("p"), 9).as("token_share"),
        round(col("pa") / col("z"), 9).as("sample_prob"),
        // A source whose documents all tokenize empty has p = 0, and
        // 0^α/z/0 is 0/0 = NaN — whose round() handling diverges between
        // Spark and DuckDB. Such a source gets a NULL factor (a resampler
        // has nothing to draw from it anyway); the SQL twin mirrors the
        // same CASE guard.
        when(col("p") > 0d, round(col("pa") / col("z") / col("p"), 9))
          .as("resample_factor"))
      .orderBy("source")
  }

  /** DuckDB twin of [[temperatureMixture]] (same ordered window sums). */
  def temperatureMixtureSql(alpha: Double = 0.3): String =
    raw"""WITH per AS (
       |  SELECT source,
       |    CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |t AS (SELECT source, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND UNBOUNDED FOLLOWING) AS total_tokens
       |  FROM per),
       |sc AS (SELECT source, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / total_tokens AS p,
       |    pow(CAST(n_tokens AS DOUBLE) / total_tokens, $alpha) AS pa
       |  FROM t),
       |z AS (SELECT *,
       |    SUM(pa) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND UNBOUNDED FOLLOWING) AS z
       |  FROM sc)
       |SELECT source, n_tokens, round(p, 9) AS token_share,
       |  round(pa / z, 9) AS sample_prob,
       |  CASE WHEN p > 0 THEN round(pa / z / p, 9) END AS resample_factor
       |FROM z ORDER BY source""".stripMargin

  /** Per-source unigram KL divergence against the whole-corpus unigram
    * distribution, plus each source's own unigram entropy — the
    * domain-shift diagnostic a mixture designer reads next to
    * [[domainMixture]]'s token shares: KL(source ‖ corpus) near 0 means
    * the source is distributionally redundant with the mix, while a
    * high-KL source contributes vocabulary mass nothing else covers (and
    * a low-entropy source is internally repetitive regardless of KL).
    * Every source word occurs in the corpus by construction, so the KL
    * needs no smoothing.
    *
    * Scale shape: two map-side-combinable count aggregations (per
    * (source, word), then per word), both vocab-bounded; the term
    * arithmetic runs over the |sources|×|vocab| frame joined to the
    * vocab-sized corpus counts and a broadcast 1-row total — the
    * (source, word) frame is persisted so the token explode+shuffle
    * runs ONCE and the three downstream legs (source totals, corpus
    * counts, grand total) re-aggregate the small cached frame instead
    * of re-scanning the corpus. Cross-engine
    * exactness follows the [[bigramLmScore]] detSum recipe: identical
    * IEEE divisions and libm logs per (source, word) row, rounded to
    * 6 dp, then decimal-summed (associative) per source.
    */
  def sourceKlDivergence(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("source"), explode(toks(col("text"))).as("tok"))
    val bySrc = tok.groupBy("source", "tok").agg(count(lit(1)).as("cs")).persist()
    val srcTot = bySrc.groupBy("source").agg(sum("cs").as("ns"))
    val corpus = bySrc.groupBy("tok").agg(sum("cs").as("c"))
    val tot = corpus.agg(sum("c").as("n"))
    val ps = col("cs").cast("double") / col("ns")
    val pc = col("c").cast("double") / col("n")
    bySrc
      .join(broadcast(corpus), Seq("tok"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("kl_term", round(ps * log(ps / pc), 6))
      .withColumn("ent_term", round(-(ps * log(ps)), 6))
      .groupBy("source")
      .agg(
        max("ns").as("n_tokens"),
        count(lit(1)).as("vocab_used"),
        sum(col("kl_term").cast("decimal(28,6)")).cast("double").as("kl_divergence"),
        sum(col("ent_term").cast("decimal(28,6)")).cast("double").as("entropy"))
      .orderBy("source")
  }

  /** DuckDB twin of [[sourceKlDivergence]]. */
  val sourceKlDivergenceSql: String =
    raw"""WITH tk AS (SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
       |            FROM documents),
       |bysrc AS (SELECT source, tok, COUNT(*) AS cs FROM tk GROUP BY 1, 2),
       |srctot AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM bysrc GROUP BY 1),
       |corpus AS (SELECT tok, CAST(SUM(cs) AS BIGINT) AS c FROM bysrc GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM corpus),
       |terms AS (
       |  SELECT b.source, s.ns,
       |    ROUND((CAST(b.cs AS DOUBLE) / s.ns)
       |      * ln((CAST(b.cs AS DOUBLE) / s.ns) / (CAST(co.c AS DOUBLE) / t.n)), 6) AS kl_term,
       |    ROUND(-((CAST(b.cs AS DOUBLE) / s.ns) * ln(CAST(b.cs AS DOUBLE) / s.ns)), 6) AS ent_term
       |  FROM bysrc b JOIN corpus co USING (tok) JOIN srctot s USING (source) CROSS JOIN tot t)
       |SELECT source, MAX(ns) AS n_tokens, COUNT(*) AS vocab_used,
       |  CAST(SUM(CAST(kl_term AS DECIMAL(28,6))) AS DOUBLE) AS kl_divergence,
       |  CAST(SUM(CAST(ent_term AS DECIMAL(28,6))) AS DOUBLE) AS entropy
       |FROM terms GROUP BY 1 ORDER BY source""".stripMargin

  /** Per-source n-gram diversity for n = 1, 2, 3: distinct / total
    * n-grams, the type-token-ratio family a corpus mixer tracks next to
    * [[domainMixture]] ([[repetitionStats]] is the per-document view;
    * this is the per-source rollup — a source whose trigram diversity
    * collapses is template/boilerplate mass). One exploded pass tags
    * every n-gram instance with its n (the per-n position range is
    * clamped via `slice`, so a doc shorter than n emits nothing instead
    * of a descending `sequence`), then two map-side-combinable count
    * layers — (source, n, gram) then (source, n) — collapse the wide
    * instance stream before anything joins. Output is |sources|×3 rows.
    */
  def ngramDiversity(documents: DataFrame): DataFrame = {
    val base = documents.select(col("source"), toks(col("text")).as("w"))
    val inst = base.select(col("source"), explode(expr(
      """flatten(transform(array(1, 2, 3), n ->
        |  transform(slice(sequence(1, size(w)), 1, greatest(size(w) - n + 1, 0)),
        |    i -> struct(n AS n, concat_ws(' ', slice(w, i, n)) AS g))))""".stripMargin))
      .as("x"))
      .select(col("source"), col("x.n").as("n"), col("x.g").as("g"))
    inst.groupBy("source", "n", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("source", "n")
      .agg(
        sum("cnt").as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("diversity",
        col("distinct_ngrams").cast("double") / col("total_ngrams"))
      .orderBy("source", "n")
  }

  /** DuckDB twin of [[ngramDiversity]]. */
  val ngramDiversitySql: String =
    raw"""WITH tk AS (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS w
       |            FROM documents),
       |ns AS (SELECT unnest([1, 2, 3]) AS n),
       |inst AS (
       |  SELECT source, n, array_to_string(list_slice(w, i, i + n - 1), ' ') AS g
       |  FROM (SELECT source, n, w, unnest(generate_series(1, len(w) - n + 1)) AS i
       |        FROM tk CROSS JOIN ns)),
       |cnt AS (SELECT source, n, g, COUNT(*) AS cnt FROM inst GROUP BY 1, 2, 3)
       |SELECT source, n, CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
       |  COUNT(*) AS distinct_ngrams,
       |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS diversity
       |FROM cnt GROUP BY 1, 2 ORDER BY source, n""".stripMargin

  /** Stopword list for the rule-based curation flags: the closed-class
    * words the synthetic corpus actually contains plus the usual
    * suspects, mirroring the "must contain ≥2 stop words" rule from
    * Rae et al. 2021 (Gopher §A1.1) / Raffel et al. 2020 (C4).
    */
  private val RuleStopwords = Seq("the", "a", "of", "to", "and", "in")

  /** Gopher/C4-style per-document quality rule flags — the explicit
    * rule-by-rule breakdown a curation pipeline reports next to the
    * blended [[qualityScore]]: each rule is an independent boolean so
    * a corpus owner can see WHICH gate a document failed, not just
    * that it scored low. Rules (adapted to this corpus; thresholds are
    * parameters with the canonical defaults scaladoc'd per rule):
    *  - word count within [minWords, maxWords] (Gopher: [50, 100k];
    *    the synthetic docs run 10–99 words, so the registered query
    *    uses 30 to exercise both outcomes)
    *  - mean word length within [3, 10] characters (Gopher)
    *  - at least 2 distinct stop words present (Gopher "stop word"
    *    rule; list in [[RuleStopwords]])
    *  - ≥ 80% of words contain an alphabetic character (Gopher)
    * `n_failed` counts failing rules; `keep` is the AND of all four.
    *
    * Scale shape: one narrow projection — every metric folds over the
    * in-row token array (no explode, no shuffle); the only Exchange is
    * the output sort. Mean word length is an integer char-sum divided
    * by an integer count once, so both engines do the same single IEEE
    * division.
    */
  def qualityRuleFlags(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 100000): DataFrame = {
    val w = toks(col("text"))
    val base = documents.select(
      col("doc_id"), col("source"),
      size(w).cast("long").as("n_words"),
      (aggregate(transform(w, t => length(t)), lit(0L), (a, x) => a + x)
        .cast("double") / size(w)).as("mean_word_len"),
      size(array_intersect(array_distinct(w), array(RuleStopwords.map(lit): _*)))
        .cast("long").as("n_stopwords"),
      (size(filter(w, t => t.rlike("[a-z]"))).cast("double") / size(w))
        .as("alpha_ratio"))
    val flagged = base
      .withColumn("word_count_ok",
        col("n_words").between(minWords.toLong, maxWords.toLong))
      .withColumn("mean_len_ok", col("mean_word_len").between(3.0, 10.0))
      .withColumn("stopwords_ok", col("n_stopwords") >= 2L)
      .withColumn("alpha_ok", col("alpha_ratio") >= 0.8)
    flagged
      .withColumn("n_failed", lit(4) -
        (col("word_count_ok").cast("int") + col("mean_len_ok").cast("int") +
          col("stopwords_ok").cast("int") + col("alpha_ok").cast("int")))
      .withColumn("keep", col("n_failed") === 0)
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[qualityRuleFlags]]. */
  def qualityRuleFlagsSql(minWords: Int = 30, maxWords: Int = 100000): String = {
    val stops = RuleStopwords.map(s => s"'$s'").mkString(", ")
    raw"""WITH s AS (SELECT doc_id, source,
       |              string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
       |m AS (SELECT doc_id, source,
       |  CAST(len(w) AS BIGINT) AS n_words,
       |  CAST(CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS DOUBLE) / len(w) AS mean_word_len,
       |  CAST(len(list_intersect(list_distinct(w), [$stops])) AS BIGINT) AS n_stopwords,
       |  CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) AS alpha_ratio
       |FROM s),
       |f AS (SELECT *,
       |  n_words BETWEEN $minWords AND $maxWords AS word_count_ok,
       |  mean_word_len BETWEEN 3.0 AND 10.0 AS mean_len_ok,
       |  n_stopwords >= 2 AS stopwords_ok,
       |  alpha_ratio >= 0.8 AS alpha_ok
       |FROM m)
       |SELECT *,
       |  4 - (CAST(word_count_ok AS INT) + CAST(mean_len_ok AS INT)
       |     + CAST(stopwords_ok AS INT) + CAST(alpha_ok AS INT)) AS n_failed,
       |  (4 - (CAST(word_count_ok AS INT) + CAST(mean_len_ok AS INT)
       |      + CAST(stopwords_ok AS INT) + CAST(alpha_ok AS INT))) = 0 AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Per-source rollup of [[qualityRuleFlags]]: how many documents
    * each rule rejects, per source — the report a corpus owner reads
    * to decide which source needs which filter retuned. One hash
    * aggregation over the narrow flags frame; output is |sources| rows.
    */
  def qualityRuleReport(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 100000): DataFrame =
    qualityRuleFlags(documents, minWords, maxWords)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum((!col("word_count_ok")).cast("long")).as("n_word_count_fail"),
        sum((!col("mean_len_ok")).cast("long")).as("n_mean_len_fail"),
        sum((!col("stopwords_ok")).cast("long")).as("n_stopword_fail"),
        sum((!col("alpha_ok")).cast("long")).as("n_alpha_fail"),
        sum(col("keep").cast("long")).as("n_kept"))
      .orderBy("source")

  /** DuckDB twin of [[qualityRuleReport]]. */
  def qualityRuleReportSql(minWords: Int = 30, maxWords: Int = 100000): String =
    raw"""WITH s AS (SELECT doc_id, source,
       |              string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
       |m AS (SELECT doc_id, source,
       |  CAST(len(w) AS BIGINT) AS n_words,
       |  CAST(CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS DOUBLE) / len(w) AS mean_word_len,
       |  CAST(len(list_intersect(list_distinct(w), [${RuleStopwords.map(s => s"'$s'").mkString(", ")}])) AS BIGINT) AS n_stopwords,
       |  CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) AS alpha_ratio
       |FROM s),
       |f AS (SELECT *,
       |  n_words BETWEEN $minWords AND $maxWords AS word_count_ok,
       |  mean_word_len BETWEEN 3.0 AND 10.0 AS mean_len_ok,
       |  n_stopwords >= 2 AS stopwords_ok,
       |  alpha_ratio >= 0.8 AS alpha_ok
       |FROM m)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CAST(NOT word_count_ok AS INT)) AS BIGINT) AS n_word_count_fail,
       |  CAST(SUM(CAST(NOT mean_len_ok AS INT)) AS BIGINT) AS n_mean_len_fail,
       |  CAST(SUM(CAST(NOT stopwords_ok AS INT)) AS BIGINT) AS n_stopword_fail,
       |  CAST(SUM(CAST(NOT alpha_ok AS INT)) AS BIGINT) AS n_alpha_fail,
       |  CAST(SUM(CAST((word_count_ok AND mean_len_ok AND stopwords_ok AND alpha_ok) AS INT)) AS BIGINT) AS n_kept
       |FROM f GROUP BY 1 ORDER BY source""".stripMargin

  /** DuckDB twin of [[repetitionStats]]. */
  val repetitionStatsSql: String =
    raw"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i + 1])) AS bigram
       |  FROM tk),
       |bc AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
       |bs AS (SELECT doc_id,
       |  CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       |  CAST(MAX(cnt) AS BIGINT) AS top_bigram_n,
       |  CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup_bigram_occ
       |  FROM bc GROUP BY 1)
       |SELECT t.doc_id,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(w)) AS BIGINT) AS distinct_tokens,
       |  CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_token_frac,
       |  bs.n_bigrams, bs.top_bigram_n,
       |  CAST(bs.top_bigram_n AS DOUBLE) / bs.n_bigrams AS top_bigram_frac,
       |  CAST(bs.dup_bigram_occ AS DOUBLE) / bs.n_bigrams AS dup_bigram_frac
       |FROM tk t LEFT JOIN bs USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Pattern redaction — the scrub-before-training pass (PII masking,
    * number normalization). Pure narrow regexp column algebra; the
    * pattern here masks digit runs (the only sensitive-shaped content in
    * the synthetic feed — swap the regex for email/phone/SSN patterns on
    * a real corpus; the mechanics are identical). Returns the redacted
    * text plus the per-row match count that an audit/DQ report needs.
    */
  def redactDigits(df: DataFrame, column: String): DataFrame =
    df.select(
      col("event_id"),
      col(column).as("original"),
      regexp_replace(col(column), "[0-9]+", "#").as("redacted"),
      regexp_count(col(column), lit("[0-9]+")).cast("long").as("n_redacted"))
      .orderBy("event_id")

  def redactDigitsSql(column: String): String =
    s"""SELECT event_id, $column AS original,
       |  regexp_replace($column, '[0-9]+', '#', 'g') AS redacted,
       |  CAST(len(regexp_extract_all($column, '[0-9]+')) AS BIGINT) AS n_redacted
       |FROM events ORDER BY event_id""".stripMargin

  /** Mechanical text normalization — the C4-style cleanup every web
    * corpus passes through before any scoring or dedup (so that "same
    * text, different mojibake" hashes identically downstream):
    * typographic quotes/dashes → ASCII, control + zero-width characters
    * and NBSP → space, whitespace runs collapsed, edges trimmed. Pure
    * narrow per-row regexp chains (codegen'd `regexp_replace`, zero
    * shuffle); patterns are literal character classes that mean the same
    * thing in Java regex and RE2, so the DuckDB twin is exact.
    */
  def normalizeText(documents: DataFrame): DataFrame = {
    val quotes = regexp_replace(
      regexp_replace(col("text"), "[\u2018\u2019]", "'"), "[\u201C\u201D]", "\"")
    val dashes = regexp_replace(quotes, "[\u2013\u2014]", "-")
    val ctrl = regexp_replace(
      dashes,
      "[\\x00-\\x1F\\x7F\u00A0\u200B-\u200D\uFEFF]", " ")
    val collapsed = trim(regexp_replace(ctrl, " +", " "))
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_raw"),
      collapsed.as("clean_text"),
      length(collapsed).cast("long").as("n_chars_clean"),
      (collapsed =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  val normalizeTextSql: String =
    raw"""WITH n AS (
       |  SELECT doc_id, text,
       |    trim(regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(text, '[\x{2018}\x{2019}]', '''', 'g'),
       |          '[\x{201C}\x{201D}]', '"', 'g'),
       |        '[\x{2013}\x{2014}]', '-', 'g'),
       |      '[\x00-\x1F\x7F\x{00A0}\x{200B}-\x{200D}\x{FEFF}]', ' ', 'g'),
       |    ' +', ' ', 'g')) AS clean_text
       |  FROM documents)
       |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw, clean_text,
       |  CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
       |  clean_text <> text AS changed
       |FROM n ORDER BY doc_id""".stripMargin


  // ---- 32-bit SimHash ----
  // Per token: h = md5(token); bit b comes from hex digit j = b / 4 of h
  // (value via an explicit 16-branch CASE — no engine-specific hex
  // parsing), bit index (3 - b % 4) within the digit. Per doc, per bit:
  // sum of ±1 over tokens; signature bit = (sum > 0).


  /** Value of a lowercase hex digit via ascii arithmetic (identical in
    * Spark and DuckDB; one branch instead of a 16-way CASE — measurably
    * faster when evaluated 8× per token row).
    */
  def hexVal(ch: Column): Column =
    when(ascii(ch) >= 97, ascii(ch) - 87).otherwise(ascii(ch) - 48)

  def hexValSql(ch: String): String =
    s"(CASE WHEN ascii($ch) >= 97 THEN ascii($ch) - 87 ELSE ascii($ch) - 48 END)"

  /** doc_id → 32-bit SimHash as BIGINT. */
  /** The 32-bit signature votes on md5 hex digits 0-7 — exactly the low
    * half of the 64-bit signature's bit numbering — so it reads straight
    * off the native fused expression: one narrow per-row call, no
    * explode, no shuffle (equality with the historical composed form is
    * covered transitively by the simhash64 equivalence spec plus the
    * unchanged DuckDB oracle).
    */
  def simhash(documents: DataFrame): DataFrame = {
    val sh = graft.functions.SimHash64Expr.simhash64(col("text"))
    documents
      .select(col("doc_id"), element_at(sh, 2).as("simhash32"))
      .orderBy("doc_id")
  }

  /** doc_id → 64-bit SimHash as two unsigned 32-bit halves (`sim_hi` =
    * bits 32..63, `sim_lo` = bits 0..31, both BIGINT in [0, 2³²)). Split
    * halves instead of one 64-bit value because bit 63 would make the
    * signature negative / overflow-prone, and signed-overflow behavior is
    * engine-specific; two positive halves compare and XOR identically in
    * Spark and DuckDB. 16-bit banding over the halves gives 65,536
    * buckets per band — the 100 TB candidate-generation path (the 8-bit
    * bands of the 32-bit variant cap at 256 buckets, which goes quadratic
    * per bucket as the corpus grows).
    */
  /** 64-bit SimHash per document via the native fused expression
    * (graft.functions.SimHash64Expr): tokenize → md5 → bit-vote →
    * signature in ONE narrow per-row call — no explode, no 64-column
    * aggregation, no shuffle. The signature stage of near-dup detection
    * is a pure map at any scale; bit-identical to the composed
    * explode/aggregate form (equivalence spec-asserted) and to the
    * DuckDB oracle twin.
    */
  def simhash64(documents: DataFrame): DataFrame = {
    val sh = graft.functions.SimHash64Expr.simhash64(col("text"))
    documents.select(col("doc_id"),
      element_at(sh, 1).as("sim_hi"),
      element_at(sh, 2).as("sim_lo"))
  }

  /** The composed built-in form simhash64 replaced (explode → hex-digit
    * columns → 64 bit-vote SUMs → sign). Kept as the reference
    * implementation for the equivalence spec — the custom expression
    * must never drift from what these built-ins compute.
    */
  private[graft] def simhash64Composed(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .withColumn("h", md5(col("t")))
    val withDigits = (0 until 16).foldLeft(tok) { (df, j) =>
      df.withColumn(s"d$j", hexVal(substring(col("h"), j + 1, 1)))
    }
    val sums = (0 until 64).map { b =>
      val d = col(s"d${b / 4}")
      val bit = (d / lit(1 << (3 - b % 4))).cast("int") % 2
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v$b")
    }
    def half(bits: Range, off: Int) = bits
      .map(b => when(col(s"v$b") > 0, lit(1L << (b - off))).otherwise(lit(0L)))
      .reduceLeft(_ + _)
    withDigits
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        half(32 until 64, 32).cast("long").as("sim_hi"),
        half(0 until 32, 0).cast("long").as("sim_lo"))
  }

  /** CTE chain ending in `simsel64(doc_id, sim_hi, sim_lo)` — the DuckDB
    * twin of [[simhash64]], composable into larger oracle queries.
    */
  val simhash64CteBody: String = {
    val digits = (0 until 16)
      .map(j => s"${hexValSql(s"substr(h, ${j + 1}, 1)")} AS d$j").mkString(",\n  ")
    val sums = (0 until 64).map { b =>
      s"SUM(CASE WHEN (d${b / 4} // ${1 << (3 - b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n  ")
    def half(bits: Range, off: Int) = bits
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(${1L << (b - off)} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    raw"""tok64 AS (
       |  SELECT doc_id, md5(unnest(string_split_regex(trim(lower(text)), '\s+'))) AS h
       |  FROM documents),
       |dig64 AS (SELECT doc_id,
       |  $digits
       |FROM tok64),
       |v64 AS (SELECT doc_id,
       |  $sums
       |FROM dig64 GROUP BY doc_id),
       |simsel64 AS (SELECT doc_id,
       |  CAST(${half(32 until 64, 32)} AS BIGINT) AS sim_hi,
       |  CAST(${half(0 until 32, 0)} AS BIGINT) AS sim_lo
       |FROM v64)""".stripMargin
  }

  /** CTE chain ending in `simsel(doc_id, simhash32)` — composable into
    * larger oracle queries (see graft.dedup.Dedup.simhashPairsSql).
    */
  val simhashCteBody: String = {
    val digits = (0 until 8)
      .map(j => s"${hexValSql(s"substr(h, ${j + 1}, 1)")} AS d$j").mkString(",\n  ")
    val sums = (0 until 32).map { b =>
      s"SUM(CASE WHEN (d${b / 4} // ${1 << (3 - b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n  ")
    val sig = (0 until 32)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    raw"""tok AS (
       |  SELECT doc_id, md5(unnest(string_split_regex(trim(lower(text)), '\s+'))) AS h
       |  FROM documents),
       |dig AS (SELECT doc_id,
       |  $digits
       |FROM tok),
       |v AS (SELECT doc_id,
       |  $sums
       |FROM dig GROUP BY doc_id),
       |simsel AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash32 FROM v)""".stripMargin
  }

  val simhashSql: String =
    s"WITH $simhashCteBody SELECT doc_id, simhash32 FROM simsel ORDER BY doc_id"

  /** Zipf / vocabulary-coverage curve: the top-k corpus vocabulary with
    * each token's count and the cumulative share of ALL token
    * occurrences covered by the vocabulary up to that rank — the "how
    * big must the tokenizer vocab be" curve.
    *
    * Scale shape: one explode + one map-side-combinable hash aggregation
    * (output is vocabulary-sized, sublinear in corpus), a bounded
    * TakeOrdered top-k (never a global sort of the vocabulary), and the
    * corpus token total as a broadcast 1-row aggregate. The ranking
    * window then runs over the k retained rows only — its single
    * partition is bounded by construction (k), not by data.
    */
  def vocabCoverage(documents: DataFrame, topK: Int = 200): DataFrame = {
    val counts = documents
      .select(explode(toks(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("token")).limit(topK)
    val w = Window.orderBy(col("n").desc, col("token"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_tokens", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("token"), col("n"),
        col("cum_tokens"),
        (col("cum_tokens").cast("double") / col("total")).as("cum_share"))
      .orderBy("rank")
  }

  /** BPE merge-pair counting — the argmax step of byte-pair-encoding
    * tokenizer training: adjacent character-pair frequencies over the
    * corpus, weighted by word frequency. The heavy reduction happens
    * FIRST (corpus → word-frequency table, vocabulary-sized and
    * sublinear in corpus); the char-pair explosion then runs over
    * distinct words only, so a 100 TB corpus pays one word-count
    * aggregation plus work proportional to |vocab| × word length. The
    * winning pair is what a BPE trainer would merge next; the top-k
    * table is the trainer's working set.
    */
  def bpeMergePairs(documents: DataFrame, topK: Int = 50): DataFrame = {
    val words = documents
      .select(explode(toks(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
    words
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(word) - 1), " +
          "i -> concat(substr(word, i, 1), substr(word, i + 1, 1)))")).as("pair"))
      .groupBy("pair")
      .agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topK)
  }

  def bpeMergePairsSql(topK: Int = 50): String =
    raw"""WITH w AS (
       |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
       |  FROM documents),
       |wc AS (SELECT word, COUNT(*) AS n FROM w GROUP BY 1 HAVING len(word) >= 2),
       |p AS (SELECT n, unnest(list_transform(generate_series(1, len(word) - 1),
       |        i -> substr(word, i, 1) || substr(word, i + 1, 1))) AS pair
       |      FROM wc)
       |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
       |FROM p GROUP BY 1
       |ORDER BY n_occurrences DESC, pair LIMIT $topK""".stripMargin

  /** Full BPE training — the iterative loop on top of the
    * [[bpeMergePairs]] argmax: repeatedly merge the most frequent
    * adjacent symbol pair and re-count. The corpus-scale work is the ONE
    * distributed word-count aggregation; the merge loop then runs on the
    * driver over the vocabulary-sized working set (exactly how real BPE
    * trainers work — the corpus is only ever touched once, the
    * iterations touch the vocab table). Ties break lexicographically;
    * output is the ordered merge table a tokenizer ships.
    *
    * Scale shape: the driver working set is the DISTINCT-WORD table, and
    * on 100 TB of noisy web text that table can reach billions of rows —
    * so the collect is bounded BEFORE it leaves the cluster, the same
    * two knobs real BPE trainers (GPT-2, SentencePiece) expose:
    * `minCount` drops hapax/noise words below a frequency floor, and
    * `maxVocab` caps the working set to the top-K words by
    * (frequency desc, word asc) — a deterministic distributed top-K, not
    * a full sort. Both default to "off" (floor 1, no cap), under which
    * the merge table is the uncapped corpus optimum; the spec pins how
    * the floor changes merges (dropped words stop voting) and that a
    * generous cap is a no-op. Oracle-exact: DuckDB replays the trainer
    * merge-for-merge via [[bpeTrainSql]]'s unrolled per-step CTEs.
    */
  def bpeTrain(documents: DataFrame, numMerges: Int = 20,
      minCount: Long = 1L, maxVocab: Int = Int.MaxValue): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val counted = documents
      .select(explode(toks(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
      .filter(col("n") >= minCount)
    val capped = // distributed TopK (orderBy+limit), never a driver-side sort
      if (maxVocab == Int.MaxValue) counted
      else counted.orderBy(col("n").desc, col("word")).limit(maxVocab)
    val vocab0: Array[(Array[String], Long)] = capped
      .orderBy("word") // deterministic driver-side iteration order
      .as[(String, Long)].collect()
      .map { case (w, n) => (w.split("").filter(_.nonEmpty), n) }
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    while (step <= numMerges) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + n
      }
      if (counts.isEmpty) step = numMerges + 1
      else {
        val ((l, r), c) = counts.toSeq
          .maxBy { case ((l, r), c) => (c, l, r) } (
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse))
        merges += ((step, l, r, c))
        vocab = vocab.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
        step += 1
      }
    }
    merges.toSeq.toDF("step", "left", "right", "pair_count")
  }

  /** DuckDB replay of [[bpeTrain]], merge-for-merge — what promotes the
    * trainer from rows-only to oracle-exact. Aggregation over a
    * recursive CTE's working table is off-limits in SQL, but the loop is
    * BOUNDED (`numMerges`), so it unrolls into `numMerges` chained CTE
    * triples: p_k counts adjacent symbol pairs weighted by word
    * frequency, b_k takes the argmax with the trainer's exact tie-break
    * (count desc, left asc, right asc), and v_k applies the merge. Each
    * word's symbol state is a delimited string `|s1||s2||…|` — symbols
    * never contain `|` (whitespace-tokenized words) — so "merge all
    * non-overlapping occurrences left-to-right" is ONE `replace()` of
    * `|l||r|` with `|lr|`: the doubled delimiter is load-bearing, since
    * the replacement's trailing `|` is exactly the leading `|` the next
    * adjacent occurrence needs (`|a||a||a||a|` → `|aa||aa|`, matching
    * the trainer's skip-after-merge scan), while single delimiters would
    * either miss back-to-back occurrences or match across symbol
    * boundaries. `MATERIALIZED` is required: v_{k-1} is referenced twice
    * per step, and inlined CTEs would re-expand the whole chain
    * exponentially. `minCount`/`maxVocab` mirror the trainer's
    * driver-collect bound.
    */
  def bpeTrainSql(numMerges: Int = 20,
      minCount: Long = 1L, maxVocab: Int = Int.MaxValue): String = {
    val cap = if (maxVocab == Int.MaxValue) "" else s" ORDER BY n DESC, word LIMIT $maxVocab"
    val v0 =
      raw"""v0 AS MATERIALIZED (
         |  SELECT '|' || array_to_string(list_transform(generate_series(1, len(word)), i -> word[i]), '||') || '|' AS s, n
         |  FROM (
         |    SELECT word, COUNT(*) AS n FROM (
         |      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word FROM documents)
         |    GROUP BY 1 HAVING len(word) >= 2 AND COUNT(*) >= $minCount$cap))""".stripMargin
    val steps = (1 to numMerges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, SUM(n) AS c
         |  FROM (SELECT string_split(trim(s, '|'), '||') AS syms, n FROM v${k - 1}),
         |       unnest(generate_series(1, len(syms) - 1)) AS u(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT $k AS step, l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT replace(s, '|' || b.l || '||' || b.r || '|', '|' || b.l || b.r || '|') AS s, n
         |  FROM v${k - 1}, b$k b)""".stripMargin
    }
    val union = (1 to numMerges)
      .map(k => s"""SELECT step, l AS "left", r AS "right", CAST(c AS BIGINT) AS pair_count FROM b$k""")
      .mkString("\nUNION ALL\n")
    s"WITH $v0,\n${steps.mkString(",\n")}\nSELECT * FROM (\n$union\n) ORDER BY step"
  }

  /** BPE ENCODE — the apply side of [[bpeTrain]]: tokenize the corpus
    * with the trained merge table and report per-document token
    * accounting under the trained tokenizer (words, characters, BPE
    * tokens — the number that actually prices a document against a
    * training token budget). Standard greedy apply: repeatedly merge
    * the pair with the LOWEST merge rank present in the word, all
    * occurrences left-to-right — which replays training exactly, so a
    * word seen in training encodes to its trained representation.
    *
    * Scale shape: the merge table is vocabulary-sized and broadcast;
    * encoding runs once per DISTINCT word (the same corpus→vocab
    * reduction [[bpeTrain]] leans on — work ∝ |vocab| × word length,
    * not corpus size), then instances join back by word and fold per
    * doc. The per-word merge loop is genuine imperative iteration — the
    * one place a typed map beats column algebra — and it never touches
    * the corpus, only the vocab. Rows-only in the registry (trained
    * merges are not SQL-expressible); encode correctness is
    * spec-asserted by hand.
    */
  def bpeEncodeStats(documents: DataFrame, numMerges: Int = 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = bpeTrain(documents, numMerges)
      .select("step", "left", "right").as[(Int, String, String)].collect()
      .map { case (s, l, r) => (l, r) -> s }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val encoded = documents
      .select(explode(toks(col("text"))).as("word")).distinct()
      .as[String].map { w =>
        var syms = w.split("").filter(_.nonEmpty)
        var done = syms.length < 2
        while (!done) {
          val rk = bc.value
          var best = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < best) best = r
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 &&
                rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue) == best) {
                out += (syms(i) + syms(i + 1)); i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.toArray
            done = syms.length < 2
          }
        }
        (w, syms.length, syms.mkString(" "))
      }.toDF("word", "n_bpe", "encoding")
    documents.select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars_tok"),
        sum(col("n_bpe")).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** [[bpeEncodeStats]] at a PINNED merge table — the serving operating
    * point (a tokenizer's merge table is the canonical frozen model
    * artifact; corpora are encoded against it for the tokenizer's whole
    * life), and the point at which BPE ENCODE becomes SQL-expressible:
    * with the merges as literals, the greedy apply is a pure function
    * of each word, and a DuckDB RECURSIVE CTE over symbol lists replays
    * it merge-for-merge ([[bpeEncodeStatsPinnedSql]]).
    *
    * Apply contract (mirrored exactly by the oracle): per iteration,
    * find the LOWEST merge rank present among adjacent symbol pairs and
    * merge its LEFTMOST occurrence, then rescan. One occurrence per
    * iteration (not one pass per rank) keeps the rebuild a pure
    * slice/concat — no sequential skip state — which is what makes the
    * recursion expressible; for BPE the fixpoint tokenization is the
    * standard greedy encoding either way, and the batch-pass form
    * remains spec-asserted through [[bpeEncodeStats]].
    */
  def bpeEncodeStatsPinned(
      documents: DataFrame, merges: Seq[(Int, String, String)]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges.map { case (s, l, r) => (l, r) -> s }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val encoded = documents
      .select(explode(toks(col("text"))).as("word")).distinct()
      .as[String].map { w =>
        var syms = w.split("").filter(_.nonEmpty)
        var done = syms.length < 2
        while (!done) {
          val rk = bc.value
          var best = Int.MaxValue
          var pos = -1
          var i = 0
          while (i < syms.length - 1) {
            val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < best) { best = r; pos = i } // strict < → leftmost of the best rank
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            syms = (syms.take(pos) :+ (syms(pos) + syms(pos + 1))) ++ syms.drop(pos + 2)
            done = syms.length < 2
          }
        }
        (w, syms.length)
      }.toDF("word", "n_bpe")
    documents.select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars_tok"),
        sum(col("n_bpe")).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[bpeEncodeStatsPinned]]: the greedy apply as a
    * RECURSIVE CTE over per-word symbol LISTS — per step, adjacent-pair
    * ranks via a literal CASE chain inside a list_transform lambda,
    * best = list_min, leftmost position = list_position, and the merge
    * is slice ∥ [l||r] ∥ slice. Rows recurse only while a mergeable
    * pair remains; the fixpoint row per word (no pair in the table)
    * joins back to token instances for the per-doc accounting.
    */
  def bpeEncodeStatsPinnedSql(merges: Seq[(Int, String, String)]): String = {
    def q(s: String) = s.replace("'", "''")
    val rankCase = "CASE " + merges.map { case (st, l, r) =>
      s"WHEN s[i] = '${q(l)}' AND s[i + 1] = '${q(r)}' THEN $st"
    }.mkString(" ") + " ELSE 999999 END"
    raw"""WITH RECURSIVE w AS (
       |  SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
       |  FROM documents),
       |base AS (
       |  -- no len filter: an empty token (whitespace-only doc) must
       |  -- survive to fin with s = [] / n_bpe = 0, or the final inner
       |  -- join would silently drop the whole document row that the
       |  -- Spark side still counts
       |  SELECT word,
       |    list_transform(generate_series(1, len(word)), i -> substr(word, i, 1)) AS s
       |  FROM w),
       |enc AS (
       |  SELECT word, s FROM base
       |  UNION ALL
       |  SELECT word,
       |    list_concat(list_concat(
       |      list_slice(s, 1, pos - 1),
       |      [s[pos] || s[pos + 1]]),
       |      list_slice(s, pos + 2, len(s))) AS s
       |  FROM (
       |    SELECT word, s,
       |      COALESCE(list_min(rks), 999999) AS best,
       |      list_position(rks, list_min(rks)) AS pos
       |    FROM (
       |      SELECT word, s,
       |        list_transform(generate_series(1, len(s) - 1), i -> $rankCase) AS rks
       |      FROM enc) rk0) st0
       |  WHERE best <> 999999),
       |fin AS (
       |  SELECT word, len(s) AS n_bpe
       |  FROM (
       |    SELECT word, s,
       |      COALESCE(list_min(
       |        list_transform(generate_series(1, len(s) - 1), i -> $rankCase)),
       |        999999) AS best
       |    FROM enc) f0
       |  WHERE best = 999999),
       |tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
       |  FROM documents)
       |SELECT t.doc_id,
       |  COUNT(*) AS n_words,
       |  CAST(SUM(len(t.word)) AS BIGINT) AS n_chars_tok,
       |  CAST(SUM(f.n_bpe) AS BIGINT) AS n_bpe_tokens
       |FROM tok t JOIN fin f USING (word)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def vocabCoverageSql(topK: Int = 200): String =
    raw"""WITH tok AS (
       |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
       |  FROM documents),
       |counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
       |total AS (SELECT SUM(n) AS total FROM counts),
       |top AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT $topK)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank,
       |  token, n,
       |  CAST(SUM(n) OVER (ORDER BY n DESC, token
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       |  CAST(SUM(n) OVER (ORDER BY n DESC, token
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / t.total AS cum_share
       |FROM top, total t
       |ORDER BY rank""".stripMargin

  // ---- HTML → text extraction (r14) -----------------------------------
  //
  // The web-corpus front door (trafilatura/jusText/resiliparse territory):
  // a crawl arrives as markup, and the FIRST pipeline op is extracting
  // main-content text — dropping head/script/style/nav blocks, stripping
  // tags, decoding entities, collapsing whitespace. Same verification
  // discipline as the image/audio/video codecs: a deterministic generator
  // wraps each document's text in a full HTML page (entity-escaped, like
  // any real HTML emitter), the extractor recovers it, and the DuckDB
  // twin computes the expected round trip STRAIGHT FROM the source text —
  // the hash gate then proves the extractor inverts the markup exactly.

  /** Hosts in the synthetic web corpus: every page lives on host
    * `h{doc_id % HtmlHosts}.example` (declared by its canonical link)
    * and links to [[HtmlLinksPerDoc]] other documents at ids
    * `(doc_id·31 + 7j + 3) mod HtmlLinkMod` — deterministic,
    * sf-independent arithmetic both engines replay, giving the corpus a
    * real cross-host link graph for [[graft.text.WebGraph]] (r15,
    * VERDICT item 2). Targets above the live id range are dangling
    * links — which a real crawl graph has too.
    */
  val HtmlHosts = 16
  val HtmlLinksPerDoc = 3
  val HtmlLinkMod = 997L

  /** The related-links targets of one page (shared by the generator,
    * the oracle builders and the specs).
    */
  def htmlLinkTargets(id: Long): Seq[Long] =
    (0 until HtmlLinksPerDoc).map(j => (id * 31 + 7 * j + 3) % HtmlLinkMod)

  /** The raw href a page writes for its j-th related link (r15): real
    * crawl markup is MESSY, so the generator emits one of four
    * deterministic spellings of the same canonical URL — clean,
    * uppercased-host + default port, dot-segment + fragment, unsorted
    * query with a tracking param — selected by (id + j) mod 4. The URL
    * normalizer must collapse all four back to the canonical form
    * (variant 3 keeps its sorted non-tracking params).
    */
  def htmlLinkHref(id: Long, j: Int): String = {
    val t = htmlLinkTargets(id)(j)
    val host = s"h${t % HtmlHosts}.example"
    ((id + j) % 4) match {
      case 0 => s"https://$host/doc/$t"
      case 1 => s"HTTPS://${host.toUpperCase}:443/doc/$t"
      case 2 => s"https://$host/a/../doc/$t#sec"
      case _ => s"https://$host/doc/$t?b=2&a=1&utm_source=feed"
    }
  }

  /** One deterministic HTML page around a document's text: head with
    * title+style and the canonical host link, nav boilerplate, an h1,
    * the entity-escaped text split into 12-word paragraphs with every
    * 7th word bold-wrapped, a related-links paragraph (the cross-doc
    * edges of the corpus link graph), a script block (with `<`/`&&`
    * inside — the classic naive-strip trap), and a kept paragraph
    * carrying the five standard entities. Escaping order (& first) is
    * what makes decode-&-last an exact inverse.
    */
  def makeHtml(id: Long, text: String): String = {
    val esc = Option(text).getOrElse("")
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // explicit whitespace class (= Java \s) — Java \s includes \x0B but
    // RE2 (the DuckDB oracle) excludes it; spelling the class out keeps
    // generator, extractor and oracle byte-identical on exotic whitespace
    val words = esc.trim.split("[ \\t\\n\\x0B\\f\\r]+").filter(_.nonEmpty)
    val decorated = words.zipWithIndex.map {
      case (w, i) if i % 7 == 6 => s"<b>$w</b>"
      case (w, _) => w
    }
    val paras = decorated.grouped(12)
      .map(g => s"<p>${g.mkString(" ")}</p>").mkString("\n")
    val related = htmlLinkTargets(id).zipWithIndex
      .map { case (t, j) => s"""<a href="${htmlLinkHref(id, j)}">doc $t</a>""" }
      .mkString(" ")
    s"""<html><head><title>Doc $id</title><style>p{color:#111;margin:0 0 1em}</style>
       |<link rel="canonical" href="https://h${id % HtmlHosts}.example/doc/$id"></head>
       |<body>
       |<nav><a href="/">home</a> | <a href="/about">about</a></nav>
       |<h1>Doc $id</h1>
       |$paras
       |<p>Related: $related</p>
       |<script type="text/javascript">var x = $id < 42 && x > 0;</script>
       |<p>Contact: AT&amp;T &lt;support&gt; &quot;24/7&quot; &#39;line&#39;</p>
       |</body></html>""".stripMargin
  }

  /** Synthetic HTML corpus: (doc_id, html) via [[makeHtml]], rendered
    * inside mapPartitions — distributed, narrow, generator inside the
    * hash gate like the media corpora.
    */
  def htmlCorpus(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, makeHtml(id, text)) })
      .toDF("doc_id", "html")
  }

  /** The extractor: block removal (head/script/style/nav — dotall
    * non-greedy, so a `<`/`&&` INSIDE a script cannot leak), tag→SPACE
    * strip (block boundaries must separate words, not weld them),
    * entity decode with `&amp;` LAST (the escape inverse), whitespace
    * collapse. Pure regexp/replace column chain — narrow, whole-stage
    * codegen, no UDF, no parser object; the plan is a scan + project +
    * output sort at any corpus size.
    */
  def extractHtmlText(htmlDocs: DataFrame): DataFrame = {
    val noBlocks = Seq("head", "script", "style", "nav")
      .foldLeft(col("html")) { (c, t) =>
        regexp_replace(c, s"(?s)<$t\\b[^>]*>.*?</$t>", " ")
      }
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // entity names contain no regex metacharacters and the replacements
    // no $/\ specials, so plain regexp_replace IS a literal replace here
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    // same explicit class as makeHtml's split — see the \x0B note there
    val extracted = trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
    htmlDocs.select(
      col("doc_id"),
      extracted.as("extracted"),
      length(extracted).cast("long").as("n_chars_text"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of htmlCorpus→[[extractHtmlText]]: the expected
    * extraction computed STRAIGHT FROM the source text — 'Doc {id}' +
    * the whitespace-normalized text + the related-links anchor texts
    * (the generator's link-target arithmetic replayed) + the decoded
    * contact line (in template order: h1, paragraphs, related, the kept
    * contact paragraph; head/nav/script content absent). Hash equality
    * proves the extractor inverts the generator's markup and escaping
    * exactly.
    */
  val extractHtmlTextSql: String = {
    val related = (0 until HtmlLinksPerDoc)
      .map(j => s"'doc ' || CAST((doc_id * 31 + ${7 * j + 3}) % $HtmlLinkMod AS VARCHAR)")
      .mkString(" || ' ' || ")
    raw"""WITH src AS (
       |  SELECT doc_id, COALESCE(text, '') AS t FROM documents WHERE doc_id IS NOT NULL),
       |x AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(
       |      'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || t ||
       |      ' Related: ' || $related ||
       |      ' Contact: AT&T <support> "24/7" ''line''',
       |      '[ \t\n\x0B\f\r]+', ' ', 'g')) AS extracted
       |  FROM src)
       |SELECT doc_id, extracted,
       |  CAST(length(extracted) AS BIGINT) AS n_chars_text
       |FROM x ORDER BY doc_id""".stripMargin
  }
}
