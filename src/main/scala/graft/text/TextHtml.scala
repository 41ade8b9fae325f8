package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HTML front door: deterministic HTML corpus synthesis and the extraction chain back to text.
  * Split out of the former TextOps.scala monolith (r16) with zero
  * behavior change; mixed into [[TextOps]].
  */
private[graft] trait TextHtml extends TextBpe {
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
