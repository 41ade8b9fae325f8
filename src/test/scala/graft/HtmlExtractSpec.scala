package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** HTML → text extraction (`html_extract`). The oracle proves the
  * generator round trip at sf0.01; these specs pin the extractor edges
  * the oracle's clean corpus never exercises: entity-laden and
  * multi-space source text, the script/`<`/`&&` leak trap, boilerplate
  * block absence, word separation at block boundaries, and the
  * columnar (no-iterator) extract plan.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(docs: org.apache.spark.sql.DataFrame) =
    TextOps.extractHtmlText(TextOps.htmlCorpus(docs)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  /** The related-links anchor texts the page template inserts (r15). */
  private def rel(id: Long) =
    TextOps.htmlLinkTargets(id).map(t => s"doc $t")
      .mkString("Related: ", " ", "")

  test("round trip survives entity-hostile and whitespace-dirty source text") {
    val docs = Seq(
      (1L, "plain words here"),
      (2L, "a & b < c > d"), // escape/decode inverse
      (3L, "literal &amp; entity &lt;kept&gt;"), // pre-escaped source text
      (4L, "   many   spaces\t\tand\nnewlines   "),
      (5L, "")).toDF("doc_id", "text")
    val out = extract(docs)
    val tail = "Contact: AT&T <support> \"24/7\" 'line'"
    assert(out(1L) == s"Doc 1 plain words here ${rel(1)} $tail")
    assert(out(2L) == s"Doc 2 a & b < c > d ${rel(2)} $tail")
    assert(out(3L) ==
      s"Doc 3 literal &amp; entity &lt;kept&gt; ${rel(3)} $tail")
    assert(out(4L) == s"Doc 4 many spaces and newlines ${rel(4)} $tail")
    assert(out(5L) == s"Doc 5 ${rel(5)} $tail")
  }

  test("script/style/nav/head content never leaks, including < and && inside script") {
    val out = extract(Seq((7L, "visible body words")).toDF("doc_id", "text"))
    val x = out(7L)
    assert(!x.contains("var x"))
    assert(!x.contains("42"))
    assert(!x.contains("color"))
    assert(!x.contains("home"))
    assert(!x.contains("about"))
    assert(!x.contains("title") && !x.contains("Doc 7 Doc 7")) // head title dropped, h1 kept once
  }

  test("block and inline tags separate words instead of welding them") {
    // 13 words forces a paragraph break between word 12 and 13; word 7
    // (index 6) is bold-wrapped — both must still read as separate words
    val words = (1 to 13).map(i => s"w$i").mkString(" ")
    val out = extract(Seq((9L, words)).toDF("doc_id", "text"))
    assert(out(9L).contains("w12 w13")) // paragraph boundary
    assert(out(9L).contains("w6 w7 w8")) // bold wrap
  }

  test("the extractor is a columnar plan (no object iterators)") {
    val html = Seq((1L, "<html><body><p>x</p></body></html>"))
      .toDF("doc_id", "html")
    val plan = TextOps.extractHtmlText(html)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"))
  }

  test("makeHtml escapes the text; extractor output is layout-independent") {
    val h = TextOps.makeHtml(3L, "a & b < c")
    assert(h.contains("a &amp; b &lt; c"))
    assert(!h.substring(h.indexOf("<h1>")).contains(" < c")) // raw < never in body text
    val docs = (0L to 40L).map(i => (i, s"text $i of doc & <$i>")).toDF("doc_id", "text")
    val a = TextOps.extractHtmlText(TextOps.htmlCorpus(docs)).collect().toSeq
    val b = TextOps.extractHtmlText(TextOps.htmlCorpus(docs.repartition(7)))
      .collect().toSeq
    assert(a == b)
  }
}
