package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass every training-data
  * pipeline runs before text leaves curation (emails, IPv4 addresses,
  * phone numbers → category placeholders, with per-document match
  * counts for audit). Pure narrow column algebra: three codegen'd
  * regexp passes per row, no shuffle except the output sort, so the
  * operator is embarrassingly parallel at any corpus size.
  *
  * Cross-engine contract: the patterns use only syntax Java regex and
  * RE2 (DuckDB) interpret identically — character classes, bounded
  * repetition, word boundaries; no lookaround, no backreferences. The
  * corpus text is synthetic and PII-free, so the fixture plants
  * deterministic PII per doc_id residue (some docs get none — the
  * zero-count path is exercised); the oracle replays the same plant +
  * scrub in DuckDB and the redacted text is md5-compared whole.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d -]{7,}\\d"

  /** Deterministic PII plant: e-mail on even doc_ids, an IP unless
    * doc_id % 5 = 0, a phone unless doc_id % 3 = 0 — appended so the
    * original text is untouched and every residue combination occurs.
    */
  private def planted = concat(
    col("text"),
    when(col("doc_id") % 2 === 0,
      concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
      .otherwise(lit("")),
    when(col("doc_id") % 5 =!= 0,
      concat(lit(" from 10.0."), col("doc_id") % 256, lit("."), col("doc_id") % 200))
      .otherwise(lit("")),
    when(col("doc_id") % 3 =!= 0,
      concat(lit(" call +407"), lpad((col("doc_id") % 100000000).cast("string"), 8, "0")))
      .otherwise(lit("")))

  /** Per-document scrub report: category counts on the planted text and
    * the md5 of the fully redacted text (whole-text equality without
    * hauling the corpus through the compare).
    */
  def piiScrub(documents: DataFrame): DataFrame = {
    val t = planted
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      md5(scrubbed).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String = {
    val t =
      """#text
        #  || CASE WHEN doc_id % 2 = 0
        #     THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        #  || CASE WHEN doc_id % 5 <> 0
        #     THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 200) ELSE '' END
        #  || CASE WHEN doc_id % 3 <> 0
        #     THEN ' call +407' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') ELSE '' END"""
        .stripMargin('#').linesIterator.map(_.trim).mkString(" ")
    s"""WITH p AS (SELECT doc_id, $t AS t FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_md5
       |FROM p ORDER BY doc_id""".stripMargin
  }
}
