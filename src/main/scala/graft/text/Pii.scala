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
  // international form: country code + 9 digits in up-to-3-digit groups.
  // The group structure is FIXED (not an open-ended [\d -]{7,} run) so a
  // match can never swallow an unrelated number that happens to follow
  // the phone — "call +40 721 234 567 9000 units" redacts exactly the
  // phone and leaves "9000 units" intact.
  val PhoneRe = "\\+\\d{1,3}[ -]?\\d{3}[ -]?\\d{3}[ -]?\\d{3}\\b"

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

  /** Per-document scrub report: category counts and the md5 of the
    * fully redacted text (whole-text equality without hauling the
    * corpus through the compare). Each category is counted on the text
    * AS ITS PASS SEES IT (emails on the raw text, IPs after the email
    * pass, phones after the IP pass), so every count equals the number
    * of placeholders that pass actually wrote — an IP-shaped substring
    * inside an e-mail local part is redacted once, as part of the
    * e-mail, and is not double-reported as an IP.
    */
  def piiScrub(documents: DataFrame): DataFrame = {
    val t = planted
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val scrubbed = regexp_replace(afterIp, PhoneRe, "<PHONE>")
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
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
    s"""WITH p AS (SELECT doc_id, $t AS t FROM documents),
       |s1 AS (SELECT doc_id, t, regexp_replace(t, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM p),
       |s2 AS (SELECT doc_id, t, t1, regexp_replace(t1, '$Ipv4Re', '<IP>', 'g') AS t2 FROM s1)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(t2, '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_md5
       |FROM s2 ORDER BY doc_id""".stripMargin
  }
}
