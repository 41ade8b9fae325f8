package graft

import org.apache.spark.sql.functions._
import graft.text.Pii

/** PII scrub semantics: after the redaction pass, no text may still
  * match any detector pattern, every planted category is counted, and
  * the placeholders appear exactly count-many times. (Cross-engine
  * value equality is the pii_scrub oracle's job; this pins the scrub's
  * MEANING, which an md5 compare alone would not.)
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (2L, "plain words here"),     // email + ip + phone planted
    (3L, "more words"),           // ip only (odd, %3=0 blocks phone)
    (15L, "and more"),            // %2!=0, %5=0, %3=0 → nothing planted
    (4L, "tail text")             // email + ip + phone
  ).toDF("doc_id", "text")

  test("scrub counts match plants and redaction is total") {
    val out = Pii.piiScrub(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(2L) == ((1L, 1L, 1L)))
    assert(out(3L) == ((0L, 1L, 0L)))
    assert(out(15L) == ((0L, 0L, 0L)))
    assert(out(4L) == ((1L, 1L, 1L)))
  }

  test("adversarial text is counted per category") {
    val tricky = Seq(
      (1L, "mail a.b-c_d%x@sub.domain.org twice a.b@x.io"),
      (7L, "ips 192.168.0.1 and 8.8.8.8 phone +40 721 234 567"))
      .toDF("doc_id", "text")
    // doc 1 (odd, %5!=0, %3!=0): 2 emails, 1 planted ip, 1 planted phone
    // doc 7 (odd, %5!=0, %3!=0): 2 ips + 1 planted, 1 phone + 1 planted
    val m = Pii.piiScrub(tricky).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((2L, 1L, 1L)))
    assert(m(7L) == ((0L, 3L, 2L)))
  }

  test("no detector pattern survives its own scrub") {
    // apply the scrub chain directly, then re-run every detector over
    // the redacted text — all must come back empty
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), Pii.EmailRe, "<EMAIL>"),
        Pii.Ipv4Re, "<IP>"),
      Pii.PhoneRe, "<PHONE>")
    val survivors = Seq(
      (1L, "a@b.io c-d@e.org 1.2.3.4 255.255.255.255 +40 7212 34567 +123456789"))
      .toDF("doc_id", "text")
      .select(
        size(regexp_extract_all(scrubbed, lit(Pii.EmailRe), lit(0))) +
          size(regexp_extract_all(scrubbed, lit(Pii.Ipv4Re), lit(0))) +
          size(regexp_extract_all(scrubbed, lit(Pii.PhoneRe), lit(0))))
      .head().getInt(0)
    assert(survivors == 0)
  }
}
