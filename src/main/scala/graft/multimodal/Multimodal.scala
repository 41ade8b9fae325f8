package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` payloads + typed metadata, processed partition-wise with the
  * Dataset API (the Scala analogue of mapInPandas batch UDFs).
  *
  * The DECODE STEP IS STUBBED — this container has no image/audio codecs,
  * so `decode` produces deterministic fake dimensions derived from the
  * payload's SHA-256. Everything Spark-side is real and verified: the
  * binary schema, the partition-wise iterator shape (one digest instance
  * per partition, streaming — no per-row allocation of heavy state), and
  * the feature schema. Swapping `decode` for a real codec is a one-function
  * change.
  */
object Multimodal {

  final case class MediaIn(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      sha256_hex: String, decoded_ok: Boolean, width: Int, height: Int)

  /** STUB decode: fake dimensions from the content hash (bytes 0/1). */
  private def decode(hash: Array[Byte]): (Int, Int) =
    ((hash(0) & 0xff) + 1, (hash(1) & 0xff) + 1)

  /** documents.text reinterpreted as a binary payload → per-media features.
    * Partition-wise batch processing over the binary column.
    */
  def extractFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaIn]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { m =>
          md.reset()
          val h = md.digest(m.payload)
          val hex = h.map("%02x".format(_)).mkString
          val (w, ht) = decode(h)
          MediaFeatures(m.doc_id, m.media_type, m.payload.length.toLong,
            hex, decoded_ok = true, width = w, height = ht)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle twin: the stub decode's width/height are (first hash byte)+1 /
    * (second hash byte)+1 — reproduced from the sha256 hex digits via the
    * 16-branch hex-digit CASE.
    */
  val extractFeaturesSql: String = {
    def byteVal(i: Int) = // byte i of the hash = 2 hex chars
      s"(${TextOps.hexValSql(s"substr(sha256(text), ${2 * i + 1}, 1)")}) * 16 + " +
        s"(${TextOps.hexValSql(s"substr(sha256(text), ${2 * i + 2}, 1)")})"
    s"""SELECT doc_id, 'text/plain' AS media_type,
       |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       |  sha256(text) AS sha256_hex,
       |  TRUE AS decoded_ok,
       |  CAST((${byteVal(0)}) + 1 AS INTEGER) AS width,
       |  CAST((${byteVal(1)}) + 1 AS INTEGER) AS height
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
