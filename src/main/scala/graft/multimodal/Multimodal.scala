package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` payloads + typed metadata.
  *
  * The DECODE STEP IS STUBBED — this container has no image/audio codecs,
  * so decoded "dimensions" are deterministic fakes derived from the
  * payload's SHA-256. With the decode stubbed, every feature is a
  * built-in expression (sha2, length, substring arithmetic), so the
  * default path is pure whole-stage-codegen column algebra — no
  * mapPartitions, no per-row JVM object churn. The partition-wise
  * iterator shape a REAL codec needs (one native decoder instance per
  * partition, streaming) is preserved as [[extractFeaturesWithCodec]];
  * swapping in a codec is a one-function change and the spec pins both
  * paths to identical output.
  */
object Multimodal {

  final case class MediaIn(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      sha256_hex: String, decoded_ok: Boolean, width: Int, height: Int)

  /** STUB decode: fake dimensions from the content hash (bytes 0/1). */
  def stubDecode(hash: Array[Byte]): (Int, Int) =
    ((hash(0) & 0xff) + 1, (hash(1) & 0xff) + 1)

  /** Byte i of a sha256 hex string as an int (two hex-digit extracts —
    * pure ascii arithmetic, codegen'd).
    */
  private def hashByte(hex: Column, i: Int): Column =
    TextOps.hexVal(substring(hex, 2 * i + 1, 1)) * 16 +
      TextOps.hexVal(substring(hex, 2 * i + 2, 1))

  /** documents.text reinterpreted as a binary payload → per-media
    * features, entirely as built-in expressions (the stubbed-decode
    * features are hash arithmetic, which Catalyst codegens; reaching for
    * an iterator here would only take the hot path OUT of codegen).
    */
  def extractFeatures(documents: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val hex = sha2(payload, 256)
    documents.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      length(payload).cast("long").as("n_bytes"),
      hex.as("sha256_hex"),
      lit(true).as("decoded_ok"),
      (hashByte(hex, 0) + 1).cast("int").as("width"),
      (hashByte(hex, 1) + 1).cast("int").as("height"))
      .orderBy("doc_id")
  }

  /** The real-codec template: partition-wise batch processing over the
    * binary column with one decoder/digest instance per partition (the
    * Scala analogue of mapInPandas batch UDFs). Use this ONLY when the
    * decode needs a native library that can't be a Catalyst expression;
    * `decode` maps payload bytes → (width, height).
    */
  def extractFeaturesWithCodec(documents: DataFrame)(
      decode: Array[Byte] => (Int, Int)): DataFrame = {
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
    * hex-digit ascii arithmetic.
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
