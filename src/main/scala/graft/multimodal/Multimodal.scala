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

  /** Frame sampling for video/audio payloads: one media row explodes to
    * its sampled frames (doc_id, frame_idx, frame_bytes, frame_sha).
    * STUB SLICER: a "frame" is a deterministic fixed-stride byte slice of
    * the payload (no video codec in this container); the Spark-side
    * contract is real — explode to a frames table via a generator over a
    * binary column, per-frame metadata as codegen'd expressions — and a
    * real demuxer drops into the slice lambda. `stride` is the sampling
    * interval ("every Nth frame"), `frameBytes` the stub frame size.
    */
  def sampleFrames(
      documents: DataFrame, frameLen: Int = 16,
      stride: Int = 2, maxFrames: Int = 4): DataFrame =
    documents
      .select(col("doc_id"), col("text").as("payload"))
      .withColumn("n_frames",
        least(lit(maxFrames),
          (length(col("payload")) / (frameLen * stride) + 1).cast("int")))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, n_frames - 1), " +
            s"i -> substring(payload, i * $frameLen * $stride + 1, $frameLen))"))
          .as(Seq("frame_idx", "frame")))
      .select(
        col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        length(col("frame")).cast("int").as("frame_len"),
        sha2(col("frame"), 256).as("frame_sha"))
      .filter(col("frame_len") > 0) // trailing empty slices drop
      .orderBy("doc_id", "frame_idx")

  /** Oracle twin of [[sampleFrames]] (substring slicing is identical in
    * both engines; the corpus is ASCII so positions are byte positions).
    */
  def sampleFramesSql(frameLen: Int = 16, stride: Int = 2, maxFrames: Int = 4): String =
    s"""WITH p AS (
       |  SELECT doc_id, text AS payload,
       |    LEAST($maxFrames, CAST(length(text) // ($frameLen * $stride) + 1 AS INTEGER)) AS n_frames
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |    substring(payload, CAST(i * $frameLen * $stride + 1 AS INTEGER), $frameLen) AS frame
       |  FROM (SELECT doc_id, payload, unnest(generate_series(0, n_frames - 1)) AS i FROM p))
       |SELECT doc_id, frame_idx,
       |  CAST(length(frame) AS INTEGER) AS frame_len,
       |  sha256(frame) AS frame_sha
       |FROM f WHERE length(frame) > 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize metadata for decoded media: the dimension arithmetic a real
    * resizer applies (halve and clamp to even, floor ≥1), as pure column
    * expressions over [[extractFeatures]] output. The pixel transform
    * itself belongs in [[extractFeaturesWithCodec]]'s iterator once a
    * codec exists; the metadata contract is engine-side and testable now.
    */
  def resizeMeta(features: DataFrame, factor: Int = 2): DataFrame =
    features.select(
      col("doc_id"),
      col("width"), col("height"),
      greatest(lit(1), (col("width") / factor).cast("int")).as("out_width"),
      greatest(lit(1), (col("height") / factor).cast("int")).as("out_height"))
      .orderBy("doc_id")

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
