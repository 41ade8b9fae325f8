package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello multimodal world", "en", "s1", 22L),
    (2L, "", "en", "s2", 0L),
    (3L, "binary payload stand-in é世", "en", "s3", 26L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("expression path and codec-template path produce identical features") {
    val expr = Multimodal.extractFeatures(docs)
    val codec = Multimodal.extractFeaturesWithCodec(docs)(Multimodal.stubDecode)
    // same names+types (nullability flags differ between expression and
    // case-class encoders; the driver compare ignores them too)
    assert(expr.schema.map(f => (f.name, f.dataType)) ==
      codec.schema.map(f => (f.name, f.dataType)))
    assert(expr.exceptAll(codec).isEmpty && codec.exceptAll(expr).isEmpty)
  }

  test("the default path stays in codegen (no object-iterator operators)") {
    val plan = Multimodal.extractFeatures(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"))
    val codecPlan = Multimodal.extractFeaturesWithCodec(docs)(Multimodal.stubDecode)
      .queryExecution.executedPlan.toString
    assert(codecPlan.contains("MapPartitions")) // the template keeps the iterator shape
  }

  test("features: n_bytes counts UTF-8 bytes, dimensions in [1,256]") {
    val r = Multimodal.extractFeatures(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_bytes") == 22L)
    // é is 2 bytes, 世 is 3 → 24 ascii + 5
    assert(r(3L).getAs[Long]("n_bytes") == 29L)
    r.values.foreach { x =>
      val (w, h) = (x.getAs[Int]("width"), x.getAs[Int]("height"))
      assert(w >= 1 && w <= 256 && h >= 1 && h <= 256)
      assert(x.getAs[String]("sha256_hex").length == 64)
    }
  }
}
