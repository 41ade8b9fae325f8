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

  test("frame sampling: strided slices, capped count, no empty frames") {
    // 80-char payload; frameLen 16, stride 2 → slices at 0, 32, 64
    val media = Seq((1L, "x" * 80, "en", "s", 80L), (2L, "ab", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(media).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc(1L).map(_.getAs[Int]("frame_idx")).toSeq.sorted == Seq(0, 1, 2))
    assert(byDoc(1L).forall(_.getAs[Int]("frame_len") == 16))
    // short payload: one partial frame, no empties
    assert(byDoc(2L).map(r => (r.getAs[Int]("frame_idx"), r.getAs[Int]("frame_len"))).toSeq == Seq((0, 2)))
    assert(frames.forall(_.getAs[String]("frame_sha").length == 64))
  }

  test("resize metadata halves and clamps to >= 1") {
    val meta = Multimodal.resizeMeta(Multimodal.extractFeatures(docs)).collect()
    meta.foreach { r =>
      assert(r.getAs[Int]("out_width") == math.max(1, r.getAs[Int]("width") / 2))
      assert(r.getAs[Int]("out_height") == math.max(1, r.getAs[Int]("height") / 2))
      assert(r.getAs[Int]("out_width") >= 1 && r.getAs[Int]("out_height") >= 1)
    }
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
