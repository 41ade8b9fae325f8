package graft

import graft.multimodal.Multimodal

/** The RIFF/AVI video codec (the WAV walker's two-level sibling). The
  * registered queries (`multimodal_avi_decode`, `multimodal_avi_frames`)
  * prove the happy path oracle-exact; these specs pin the container
  * grammar edges the oracle cannot see: unknown-chunk skipping, odd-size
  * word alignment, truncation/mismatch quarantine, and the bottom-up
  * row mapping via a hand-computed frame.
  */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def le(bytes: Array[Byte], off: Int, v: Int): Unit = {
    bytes(off) = (v & 0xff).toByte
    bytes(off + 1) = ((v >> 8) & 0xff).toByte
    bytes(off + 2) = ((v >> 16) & 0xff).toByte
    bytes(off + 3) = ((v >> 24) & 0xff).toByte
  }

  test("hand-computed 2x2x1 round trip: sums, ysum, bottom-up rows, padding") {
    // pixel(f,x,y) = (x, y, 10x+y): easy to hand-sum
    val avi = Multimodal.makeAvi(2, 2, 1, (_, x, y) => (x, y, 10 * x + y))
    val Some((w, h, frames)) = Multimodal.parseAvi(avi)
    assert(w == 2 && h == 2 && frames.length == 1)
    val (sr, sg, sb, ysum) = frames.head
    assert(sr == 0 + 1 + 0 + 1) // r = x over {(0,0),(1,0),(0,1),(1,1)}
    assert(sg == 0 + 0 + 1 + 1) // g = y
    assert(sb == 0 + 10 + 1 + 11) // b = 10x+y
    // ysum = Σ y*(r+g+b): row y=1 only → (0+1+1) + (1+1+11) = 15
    assert(ysum == 15L)
    // row stride is padded: 2 px * 3 B = 6 → stride 8; frame chunk = 16 B
    val frameSize = 16
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    assert(avi.length > frameSize)
  }

  test("unknown chunks skip word-aligned at the top level (incl. odd size)") {
    val avi = Multimodal.makeAvi(3, 2, 2, (f, x, y) => (f + x, y, x + y))
    val base = Multimodal.parseAvi(avi).get
    // splice a 3-byte JUNK chunk (odd size → 1 pad byte) after hdrl:
    // hdrl ends at 12 + 8 + hdrlSize, hdrlSize = 4 + (8+56) + (8 + 116) = 192
    val insertAt = 12 + 8 + 192
    val junk = new Array[Byte](8 + 3 + 1)
    "JUNK".getBytes("US-ASCII").copyToArray(junk, 0)
    le(junk, 4, 3) // declared size 3; writer pads to 4
    val spliced = avi.take(insertAt) ++ junk ++ avi.drop(insertAt)
    le(spliced, 4, spliced.length - 8) // fix the RIFF size
    val walked = Multimodal.parseAvi(spliced)
    assert(walked.contains(base))
  }

  test("quarantine: truncation, bad magic, and header/movi count mismatch") {
    val avi = Multimodal.makeAvi(4, 3, 2, (f, x, y) => (f, x, y))
    assert(Multimodal.parseAvi(avi.take(32)).isEmpty) // mid-header cut
    // a cut INSIDE movi (idx1 is 2*16+8=40 B, so -45 lands mid-frame)
    assert(Multimodal.parseAvi(avi.take(avi.length - 45)).isEmpty)
    // a cut inside idx1 only is TOLERATED: the seek index is optional
    // and every frame is intact (lenient like a real demuxer)
    assert(Multimodal.parseAvi(avi.take(avi.length - 10)) == Multimodal.parseAvi(avi))
    assert(Multimodal.parseAvi(Array[Byte](1, 2, 3)).isEmpty)
    val wav = Multimodal.makeWav(8000, 1, 4, _ => 7)
    assert(Multimodal.parseAvi(wav).isEmpty) // RIFF but not AVI
    // lie in avih dwTotalFrames (offset 12+8+4+8+16): parser must refuse
    val lied = avi.clone()
    le(lied, 12 + 8 + 4 + 8 + 16, 5)
    assert(Multimodal.parseAvi(lied).isEmpty)
  }

  test("sniffFormat dispatches RIFF containers: avi vs wav vs unknown") {
    val avi = Multimodal.makeAvi(2, 2, 1, (_, x, y) => (x, y, 0))
    val wav = Multimodal.makeWav(8000, 1, 4, _ => 0)
    assert(Multimodal.sniffFormat(avi) == "avi")
    assert(Multimodal.sniffFormat(wav) == "wav")
    assert(Multimodal.sniffFormat("RIFFxxxxJUNK".getBytes("US-ASCII")) == "unknown")
    // truncated AVI still sniffs as avi (magic intact) — the
    // sniff-then-decode split is what routes it to quarantine
    assert(Multimodal.sniffFormat(avi.take(32)) == "avi")
  }

  test("frame sampling strides: every Nth frame, frame_idx preserved") {
    val docs = Seq(9L).toDF("doc_id") // videoSpec(9) = (11, 3, 5): 5 frames
    val corpus = Multimodal.videoCorpus(docs)
    val s1 = Multimodal.videoFrames(corpus, stride = 1).collect()
    val s3 = Multimodal.videoFrames(corpus, stride = 3).collect()
    assert(s1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(s3.map(_.getInt(1)).toSeq == Seq(0, 3))
    // sampled rows are the SAME rows, not recomputed differently
    val all = s1.map(r => r.getInt(1) -> r.getLong(4)).toMap
    s3.foreach(r => assert(all(r.getInt(1)) == r.getLong(4)))
  }

  test("corpus quarantine parity: % 89 == 5 rows are decoded_ok=false zeros") {
    val docs = Seq(5L, 6L, 94L).toDF("doc_id") // 5 and 94 quarantine
    val sum = Multimodal.videoSummary(Multimodal.videoCorpus(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!sum(5L).getBoolean(1) && !sum(94L).getBoolean(1))
    assert(sum(5L).getInt(4) == 0 && sum(5L).getLong(6) == 0L)
    assert(sum(6L).getBoolean(1))
    val (w, h, n) = Multimodal.videoSpec(6L)
    assert((sum(6L).getInt(2), sum(6L).getInt(3), sum(6L).getInt(4)) == (w, h, n))
    // frames table: quarantined docs contribute no rows
    val frames = Multimodal.videoFrames(Multimodal.videoCorpus(docs)).collect()
    assert(frames.forall(_.getLong(0) == 6L))
  }

  // ───────────── MJPEG '00dc' leg (r15, VERDICT item 3) ────────────────

  test("MJPEG round trip: exact dims/count, pixel sums banded (lossy)") {
    // solid fill — chroma subsampling is flat on a constant raster, so
    // the decode bands within a few units per channel (the codec-zoo
    // JPEG rule); dims and frame count must be EXACT
    val (w, h, n) = (6, 4, 3)
    val avi = Multimodal.makeMjpegAvi(w, h, n, (_, _, _) => (100, 150, 200))
    val Some((pw, ph, frames)) = Multimodal.parseAvi(avi)
    assert(pw == w && ph == h && frames.length == n)
    frames.foreach { case (sr, sg, sb, _) =>
      val px = (w * h).toLong
      assert(math.abs(sr / px - 100) <= 8 && math.abs(sg / px - 150) <= 8 &&
        math.abs(sb / px - 200) <= 8,
        s"MJPEG solid-fill sums out of band: ($sr,$sg,$sb) over $px px")
    }
    // the container declares the MJPEG stream, not a DIB one
    val s = new String(avi, 0, avi.length, "ISO-8859-1")
    assert(s.contains("MJPG") && s.contains("00dc") && !s.contains("00db"))
  }

  test("MJPEG truncated final frame quarantines the whole payload") {
    val ok = Multimodal.makeMjpegAvi(5, 3, 2, (f, x, y) => (x * 40, y * 60, f * 90))
    assert(Multimodal.parseAvi(ok).isDefined)
    val bad = Multimodal.makeMjpegAvi(5, 3, 2, (f, x, y) => (x * 40, y * 60, f * 90),
      truncateLastFrame = true)
    assert(Multimodal.parseAvi(bad).isEmpty,
      "a truncated entropy body must fail the whole payload")
  }

  test("mjpeg corpus quarantine parity: % 83 == 7 rows flag, others decode") {
    val docs = Seq(7L, 8L, 90L).toDF("doc_id") // 7 and 90 quarantine
    val out = Multimodal.mjpegDecode(Multimodal.mjpegCorpus(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out(7L).getBoolean(1) && !out(90L).getBoolean(1))
    assert(out(7L).getInt(2) == 0 && out(7L).getInt(4) == 0)
    assert(out(8L).getBoolean(1))
    val (w, h, n) = Multimodal.videoSpec(8L)
    assert((out(8L).getInt(2), out(8L).getInt(3), out(8L).getInt(4)) == (w, h, n))
  }
}
