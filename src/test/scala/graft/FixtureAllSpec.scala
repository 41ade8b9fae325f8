package graft

import java.nio.file.{Files, Path, Paths}

/** Umbrella staleness gate for ALL committed model fixtures (r12): runs
  * the actual generator — `FixtureGen.generate`, the same code path the
  * documented `sbt "runMain graft.sim.FixtureGen"` refresh uses — into a
  * temp tree and byte-diffs every produced file against the committed
  * source. One run proves all six fixture files (PQ codebooks, SemDedup/
  * k-means centroids, PCA basis, BPE merges, quality LR weights, RF
  * forest — the SemDedup centroids also serve the kmeans_*_pinned
  * queries) are exactly what retraining on the current testdata
  * produces, so a testdata refresh can never silently strand a fixture.
  * The per-fixture FixtureSpec legs remain for pinpointing which trainer
  * drifted; this gate additionally pins FixtureGen's own serialization
  * (a generator bug that formatted literals differently would pass
  * FixtureSpec but fail here).
  */
class FixtureAllSpec extends SparkSpec {

  test("FixtureGen regenerates every committed fixture file byte-for-byte", Soak) {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val tmp = Files.createTempDirectory("fixturegen").toString
    graft.sim.FixtureGen.generate(spark, dir, s"$tmp/sim")
    val committedRoot = "src/main/scala/graft"
    val files = Seq(
      "sim/PqFixture.scala", "sim/SemDedupFixture.scala", "sim/PcaFixture.scala",
      "text/BpeFixture.scala", "ml/QualityFixture.scala", "ml/RfFixture.scala")
    val drifted = files.filter { f =>
      val generated: Path = Paths.get(s"$tmp/$f").normalize()
      val committed: Path = Paths.get(s"$committedRoot/$f")
      assert(Files.exists(generated), s"generator did not produce $f")
      assert(Files.exists(committed), s"committed fixture $f missing")
      !java.util.Arrays.equals(Files.readAllBytes(generated), Files.readAllBytes(committed))
    }
    if (drifted.nonEmpty) fail(
      s"fixture drift in ${drifted.mkString(", ")} — testdata or a trainer changed; " +
        "regenerate via `sbt \"runMain graft.sim.FixtureGen /root/testdata/sf0.01\"` " +
        "and re-verify the dependent oracle queries")
  }
}
