package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.AudioOps

/** Big-book bound: one ~100 MB book (25.6 M samples) through the full
  * audio phase — decode -> gate -> resample -> normalize -> ordered
  * concat -> metrics — and the wav sink. The pipeline's documented
  * memory bound is O(|one book| × small constant) per task (the
  * mapGroups iterator holds a single book's parts, never the corpus);
  * this test exercises that bound at a two-orders-of-magnitude larger
  * book than the unit fixtures, and pins the exact sample arithmetic so
  * a copy-amplifying or sample-dropping regression surfaces as a count
  * mismatch, not just an OOM. */
class BigBookAudioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("~100 MB book: exact sample accounting through resample+concat, wav sink round-trips") {
    val root = Files.createTempDirectory("bigbook").toString
    val dir = new java.io.File(s"$root/spk1"); dir.mkdirs()
    // 32 parts x 800k samples @ 22050 Hz = 25.6 M source samples (~100 MB
    // as float32). Parts land on disk as PCM16 wav (~51 MB) — the decode
    // path is the real RIFF parser, not a stub.
    val partSamples = 800000
    val nParts = 32
    (0 until nParts).foreach { i =>
      val s = new Array[Float](partSamples)
      var j = 0
      while (j < partSamples) { s(j) = ((i * 31 + j * 7) % 1000) / 1000.0f - 0.5f; j += 1 }
      Files.write(java.nio.file.Paths.get(dir.getPath, s"book1_$i.wav"),
        AudioOps.encodePcm16Wav(s, 22050))
    }

    val out = PreprocessPipeline.processAudio(spark, s"$root/*/*.wav")
      .collect()
    assert(out.length == 1)
    val row = out(0)
    assert(row.getAs[String]("book_id") == "book1")
    assert(row.getAs[Int]("sample_rate") == PreprocessPipeline.TargetSr)
    assert(row.getAs[Boolean]("qualified")) // 22050 >= MinSr
    // linearResample(n, 22050 -> 24000) emits round(n * 24000/22050)
    // samples per part (endpoint-inclusive interpolation — pinned by
    // AudioOpsSpec); concat is exact, normalize is length-preserving.
    val perPart = AudioOps.linearResample(
      new Array[Float](partSamples), 22050, PreprocessPipeline.TargetSr).length
    val expected = perPart.toLong * nParts
    assert(row.getAs[Long]("n_samples") == expected,
      s"sample accounting drifted: got ${row.getAs[Long]("n_samples")}, want $expected")
    assert(math.abs(row.getAs[Double]("audio_duration_s") -
      expected.toDouble / PreprocessPipeline.TargetSr) < 1e-9)

    // wav sink at book scale: header arithmetic + byte length for a
    // >50 MB payload (32-bit RIFF sizes handled as unsigned-safe longs)
    val big = new Array[Float](expected.toInt.min(26000000))
    val wav = AudioOps.encodePcm16Wav(big, PreprocessPipeline.TargetSr)
    assert(wav.length.toLong == 44L + 2L * big.length)
    val (decoded, sr) = AudioOps.decodePcm16Wav(wav)
    assert(decoded.length == big.length && sr == PreprocessPipeline.TargetSr)
  }
}
