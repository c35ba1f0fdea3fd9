package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AudioOpsSpec extends AnyFunSuite {

  private def wav(sr: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sr).putInt(sr * channels * 2).putShort((channels * 2).toShort)
      .putShort(16).put("data".getBytes).putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodePcm16Wav: mono roundtrip preserves sample count and scale") {
    val (s, sr) = AudioOps.decodePcm16Wav(wav(24000, 1, Array[Short](0, 16384, -16384)))
    assert(sr == 24000)
    assert(s.length == 3)
    assert(math.abs(s(1) - 0.5f) < 1e-4)
    assert(math.abs(s(2) + 0.5f) < 1e-4)
  }

  test("encodePcm16Wav: byte-exact inverse of decode (K6 sink kernel)") {
    // decode∘encode = identity on decoded samples: s/32768 re-quantizes
    // to exactly s.
    val original = wav(24000, 1, Array[Short](0, 16384, -16384, 32767, -32768))
    val (samples, sr) = AudioOps.decodePcm16Wav(original)
    val reencoded = AudioOps.encodePcm16Wav(samples, sr)
    assert(reencoded.sameElements(original))
    val (samples2, sr2) = AudioOps.decodePcm16Wav(reencoded)
    assert(sr2 == sr && samples2.sameElements(samples))
  }

  test("encodePcm16Wav: clamps out-of-range samples instead of wrapping") {
    val bytes = AudioOps.encodePcm16Wav(Array(1.5f, -1.5f, 1.0f), 8000)
    val (s, _) = AudioOps.decodePcm16Wav(bytes)
    assert(s(0) == 32767 / 32768.0f)  // +1.5 -> full-scale positive
    assert(s(1) == -1.0f)             // -1.5 -> full-scale negative
    assert(s(2) == 32767 / 32768.0f)  // +1.0 quantizes to max, not -1
  }

  test("decodePcm16Wav: stereo mixes down to mono (librosa mono=True)") {
    // interleaved L/R pairs: (16384, 0) -> 0.25
    val (s, _) = AudioOps.decodePcm16Wav(wav(16000, 2, Array[Short](16384, 0, 0, 16384)))
    assert(s.length == 2)
    assert(math.abs(s(0) - 0.25f) < 1e-4)
    assert(math.abs(s(1) - 0.25f) < 1e-4)
  }

  test("peakNormalize: scales peak to target, silence passes through") {
    val out = AudioOps.peakNormalize(Array(0.1f, -0.5f, 0.25f), 0.95f)
    assert(math.abs(out.map(math.abs).max - 0.95f) < 1e-6)
    assert(AudioOps.peakNormalize(Array(0f, 0f)).toSeq == Seq(0f, 0f))
  }

  test("linearResample: identity at equal rates, 2x doubles length, endpoints kept") {
    val in = Array(0f, 1f, 0f, -1f)
    assert(AudioOps.linearResample(in, 24000, 24000) eq in)
    val up = AudioOps.linearResample(in, 12000, 24000)
    assert(up.length == 8)
    assert(up(0) == 0f && math.abs(up(up.length - 1) + 1f) < 1e-6)
  }

  test("linearResample: a corrupt-header rate that would materialize " +
      "beyond Int.MaxValue fails loudly instead of wrapping") {
    // sr=1 from a crafted wav header: 2^20 samples x 16000 = 1.7e10
    // outputs — the former .toInt wrapped this into a wrong-sized or
    // negative-sized array; the contract is now the decodeMp3
    // materialization bound (require -> deterministic task error)
    val in = new Array[Float](1 << 20)
    val e = intercept[IllegalArgumentException] {
      AudioOps.linearResample(in, 1, 16000)
    }
    assert(e.getMessage.contains("materialize"))
  }

  test("sliceSeconds: ffmpeg -ss/-t as array slice, clamped at bounds") {
    val in = Array.tabulate(100)(_.toFloat)
    val cut = AudioOps.sliceSeconds(in, 10, 2.0, 5.0) // 10 Hz: samples 20..49
    assert(cut.length == 30 && cut(0) == 20f)
    assert(AudioOps.sliceSeconds(in, 10, 9.0, 99.0).length == 10)
    assert(AudioOps.sliceSeconds(in, 10, 50.0, 40.0).length == 0)
  }

  test("concatParts + durationSeconds") {
    val c = AudioOps.concatParts(Seq(Array(1f, 2f), Array(3f)))
    assert(c.toSeq == Seq(1f, 2f, 3f))
    assert(AudioOps.durationSeconds(24000, 24000) == 1.0)
    assert(AudioOps.durationSeconds(100, 0) == 0.0)
  }

  test("vadSegments: run merging, strict > threshold, partial tail drop") {
    def sig(frames: Float*): Array[Float] =
      frames.toArray.flatMap(v => Array.fill(4)(v / 4)) // frame=4, sum = v
    // frames sums: 0, 5, 5, 0, 5, 0 -> segments (1,3) and (4,5) at thr 1
    assert(AudioOps.vadSegments(sig(0, 5, 5, 0, 5, 0), 4, 1f)
      == Seq((1, 3), (4, 5)))
    // trailing active run closes at nf
    assert(AudioOps.vadSegments(sig(0, 5, 5), 4, 1f) == Seq((1, 3)))
    // strict >: a frame summing EXACTLY to thr stays inactive
    assert(AudioOps.vadSegments(sig(1, 2), 4, 1f) == Seq((1, 2)))
    // partial tail frame (3 extra loud samples) is dropped, not a segment
    assert(AudioOps.vadSegments(sig(0) ++ Array(9f, 9f, 9f), 4, 1f) == Seq())
    // all silence -> empty; empty input -> empty
    assert(AudioOps.vadSegments(sig(0, 0), 4, 1f) == Seq())
    assert(AudioOps.vadSegments(Array.emptyFloatArray, 4, 1f) == Seq())
  }
}
