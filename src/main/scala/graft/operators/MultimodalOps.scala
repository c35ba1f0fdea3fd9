package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column operators. Media columns are opaque
  * `BinaryType` with typed metadata alongside; decode / feature-extract
  * runs executor-side over `mapPartitions` so a per-partition decoder
  * handle could be reused (here the "decoder" is a deterministic fake —
  * no media libs in this container — but the Spark-side plumbing: schema,
  * partition mapping, batch shape, is the real thing).
  *
  * SURVEY §2.1 S10-S12/K6: reference process_all.py:265-279 (PDF decode),
  * :382-392 (audio decode), push_to_hf.py:125-130 (duration probe).
  */
object MultimodalOps {

  final case class BinFeature(
    path: String, n_bytes: Long, content_md5: String, head: String)

  /** Deterministic per-blob "feature extraction" (stands in for decode /
    * resize / frame-sample): size, content digest, head bytes. */
  def binaryFeatures(df: DataFrame, pathCol: String, contentCol: String): DataFrame = {
    val in = df.select(col(pathCol).cast("string"), col(contentCol))
    in.mapPartitions { rows =>
      // one digest instance per partition — the "decoder handle" pattern
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val path = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        BinFeature(path, bytes.length.toLong, digest,
          new String(bytes.take(16), java.nio.charset.StandardCharsets.US_ASCII))
      }
    }(Encoders.product[BinFeature]).toDF()
  }

  final case class WavInfo(
    path: String, channels: Int, sample_rate: Int, bits_per_sample: Int,
    n_samples: Long, duration_s: Double)

  /** WAV (RIFF/PCM) header probe — real byte parsing, no full decode
    * (the reference's librosa.get_duration(filename=...) shape). */
  def wavProbe(df: DataFrame, pathCol: String, contentCol: String): DataFrame = {
    val in = df.select(col(pathCol).cast("string"), col(contentCol))
    in.mapPartitions { rows =>
      rows.map { r =>
        val path = r.getString(0)
        val b = r.getAs[Array[Byte]](1)
        def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        def le32(o: Int) = (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
          ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
        // canonical 44-byte RIFF header: fmt at 12, data size at 40.
        // Guard short blobs and clamp the declared data size to the bytes
        // actually present (mirrors decodePcm16Wav) — a truncated file
        // must not report inflated duration or throw inside the task.
        if (b == null || b.length < 44) WavInfo(path, 0, 0, 0, 0L, 0.0)
        else {
          val channels = le16(22)
          val rate = le32(24).toInt
          val bps = le16(34)
          val dataBytes = math.min(le32(40), (b.length - 44).toLong).max(0L)
          val nSamples = if (channels > 0 && bps > 0) dataBytes / (channels * bps / 8) else 0L
          val dur = if (rate > 0) nSamples.toDouble / rate else 0.0
          WavInfo(path, channels, rate, bps, nSamples, dur)
        }
      }
    }(Encoders.product[WavInfo]).toDF()
  }
}
