package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Audio tier ([[Multimodal.syntheticWav]] / [[Multimodal.audioFeatures]]):
 * the generator emits genuine RIFF streams, the parser walks chunks
 * (padding, extra chunks, malformed input), and features match a scalar
 * reference exactly.
 */
class AudioSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  private def wav(samples: Seq[Short], rate: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.size * 2
    val extra = if (extraChunk) 8 + 3 + 1 else 0 // odd-length chunk + pad
    val buf = java.nio.ByteBuffer.allocate(44 + extra + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(rate)
      .putInt(rate * 2).putShort(2.toShort).putShort(16.toShort)
    if (extraChunk) // a LIST-style chunk with odd length (RIFF pads to even)
      buf.put("LIST".getBytes("US-ASCII")).putInt(3)
        .put(Array[Byte](7, 8, 9)).put(0.toByte)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  private def feats(payload: Array[Byte]): Multimodal.AudioFeatures =
    Multimodal.audioFeatures(
      Seq(Multimodal.MediaRow(1L, "audio/wav", payload)).toDS()).head()

  test("hand-computed features on a tiny signal") {
    val f = feats(wav(Seq[Short](100, -100)))
    assert(f === Multimodal.AudioFeatures(1L, 8000, 2L, 0L, 100L, 100000L, 1L))
  }

  test("zero crossings skip zeros, count sign flips only") {
    // 1000 -> -1000 (1), -1000 -> 1000 (2), 1000 -> 0 (skip), 0 -> -5 (3)
    val f = feats(wav(Seq[Short](1000, -1000, 1000, 0, -5)))
    assert(f.zero_crossings === 3L)
    assert(f.peak_abs === 1000L)
  }

  test("chunk walk skips extra odd-length chunks before data") {
    val f = feats(wav(Seq[Short](5, -5, 5), extraChunk = true))
    assert(f.sample_rate === 8000 && f.n_samples === 3L)
  }

  test("synthetic WAVs parse and match a scalar reference") {
    for (id <- Seq(0L, 3L, 7L, 15L)) {
      val bytes = Multimodal.syntheticWav(id)
      val Some((rate, samples)) = Multimodal.parseWavPcm16(bytes)
      assert(rate === 8000)
      assert(samples.length === (800 + (id % 5) * 400).toInt)
      val f = feats(bytes)
      val peak = samples.map(s => math.abs(s.toLong)).max
      val sumSq = samples.map(s => s.toDouble * s).sum
      val rms = math.floor(math.sqrt(sumSq / samples.length) * 1000.0).toLong
      assert(f.peak_abs === peak)
      assert(f.rms_milli === rms)
      assert(f.duration_ms === samples.length * 1000L / 8000L)
      // a pure f-Hz sine crosses zero ~2f times per second
      val freq = 220.0 + (id % 16) * 55.0
      val expectZc = 2.0 * freq * samples.length / 8000.0
      assert(math.abs(f.zero_crossings - expectZc) <= 2.0,
        s"id=$id zc=${f.zero_crossings} expect~$expectZc")
    }
  }

  test("near-Int.MaxValue chunk length cannot overflow the bounds guard") {
    // a crafted data-chunk length of 0x7FFFFFF0 makes `off + 8 + clen`
    // overflow negative in int arithmetic, bypassing the guard and
    // crashing downstream; the Long-typed guard rejects it -> sentinel
    val bytes = wav(Seq[Short](1, 2))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 0x7FFFFFF0) // data chunk length field
    assert(Multimodal.parseWavPcm16(bytes).isEmpty)
    assert(feats(bytes).sample_rate === -1)
  }

  test("malformed and non-PCM16 payloads yield the sentinel, not a crash") {
    assert(feats(Array[Byte](1, 2, 3)).sample_rate === -1)
    assert(feats(Array.empty[Byte]).sample_rate === -1)
    // valid RIFF but 8-bit format: rejected by the fmt gate
    val bad = wav(Seq[Short](1, 2))
    bad(34) = 8 // bits-per-sample 16 -> 8
    assert(feats(bad).sample_rate === -1)
  }
}
