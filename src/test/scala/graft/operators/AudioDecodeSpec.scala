package graft.operators

import graft.SparkSpec

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio decode ([[Multimodal.decodeAudio]]/[[Multimodal.decodeAudios]]):
  * actual WAV byte streams — encoded right here with `AudioSystem.write`
  * from synthesized PCM, so sample rate, frame count, and the signal's
  * RMS/peak/zero-cross stats are known exactly — decoded through the
  * same bounded-batch `mapPartitions` plumbing as the image path. The
  * audio pillar's codec is as real as the image one: `javax.sound.
  * sampled` is JDK built-in, no external library.
  */
class AudioDecodeSpec extends SparkSpec {

  /** Encode `samples` (mono doubles in [-1,1]) as a 16-bit signed
    * little-endian PCM WAV container. */
  private def wav16(samples: Array[Double], sampleRate: Float): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      val v = math.max(-32768, math.min(32767,
        math.round(samples(i) * 32767).toInt))
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Encode mono bytes as 8-bit UNSIGNED PCM WAV (the other sample
    * layout: no sign bit, re-centered at 128). */
  private def wav8u(samples: Array[Int], sampleRate: Float): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 8, 1, false, false)
    val raw = samples.map(v => (v & 0xff).toByte)
    val in = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 8000 Hz mono sine at 1000 Hz, amplitude 0.5, exactly 0.1 s. */
  private lazy val sineWav: Array[Byte] = {
    val sr = 8000
    val n = 800
    wav16(Array.tabulate(n)(i =>
      0.5 * math.sin(2 * math.Pi * 1000 * i / sr)), sr.toFloat)
  }

  test("WAV decode: exact stream parameters and signal stats") {
    val d = Multimodal.decodeAudio(1L, "audio/wav", sineWav).get
    assert(d.sample_rate == 8000f)
    assert(d.channels == 1 && d.bit_depth == 16)
    assert(d.n_frames == 800L, s"frames ${d.n_frames}")
    assert(math.abs(d.duration_sec - 0.1) < 1e-9)
    assert(d.byte_len == sineWav.length)
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ~ 0.35355
    assert(math.abs(d.feature(0) - 0.35355f) < 1e-3, s"rms ${d.feature(0)}")
    assert(math.abs(d.feature(1) - 0.5f) < 1e-3, s"peak ${d.feature(1)}")
    // mean |x| at 8 samples/cycle (phases k*pi/4): A*(2 + 4*sqrt(2)/2)/8
    // = 0.5 * 0.60355 ~ 0.30178 — the discrete grid, not 2A/pi
    assert(math.abs(d.feature(2) - 0.30178f) < 1e-3, s"meanAbs ${d.feature(2)}")
    // 1000 Hz at 8000 Hz sampling: 2 crossings/cycle, 1000 cycles/s
    // -> zero-cross rate = 2*1000/8000 = 0.25
    assert(math.abs(d.feature(3) - 0.25f) < 0.01, s"zcr ${d.feature(3)}")
  }

  test("silence and DC: degenerate signals decode with exact stats") {
    val silent = Multimodal.decodeAudio(2L, "audio/wav",
      wav16(Array.fill(100)(0.0), 44100f)).get
    assert(silent.sample_rate == 44100f && silent.n_frames == 100L)
    assert(silent.feature(0) == 0.0f && silent.feature(1) == 0.0f
      && silent.feature(3) == 0.0f)
    val dc = Multimodal.decodeAudio(3L, "audio/wav",
      wav16(Array.fill(50)(0.25), 8000f)).get
    assert(math.abs(dc.feature(0) - 0.25f) < 1e-3, "DC RMS = level")
    assert(dc.feature(3) == 0.0f, "DC never crosses zero")
  }

  test("8-bit unsigned PCM: re-centered decode, full-scale square wave") {
    // alternating 0 / 255 ~ full-scale square wave around center 128
    val sq = Multimodal.decodeAudio(4L, "audio/wav",
      wav8u(Array.tabulate(64)(i => if (i % 2 == 0) 0 else 255), 8000f)).get
    assert(sq.bit_depth == 8 && sq.channels == 1 && sq.n_frames == 64L)
    assert(sq.feature(0) > 0.97f, s"square-wave RMS ~1, got ${sq.feature(0)}")
    assert(math.abs(sq.feature(3) - 1.0f) < 0.05,
      "alternating samples cross zero every frame")
  }

  test("corrupt or non-audio bytes decode to None, not an exception") {
    assert(Multimodal.decodeAudio(5L, "audio/wav",
      Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(Multimodal.decodeAudio(6L, "audio/wav",
      sineWav.take(16)).isEmpty, "truncated header fails soft")
  }

  test("decodeAudios: the batched DataFrame path decodes real WAV end to end") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType),
      StructField("meta", Multimodal.mediaMetaSchema)))
    def row(id: Long, b: Array[Byte]) =
      Row(id, b, Row("audio/wav", b.length.toLong, "h" + id))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        row(1L, sineWav),
        row(2L, wav16(Array.fill(100)(0.0), 44100f)),
        row(3L, Array[Byte](9, 9, 9)), // undecodable -> dropped
      ), 2), schema)
    val out = Multimodal.decodeAudios(spark, media, batchSize = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val byId = out.map(r => r.getLong(0) ->
      ((r.getFloat(3), r.getInt(4), r.getInt(5), r.getLong(6)))).toMap
    assert(byId(1L) == ((8000f, 1, 16, 800L)))
    assert(byId(2L) == ((44100f, 1, 16, 100L)))
    assert(out.map(_.getString(1)).toSeq == Seq("audio/wav", "audio/wav"))
  }
}
