package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed decoded-media record; top-level so Spark derives its Encoder. */
final case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    width: Int,
    height: Int,
    feature: Array[Float],
)

/** Typed REAL-decode record ([[Multimodal.decodeImage]]): raster
  * dimensions + channel count from the decoded image, pixel-derived
  * feature stats. Top-level so Spark derives its Encoder. */
final case class DecodedImage(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    width: Int,
    height: Int,
    channels: Int,
    feature: Array[Float],
)

/** Typed REAL multi-frame decode record ([[Multimodal.decodeFrames]]):
  * one row per sampled frame of an animated container (GIF — the one
  * multi-frame format the JDK decodes natively). Top-level so Spark
  * derives its Encoder. */
final case class DecodedFrame(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    n_frames: Int,
    frame_index: Int,
    width: Int,
    height: Int,
    feature: Array[Float],
)

/** Typed REAL audio-decode record ([[Multimodal.decodeAudio]]): PCM
  * stream parameters + sample-derived feature stats. Top-level so
  * Spark derives its Encoder. */
final case class DecodedAudio(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    sample_rate: Float,
    channels: Int,
    bit_depth: Int,
    n_frames: Long,
    duration_sec: Double,
    feature: Array[Float],
)

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per partition in bounded
  * batches.
  *
  * The Spark-side mechanics are real and tested — schema contracts,
  * partition-parallel batch iteration (the JVM analogue of
  * `mapInPandas`: one bounded batch of rows at a time, never the whole
  * partition materialized), metadata propagation. Image decoding is
  * REAL: [[decodeImage]]/[[decodeImages]] decode actual PNG/JPEG/BMP/
  * GIF byte streams via `javax.imageio` (JDK built-in — no external
  * codec), and [[decodeFrames]]/[[decodeVideoFrames]] extract REAL
  * per-frame rasters from multi-frame containers (animated GIF — the
  * one the JDK ships a decoder for; MP4/WebM take an FFmpeg-backed
  * decoder behind the same signature in production). [[decodeStub]]
  * remains only for the DuckDB-oracle query over the synthetic
  * (text-payload) testdata, where both engines must express the same
  * deterministic fake.
  *
  * At 100 TB: media blobs dominate row size, so the batch size bounds
  * executor memory (`batchSize` rows per decode batch), and
  * decode-heavy stages should be repartitioned to cores x executors
  * before this map — both are the caller's knobs here.
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
  ))

  /** Schema of [[decode]]'s output — the [[DecodedMedia]] encoder's
    * schema (primitives non-nullable). */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false)),
  ))

  /** Wrap a text table as a media table (binary payload + metadata) —
    * the ingestion shape for real media directories
    * (`spark.read.format("binaryFile")` in production). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        lit("image/stub").as("media_type"),
        length(encode(col(payloadCol), "UTF-8")).cast(LongType).as("byte_len"),
        md5(col(payloadCol)).as("content_hash")).as("meta"))

  /** REAL image decode — `javax.imageio` ships with the JDK, so
    * PNG/JPEG/BMP/GIF need no external codec. Returns raster
    * dimensions, the color model's channel count, and a pixel-derived
    * feature: [meanR, meanG, meanB, meanLuma, stdLuma, aspect(w/h)],
    * channel means in [0,1], luma = Rec.601. `None` for byte streams
    * no installed reader accepts (corrupt/unknown container) — the
    * caller decides drop vs quarantine; a decode failure must never
    * kill a 100 TB job. Runs executor-side inside [[decodeImages]]'s
    * bounded batches; `ImageIO` disk caching is off (a temp-file write
    * per blob would turn a CPU-bound decode into an IO-bound one). */
  def decodeImage(docId: Long, mediaType: String,
      bytes: Array[Byte]): Option[DecodedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // IIOException on corrupt streams
    if (img == null) None
    else {
      val feature = pixelFeature(img)
      Some(DecodedImage(docId, mediaType, bytes.length.toLong,
        img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, feature))
    }
  }

  /** The shared pixel-stat pass: [meanR, meanG, meanB, meanLuma,
    * stdLuma, aspect(w/h)], channel means in [0,1], luma = Rec.601. */
  private def pixelFeature(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr, sg, sb, sy, syy = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = ((rgb >> 16) & 0xff) / 255.0
        val g = ((rgb >> 8) & 0xff) / 255.0
        val b = (rgb & 0xff) / 255.0
        sr += r; sg += g; sb += b
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sy += luma; syy += luma * luma
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val meanY = sy / n
    val stdY = math.sqrt(math.max(0.0, syy / n - meanY * meanY))
    Array((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      meanY.toFloat, stdY.toFloat, w.toFloat / h)
  }

  /** REAL multi-frame decode — the video pillar's frame-extraction
    * path, exercised on the one multi-frame container the JDK decodes
    * natively (animated GIF; MP4/WebM need codecs the JDK does not
    * ship, so those containers return None here and a production
    * deployment drops in an FFmpeg-backed decoder behind this same
    * signature). `ImageIO.getImageReaders` picks the container's
    * reader, `getNumImages(true)` counts frames, and every `stride`-th
    * frame (capped at `maxFrames`) decodes through the same pixel-stat
    * pass as [[decodeImage]] — one [[DecodedFrame]] row per sampled
    * frame, carrying (n_frames, frame_index) so downstream sampling is
    * auditable. Frames decode as STORED: GIF frames may be smaller
    * than the logical screen (frame rects) — width/height are the
    * frame's own raster dims. Fail-soft like every decoder here:
    * corrupt or single-image-only streams yield what they can, never
    * an exception. */
  def decodeFrames(docId: Long, mediaType: String, bytes: Array[Byte],
      stride: Int = 1, maxFrames: Int = Int.MaxValue): Seq[DecodedFrame] = {
    require(stride >= 1, "stride must be >= 1")
    javax.imageio.ImageIO.setUseCache(false)
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return Nil
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true) // full scan; exact for GIF
        (0 until n by stride).take(maxFrames).flatMap { i =>
          val img =
            try reader.read(i)
            catch { case _: Exception => null } // corrupt frame: skip it
          if (img == null) None
          else Some(DecodedFrame(docId, mediaType, bytes.length.toLong,
            n, i, img.getWidth, img.getHeight, pixelFeature(img)))
        }
      } finally reader.dispose()
    } catch { case _: Exception => Nil }
    finally iis.close()
  }

  /** [[decodeImages]]'s multi-frame twin: bounded-batch typed
    * `mapPartitions`, [[decodeFrames]] per blob — each blob fans out
    * to its sampled frames, so cap the fan-out with `stride`/
    * `maxFrames` (a 10k-frame clip at stride 1 is 10k rows). */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame,
      stride: Int = 1, maxFrames: Int = Int.MaxValue,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast(LongType).as("doc_id"),
        col("meta.media_type").as("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, mt, bytes) =>
            decodeFrames(id, mt, bytes, stride, maxFrames) }
        }
      }
      .toDF()
  }

  /** [[decode]] with the REAL codec: same bounded-batch typed
    * `mapPartitions` shape, [[decodeImage]] per blob; undecodable blobs
    * are dropped (count them upstream via an `is_decodable` pass if the
    * drop rate matters). */
  def decodeImages(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast(LongType).as("doc_id"),
        col("meta.media_type").as("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, mt, bytes) =>
            decodeImage(id, mt, bytes) }
        }
      }
      .toDF()
  }

  /** REAL audio decode — `javax.sound.sampled` ships with the JDK, so
    * WAV/AIFF/AU PCM containers need no external codec. Returns the
    * stream parameters (sample rate, channels, bit depth, frame count,
    * duration) plus a sample-derived feature vector:
    * [rms, peak, meanAbs, zeroCrossRate] over the channel-mixed mono
    * signal, samples normalized to [-1, 1]. `None` for byte streams no
    * installed reader accepts — same contract as [[decodeImage]]: a
    * decode failure must never kill a 100 TB job. Supports signed and
    * unsigned PCM at 8/16/24/32-bit, both endiannesses, any channel
    * count; non-PCM encodings (u-law, float) return None rather than
    * guessing. */
  def decodeAudio(docId: Long, mediaType: String,
      bytes: Array[Byte]): Option[DecodedAudio] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (in == null) return None
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val nFrames = in.getFrameLength
      if ((!signed && !unsigned) || bits % 8 != 0 || bits > 32 || nFrames < 0)
        return None
      val bytesPerSample = bits / 8
      val raw = in.readAllBytes()
      val frames = math.min(nFrames, raw.length.toLong / (bytesPerSample * ch)).toInt
      val big = fmt.isBigEndian
      val full = 1L << bits
      val half = (1L << (bits - 1)).toDouble
      var sum, sumSq, peak = 0.0
      var zc = 0
      var prev = 0.0
      var f = 0
      while (f < frames) {
        var mix = 0.0
        var c = 0
        while (c < ch) {
          val off = (f * ch + c) * bytesPerSample
          var v = 0L
          var i = 0
          while (i < bytesPerSample) {
            val b = raw(off + (if (big) i else bytesPerSample - 1 - i)) & 0xffL
            v = (v << 8) | b
            i += 1
          }
          // Sign-extend (signed PCM) or re-center (unsigned PCM).
          val s =
            if (unsigned) v - half
            else if (v >= half) v - full
            else v
          mix += s / half
          c += 1
        }
        mix /= ch
        sum += math.abs(mix)
        sumSq += mix * mix
        peak = math.max(peak, math.abs(mix))
        if (f > 0 && ((prev < 0 && mix >= 0) || (prev >= 0 && mix < 0))) zc += 1
        prev = mix
        f += 1
      }
      val n = math.max(frames, 1).toDouble
      Some(DecodedAudio(docId, mediaType, bytes.length.toLong,
        fmt.getSampleRate, ch, bits, frames.toLong,
        frames / fmt.getSampleRate.toDouble,
        Array(math.sqrt(sumSq / n).toFloat, peak.toFloat,
          (sum / n).toFloat, (zc / n).toFloat)))
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** [[decodeImages]]'s audio twin: bounded-batch typed
    * `mapPartitions`, [[decodeAudio]] per blob, undecodable blobs
    * dropped. */
  def decodeAudios(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast(LongType).as("doc_id"),
        col("meta.media_type").as("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, mt, bytes) =>
            decodeAudio(id, mt, bytes) }
        }
      }
      .toDF()
  }

  /** A deterministic stand-in decoder, relegated to ORACLE-PARITY duty:
    * the synthetic testdata carries text payloads, not real images, so
    * the DuckDB-checked query (`q_multimodal_decode`) needs a decode
    * both engines can express — width/height from byte-length, an
    * 8-dim "feature" from the first bytes. Real byte streams go through
    * [[decodeImage]]/[[decodeImages]] (spec-verified on real PNG/JPEG
    * fixtures). */
  def decodeStub(docId: Long, mediaType: String, bytes: Array[Byte]): DecodedMedia = {
    val w = 16 + (bytes.length % 64)
    val h = 16 + ((bytes.length / 64) % 64)
    val feature = (0 until 8).map { i =>
      if (bytes.isEmpty) 0.0f
      else (bytes(i % bytes.length).toInt & 0xff).toFloat / 255.0f
    }.toArray
    DecodedMedia(docId, mediaType, bytes.length.toLong, w, h, feature)
  }

  /** Partition-parallel decode in bounded batches (the mapInPandas
    * analogue): each executor thread pulls `batchSize` rows, decodes
    * them, emits, and only then pulls the next batch. Typed
    * `Dataset.mapPartitions` (NOT an `.rdd` round trip) so rows stay in
    * Tungsten binary form and the map fuses into the surrounding
    * codegen stages — the codec call is the only deserialization
    * point. */
  def decode(spark: SparkSession, media: DataFrame, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast(LongType).as("doc_id"),
        col("meta.media_type").as("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) }
        }
      }
      .toDF()
  }

  /** Deterministic frame sampling plumbing for video-like payloads:
    * pick every `stride`-th chunk index of the payload. This is the
    * pure-Column PLANNING shape (and the oracle-expressible one —
    * `q_multimodal_frames` runs it over the text-payload testdata);
    * real frame extraction is [[decodeFrames]]. */
  def frameSampleIndexes(byteLen: org.apache.spark.sql.Column, chunk: Int,
      stride: Int): org.apache.spark.sql.Column =
    filter(
      sequence(lit(0), greatest((byteLen / chunk).cast("int") - 1, lit(0))),
      i => i % stride === 0)

  /** REAL pixel resize — the execution half of [[resizeDims]]: decode
    * via `javax.imageio`, resample with bilinear interpolation to the
    * exact dimensions [[resizeDims]] plans (same rule: scale the long
    * edge to `targetLongEdge`, never upscale, floor, clamp at 1px),
    * re-encode as PNG (lossless — the training-data norm for
    * intermediate storage). Returns (png bytes, out_w, out_h); `None`
    * on undecodable input, same fail-soft contract as [[decodeImage]]. */
  def resizeImage(bytes: Array[Byte],
      targetLongEdge: Int): Option[(Array[Byte], Int, Int)] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val mx = math.max(w, h)
      val (ow, oh) =
        if (mx <= targetLongEdge) (w, h)
        else (math.max(1, (w.toLong * targetLongEdge / mx).toInt),
          math.max(1, (h.toLong * targetLongEdge / mx).toInt))
      val out = new java.awt.image.BufferedImage(ow, oh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some((bos.toByteArray, ow, oh))
    }
  }

  /** Batched DataFrame resize: same bounded-batch typed mapPartitions
    * shape as [[decodeImages]]; emits (doc_id, media_type, content =
    * resized png, width, height), undecodable blobs dropped. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetLongEdge: Int, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast(LongType).as("doc_id"),
        col("meta.media_type").as("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, mt, bytes) =>
            resizeImage(bytes, targetLongEdge).map { case (b, w, h) =>
              (id, mt, b, w, h) }
          }
        }
      }
      .toDF("doc_id", "media_type", "content", "width", "height")
  }

  /** Aspect-preserving resize DIMENSIONS, as pure Column integer math
    * (no UDF — stays in whole-stage codegen): scale the long edge down
    * to `targetLongEdge` (never upscale), floor the short edge, clamp
    * at 1px. This is the planning half of a resize; the pixel
    * transform itself is a codec call that belongs next to
    * [[decodeStub]] in the batched decode. `w*t` stays < 2^53 for any
    * sane dimensions so the floor over the double division is exact. */
  def resizeDims(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      targetLongEdge: Int): org.apache.spark.sql.Column = {
    val w = width.cast(LongType)
    val h = height.cast(LongType)
    val mx = greatest(w, h)
    val t = lit(targetLongEdge.toLong)
    def scaled(e: org.apache.spark.sql.Column) =
      greatest(lit(1L), floor(e * t / mx).cast(LongType))
    struct(
      when(mx <= t, w).otherwise(scaled(w)).as("out_w"),
      when(mx <= t, h).otherwise(scaled(h)).as("out_h"))
  }
}
