package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO}

/** REAL multi-frame decode ([[Multimodal.decodeFrames]]/
  * [[Multimodal.decodeVideoFrames]]) on the one multi-frame container
  * the JDK decodes natively: animated GIF. Fixtures are written right
  * here with `ImageIO`'s GIF sequence writer — N frames of distinct
  * solid colors — so frame count, sampled indexes, per-frame
  * dimensions, and per-frame pixel stats are all asserted against
  * exact ground truth (solid primaries survive GIF palettization
  * losslessly). This replaces byte-chunk `frameSampleIndexes` duty
  * with actual frame extraction (r6 verdict task #4). */
class AnimatedGifDecodeSpec extends SparkSpec {

  /** Animated GIF of solid-color frames, written with the JDK's own
    * sequence writer so the expected pixels are known exactly. */
  private def animatedGif(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      writer.writeToSequence(new IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  // red, green, blue, white — distinct per frame, all palette-exact
  private val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
  private lazy val gif4 = animatedGif(colors, w = 6, h = 4)

  test("every frame decodes with exact dims, index, and solid-color stats") {
    val frames = Multimodal.decodeFrames(7L, "image/gif", gif4)
    assert(frames.length == 4, s"expected 4 frames, got ${frames.length}")
    assert(frames.forall(_.n_frames == 4))
    assert(frames.map(_.frame_index) == Seq(0, 1, 2, 3))
    assert(frames.forall(f => f.width == 6 && f.height == 4))
    assert(frames.forall(f => f.doc_id == 7L && f.byte_len == gif4.length))
    frames.zip(colors).foreach { case (f, c) =>
      val Seq(er, eg, eb) =
        Seq(16, 8, 0).map(s => ((c >> s) & 0xff).toFloat / 255.0f)
      assert(f.feature(0) == er && f.feature(1) == eg && f.feature(2) == eb,
        s"frame ${f.frame_index}: got rgb means " +
          s"(${f.feature(0)}, ${f.feature(1)}, ${f.feature(2)}), " +
          s"expected ($er, $eg, $eb)")
      // sqrt(E[x^2] - E[x]^2) on identical values leaves ~1e-8 of
      // catastrophic-cancellation noise; zero up to float tolerance
      assert(f.feature(4) < 1e-6f, "solid frame must have ~zero luma spread")
      assert(f.feature(5) == 1.5f, "aspect 6/4")
    }
  }

  test("stride and maxFrames sample the expected frame indexes") {
    assert(Multimodal.decodeFrames(1L, "image/gif", gif4, stride = 2)
      .map(_.frame_index) == Seq(0, 2))
    assert(Multimodal.decodeFrames(1L, "image/gif", gif4, stride = 3)
      .map(_.frame_index) == Seq(0, 3))
    assert(Multimodal.decodeFrames(1L, "image/gif", gif4, maxFrames = 1)
      .map(_.frame_index) == Seq(0))
  }

  test("single-image containers and corrupt streams fail soft") {
    val png = {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val one = Multimodal.decodeFrames(2L, "image/png", png)
    assert(one.length == 1 && one.head.n_frames == 1 && one.head.frame_index == 0)
    assert(Multimodal.decodeFrames(3L, "video/mp4",
      Array.fill[Byte](64)(0x2a)).isEmpty, "no JDK reader: must yield Nil")
  }

  test("decodeVideoFrames: bounded-batch DataFrame fan-out, bad blobs dropped") {
    import spark.implicits._
    val media = Seq(
        (10L, gif4),
        (11L, Array.fill[Byte](32)(0x00)), // undecodable
      ).toDF("doc_id", "content")
      .select(col("doc_id"), col("content"),
        struct(lit("image/gif").as("media_type"),
          length(col("content")).cast("long").as("byte_len"),
          lit("h").as("content_hash")).as("meta"))
    val out = Multimodal.decodeVideoFrames(spark, media, stride = 2,
        maxFrames = 10, batchSize = 2)
      .orderBy("doc_id", "frame_index").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(4))).toSeq ==
      Seq((10L, 0), (10L, 2)), s"got: ${out.mkString(" ")}")
    assert(out.forall(_.getInt(3) == 4), "n_frames carried per row")
  }
}
