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

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per partition in bounded
  * batches.
  *
  * The Spark-side mechanics are real and tested — schema contracts,
  * partition-parallel batch iteration (the JVM analogue of
  * `mapInPandas`: one bounded batch of rows at a time, never the whole
  * partition materialized), metadata propagation. The actual media
  * decoding is STUBBED (`decodeStub`) because no image/audio codec
  * library ships in this environment: it derives deterministic fake
  * dimensions/features from the bytes. Swapping in a real decoder
  * changes only that one function.
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

  /** ??? in spirit — a deterministic stand-in for the media decoder:
    * width/height from byte-length, an 8-dim "feature" from the first
    * bytes. Replace with a real codec call; the batching around it is
    * the part that matters. */
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
    * pick every `stride`-th chunk index of the payload. */
  def frameSampleIndexes(byteLen: org.apache.spark.sql.Column, chunk: Int,
      stride: Int): org.apache.spark.sql.Column =
    filter(
      sequence(lit(0), greatest((byteLen / chunk).cast("int") - 1, lit(0))),
      i => i % stride === 0)

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
