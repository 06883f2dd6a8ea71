package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media are opaque `binary` columns + a typed metadata struct; decode /
  * feature-extract run batch-wise over partitions (the Scala analogue of
  * `mapInPandas`: one iterator of bounded batches per task, so decoder
  * state — a model, a codec — is initialized once per batch, never per
  * row, and memory stays bounded regardless of partition size).
  *
  * The actual codec calls are STUBBED (no image/audio libs in this
  * environment): [[StubCodecs]] derives deterministic fake outputs from
  * the bytes. The Spark-side plumbing — schema, batch shape, partition
  * sizing, null/corrupt handling — is real and tested; swapping a real
  * decoder in changes only the function body marked STUB.
  */
object Multimodal {

  /** Canonical media schema: id + raw bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap a (id, binary) DataFrame into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
              format: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(binCol).as("content"),
      struct(lit(format).as("format"),
        coalesce(length(col(binCol)).cast("long"), lit(0L)).as("n_bytes")).as("meta"))

  final case class ImageInfo(mediaId: Long, width: Int, height: Int,
                             channels: Int, ok: Boolean)
  final case class MediaFeature(mediaId: Long, feature: Array[Float])

  /** Batch-wise decode: partitions stream through in `batchSize` groups
    * (mapInPandas batch shape). Corrupt/null content yields ok=false rows
    * instead of failing the task (quarantine semantics, F9). */
  def decodeImages(media: DataFrame, batchSize: Int = 64): Dataset[ImageInfo] = {
    implicit val enc: Encoder[ImageInfo] = Encoders.product[ImageInfo]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        // STUB: per-batch decoder init would happen here (codec/model)
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null || bytes.length < 4)
            ImageInfo(id, 0, 0, 0, ok = false)
          else {
            val (w, h, c) = StubCodecs.decodeDims(bytes)
            ImageInfo(id, w, h, c, ok = true)
          }
        }
      }
    }
  }

  /** Batch-wise feature extraction: binary → fixed-dim float vector
    * (joins the ANN/near-dup pipeline via graft.ext.Similarity). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): Dataset[MediaFeature] = {
    implicit val enc: Encoder[MediaFeature] = Encoders.product[MediaFeature]
    media.select("media_id", "content").mapPartitions { rows: Iterator[Row] =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          MediaFeature(r.getLong(0), StubCodecs.embed(bytes, dim))
        }
      }
    }
  }

  /** Video frame sampling: every `stride`-th frame index up to nFrames
    * (frame boundaries from metadata; extraction itself is the decode
    * stub's job). Pure column expression — no data movement. */
  def sampleFrameIndexes(media: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))))
}

/** STUB codec layer — deterministic fakes standing in for image/audio
  * libraries unavailable in this environment. Every output is a pure
  * function of the input bytes, so tests are reproducible. */
object StubCodecs {

  /** STUB decode: dims derived from a hash of the leading bytes (a real
    * impl would parse the codec header / hand off to a decoder). */
  def decodeDims(bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    val lim = math.min(bytes.length, 16)
    while (i < lim) { h = 31 * h + bytes(i); i += 1 }
    val w = 16 + (math.abs(h) % 1024).toInt
    val hgt = 16 + (math.abs(h >> 10) % 1024).toInt
    ((w, hgt, 3))
  }

  /** STUB embedding: bytes folded into a deterministic unit-ish vector. */
  def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      acc(d) += ((bytes(i) & 0xFF) - 127.5f) / 127.5f
      i += 1
    }
    val norm = math.sqrt(acc.map(x => x * x).sum).toFloat max 1e-6f
    acc.map(_ / norm)
  }
}
