package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video as opaque BINARY with typed metadata.
 *
 * The Spark-side plumbing — schema, magic-byte sniffing, partition-wise batched
 * decode, frame-sample explode — is real and tested; the actual media decoding
 * is STUBBED with a deterministic fake (this container ships no image/audio
 * codecs). Every stub is marked `STUB:` and would be swapped for a real codec
 * (or a pandas UDF via mapInPandas on a PySpark deployment) without touching
 * the surrounding plan shape: the decode runs inside `mapPartitions`, one
 * decoder context per partition, iterator-in/iterator-out so Spark's batching
 * and spill behavior apply unchanged.
 */
object Multimodal {

  /** Typed decode output (what a real image decoder would yield). */
  final case class DecodedMeta(mediaId: Long, kind: String, nBytes: Long,
      width: Int, height: Int, channels: Int, meanLuma: Double)

  final case class MediaRow(mediaId: Long, kind: String, bytes: Array[Byte])

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private val JpegMagic = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
  private val RiffMagic = Array[Byte]('R', 'I', 'F', 'F')

  /** Deterministic synthetic media table (media_id, kind, bytes BINARY):
   * payloads carry real magic headers so sniffing is meaningful. */
  def synthesizeMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kindIdx = (id % 3).toInt
      val (kind, magic) = kindIdx match {
        case 0 => ("image/png", PngMagic)
        case 1 => ("image/jpeg", JpegMagic)
        case _ => ("audio/wav", RiffMagic)
      }
      val len = 64 + ((seed * 31 + id * 131) % 192).toInt.abs
      val body = Array.tabulate(len)(i => ((seed + id * 7 + i * 13) % 251).toByte)
      MediaRow(id, kind, magic ++ body)
    }
  }

  /** Magic-byte MIME sniffing as a pure column expression (codegen; the hex of
   * the first 4 bytes is compared — no UDF). */
  def sniffKind(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = lower(hex(substring(bytes, 1, 4)))
    when(h === "89504e47", "image/png")
      .when(h.startsWith("ffd8ff"), "image/jpeg")
      .when(h === "52494646", "audio/wav")
      .otherwise("application/octet-stream")
  }

  /** STUB: deterministic fake image/audio decode. A real deployment replaces
   * ONLY this function body with a codec call (e.g. javax.imageio / ffmpeg, or
   * a pandas UDF batch on PySpark); the mapPartitions plumbing stays. */
  def decodeStub(id: Long, kind: String, bytes: Array[Byte]): DecodedMeta = {
    val h = java.util.Arrays.hashCode(bytes)
    val w = 16 + math.abs(h % 1024)
    val ht = 16 + math.abs((h / 1024) % 1024)
    DecodedMeta(id, kind, bytes.length.toLong, w, ht,
      channels = if (kind.startsWith("image")) 3 else 1,
      meanLuma = math.abs(h % 256).toDouble / 255.0)
  }

  /** Partition-wise batched decode: one decoder context per partition,
   * iterator-in/iterator-out (constant memory per batch). */
  def decodeMeta(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // STUB: a real decoder would allocate its native context here, once per
      // partition, and close it when the iterator drains.
      it.map(m => decodeStub(m.mediaId, m.kind, m.bytes))
    }
  }

  /** Frame sampling for video-like payloads: emits one row per sampled frame
   * index (explode over a computed frame count) — plan-shape-identical to real
   * frame extraction; frame bytes are STUB-derived slices. */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame = {
    val frames = (length(col("bytes")) / lit(32)).cast("int").as("n_frames")
    media
      .withColumn("n_frames", frames)
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyNth))))
      // STUB: real extraction decodes the frame; here it's a 32-byte slice
      .withColumn("frame_bytes", col("bytes").substr(col("frame_idx") * 32 + 1, lit(32)))
      .select(col("mediaId").as("media_id"), col("frame_idx"), col("frame_bytes"))
  }
}
