package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed in partition-sized batches.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real; the
  * actual media decode is STUBBED behind [[MediaCodec.decodeStub]] — the
  * image/audio libraries are not in this container. Swapping the stub for
  * javacv/ffmpeg is a one-function change; everything else (columnar
  * transport, per-partition batching, skew-aware repartition by size) stays.
  */
object Multimodal {

  /** Typed media row: binary payload + extracted metadata. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, media_type: String,
                             width: Int, height: Int, n_frames: Int)

  /** What a real decoder would return for one payload. */
  final case class Decoded(mediaType: String, width: Int, height: Int,
                           nFrames: Int)

  object MediaCodec {
    /** STUB — deterministic fake decode. A real implementation would parse the
      * container header (JPEG SOF / WAV fmt / MP4 moov) from `bytes`. The fake
      * derives stable pseudo-dimensions from payload bytes so tests are
      * deterministic and engine-independent. */
    def decodeStub(bytes: Array[Byte]): Decoded = {
      val h = graft.functions.RollingHash.hashBytes(bytes)
      val mt = (java.lang.Long.remainderUnsigned(h, 3L)) match {
        case 0L => "image" case 1L => "audio" case _ => "video"
      }
      Decoded(mt,
        width = 160 + (java.lang.Long.remainderUnsigned(h >>> 8, 8L) * 160).toInt,
        height = 120 + (java.lang.Long.remainderUnsigned(h >>> 16, 8L) * 120).toInt,
        nFrames = 1 + java.lang.Long.remainderUnsigned(h >>> 24, 240L).toInt)
    }
  }

  /** Attach a payload column: treat the UTF-8 text bytes as the opaque media
    * payload (fixture stand-in for real image/audio bytes). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Decode/feature-extract pass: per-partition batch processing over the
    * binary column — the Scala analog of `mapInPandas` (each partition is
    * processed as one streaming batch of rows; no per-row JVM⇄native churn
    * once a real codec is behind the stub). */
  def extractMetadata(spark: SparkSession, docs: DataFrame,
                      idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    val payloads = withPayload(docs).select(col(idCol).cast("long"), col("payload"))
    payloads.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val d = MediaCodec.decodeStub(bytes)
        MediaMeta(id, bytes.length.toLong, d.mediaType, d.width, d.height, d.nFrames)
      }
    }
  }

  /** Frame sampling plan: every `stride`-th frame index per video — the
    * shuffle-free explode that a frame-extraction stage would feed. */
  def frameSamplePlan(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    meta.toDF()
      .filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"))
  }

  /** Size-aware repartition: media payloads are heavily skewed (a 4 GB video
    * next to a 30 kB icon); balance partitions by cumulative byte size, not
    * row count, before the expensive decode stage. */
  def repartitionBySize(docs: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val sized = withPayload(docs).withColumn("__bytes", octet_length(col("payload")))
    val total = sized.agg(sum(col("__bytes"))).head().getLong(0)
    val parts = math.max(1, (total / targetBytesPerPartition).toInt)
    sized.repartitionByRange(parts, col("__bytes"), col("doc_id")).drop("__bytes")
  }
}
