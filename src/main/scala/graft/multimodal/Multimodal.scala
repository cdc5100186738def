package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed in partition-sized batches.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real, and
  * so is container-HEADER metadata extraction ([[MediaCodec.parseHeader]]:
  * PNG/JPEG/GIF/BMP dimensions, WAV rate/channels/samples — pure byte
  * layout, no codec library). Pixel/sample DATA decode is STUBBED behind
  * [[MediaCodec.decodeStub]] — the image/audio libraries are not in this
  * container. Swapping the stub for javacv/ffmpeg is a one-function change;
  * everything else (columnar transport, per-partition batching, skew-aware
  * repartition by size) stays.
  */
object Multimodal {

  /** Typed media row: binary payload + extracted metadata. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, media_type: String,
                             width: Int, height: Int, n_frames: Int)

  /** What a real decoder would return for one payload. */
  final case class Decoded(mediaType: String, width: Int, height: Int,
                           nFrames: Int)

  object MediaCodec {
    /** REAL container-header metadata decode for the formats whose headers
      * are pure byte layout (no codec library needed): PNG / JPEG / GIF /
      * BMP dimensions and WAV channel/sample-rate/sample-count. Returns
      * None for unrecognized payloads. For audio, `width` carries the
      * sample rate, `height` the channel count, and `nFrames` the PCM
      * sample-frame count. Pixel/sample DATA decode still needs a codec —
      * that part remains stubbed. */
    def parseHeader(bytes: Array[Byte]): Option[Decoded] = {
      def u8(i: Int) = bytes(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def ascii(i: Int, s: String) =
        bytes.length >= i + s.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
      val n = bytes.length
      if (n >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a)
        // PNG: fixed 8-byte signature, IHDR is always the first chunk —
        // width/height are the big-endian ints at offsets 16/20
        Some(Decoded("image", be32(16), be32(20), 1))
      else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk marker segments to the first SOFn (C0-CF minus the
        // non-frame C4/C8/CC); height/width are at +5/+7 inside it
        var i = 2
        var out: Option[Decoded] = None
        while (out.isEmpty && i + 9 < n && u8(i) == 0xff) {
          val m = u8(i + 1)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
            out = Some(Decoded("image", be16(i + 7), be16(i + 5), 1))
          else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i += 2 // bare marker
          else i += 2 + be16(i + 2)
        }
        out
      }
      else if (n >= 14 && (ascii(0, "GIF87a") || ascii(0, "GIF89a"))
               && le16(6) > 0 && le16(8) > 0 && {
                 // GIF's magic is pure ASCII, so demand the structure too:
                 // past the 13-byte header (+ global color table if its flag
                 // is set) must sit an image descriptor / extension / trailer
                 val packed = u8(10)
                 val gct = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0
                 val intro = 13 + gct
                 intro < n && (u8(intro) == 0x2c || u8(intro) == 0x21 || u8(intro) == 0x3b)
               })
        Some(Decoded("image", le16(6), le16(8), 1))
      // BMP's magic is two ASCII letters — demand the header's file-size
      // field match the payload so prose starting with "BM" never sniffs
      else if (n >= 26 && ascii(0, "BM") && le32(2) == n && le32(18) > 0)
        Some(Decoded("image", le32(18), math.abs(le32(22)), 1))
      else if (n >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE")) {
        // WAV: scan RIFF chunks for fmt (rate/channels/block align) + data.
        // The chunk size is UNTRUSTED input: a crafted/corrupt 32-bit size
        // can be negative as an int (stalling the loop forever or driving
        // the index negative) — read it unsigned and bail on nonsense.
        var i = 12
        var rate = 0; var ch = 0; var align = 0; var dataLen = -1
        var bad = false
        while (!bad && i + 8 <= n && (rate == 0 || dataLen < 0)) {
          val sz = le32(i + 4).toLong & 0xffffffffL
          if (ascii(i, "fmt ") && i + 24 <= n) {
            ch = le16(i + 10); rate = le32(i + 12); align = le16(i + 20)
          } else if (ascii(i, "data")) dataLen = le32(i + 4)
          val next = i.toLong + 8L + sz + (sz & 1L) // chunks are word-aligned
          if (next <= i || next > Int.MaxValue) bad = true else i = next.toInt
        }
        if (!bad && rate > 0 && ch > 0 && align > 0 && dataLen >= 0)
          Some(Decoded("audio", rate, ch, dataLen / align))
        else None
      }
      else None
    }

    /** STUB — deterministic fake decode for payloads [[parseHeader]] doesn't
      * recognize (and for pixel/sample data, which needs a real codec). The
      * fake derives stable pseudo-dimensions from payload bytes so tests are
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

    /** Header metadata when the container is recognized, stub otherwise. */
    def decode(bytes: Array[Byte]): Decoded =
      parseHeader(bytes).getOrElse(decodeStub(bytes))
  }

  /** Attach a payload column. A dataset that already carries a binary
    * `payload` column (real media bytes) passes through untouched; otherwise
    * the UTF-8 text bytes stand in for the opaque media payload (fixture
    * stand-in for real image/audio bytes). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    if (docs.columns.contains("payload")) docs
    else docs.withColumn("payload", col(textCol).cast("binary"))

  /** Decode/feature-extract pass: per-partition batch processing over the
    * binary column — the Scala analog of `mapInPandas` (each partition is
    * processed as one streaming batch of rows; no per-row JVM⇄native churn
    * once a real codec is behind the stub). */
  def extractMetadata(spark: SparkSession, docs: DataFrame,
                      idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    // scraped corpora carry null payloads and null ids; a null either way
    // would NPE the task (or fail the non-nullable encoder) — null ids are
    // undecodable rows (dropped), null payloads decode as empty
    val payloads = withPayload(docs)
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"),
        coalesce(col("payload"), lit(Array.emptyByteArray)).as("payload"))
    payloads.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val d = MediaCodec.decode(bytes)
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
    * next to a 30 kB icon); size the partition COUNT by total bytes and
    * spread rows by id hash, so expected bytes per partition ≈ the target.
    *
    * Deliberately NOT repartitionByRange on the size column: ranging on size
    * sorts similar sizes together — all the giant payloads land in the top
    * range partition, the exact skew this function exists to remove. Hash
    * placement is size-oblivious, so partitions converge to the target in
    * expectation; a single payload larger than the target is irreducible
    * either way (a row cannot split). */
  def repartitionBySize(docs: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val sized = withPayload(docs).withColumn("__bytes", octet_length(col("payload")))
    // empty increment → no-op single partition, not an NPE on a null SUM
    val total = Option(sized.agg(sum(col("__bytes"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val parts = math.max(1, (total / math.max(1L, targetBytesPerPartition)).toInt)
    sized.repartition(parts, col("doc_id")).drop("__bytes")
  }
}
