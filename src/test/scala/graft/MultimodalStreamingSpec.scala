package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.streaming.StreamingPipeline

/** Multimodal invariants — header parsing, REAL JDK pixel/sample decode
  * (ImageIO / javax.sound.sampled), batch plumbing — and the Structured
  * Streaming rollup path. */
class MultimodalStreamingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("extractMetadata is deterministic and covers every row") {
    val a = Multimodal.extractMetadata(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    val b = Multimodal.extractMetadata(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(a == b)                               // stub decode is deterministic
    assert(a.size == docs.count())
    a.values.foreach { m =>
      assert(m.byte_len > 0)
      assert(Set("image", "audio", "video")(m.media_type))
      assert(m.width > 0 && m.height > 0 && m.n_frames >= 1)
    }
  }

  test("byte_len matches the utf-8 payload length") {
    val expected = docs.select(col("doc_id"),
      octet_length(col("text").cast("binary")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = Multimodal.extractMetadata(spark, docs).collect()
      .map(m => m.doc_id -> m.byte_len).toMap
    assert(got == expected)
  }

  test("frameSamplePlan emits stride-spaced indices only for videos") {
    val meta = Multimodal.extractMetadata(spark, docs)
    val frames = Multimodal.frameSamplePlan(meta, stride = 30).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val videos = meta.collect().filter(_.media_type == "video")
      .map(m => m.doc_id -> m.n_frames).toMap
    assert(frames.map(_._1).toSet == videos.keySet)
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val idxs = fs.map(_._2).sorted.toSeq
      assert(idxs == (0 until videos(id) by 30))
    }
  }

  test("parseHeader: real PNG/JPEG/GIF/BMP/WAV container bytes") {
    import Multimodal.MediaCodec.parseHeader
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

    // PNG: signature + IHDR length/name + width/height
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array[Byte](8, 2, 0, 0, 0)
    assert(parseHeader(png).contains(Multimodal.Decoded("image", 640, 480, 1)))

    // JPEG: SOI, APP0 segment (skipped), then SOF0 with height/width
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(6) ++ "JFIF".getBytes ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(1080) ++ be16(1920) ++ Array[Byte](3, 0, 0, 0)
    assert(parseHeader(jpeg).contains(Multimodal.Decoded("image", 1920, 1080, 1)))

    // GIF89a with LE dims: 13-byte header (no color table) + trailer
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++
      Array[Byte](0, 0, 0, 0x3b)
    assert(parseHeader(gif).contains(Multimodal.Decoded("image", 320, 200, 1)))

    // BMP: 26-byte payload whose size field matches
    val bmpBody = le32(26) ++ le32(0) ++ le32(26) ++ le32(12) ++
      le32(800) ++ le32(600)
    val bmp = "BM".getBytes ++ bmpBody
    assert(parseHeader(bmp).contains(Multimodal.Decoded("image", 800, 600, 1)))

    // WAV: RIFF/WAVE with fmt (2ch, 44100 Hz, block align 4) + 400-byte data
    val wav = "RIFF".getBytes ++ le32(36 + 400) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(176400) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(400) ++ Array.fill[Byte](400)(0)
    assert(parseHeader(wav).contains(Multimodal.Decoded("audio", 44100, 2, 100)))

    // prose payloads never sniff as containers — even "BM"/"GIF89a" prefixes
    assert(parseHeader("BMW sales rose in the third quarter of the year, says the report".getBytes).isEmpty)
    assert(parseHeader("GIF89a is the 1989 revision of the format".getBytes).isEmpty)
    assert(parseHeader("plain text document".getBytes).isEmpty)

    // crafted/corrupt RIFF chunk sizes are untrusted input: 0xFFFFFFF8 reads
    // as -8 (stalls the scanner forever), 0xFFFFFF00 drives the index
    // negative (AIOOBE) — both must terminate with None, not hang a task
    val evil1 = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xFFFFFFF8) ++ Array.fill[Byte](32)(0)
    assert(parseHeader(evil1).isEmpty)
    val evil2 = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xFFFFFF00) ++ Array.fill[Byte](32)(0)
    assert(parseHeader(evil2).isEmpty)
  }

  test("parseHeader MP4: box walk, fixed-point dims, stsz count, hostile sizes") {
    import Multimodal.{MediaCodec, MediaFixtures}
    // the fixture's hand-assembled container parses back to its formulas
    val d = MediaCodec.parseHeader(MediaFixtures.mp4Payload(7L))
    val (w, h) = MediaFixtures.videoDims(7L)
    assert(d.contains(Multimodal.Decoded("video", w, h,
      MediaFixtures.videoFrames(7L))))
    val bytes = MediaFixtures.mp4Payload(7L)
    // 64-bit largesize on the leading ftyp still walks (size=1 + 8-byte size)
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val ftypLen = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val rest = bytes.drop(ftypLen)
    val large = be32(1) ++ "ftyp".getBytes ++ be32(0) ++ be32(ftypLen + 8) ++
      bytes.slice(8, ftypLen) ++ rest
    assert(MediaCodec.parseHeader(large) ==
      MediaCodec.parseHeader(bytes))
    // a corrupt box size (overruns the file) fails the parse, not the JVM
    val corrupt = bytes.clone()
    corrupt(ftypLen) = 0x7f.toByte // moov size → huge
    assert(MediaCodec.parseHeader(corrupt).isEmpty)
    // prose that happens to contain 'ftyp' at offset 4 is not a video
    assert(MediaCodec.parseHeader(
      "someftyp prose that mentions boxes".getBytes("UTF-8")).isEmpty)
    // an audio-only trak (tkhd width 0) yields no visual track
    val zeroDim = MediaFixtures.mp4Payload(8L) // w=160*…: find tkhd and zero it
    val tkhdAt = {
      val s = new String(zeroDim, "ISO-8859-1")
      s.indexOf("tkhd")
    }
    // width sits 76 bytes into tkhd content (+4 past the name)
    java.util.Arrays.fill(zeroDim, tkhdAt + 4 + 76, tkhdAt + 4 + 84, 0.toByte)
    assert(MediaCodec.parseHeader(zeroDim).isEmpty)
  }

  test("extractMetadata survives null payloads and ids; empty repartition no-ops") {
    val s = spark; import s.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), "real text"),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[String]),
      (null.asInstanceOf[java.lang.Long], "orphan row")
    ).toDF("doc_id", "text")
    val meta = Multimodal.extractMetadata(spark, df).collect()
      .map(m => m.doc_id -> m.byte_len).toMap
    assert(meta == Map(1L -> 9L, 2L -> 0L)) // null text → empty payload; null id dropped
    val empty = Multimodal.repartitionBySize(
      df.filter(col("doc_id") < 0), targetBytesPerPartition = 1024)
    assert(empty.count() == 0) // no NPE on the null SUM
  }

  test("extractMetadata uses the real header when the payload is a container") {
    val s = spark
    import s.implicits._
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0, 0, 1, 0) ++ Array[Byte](0, 0, 2, 0) ++ // 256 x 512
      Array[Byte](8, 2, 0, 0, 0)
    // a real binary payload column passes through withPayload untouched
    val df = Seq((1L, png)).toDF("doc_id", "payload")
    val m = Multimodal.extractMetadata(spark, df).collect().head
    assert(m.media_type == "image" && m.width == 256 && m.height == 512)
    assert(m.byte_len == png.length.toLong)
  }

  test("parseHeader: JPEG with 0xFF fill padding before markers still finds SOF") {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    // SOI, APP0, then THREE 0xFF fill bytes before the SOF0 marker code —
    // legal per the spec; without the fill-skip the walker reads a garbage
    // segment length and misses the SOF
    val padded = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(6) ++ "JFIF".getBytes ++
      Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(480) ++ be16(640) ++ Array[Byte](3, 0, 0, 0)
    assert(Multimodal.MediaCodec.parseHeader(padded)
      .contains(Multimodal.Decoded("image", 640, 480, 1)))
  }

  test("decodeImage: real PNG round-trip returns the exact pixel formula") {
    import Multimodal.{MediaCodec, MediaFixtures}
    for (d <- Seq(0L, 2L, 14L, 100L)) {
      val (w, h) = MediaFixtures.imageDims(d)
      val expectedLum = (0L until w.toLong * h * 3)
        .map(MediaFixtures.pixelByte(d, _).toLong).sum
      val got = MediaCodec.decodeImage(MediaFixtures.pngPayload(d))
      assert(got.contains(MediaCodec.ImagePixels(w, h, expectedLum)))
    }
  }

  test("decodeImage: JPEG written by ImageIO decodes with exact dimensions") {
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 17) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val got = Multimodal.MediaCodec.decodeImage(baos.toByteArray).get
    assert(got.width == 17 && got.height == 9)
    // JPEG is lossy but a uniform gray block stays within a few code values
    val mean = got.lumSum.toDouble / (17 * 9 * 3)
    assert(math.abs(mean - 0x80) < 4.0, s"mean channel drifted to $mean")
  }

  test("decodeAudio: real WAV round-trip returns the exact PCM samples") {
    import Multimodal.{MediaCodec, MediaFixtures}
    for (d <- Seq(1L, 3L, 99L)) {
      val n = MediaFixtures.audioFrames(d)
      val got = MediaCodec.decodeAudio(MediaFixtures.wavPayload(d)).get
      assert(got.sampleRate == 8000 && got.channels == 1 && got.nFrames == n)
      assert(got.samples.toSeq ==
        (0 until n).map(j => MediaFixtures.sampleValue(d, j.toLong)))
    }
  }

  test("decodeAudio: big-endian AIFF exercises the endian branch") {
    import javax.sound.sampled._
    val samples = Array[Int](-2000, -1, 0, 1, 1999, 32767, -32768)
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { j =>                 // big-endian PCM16
      data(2 * j) = ((samples(j) >> 8) & 0xff).toByte
      data(2 * j + 1) = (samples(j) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, true)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, baos)
    val got = Multimodal.MediaCodec.decodeAudio(baos.toByteArray).get
    assert(got.sampleRate == 16000 && got.samples.toSeq == samples.toSeq)
  }

  test("fixture writers: registry-free WAV/PNG bytes identical to the JDK writers") {
    import javax.sound.sampled._
    // WAV: the pure 44-byte-header writer must be byte-for-byte what
    // AudioSystem.write(WAVE) produced before the registry bypass — the
    // fixture payloads are hashed/classed downstream, so container DRIFT,
    // not just sample drift, would change results
    for (d <- Seq(2L, 7L, 49L)) {
      val pure = Multimodal.MediaFixtures.wavPayload(d)
      val n = Multimodal.MediaFixtures.audioFrames(d)
      val data = new Array[Byte](n * 2)
      (0 until n).foreach { j =>
        val s = Multimodal.MediaFixtures.sampleValue(d, j.toLong)
        data(2 * j) = (s & 0xff).toByte
        data(2 * j + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      assert(pure.toSeq == baos.toByteArray.toSeq)
    }
    // PNG: the per-thread ImageWriter is the same plugin ImageIO.write
    // resolves to, so its output must match byte-for-byte
    for (d <- Seq(0L, 4L, 88L)) {
      val pure = Multimodal.MediaFixtures.pngPayload(d)
      val (w, h) = Multimodal.MediaFixtures.imageDims(d)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      for (y <- 0 until h; x <- 0 until w) {
        val r = Multimodal.MediaFixtures.pixelByte(d, p * 3L)
        val g = Multimodal.MediaFixtures.pixelByte(d, p * 3L + 1)
        val b = Multimodal.MediaFixtures.pixelByte(d, p * 3L + 2)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      assert(pure.toSeq == baos.toByteArray.toSeq)
    }
  }

  test("decodeAudio: AU (.snd) container decodes through the pure-byte branch") {
    import javax.sound.sampled._
    val samples = (0 until 300).map(j => ((j * 13) % 4001) - 2000).toArray
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { j =>                 // AU is big-endian PCM16
      data(2 * j) = ((samples(j) >> 8) & 0xff).toByte
      data(2 * j + 1) = (samples(j) & 0xff).toByte
    }
    val fmt = new AudioFormat(11025f, 16, 1, true, true)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AU, baos)
    val got = Multimodal.MediaCodec.decodeAudio(baos.toByteArray).get
    assert(got.sampleRate == 11025 && got.channels == 1)
    assert(got.samples.toSeq == samples.toSeq)
  }

  test("decodeImage/decodeAudio reject the other modality and junk") {
    import Multimodal.{MediaCodec, MediaFixtures}
    assert(MediaCodec.decodeImage(MediaFixtures.wavPayload(1L)).isEmpty)
    assert(MediaCodec.decodeAudio(MediaFixtures.pngPayload(2L)).isEmpty)
    assert(MediaCodec.decodeImage("not media at all".getBytes).isEmpty)
    assert(MediaCodec.decodeAudio("not media at all".getBytes).isEmpty)
    assert(MediaCodec.decodeImage(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeAudio(Array.emptyByteArray).isEmpty)
  }

  test("decode operators agree with the fixture formulas end-to-end") {
    val s = spark; import s.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L).toDF("doc_id")
    val media = Multimodal.withFixtureMedia(spark, ids)
    val img = Multimodal.decodeImageStats(spark, media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(img.keySet == Set(0L, 2L, 10L))       // even ids are images
    img.foreach { case (d, (w, h, lum)) =>
      val (ew, eh) = Multimodal.MediaFixtures.imageDims(d)
      val elum = (0L until ew.toLong * eh * 3)
        .map(Multimodal.MediaFixtures.pixelByte(d, _).toLong).sum
      assert((w, h, lum) == (ew.toLong, eh.toLong, elum))
    }
    val au = Multimodal.decodeAudioStats(spark, media).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(au.keySet == Set(1L, 3L, 11L))        // odd ids are audio
    au.foreach { case (d, (n, sum, sq)) =>
      val ss = (0 until Multimodal.MediaFixtures.audioFrames(d))
        .map(j => Multimodal.MediaFixtures.sampleValue(d, j.toLong).toLong)
      assert((n, sum, sq) == (ss.size.toLong, ss.sum, ss.map(v => v * v).sum))
    }
    val frames = Multimodal.sampleAudioFrames(spark, media, stride = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(frames.forall { case (d, j, a) =>
      d % 2 == 1 && j % 100 == 0 &&
        a == Multimodal.MediaFixtures.sampleValue(d, j).toLong
    })
    assert(frames.groupBy(_._1).keySet == Set(1L, 3L, 11L))
  }

  test("repartitionBySize balances without losing rows") {
    val out = Multimodal.repartitionBySize(docs, targetBytesPerPartition = 20000)
    assert(out.count() == docs.count())
    assert(out.rdd.getNumPartitions >= 1)
  }

  test("streamingLoad: exactly-once across incremental runs and re-runs") {
    val s = spark; import s.implicits._
    val staging = tmpDir("sload_staging")
    val target = tmpDir("sload_target") + "/t"
    val ckpt = tmpDir("sload_ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(staging)
    StreamingPipeline.streamingLoad(spark, staging, target, ckpt)
    assert(StreamingPipeline.readStreamingTarget(spark, target).count() == 2)
    // second batch staged, same checkpoint → only the delta loads
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(staging)
    StreamingPipeline.streamingLoad(spark, staging, target, ckpt)
    val after = StreamingPipeline.readStreamingTarget(spark, target)
    assert(after.count() == 3)
    assert(after.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // idle re-run: no new files, no duplicates
    StreamingPipeline.streamingLoad(spark, staging, target, ckpt)
    assert(StreamingPipeline.readStreamingTarget(spark, target).count() == 3)
  }

  test("streamingDedupFingerprints: state-store dedup, exactly-once re-runs") {
    val s = spark; import s.implicits._
    val docsDir = tmpDir("sdedup_docs")
    val ckpt = tmpDir("sdedup_ckpt")
    Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "Alpha, beta!"),
      (4L, "gamma delta"))
      .toDF("doc_id", "text").write.mode("append").parquet(docsDir)
    val out = StreamingPipeline.streamingDedupFingerprints(
      spark, docsDir, ckpt, s"sdedup_${System.nanoTime()}")
    // 1,2,3 normalize to the same content → 2 distinct fingerprints
    assert(out.count() == 2)
    // duplicate-only second batch, same checkpoint → state suppresses it
    Seq((5L, "alpha beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(docsDir)
    val after = StreamingPipeline.streamingDedupFingerprints(
      spark, docsDir, ckpt, s"sdedup_${System.nanoTime()}")
    assert(after.count() == 2)
    // novel third batch → exactly one new fingerprint
    Seq((6L, "epsilon zeta")).toDF("doc_id", "text")
      .write.mode("append").parquet(docsDir)
    val last = StreamingPipeline.streamingDedupFingerprints(
      spark, docsDir, ckpt, s"sdedup_${System.nanoTime()}")
    assert(last.count() == 3)
  }

  test("mapGroupsWithState: per-user state survives across checkpointed runs") {
    val s = spark; import s.implicits._
    val staging = tmpDir("state_staging")
    val ckpt = tmpDir("state_ckpt")
    Seq((10L, 1L), (10L, 2L), (20L, 3L)).toDF("user_id", "event_id")
      .write.mode("append").parquet(staging)
    val r1 = StreamingPipeline.statefulUserCounts(spark, staging, ckpt,
      s"state_a_${System.nanoTime()}")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(10L -> 2L, 20L -> 1L))
    // second run with NEW events only: totals must be CUMULATIVE — the
    // group state was restored from the checkpoint, not recomputed
    Seq((10L, 4L), (30L, 5L)).toDF("user_id", "event_id")
      .write.mode("append").parquet(staging)
    val r2 = StreamingPipeline.statefulUserCounts(spark, staging, ckpt,
      s"state_b_${System.nanoTime()}")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(10L) == 3L)       // 2 from run 1 (restored state) + 1 new
    assert(r2(30L) == 1L)       // new user
    assert(!r2.contains(20L))   // unchanged group not re-emitted (Update mode)
  }

  test("stateful totals: re-run on the same checkpoint neither doubles nor forgets") {
    val s = spark; import s.implicits._
    // SINGLE-FILE input: the symlink staging dir must be stable across runs
    // (a fresh temp dir per run makes the file-source re-ingest the file and
    // double every total); and the snapshot sink must survive the re-run so
    // a recovery pass that replays zero batches still returns every user
    val dir = tmpDir("rerun_src")
    Seq((10L, 1L), (10L, 2L), (20L, 3L)).toDF("user_id", "event_id")
      .coalesce(1).write.parquet(s"$dir/ev")
    val file = new java.io.File(s"$dir/ev").listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val ckpt = tmpDir("rerun_ckpt") + "/ckpt"
    val name = s"rerun_${System.nanoTime()}"
    def run() = StreamingPipeline.statefulUserCounts(spark, file, ckpt, name)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = run()
    assert(first == Map(10L -> 2L, 20L -> 1L))
    val second = run() // zero new batches — pure recovery read
    assert(second == first,
      s"re-run changed the totals: $first -> $second")
  }

  test("streaming fold maintenance: micro-batches fold to the batch result, exactly once") {
    val s = spark; import s.implicits._
    import graft.operators.Relational
    val dir = tmpDir("sfold")
    val staging = s"$dir/staged"
    val statePath = s"$dir/state"
    val ckpt = s"$dir/ckpt"
    val sums = Seq(Relational.SumSpec("sum_v", "v", 2))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      Relational.readAggState(df, sums).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    Seq((1L, "a", 1.5), (2L, "b", 2.0), (3L, "a", 0.5))
      .toDF("id", "grp", "v").write.parquet(staging)
    val s1 = StreamingPipeline.streamingFoldAggregate(
      spark, staging, statePath, ckpt, Seq("grp"), sums)
    assert(asMap(s1) == Map("a" -> ((2L, 2.0)), "b" -> ((1L, 2.0))))
    // second micro-batch: new staged files drain into the same state
    Seq((4L, "a", 3.0), (5L, "c", 1.0))
      .toDF("id", "grp", "v").write.mode("append").parquet(staging)
    val s2 = StreamingPipeline.streamingFoldAggregate(
      spark, staging, statePath, ckpt, Seq("grp"), sums)
    // two micro-batches must equal the one-shot BATCH fold of all rows
    val direct = Relational.foldAggregate(None,
      spark.read.parquet(staging), Seq("grp"), sums)
    assert(asMap(s2) == asMap(direct))
    assert(asMap(s2) == Map("a" -> ((3L, 5.0)), "b" -> ((1L, 2.0)),
      "c" -> ((1L, 1.0))))
    // a third run with nothing staged folds nothing (exactly-once)
    val s3 = StreamingPipeline.streamingFoldAggregate(
      spark, staging, statePath, ckpt, Seq("grp"), sums)
    assert(asMap(s3) == asMap(s2))
  }

  test("streaming drift gate: baseline folds, shifted batch fails and " +
    "is re-gated, conforming batch passes") {
    val s = spark; import s.implicits._
    val dir = tmpDir("sdrift")
    val staging = s"$dir/staged"
    val statePath = s"$dir/state"
    val ckpt = s"$dir/ckpt"
    def mix(en: Int, es: Int) =
      (Seq.fill(en)("en") ++ Seq.fill(es)("es")).zipWithIndex
        .map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    // batch 1 defines the baseline mix (no gate on first fold)
    mix(80, 20).write.parquet(staging)
    val s1 = StreamingPipeline.streamingDriftGate(
      spark, staging, statePath, ckpt, "lang", threshold = 0.25)
    val m1 = s1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 == Map("en" -> 80L, "es" -> 20L))
    // batch 2 inverts the mix → PSI breach → the QUERY fails and the
    // state is untouched
    mix(5, 95).write.mode("append").parquet(staging)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.streamingDriftGate(
        spark, staging, statePath, ckpt, "lang", threshold = 0.25)
    }
    assert(e.getMessage.contains("drift_gate"), e.getMessage)
    val after = spark.read.parquet(statePath).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == m1, "breached batch must not fold into the state")
    // the offending batch is RE-GATED on restart (cursor unmoved), so the
    // stream stays failed until an operator intervenes
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.streamingDriftGate(
        spark, staging, statePath, ckpt, "lang", threshold = 0.25)
    }
    // raising the threshold (operator intervention) lets the same batch
    // fold; totals now include it
    val s3 = StreamingPipeline.streamingDriftGate(
      spark, staging, statePath, ckpt, "lang", threshold = 10.0)
    val m3 = s3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m3 == Map("en" -> 85L, "es" -> 115L), m3.toString)
  }

  test("streaming reliability gate: agreeing batch folds the audit trail, " +
    "a noisy batch fails and is re-gated until intervention") {
    val s = spark; import s.implicits._
    val dir = tmpDir("relgate")
    val staging = s"$dir/staged"
    val statePath = s"$dir/state"
    val ckpt = s"$dir/ckpt"
    def gate(minAlpha: Double) = StreamingPipeline.streamingReliabilityGate(
      spark, staging, statePath, ckpt, "item", "rater", "label", minAlpha)
    // batch 1: perfect agreement across two categories -> alpha = 1
    (for { i <- 1L to 4L; r <- 1L to 3L } yield (i, r, s"l${i % 2}"))
      .toDF("item", "rater", "label").write.parquet(staging)
    val s1 = gate(0.5)
    assert(s1.count() == 1 && s1.head.getAs[Double]("alpha") == 1.0)
    // batch 2: systematic 1-1 splits -> alpha far below the floor -> the
    // QUERY fails and the audit state is untouched
    (11L to 16L).flatMap(i => Seq((i, 1L, "A"), (i, 2L, "B")))
      .toDF("item", "rater", "label").write.mode("append").parquet(staging)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gate(0.5)
    }
    assert(e.getMessage.contains("reliability_gate"), e.getMessage)
    assert(spark.read.parquet(statePath).count() == 1,
      "breached batch must not fold into the audit state")
    // re-gated on restart (cursor unmoved)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gate(0.5)
    }
    // operator intervention (floor lowered) folds the SAME batch; the
    // audit trail stays ordered by batch_seq
    val s3 = gate(-1.0)
    assert(s3.count() == 2)
    assert(s3.collect().map(_.getAs[Long]("batch_seq")).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("streaming sketch maintenance: micro-batched state BIT-IDENTICAL to batch") {
    val s = spark; import s.implicits._
    import graft.operators.Sketches
    val dir = tmpDir("sksfold")
    def rows(lo: Long, hi: Long) = (lo to hi).map(i =>
      (i, s"g${i % 2}", i)).toDF("id", "grp", "item") // unbounded item domain
    rows(1, 200).write.parquet(s"$dir/staged")
    def kmvMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val m1 = kmvMap(StreamingPipeline.streamingKmvDistinct(
      spark, s"$dir/staged", s"$dir/kmv", s"$dir/ckpt_kmv", Seq("grp"),
      "item", k = 16))
    rows(201, 350).write.mode("append").parquet(s"$dir/staged")
    val m2 = kmvMap(StreamingPipeline.streamingKmvDistinct(
      spark, s"$dir/staged", s"$dir/kmv", s"$dir/ckpt_kmv", Seq("grp"),
      "item", k = 16))
    // the defining property of the DETERMINISTIC sketch family: streamed
    // micro-batches == one-pass batch build, bit for bit
    val direct = Sketches.foldKmvDistinct(None,
      spark.read.parquet(s"$dir/staged"), Seq("grp"), "item", k = 16)
    assert(m2 == kmvMap(direct))
    assert(m1 != m2, "second drain must have folded")
    val cms = StreamingPipeline.streamingCountMin(
      spark, s"$dir/staged", s"$dir/cms", s"$dir/ckpt_cms", Seq("grp"), "item")
    val cmsDirect = Sketches.foldCountMin(None,
      spark.read.parquet(s"$dir/staged"), Seq("grp"), "item")
    def cmsMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(cmsMap(cms) == cmsMap(cmsDirect))
  }

  test("image dHash: identical pixels collide, a gradient flip moves one bit") {
    import graft.multimodal.Multimodal
    def png(pix: Array[Array[Int]]): Array[Byte] = {
      val h = pix.length; val w = pix(0).length
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = pix(y)(x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val base = Array(Array(10, 20, 30, 40), Array(50, 40, 30, 20),
      Array(5, 15, 25, 35))
    val flip = base.map(_.clone())
    flip(0)(1) = 45 // 10<45>30: flips exactly the (0,0) rising + (0,1) bit
    val s = spark; import s.implicits._
    val docs = Seq((1L, png(base)), (2L, png(base)), (3L, png(flip)))
      .toDF("doc_id", "payload")
    val hs = Multimodal.imagePerceptualHashes(spark, docs)
    val m = hs.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(1) == m(2), "identical images must share the perceptual hash")
    assert(m(1) != m(3))
    assert(java.lang.Long.bitCount(m(1) ^ m(3)) <= 2)
    // banded near-dup finds exactly the pairs within the Hamming budget
    val pairs = Multimodal.imageNearDuplicates(hs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val strict = Multimodal.imageNearDuplicates(hs, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)))
  }

  test("audio fingerprint: identical PCM collides, re-leveled audio too") {
    import graft.multimodal.Multimodal
    def wav(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val base = Array.tabulate(400)(j => (((j * 37) % 1901) - 950).toShort)
    // volume-halved copy: every energy gradient keeps its sign
    val soft = base.map(s => (s / 2).toShort)
    val other = Array.tabulate(400)(j => (((j * 53 + 7) % 1901) - 950).toShort)
    val s = spark; import s.implicits._
    val docs = Seq((1L, wav(base)), (2L, wav(base)), (3L, wav(soft)),
      (4L, wav(other))).toDF("doc_id", "payload")
    val m = Multimodal.audioPerceptualHashes(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1) == m(2), "identical PCM must share the fingerprint")
    assert(java.lang.Long.bitCount(m(1) ^ m(3)) <= 4,
      "volume change should barely move the energy-gradient fingerprint")
    assert(java.lang.Long.bitCount(m(1) ^ m(4)) > 8,
      "unrelated audio should diverge")
  }

  test("image resize: exact nearest-neighbor bytes, identity round-trip") {
    import graft.multimodal.Multimodal
    def png(px: Array[Array[Int]]): Array[Byte] = { // px(y)(x) = gray value
      val h = px.length; val w = px(0).length
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (px(y)(x) << 16) | (px(y)(x) << 8) | px(y)(x))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val s = spark; import s.implicits._
    // 4x2 gradient image; nearest-neighbor to 2x2 picks columns 0 and 2
    // (x*4/2 = 0, 2) on both rows (y*2/2 = 0, 1)
    val src = Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80))
    val docs = Seq((1L, png(src))).toDF("doc_id", "payload")
    val r = Multimodal.resizeImages(spark, docs, outW = 2, outH = 2).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L) // src dims
    val rgb = r.getAs[Array[Byte]]("thumb_rgb").map(_ & 0xff)
    assert(rgb.toSeq == Seq(10, 10, 10, 30, 30, 30, 50, 50, 50, 70, 70, 70),
      s"nearest-neighbor picks wrong: ${rgb.toSeq}")
    // identity resize returns the original pixels byte-for-byte
    val id4x2 = Multimodal.resizeImages(spark, docs, outW = 4, outH = 2).head()
      .getAs[Array[Byte]]("thumb_rgb").map(_ & 0xff)
    assert(id4x2.toSeq == src.flatten.toSeq.flatMap(v => Seq(v, v, v)))
    // upscale repeats source pixels (2x width: each column doubled)
    val up = Multimodal.resizeImages(spark, docs, outW = 8, outH = 2).head()
      .getAs[Array[Byte]]("thumb_rgb").map(_ & 0xff)
    assert(up.length == 8 * 2 * 3 && up.take(6).toSeq == Seq(10, 10, 10, 10, 10, 10))
    // undecodable payloads drop out; bad dims refused
    val mixed = Seq((1L, png(src)), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    assert(Multimodal.resizeImages(spark, mixed, 2, 2).count() == 1)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImages(spark, docs, 0, 2)
    }
  }

  test("incremental image near-dup == batch pairs restricted to incoming side") {
    import graft.multimodal.Multimodal
    val s = spark; import s.implicits._
    val docs = spark.range(0, 80).select(col("id").as("doc_id"))
    val hashes = Multimodal.imagePerceptualHashes(spark,
      Multimodal.withFixtureMedia(spark, docs))
    val corpus = hashes.filter(col("doc_id") % 4 === 0)
    val incoming = hashes.filter(col("doc_id") % 4 === 2)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = canon(Multimodal.imageNearDuplicatesIncremental(
      incoming, corpus, maxHamming = 2))
    val want = canon(Multimodal.imageNearDuplicates(hashes, maxHamming = 2))
      .filter { case (a, b, _) => a % 4 == 2 || b % 4 == 2 }
    assert(got == want)
    assert(got.nonEmpty, "fixture must exercise at least one incoming pair")
    // idempotent wrt duplicated hash rows (append-maintained table replayed
    // after a crash): duplicates change nothing
    val got2 = canon(Multimodal.imageNearDuplicatesIncremental(
      incoming, corpus.unionAll(corpus.limit(3)), maxHamming = 2))
    assert(got2 == want)
    // empty increment → empty pair set (idle sync)
    assert(Multimodal.imageNearDuplicatesIncremental(
      incoming.limit(0), corpus, maxHamming = 2).count() == 0)
  }

  test("audio near-dup: banded pairs == brute force, length gate fences") {
    import graft.multimodal.Multimodal
    def wav(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    // base clip rises into its last window (samples 394..399 form window 63
    // of n=400): e63 = 6·1000² ≫ e62 = 6·100², so bit 62 is firmly 1 —
    // silencing the tail flips it to exactly Hamming 1
    val base = Array.tabulate(400) { j =>
      (if (j >= 394) 1000 else if (j >= 388) 100
       else ((j * 37) % 1901) - 950).toShort
    }
    val silenced = base.clone()
    for (j <- 394 until 400) silenced(j) = 0
    val other = Array.tabulate(400)(j => (((j * 53 + 7) % 1901) - 950).toShort)
    val longer = Array.tabulate(432)(j => base(j % 400))
    val s = spark; import s.implicits._
    val docs = Seq((1L, wav(base)), (2L, wav(base)), (3L, wav(silenced)),
      (4L, wav(other)), (5L, wav(longer))).toDF("doc_id", "payload")
    val hs = Multimodal.audioPerceptualHashes(spark, docs)
    val got = Multimodal.audioNearDuplicates(hs, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected fingerprints: same length, Hamming ≤ 1
    val rows = hs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, na, fa) <- rows; (ib, nb, fb) <- rows
      if ia < ib && na == nb &&
        java.lang.Long.bitCount(fa ^ fb) <= 1
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb))).toSet
    assert(got == brute, s"banded $got != brute $brute")
    // the planted relations: identical clips at 0, silenced tail at exactly 1
    assert(got.contains((1L, 2L, 0)))
    assert(got.contains((1L, 3L, 1)) && got.contains((2L, 3L, 1)))
    // the different-length clip never pairs, whatever its fingerprint
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
    // unrelated same-length audio stays out
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    // incremental probe (persisted fingerprint table) == batch restricted
    // to pairs touching the increment; duplicated table rows change nothing
    val inc = hs.filter(col("doc_id") isin (2L, 3L))
    val corpus = hs.filter(col("doc_id") isin (1L, 4L, 5L))
    val gotInc = Multimodal.audioNearDuplicatesIncremental(inc, corpus,
      maxHamming = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wantInc = got.filter { case (a, b, _) =>
      Set(2L, 3L).contains(a) || Set(2L, 3L).contains(b) }
    assert(gotInc == wantInc, s"incremental $gotInc != restricted $wantInc")
    val gotInc2 = Multimodal.audioNearDuplicatesIncremental(inc,
      corpus.unionAll(corpus.limit(1)), maxHamming = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotInc2 == wantInc)
  }

  test("video near-dup: shared distinct frames, repeat collapse, dims gate") {
    import graft.multimodal.{H264, Multimodal}
    def frame(w: Int, h: Int, k: Int): H264.Frame = H264.Frame(w, h,
      Array.tabulate(w * h)(j => ((k * 31 + j) % 256).toByte),
      Array.tabulate(w * h / 4)(j => ((k * 13 + j) % 256).toByte),
      Array.tabulate(w * h / 4)(j => ((k * 17 + j) % 256).toByte))
    val s = spark; import s.implicits._
    // v1: frames A,B,C; v2: A,B,D (shares 2 with v1); v3: A,E,F (shares 1
    // with each); v4: A,A,A,B (STILL-SHOT REPEATS — must count A once, so
    // v4~v1 and v4~v2 share {A,B} = 2); v5: same content as A but 32x16 —
    // the dims gate must fence it
    val docs = Seq(
      (1L, H264.encodeIPcm(Seq(frame(16, 16, 1), frame(16, 16, 2), frame(16, 16, 3)))),
      (2L, H264.encodeIPcm(Seq(frame(16, 16, 1), frame(16, 16, 2), frame(16, 16, 4)))),
      (3L, H264.encodeIPcm(Seq(frame(16, 16, 1), frame(16, 16, 5), frame(16, 16, 6)))),
      (4L, H264.encodeIPcm(Seq(frame(16, 16, 1), frame(16, 16, 1),
        frame(16, 16, 1), frame(16, 16, 2)))),
      (5L, H264.encodeIPcm(Seq(frame(32, 16, 1), frame(32, 16, 2))))
    ).toDF("doc_id", "payload")
    val sigs = Multimodal.videoFrameSignatures(spark, docs)
    // per-frame signatures are exact: v1 and v2 agree on frames A and B
    val s1 = sigs.filter(col("doc_id") === 1L && col("frame_idx") < 2)
      .select("y_sig", "cb_sig", "cr_sig").collect().toSet
    val s2 = sigs.filter(col("doc_id") === 2L && col("frame_idx") < 2)
      .select("y_sig", "cb_sig", "cr_sig").collect().toSet
    assert(s1 == s2)
    val got = Multimodal.videoNearDuplicates(sigs, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L), (1L, 4L, 2L), (2L, 4L, 2L)),
      s"got $got")
    // threshold 1 admits the single-shared-frame pairs (incl. v3), but the
    // differently-shaped v5 never pairs however its planes read
    val loose = Multimodal.videoNearDuplicates(sigs, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((1L, 3L)) && loose.contains((2L, 3L)) &&
      loose.contains((3L, 4L)))
    assert(!loose.exists(p => p._1 == 5L || p._2 == 5L))
    intercept[IllegalArgumentException] {
      Multimodal.videoNearDuplicates(sigs, minShared = 0)
    }
  }

  test("streaming BM25 index: drained micro-batches score identically to batch") {
    val s = spark; import s.implicits._
    import graft.functions.CorpusFunctions
    val dir = tmpDir("bm25stream")
    val c1 = Seq((1L, "spark join merge window"), (2L, "agg stream key row"),
      (3L, "spark window filter")).toDF("doc_id", "text")
    val c2 = Seq((4L, "merge window stream"), (5L, "join join join spark"))
      .toDF("doc_id", "text")
    c1.write.parquet(s"$dir/staged")
    val probes = Seq((0L, "spark join"), (1L, "window stream"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._5)).toSeq
    val s1 = StreamingPipeline.streamingBm25Index(
      spark, s"$dir/staged", s"$dir/bm25", s"$dir/ckpt_bm25",
      "doc_id", "text")
    assert(s1.filter(col("kind") === "d").count() == 3)
    c2.write.mode("append").parquet(s"$dir/staged")
    val s2 = StreamingPipeline.streamingBm25Index(
      spark, s"$dir/staged", s"$dir/bm25", s"$dir/ckpt_bm25",
      "doc_id", "text")
    // streamed state scores EXACTLY like batch BM25 over all documents
    val batch = canon(CorpusFunctions.bm25TopK(
      c1.unionByName(c2), "doc_id", "text", probes, k = 10))
    assert(canon(CorpusFunctions.bm25FromIndex(s2, probes, k = 10)) == batch)
    // re-drain with nothing staged: state unchanged (exactly-once)
    val s3 = StreamingPipeline.streamingBm25Index(
      spark, s"$dir/staged", s"$dir/bm25", s"$dir/ckpt_bm25",
      "doc_id", "text")
    assert(canon(CorpusFunctions.bm25FromIndex(s3, probes, k = 10)) == batch)
  }

  test("streaming SimHash labels: drained micro-batches cluster like batch") {
    val s = spark; import s.implicits._
    import graft.functions.DedupFunctions
    val dir = tmpDir("simhashstream")
    val c1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "completely different content about spark catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val c2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (5L, "totally unrelated corpus text with its own vocabulary entirely"))
      .toDF("doc_id", "text")
    c1.write.parquet(s"$dir/staged")
    def labels(st: org.apache.spark.sql.DataFrame) = st
      .filter(col("kind") === "l").select("doc_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = StreamingPipeline.streamingSimhashLabels(
      spark, s"$dir/staged", s"$dir/simhash", s"$dir/ckpt_simhash",
      "doc_id", "text")
    // batch 1: docs 1 and 2 are identical → one cluster; band rows cover
    // every doc at (maxHamming+1) bands each
    assert(labels(s1) == Set((1L, 1L), (2L, 1L)))
    assert(s1.filter(col("kind") === "b").count() == 3 * 4)
    c2.write.mode("append").parquet(s"$dir/staged")
    val s2 = StreamingPipeline.streamingSimhashLabels(
      spark, s"$dir/staged", s"$dir/simhash", s"$dir/ckpt_simhash",
      "doc_id", "text")
    // streamed folds label EXACTLY like batch clustering of everything
    val batchLabels = DedupFunctions.duplicateClusters(
      DedupFunctions.simhashNearDuplicates(c1.unionByName(c2),
        "doc_id", "text", maxHamming = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels(s2) == batchLabels)
    // cross-batch pairing happened (the labels aren't just batch-1's): an
    // exact dup of doc 1 streamed later must join its existing cluster
    val c3 = Seq((6L,
      "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    c3.write.mode("append").parquet(s"$dir/staged")
    val s2b = StreamingPipeline.streamingSimhashLabels(
      spark, s"$dir/staged", s"$dir/simhash", s"$dir/ckpt_simhash",
      "doc_id", "text")
    assert(labels(s2b).contains((6L, 1L)),
      s"cross-batch dup must join doc 1's cluster: ${labels(s2b)}")
    assert(s2b.filter(col("kind") === "b").count() == 6 * 4)
    // re-drain with nothing staged: state unchanged (exactly-once)
    val s3 = StreamingPipeline.streamingSimhashLabels(
      spark, s"$dir/staged", s"$dir/simhash", s"$dir/ckpt_simhash",
      "doc_id", "text")
    assert(labels(s3) == labels(s2b) &&
      s3.filter(col("kind") === "b").count() == 6 * 4)
  }

  test("single-file staging refuses a stale non-symlink squatting on the link path") {
    // a stale REGULAR file at the link path means the source would stream
    // whatever it holds instead of the caller's input — must fail loudly,
    // not proceed (the guard previously only fired for symlinks)
    val s = spark; import s.implicits._
    val dir = tmpDir("stale_src")
    Seq((1L, 1L)).toDF("user_id", "event_id").coalesce(1).write.parquet(s"$dir/ev")
    val file = new java.io.File(s"$dir/ev").listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val ckpt = tmpDir("stale_ckpt") + "/ckpt"
    val staging = java.nio.file.Paths.get(ckpt + "_src")
    java.nio.file.Files.createDirectories(staging)
    java.nio.file.Files.writeString(
      staging.resolve(new java.io.File(file).getName), "not the input")
    val e = intercept[IllegalStateException] {
      StreamingPipeline.statefulUserCounts(spark, file, ckpt,
        s"stale_${System.nanoTime()}")
    }
    assert(e.getMessage.contains("not a symlink"))
  }

  test("stream-stream interval join: batch-equal, re-run adds nothing") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ssj").toString + "/ckpt"
    def run() = StreamingPipeline.streamStreamAttribution(
      spark, s"$sfDir/events.parquet", ckpt, s"ssj_${System.nanoTime()}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val first = run()
    // batch equivalent: same-user signup→purchase within 1h
    val s = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("u"), col("event_id").as("sid"),
        graft.util.TimeCols.epochUs("ts").as("sts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("event_id").as("pid"),
        graft.util.TimeCols.epochUs("ts").as("pts"))
    val batch = s.join(p, Seq("u"))
      .filter(col("pts") >= col("sts") &&
        col("pts") <= col("sts") + 3600L * 1000000L)
      .select(col("sid"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(first == batch)
    // same checkpoint, no new input → the join emits nothing further
    assert(run() == first)
  }

  test("rollup read path scans exactly one batch= snapshot, no dedup shuffle") {
    // the round-4 fix replaced a window-dedup read (13.98s at sf0.1) with a
    // compacted single-snapshot scan (2.23s) — lock the shape in so a
    // refactor can't silently reintroduce the read-side dedup:
    //  1. every file the result reads lives under ONE batch= directory;
    //  2. the read plan is exchange- and window-free (plain scan);
    //  3. superseded snapshots were pruned from the sink.
    val ckpt = tmpDir("rollup_guard")
    val df = StreamingPipeline.hourlyEventRollup(spark,
      s"$sfDir/events.parquet", ckpt, s"guard_rollup_${System.nanoTime()}")
    val files = df.inputFiles
    assert(files.nonEmpty, "rollup produced no snapshot — vacuous")
    val batchDirs = files.map(f =>
      f.substring(0, f.lastIndexOf('/'))).distinct
    assert(batchDirs.length == 1 && batchDirs.head.contains("batch="),
      s"result must read ONE batch= snapshot, got: ${batchDirs.toSeq}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"read-side dedup reintroduced:\n$plan")
    // the sink keeps only the latest committed snapshot
    val sink = new java.io.File(s"${ckpt}_sink")
    val committed = sink.listFiles().filter(d =>
      d.getName.startsWith("batch=") &&
        new java.io.File(d, "_SUCCESS").exists())
    assert(committed.length == 1,
      s"superseded snapshots not pruned: ${committed.map(_.getName).toSeq}")
  }

  test("streaming hourly rollup equals the batch aggregation") {
    val name = s"test_rollup_${System.nanoTime()}"
    val streamed = StreamingPipeline.hourlyEventRollup(spark,
      s"$sfDir/events.parquet", tmpDir("ckpt"), name)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("event_ts", timestamp_micros(graft.util.TimeCols.epochUs("ts")))
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .select(unix_timestamp(col("window.start")).as("hs"), col("event_type"),
        col("n"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch)
  }

  test("imageNearDupEdges: star-collapsed edges close to the SAME " +
      "components as the full pair relation, with STRICTLY fewer edges") {
    import graft.multimodal.Multimodal
    import graft.functions.DedupFunctions
    val s = spark
    import s.implicits._
    // planted classes (the fixture's id-keyed pixels never collide at this
    // sf, so crafted hashes exercise the star branch): class A = ids 1,2,3
    // with IDENTICAL dhash; class B = ids 10,11 at hamming 1 from A (so A
    // and B merge through the rep pair); id 20 differs in dims (gated
    // out); id 30 is hamming 5 away (beyond maxHamming)
    val hashes = Seq(
      (1L, 8L, 8L, 0xF0F0L), (2L, 8L, 8L, 0xF0F0L), (3L, 8L, 8L, 0xF0F0L),
      (10L, 8L, 8L, 0xF0F1L), (11L, 8L, 8L, 0xF0F1L),
      (20L, 4L, 8L, 0xF0F0L), (30L, 8L, 8L, 0xF00FL)
    ).toDF("doc_id", "width", "height", "dhash")
    val fullPairs = Multimodal.imageNearDuplicates(hashes, maxHamming = 2)
      .select(col("id_a"), col("id_b"))
    def labels(pairs: org.apache.spark.sql.DataFrame) =
      DedupFunctions.foldClusterLabels(None, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lf = labels(fullPairs)
    // classes A and B fuse into one component rooted at 1; 20/30 are out
    assert(lf == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
    val starEdges = Multimodal.imageNearDupEdges(hashes, maxHamming = 2)
    assert(labels(starEdges) == lf,
      "edge reduction must preserve connected components exactly")
    // full: C(3,2) + C(2,2-ish) within classes + 3x2 cross = 10 pairs;
    // star: 2 + 1 intra-class + 1 rep pair = 4 edges — STRICTLY fewer
    val nFull = fullPairs.count(); val nStar = starEdges.count()
    assert(nFull == 10 && nStar == 4, s"full=$nFull star=$nStar")
    // the real fixture still agrees end-to-end (singleton classes there:
    // the star form degenerates to the rep pairs, components unchanged)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fh = Multimodal.imagePerceptualHashes(spark,
      Multimodal.withFixtureMedia(spark, docs)).cache()
    val lFixture = labels(Multimodal.imageNearDuplicates(fh, maxHamming = 2)
      .select(col("id_a"), col("id_b")))
    assert(lFixture.nonEmpty, "no image near-dups in the fixture — vacuous")
    assert(labels(Multimodal.imageNearDupEdges(fh, maxHamming = 2)) ==
      lFixture)
    fh.unpersist()
  }

  test("H264 I_PCM: bitstream round-trip is pixel-exact, emulation bytes " +
      "inserted and stripped, junk rejected") {
    import graft.multimodal.{H264, Multimodal}
    // closed-form fixture frames for ids covering all dim/frame variants
    Seq(0L, 1L, 2L, 3L, 4L, 5L).foreach { d =>
      val frames = Multimodal.MediaFixtures.h264Frames(d)
      val stream = H264.encodeIPcm(frames)
      val back = H264.decodeIPcm(stream).get
      assert(back.length == frames.length, s"doc $d frame count")
      frames.zip(back).foreach { case (a, b) =>
        assert(a.width == b.width && a.height == b.height)
        assert(java.util.Arrays.equals(a.y, b.y), s"doc $d luma")
        assert(java.util.Arrays.equals(a.cb, b.cb), s"doc $d cb")
        assert(java.util.Arrays.equals(a.cr, b.cr), s"doc $d cr")
      }
    }
    // an all-zero plane forces 00 00 0x runs in the RBSP: the encoder MUST
    // emit emulation-prevention 0x03 bytes and the decoder must strip them
    val z = H264.Frame(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))
    val zs = H264.encodeIPcm(Seq(z))
    assert(zs.count(_ == 3.toByte) > 10,
      "zero-run stream must carry emulation-prevention bytes")
    val zback = H264.decodeIPcm(zs).get.head
    assert(java.util.Arrays.equals(zback.y, z.y) &&
      java.util.Arrays.equals(zback.cb, z.cb))
    // container path: mdat-wrapped stream decodes; metadata walk still works
    val d7 = Multimodal.MediaFixtures.h264Mp4Payload(7L)
    val viaBox = Multimodal.MediaCodec.decodeH264Frames(d7).get
    assert(viaBox.length == Multimodal.MediaFixtures.h264FrameCount(7L))
    val meta = Multimodal.MediaCodec.parseHeader(d7).get
    assert((meta.width, meta.height) == Multimodal.MediaFixtures.h264Dims(7L))
    // junk, truncation, NULL and non-video bytes reject cleanly
    assert(H264.decodeIPcm("not h264".getBytes).isEmpty)
    assert(H264.decodeIPcm(zs.take(zs.length / 2)).isEmpty)
    assert(Multimodal.MediaCodec.decodeH264Frames(
      Multimodal.MediaFixtures.pngPayload(2L)).isEmpty)
    assert(Multimodal.MediaCodec.decodeH264Frames(null).isEmpty,
      "a NULL payload must drop out, not NPE the task")
    // a legal runs-to-EOF mdat (size = 0, common for the last box) still
    // decodes — the shared hardened box walk handles it
    val container = Multimodal.MediaFixtures.h264Mp4Payload(7L)
    val mdatName = "mdat".getBytes("ISO-8859-1")
    val mdatAt = container.indices.find(i => i + 4 <= container.length &&
      container.slice(i, i + 4).sameElements(mdatName)).get
    val eofMdat = container.clone()
    (0 until 4).foreach(j => eofMdat(mdatAt - 4 + j) = 0) // size := 0
    assert(Multimodal.MediaCodec.decodeH264Frames(eofMdat).get.length ==
      Multimodal.MediaFixtures.h264FrameCount(7L))
  }

  test("block-salted quadratic generation: hot-class output identical to " +
    "brute force, spread over >= cores join keys") {
    val s = spark; import s.implicits._
    // synthetic hot-class corpus: one 40-member identical-dhash class, a
    // 12-member class at Hamming 1 from it, a singleton at Hamming 2, and
    // a 5-member class behind the dimension gate (never pairs)
    val h0 = 0x0f0f0f0f0f0f0f0fL
    val h1 = h0 ^ 1L          // hamming 1 from h0
    val h2 = h0 ^ 3L          // hamming 2 from h0
    val rows =
      (1L to 40L).map(i => (i, 8L, 6L, h0)) ++
      (101L to 112L).map(i => (i, 8L, 6L, h1)) ++
      Seq((201L, 8L, 6L, h2)) ++
      (301L to 305L).map(i => (i, 4L, 3L, h0))
    val hashes = rows.toDF("doc_id", "width", "height", "dhash")
    // brute force: every same-dims pair within the Hamming budget
    val naive = rows.flatMap { case (a, wa, ha, xa) =>
      rows.collect { case (b, wb, hb, xb)
        if a < b && wa == wb && ha == hb &&
          java.lang.Long.bitCount(xa ^ xb) <= 2 =>
        (a, b, java.lang.Long.bitCount(xa ^ xb))
      }
    }.toSet
    val (t0, s0) = (Multimodal.quadBlockRows, Multimodal.quadStreamSpread)
    try {
      // force multi-block generation on the small fixture: 40 members at
      // 7 rows/block -> B = 6 -> 21 within keys for the hot class alone
      Multimodal.quadBlockRows = 7
      Multimodal.quadStreamSpread = 3
      val got = Multimodal.imageNearDuplicates(hashes, maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == naive,
        s"salted generation diverged: missing ${naive -- got}, " +
          s"extra ${got -- naive}")
      // each pair appears EXACTLY once (the Set compare above would hide
      // duplicate generation)
      val n = Multimodal.imageNearDuplicates(hashes, maxHamming = 2).count()
      assert(n == naive.size.toLong, s"duplicate pairs generated: $n rows " +
        s"for ${naive.size} distinct pairs")
      // key spread: the hot class alone fans its within generation out
      // over B(B+1)/2 = 21 block-pair keys (>= a 16-core session), where
      // the unsalted join held all C(40,2) pairs under ONE key
      val b = (40 + Multimodal.quadBlockRows - 1) / Multimodal.quadBlockRows
      assert(b * (b + 1) / 2 >= 16)
      // and the salted plan carries the AQE-exempt repartition that turns
      // key spread into task spread
      val plan = Multimodal.imageNearDuplicates(hashes, maxHamming = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("REPARTITION_BY_NUM"),
        "expected explicit AQE-exempt repartition in the generation plan")
      // degenerate corpus (all classes singleton): adaptive skip keeps the
      // result identical
      val singles = (1L to 30L).map(i => (i, 8L, 6L, h0 ^ (1L << (i % 60))))
        .toDF("doc_id", "width", "height", "dhash")
      val viaOp = Multimodal.imageNearDuplicates(singles, maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive2 = (1L to 30L).flatMap(a => (1L to 30L).collect {
        case b if a < b && java.lang.Long.bitCount(
          (h0 ^ (1L << (a % 60))) ^ (h0 ^ (1L << (b % 60)))) <= 2 => (a, b)
      }).toSet
      assert(viaOp == naive2)
    } finally {
      Multimodal.quadBlockRows = t0
      Multimodal.quadStreamSpread = s0
    }
  }
}
