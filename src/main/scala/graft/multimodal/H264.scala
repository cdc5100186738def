package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Minimal REAL H.264 (ISO/IEC 14496-10) encode/decode for the I_PCM
  * subset: IDR pictures whose macroblocks are all I_PCM (mb_type 25 —
  * uncompressed 4:2:0 samples carried verbatim in the bitstream, no
  * entropy coding, no prediction, no transform). This is a LEGAL baseline-
  * profile stream shape — I_PCM exists in the spec precisely as the
  * escape hatch every conformant decoder must honor — and parsing it
  * exercises the real bitstream machinery: NAL framing with emulation-
  * prevention bytes, Exp-Golomb (ue/se) syntax, SPS/PPS parameter-set
  * parsing, IDR slice headers, and byte-aligned PCM macroblock payloads.
  * Entropy-coded (CAVLC/CABAC) residual decoding stays out of scope and is
  * said so loudly — the fixture encoder below only emits I_PCM, so the
  * decode path is complete for everything the engine itself produces.
  *
  * Cited shapes: reference multimodal handling keeps video as opaque bytes
  * + metadata (the engine's MP4 box walk, `Multimodal.MediaCodec`); this
  * module closes the remaining "frame PIXEL decode" stub without leaving
  * the JDK (no JCodec/ffmpeg dependency).
  */
object H264 {

  // ------------------------------------------------------------ bit I/O

  /** MSB-first bit writer over a growable byte buffer. */
  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def putBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => putBit(((v >>> i) & 1L).toInt))
    def ue(v: Int): Unit = {
      val cp = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cp)
      u(0L, len - 1); u(cp.toLong, len)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = nbits == 0
    def alignZero(): Unit = while (!byteAligned) putBit(0)
    def putByte(b: Int): Unit = u(b.toLong & 0xffL, 8)
    def rbspTrailing(): Unit = { putBit(1); alignZero() }
    def bytes: Array[Byte] = {
      require(nbits == 0, "unaligned RBSP")
      buf.toArray
    }
  }

  /** MSB-first bit reader over an RBSP (emulation bytes already removed). */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // bit position
    def bit(): Int = {
      val b = (bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1
      pos += 1; b
    }
    def u(n: Int): Long = (0 until n).foldLeft(0L)((a, _) => (a << 1) | bit())
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) zeros += 1
      ((1L << zeros) - 1 + u(zeros)).toInt
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAligned: Boolean = (pos & 7) == 0
    def alignToByte(): Unit = while (!byteAligned) { bit(); () }
    def readByte(): Int = u(8).toInt
  }

  /** RBSP → NAL payload: insert emulation-prevention 0x03 after any two
    * zero bytes followed by 0x00..0x03 (14496-10 §7.4.1.1). */
  private def emulationPrevent(rbsp: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](rbsp.length + 8)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 0x03.toByte; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** NAL payload → RBSP: strip emulation-prevention bytes. */
  private def emulationStrip(nal: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](nal.length)
    var i = 0
    while (i < nal.length) {
      if (i + 2 < nal.length && nal(i) == 0 && nal(i + 1) == 0 &&
        nal(i + 2) == 3) {
        out += 0; out += 0; i += 3
      } else { out += nal(i); i += 1 }
    }
    out.toArray
  }

  private def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] =
    Array(((refIdc << 5) | nalType).toByte) ++ emulationPrevent(rbsp)

  private val startCode = Array[Byte](0, 0, 0, 1)

  // ------------------------------------------------------------- encode

  /** One decoded (or to-encode) frame: full 4:2:0 planes. */
  final case class Frame(width: Int, height: Int,
                         y: Array[Byte], cb: Array[Byte], cr: Array[Byte])

  /** Encode frames (dims multiples of 16) as an Annex-B byte stream:
    * SPS, PPS, then one all-I_PCM IDR picture per frame. */
  def encodeIPcm(frames: Seq[Frame]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val w = frames.head.width; val h = frames.head.height
    require(w % 16 == 0 && h % 16 == 0, s"dims ($w x $h) not MB-aligned")
    require(frames.forall(f => f.width == w && f.height == h),
      "frame dims must agree")

    val sps = {
      val bw = new BitWriter
      bw.u(66, 8)            // profile_idc: baseline
      bw.u(0, 8)             // constraint flags + reserved
      bw.u(10, 8)            // level_idc 1.0
      bw.ue(0)               // seq_parameter_set_id
      bw.ue(0)               // log2_max_frame_num_minus4 → 4 bits
      bw.ue(2)               // pic_order_cnt_type 2 (no POC syntax)
      bw.ue(0)               // max_num_ref_frames
      bw.u(0, 1)             // gaps_in_frame_num_value_allowed_flag
      bw.ue(w / 16 - 1)      // pic_width_in_mbs_minus1
      bw.ue(h / 16 - 1)      // pic_height_in_map_units_minus1
      bw.u(1, 1)             // frame_mbs_only_flag
      bw.u(0, 1)             // direct_8x8_inference_flag
      bw.u(0, 1)             // frame_cropping_flag
      bw.u(0, 1)             // vui_parameters_present_flag
      bw.rbspTrailing()
      nal(3, 7, bw.bytes)
    }
    val pps = {
      val bw = new BitWriter
      bw.ue(0)               // pic_parameter_set_id
      bw.ue(0)               // seq_parameter_set_id
      bw.u(0, 1)             // entropy_coding_mode_flag (CAVLC)
      bw.u(0, 1)             // bottom_field_pic_order_in_frame_present
      bw.ue(0)               // num_slice_groups_minus1
      bw.ue(0)               // num_ref_idx_l0_default_active_minus1
      bw.ue(0)               // num_ref_idx_l1_default_active_minus1
      bw.u(0, 1)             // weighted_pred_flag
      bw.u(0, 2)             // weighted_bipred_idc
      bw.se(0)               // pic_init_qp_minus26
      bw.se(0)               // pic_init_qs_minus26
      bw.se(0)               // chroma_qp_index_offset
      bw.u(0, 1)             // deblocking_filter_control_present_flag
      bw.u(0, 1)             // constrained_intra_pred_flag
      bw.u(0, 1)             // redundant_pic_cnt_present_flag
      bw.rbspTrailing()
      nal(3, 8, bw.bytes)
    }
    val slices = frames.zipWithIndex.map { case (f, idx) =>
      val bw = new BitWriter
      bw.ue(0)               // first_mb_in_slice
      bw.ue(7)               // slice_type: I (all slices of the pic are I)
      bw.ue(0)               // pic_parameter_set_id
      bw.u(0, 4)             // frame_num (log2_max_frame_num = 4)
      bw.ue(idx % 2)         // idr_pic_id (consecutive IDRs must differ)
      bw.u(0, 1)             // no_output_of_prior_pics_flag
      bw.u(0, 1)             // long_term_reference_flag
      bw.se(0)               // slice_qp_delta
      val mbW = w / 16; val mbH = h / 16
      for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
        bw.ue(25)            // mb_type: I_PCM
        bw.alignZero()       // pcm_alignment_zero_bit(s)
        for (j <- 0 until 16; i <- 0 until 16)
          bw.putByte(f.y((mbY * 16 + j) * w + (mbX * 16 + i)) & 0xff)
        for (j <- 0 until 8; i <- 0 until 8)
          bw.putByte(f.cb((mbY * 8 + j) * (w / 2) + (mbX * 8 + i)) & 0xff)
        for (j <- 0 until 8; i <- 0 until 8)
          bw.putByte(f.cr((mbY * 8 + j) * (w / 2) + (mbX * 8 + i)) & 0xff)
      }
      bw.rbspTrailing()
      nal(3, 5, bw.bytes)
    }
    (Seq(sps, pps) ++ slices)
      .flatMap(n => startCode ++ n).toArray
  }

  // ------------------------------------------------------------- decode

  private final case class SpsInfo(width: Int, height: Int,
                                   frameNumBits: Int, pocType: Int)

  private def parseSps(rbsp: Array[Byte]): SpsInfo = {
    val br = new BitReader(rbsp)
    val profile = br.u(8).toInt
    br.u(8); br.u(8)                        // constraints, level
    br.ue()                                 // sps id
    // high profiles carry chroma_format_idc etc. before the frame-num
    // field; the I_PCM fixture is baseline (66) but parse defensively
    if (profile == 100 || profile == 110 || profile == 122 ||
      profile == 244 || profile == 44 || profile == 83 || profile == 86) {
      val chroma = br.ue()
      if (chroma == 3) br.u(1)
      br.ue(); br.ue(); br.u(1)
      if (br.u(1) == 1L)                    // seq_scaling_matrix (unsupported)
        throw new IllegalArgumentException("scaling matrices unsupported")
    }
    val frameNumBits = br.ue() + 4
    val pocType = br.ue()
    if (pocType != 2) // types 0/1 add u(v)/nested slice syntax — reject
      throw new IllegalArgumentException(s"poc type $pocType unsupported")
    br.ue()                                 // max_num_ref_frames
    br.u(1)
    val wMbs = br.ue() + 1
    val hMbs = br.ue() + 1
    val frameMbsOnly = br.u(1)
    if (frameMbsOnly == 0L)
      throw new IllegalArgumentException("interlaced streams unsupported")
    // SPS dimensions are UNTRUSTED bytes: a hostile/corrupt stream can
    // encode 65536×16384 and the per-frame plane allocation would OOM the
    // task (an Error, not an Exception — it would escape decodeIPcm's
    // catch). Same bailout discipline as the MP4 box walk: cap the plane
    // at 16M pixels (~16 MB luma) and refuse beyond it.
    if (wMbs.toLong * hMbs * 256 > (1L << 24))
      throw new IllegalArgumentException(
        s"refusing ${wMbs * 16}x${hMbs * 16} frame (hostile-size bailout)")
    SpsInfo(wMbs * 16, hMbs * 16, frameNumBits, pocType)
  }

  /** Split an Annex-B byte stream into NAL units (start-code scan). */
  private def nalUnits(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val starts = new ArrayBuffer[Int]()
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3; i += 3
      } else i += 1
    }
    starts.zipAll(starts.drop(1).map(_ - 3), 0, bytes.length)
      .map { case (s, e) =>
        // a start code may be 4 bytes (leading zero) — trim trailing zeros
        var end = e
        while (end > s && bytes(end - 1) == 0) end -= 1
        bytes.slice(s, end)
      }.toSeq
  }

  /** Decode an Annex-B I_PCM stream to frames. Returns None when the
    * bytes are not an H.264 stream this subset covers (no SPS, entropy-
    * coded macroblocks, interlace...) — callers treat it like any other
    * undecodable payload. */
  def decodeIPcm(bytes: Array[Byte]): Option[Seq[Frame]] = try {
    var sps: Option[SpsInfo] = None
    val frames = new ArrayBuffer[Frame]()
    nalUnits(bytes).foreach { n =>
      if (n.nonEmpty) {
        val nalType = n(0) & 0x1f
        val rbsp = emulationStrip(n.drop(1))
        nalType match {
          case 7 => sps = Some(parseSps(rbsp))
          case 8 => () // PPS carries nothing this subset needs
          case 5 =>
            val s = sps.getOrElse(
              throw new IllegalArgumentException("slice before SPS"))
            frames += parseIdrIPcmSlice(rbsp, s)
          case _ => ()
        }
      }
    }
    if (frames.isEmpty) None else Some(frames.toSeq)
  } catch { case _: Exception => None }

  private def parseIdrIPcmSlice(rbsp: Array[Byte], sps: SpsInfo): Frame = {
    val br = new BitReader(rbsp)
    val firstMb = br.ue()
    require(firstMb == 0, "multi-slice pictures unsupported")
    val sliceType = br.ue()
    require(sliceType == 2 || sliceType == 7,
      s"non-I slice type $sliceType")
    br.ue()                        // pps id
    br.u(sps.frameNumBits)         // frame_num
    br.ue()                        // idr_pic_id (poc type 2: no POC syntax)
    br.u(1); br.u(1)               // dec_ref_pic_marking (IDR flags)
    br.se()                        // slice_qp_delta
    val w = sps.width; val h = sps.height
    val y = new Array[Byte](w * h)
    val cb = new Array[Byte](w * h / 4)
    val cr = new Array[Byte](w * h / 4)
    for (mbY <- 0 until h / 16; mbX <- 0 until w / 16) {
      val mbType = br.ue()
      require(mbType == 25, s"mb_type $mbType is not I_PCM — " +
        "entropy-coded macroblocks out of scope")
      br.alignToByte()
      for (j <- 0 until 16; i <- 0 until 16)
        y((mbY * 16 + j) * w + (mbX * 16 + i)) = br.readByte().toByte
      for (j <- 0 until 8; i <- 0 until 8)
        cb((mbY * 8 + j) * (w / 2) + (mbX * 8 + i)) = br.readByte().toByte
      for (j <- 0 until 8; i <- 0 until 8)
        cr((mbY * 8 + j) * (w / 2) + (mbX * 8 + i)) = br.readByte().toByte
    }
    Frame(w, h, y, cb, cr)
  }
}
