package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with decode / feature
  * extraction as per-partition batch transforms.
  *
  * Codecs: images decode for real via `javax.imageio` (PNG/BMP/GIF/
  * JPEG — pure JVM, no native libs), audio via a RIFF/WAVE
  * 16-bit-PCM parser ([[decodeWavFeatures]]), and video via a pure-JVM
  * MJPEG-in-AVI demuxer ([[demuxAvi]]: RIFF chunk walk over
  * `movi`/`00dc`, per-frame JPEG decode through the ImageIO path).
  * All fall back to [[fakeDecodeFeatures]] for payloads their format
  * sniffing rejects (e.g. H.264 in MP4, which needs native codec
  * libs this container lacks — a deployment adds javacv/ffmpeg behind
  * the same dispatch without changing the dataflow).
  *
  * Scale notes: payloads stay off the shuffle path (decode happens
  * before any wide transform); `mapPartitions` keeps per-batch codec
  * state (a real decoder is expensive to init per row); feature
  * vectors, not payloads, flow into downstream joins/ANN.
  */
object Multimodal {

  /** Feature-vector width shared by every codec branch. */
  val FeatureDim = 8

  /** Typed media record: opaque payload + structured metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String,           // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Synthesize a media table from `documents` (text bytes stand in
    * for encoded payloads — deterministic, so specs and the driver can
    * rely on byte-identical runs).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 32).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /** Synthetic media with REAL encoded payloads, deterministic per
    * doc_id: image rows carry an actual PNG (encoded via ImageIO from
    * id-derived pixels), audio rows an actual 16-bit-PCM WAV, video
    * rows an actual MJPEG-in-AVI ([[encodeMjpegAvi]]: JPEG frames in
    * a RIFF/AVI container, 25 fps). Built in `mapPartitions` like
    * [[decodeBatch]]: codec state per partition, payload construction
    * off the driver. This is the fixture that makes the driver-run
    * feature query exercise the real decode path for every kind.
    */
  def syntheticMediaEncoded(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Par.widen (r18): codec encode is the dominant row-local cost —
    // don't serialize it on a one-task scan.
    Par.widen(docs.select(col("doc_id"), col("text"), col("n_chars")),
        col("doc_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, _, nChars) =>
          val kind = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val w = 4 + (id % 8).toInt
          val h = 4 + (id % 6).toInt
          val (payload, durMs) = kind match {
            case "image" => (encodePng(id, w, h), nChars * 10)
            case "audio" => (encodeWav(id), nChars * 10)
            case _ =>
              val nFrames = 3 + (id % 4).toInt
              (encodeMjpegAvi(id, w, h, nFrames), nFrames * 40L) // 25 fps
          }
          MediaRecord(id, kind, payload, w, h, durMs)
        }
      }
      .toDF()
      .select(col("media_id"), col("kind"), col("payload"),
        col("width"), col("height"), col("duration_ms"))
  }

  /** Tiny deterministic PNG: pixel (x, y) colored from (id, x, y). */
  private[graft] def encodePng(id: Long, w: Int, h: Int): Array[Byte] =
    encodeImage(id, w, h, "png")

  /** [[encodePng]] generalized over the JDK's writer set (png, gif,
    * bmp, jpg) — same id-derived pixels, format-specific container.
    */
  private[graft] def encodeImage(id: Long, w: Int, h: Int,
                                 format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (id * 31 + x * 7 + y * 13) & 0xff
        img.setRGB(x, y, (v.toInt << 16) | ((255 - v).toInt << 8) | ((id % 255).toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** One image row per doc in a format ROTATING by doc_id % 4 over the
    * JDK's four writable containers (png, gif, bmp, jpg) — the fixture
    * behind the per-format decode-path pin: a future JVM dropping or
    * changing one codec fails that format's named count, not an
    * anonymous feature row.
    */
  def syntheticImagesMultiFormat(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val fmt = (id % 4) match {
            case 0 => "png"
            case 1 => "gif"
            case 2 => "bmp"
            case _ => "jpg"
          }
          val w = 4 + (id % 8).toInt
          val h = 4 + (id % 6).toInt
          MediaRecord(id, "image", encodeImage(id, w, h, fmt), w, h, nChars * 10)
        }
      }
      .toDF()
      .select(col("media_id"), col("kind"), col("payload"),
        col("width"), col("height"), col("duration_ms"))
  }

  /** Tiny deterministic mono 16-bit PCM WAV: an id-pitched square
    * wave, 8 kHz, 160 + (id mod 100) samples.
    */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val sr = 8000
    val n = 160 + (id % 100).toInt
    val halfPeriod = 4 + (id % 12).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(sr)
    bb.putInt(sr * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort(if ((i / halfPeriod) % 2 == 0) 16384.toShort else (-16384).toShort)
      i += 1
    }
    bb.array()
  }

  /** Re-encode a PCM16 WAV at `newRate` via linear interpolation —
    * the cheap resampler every transcode pipeline implements, and the
    * realistic way the same clip re-arrives at a different sample
    * rate (the commonest real-world audio dup). Duration is
    * preserved: output frame j samples source time j/newRate, so a
    * resampled clip lands on [[audioHash64]]'s wall-clock windows and
    * fixed-Hz bands exactly like its original. None for non-PCM16 or
    * unparseable payloads.
    */
  private[graft] def resampleWav(payload: Array[Byte],
                                 newRate: Int): Option[Array[Byte]] = {
    if (payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      bb.position(12) // past RIFF<size>WAVE
      var sampleRate = 0
      var channels = 0
      var dataOff = -1
      var dataLen = 0
      while (bb.remaining() >= 8) {
        val id = new Array[Byte](4)
        bb.get(id)
        val size = bb.getInt()
        val body = bb.position()
        new String(id, java.nio.charset.StandardCharsets.US_ASCII) match {
          case "fmt " =>
            val audioFormat = bb.getShort()
            channels = bb.getShort()
            sampleRate = bb.getInt()
            bb.getInt(); bb.getShort()
            val bits = bb.getShort()
            if (audioFormat != 1 || bits != 16) return None
          case "data" =>
            dataOff = body
            dataLen = size
          case _ => ()
        }
        bb.position(math.min(body + size + (size & 1), payload.length))
      }
      if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
      val nSamples = math.min(dataLen, payload.length - dataOff) / 2
      val nFrames = nSamples / channels
      if (nFrames == 0) return None
      val outFrames = math.max(1,
        (nFrames.toLong * newRate / sampleRate).toInt)
      val outLen = outFrames * channels * 2
      val out = java.nio.ByteBuffer.allocate(44 + outLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes); out.putInt(36 + outLen); out.put("WAVE".getBytes)
      out.put("fmt ".getBytes); out.putInt(16)
      out.putShort(1); out.putShort(channels.toShort); out.putInt(newRate)
      out.putInt(newRate * channels * 2); out.putShort((channels * 2).toShort)
      out.putShort(16)
      out.put("data".getBytes); out.putInt(outLen)
      var j = 0
      while (j < outFrames) {
        // source time of output frame j, in source-frame units
        val pos = j.toDouble * sampleRate / newRate
        val i0 = math.min(pos.toInt, nFrames - 1)
        val i1 = math.min(i0 + 1, nFrames - 1)
        val frac = pos - i0
        var c = 0
        while (c < channels) {
          val s0 = bb.getShort(dataOff + (i0 * channels + c) * 2).toDouble
          val s1 = bb.getShort(dataOff + (i1 * channels + c) * 2).toDouble
          out.putShort(math.rint(s0 * (1.0 - frac) + s1 * frac).toShort)
          c += 1
        }
        j += 1
      }
      Some(out.array())
    } catch { case _: Exception => None }
  }

  /** Tiny deterministic MJPEG-in-AVI: `nFrames` JPEG frames whose
    * pixels derive from (id, frame, x, y), in a standard RIFF/AVI
    * container (hdrl with avih/strh/strf headers, movi list of `00dc`
    * chunks) at 25 fps. Everything pure JVM: ImageIO writes the JPEG
    * frames, the container is a ByteBuffer walk — the encode twin of
    * [[demuxAvi]].
    */
  private[graft] def encodeMjpegAvi(id: Long, w: Int, h: Int,
                                    nFrames: Int): Array[Byte] = {
    val usPerFrame = 40000 // 25 fps
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(body.length)
      bb.put(body)
      bb.array() // odd sizes keep their zero pad byte
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body)

    val frames = (0 until nFrames).map { fi =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (id * 31 + fi * 97 + x * 7 + y * 13) & 0xff
          img.setRGB(x, y, (v.toInt << 16) | ((255 - v).toInt << 8) | ((id % 255).toInt))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(usPerFrame); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(nFrames); bb.putInt(0); bb.putInt(1); bb.putInt(0)
      bb.putInt(w); bb.putInt(h)
      bb.array() // 4 reserved ints stay zero
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes); bb.put("MJPG".getBytes)
      bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(1); bb.putInt(25) // scale/rate = 25 fps
      bb.putInt(0); bb.putInt(nFrames); bb.putInt(0); bb.putInt(-1); bb.putInt(0)
      bb.putShort(0); bb.putShort(0)
      bb.putShort(w.toShort); bb.putShort(h.toShort)
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40); bb.putInt(w); bb.putInt(h)
      bb.putShort(1); bb.putShort(24)
      bb.put("MJPG".getBytes); bb.putInt(w * h * 3)
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF",
      "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ hdrl ++ movi)
  }

  /** Pure-JVM AVI demux: RIFF chunk walk (same pattern as the WAV
    * parser above) collecting video frame chunks (`##dc`/`##db`) from
    * the `movi` list and the frame interval (µs) from `avih`. Returns
    * None for non-AVI payloads or containers with no frames. The JPEG
    * frame bytes go through [[decodeImageFeatures]] downstream — ALL
    * pure JVM, no native codecs.
    */
  private[graft] def demuxAvi(payload: Array[Byte]): Option[(Long, Vector[Array[Byte]])] = {
    if (sniff(payload) != "avi" || payload.length < 12) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var usPerFrame = 40000L
      val frames = Vector.newBuilder[Array[Byte]]
      def isFrameChunk(cc: String): Boolean =
        cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
          (cc.endsWith("dc") || cc.endsWith("db"))
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val cc = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val size = bb.getInt(off + 4)
          if (size < 0 || off + 8 + size > end) return // malformed: stop
          cc match {
            case "LIST" =>
              val listType = new String(payload, off + 8, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
              if (listType == "hdrl" || listType == "movi" || listType == "rec ")
                walk(off + 12, off + 8 + size)
            case "avih" =>
              usPerFrame = math.max(bb.getInt(off + 8).toLong, 1L)
            case c if isFrameChunk(c) =>
              frames += java.util.Arrays.copyOfRange(payload, off + 8, off + 8 + size)
            case _ => ()
          }
          off += 8 + size + (size & 1)
        }
      }
      walk(12, math.min(8 + bb.getInt(4), payload.length))
      val fs = frames.result()
      if (fs.isEmpty) None else Some((usPerFrame, fs))
    } catch { case _: Exception => None }
  }

  /** Parsed MP4 track metadata — everything the pure-JVM container
    * walk can know WITHOUT a native H.264 decoder: codec fourcc from
    * `stsd`, wall-clock duration from `stts`×`mdhd.timescale`, sample
    * count from `stts`, keyframe count from `stss` (absent table =
    * every sample is sync, per ISO 14496-12 §8.6.2). */
  private[graft] case class Mp4Meta(
      codec: String, durationMs: Long, nSamples: Long, nKeyframes: Long,
      width: Int = 0, height: Int = 0)

  /** Exp-Golomb bit reader over an RBSP (emulation-prevention bytes
    * already stripped) — the minimal H.264 syntax reader the SPS
    * parse needs. Throws past-the-end; callers wrap in try. */
  private final class RbspReader(bytes: Array[Byte]) {
    private var bit = 0
    def u1(): Int = {
      val b = (bytes(bit >> 3) >> (7 - (bit & 7))) & 1
      bit += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        require(zeros < 32, "ue overflow")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** Parse coded WIDTH×HEIGHT from an H.264 sequence parameter set
    * NAL (ITU-T H.264 §7.3.2.1.1) — profile branch, POC branch, and
    * frame cropping handled; scaling matrices (never emitted by the
    * encoders this engine meets) bail to None rather than misparse.
    * Input is the raw SPS NAL including its header byte. */
  private[graft] def parseSpsDims(nal: Array[Byte]): Option[(Int, Int)] =
    try {
      // strip emulation prevention: 00 00 03 xx → 00 00 xx
      val rbsp = {
        val out = new java.io.ByteArrayOutputStream(nal.length)
        var i = 1 // skip the NAL header byte
        while (i < nal.length) {
          if (i + 2 < nal.length && nal(i) == 0 && nal(i + 1) == 0 &&
              nal(i + 2) == 3) {
            out.write(0); out.write(0); i += 3
          } else { out.write(nal(i)); i += 1 }
        }
        out.toByteArray
      }
      val r = new RbspReader(rbsp)
      val profile = r.u(8)
      r.u(16): Unit // constraint flags + level_idc
      r.ue(): Unit // seq_parameter_set_id
      val highProfiles = Set(100, 110, 122, 244, 44, 83, 86, 118, 128,
        138, 139, 134, 135)
      var chroma = 1
      if (highProfiles(profile)) {
        chroma = r.ue()
        if (chroma == 3) r.u1(): Unit // separate_colour_plane_flag
        r.ue(): Unit // bit_depth_luma_minus8
        r.ue(): Unit // bit_depth_chroma_minus8
        r.u1(): Unit // qpprime_y_zero_transform_bypass_flag
        if (r.u1() == 1) return None // seq_scaling_matrix_present
      }
      r.ue(): Unit // log2_max_frame_num_minus4
      r.ue() match {
        case 0 => r.ue(): Unit // log2_max_pic_order_cnt_lsb_minus4
        case 1 =>
          r.u1(): Unit; r.se(): Unit; r.se(): Unit
          val n = r.ue()
          (0 until n).foreach(_ => r.se(): Unit)
        case _ => ()
      }
      r.ue(): Unit // max_num_ref_frames
      r.u1(): Unit // gaps_in_frame_num_value_allowed_flag
      val wMbs = r.ue() + 1
      val hMap = r.ue() + 1
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1(): Unit // mb_adaptive_frame_field
      r.u1(): Unit // direct_8x8_inference_flag
      var w = wMbs * 16
      var h = (2 - frameMbsOnly) * hMap * 16
      if (r.u1() == 1) { // frame_cropping_flag
        val (l, rr, t, b) = (r.ue(), r.ue(), r.ue(), r.ue())
        val subW = if (chroma == 3) 1 else 2
        val subH = if (chroma == 1) 2 else 1
        val cropX = if (chroma == 0) 1 else subW
        val cropY = (if (chroma == 0) 1 else subH) * (2 - frameMbsOnly)
        w -= (l + rr) * cropX
        h -= (t + b) * cropY
      }
      Some((w, h))
    } catch { case _: Exception => None }

  /** WIDTH×HEIGHT from the avih header of an AVI payload — the
    * container half of the dimension story ([[parseSpsDims]] is the
    * bitstream half); metadata only, no frame decode. */
  private[graft] def parseAviDims(payload: Array[Byte]): Option[(Int, Int)] = {
    if (sniff(payload) != "avi" || payload.length < 12) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // RIFF('AVI ') → LIST('hdrl') → 'avih' (dwWidth/dwHeight at
      // byte offsets 32/36 of the avih body)
      var off = 12
      while (off + 8 <= payload.length) {
        val size = bb.getInt(off + 4)
        if (cc(off) == "LIST" && off + 12 <= payload.length &&
            cc(off + 8) == "hdrl") {
          var in = off + 12
          val end = off + 8 + size
          while (in + 8 <= end) {
            val s2 = bb.getInt(in + 4)
            if (cc(in) == "avih" && in + 8 + 40 <= payload.length)
              return Some((bb.getInt(in + 8 + 32), bb.getInt(in + 8 + 36)))
            in += 8 + s2 + (s2 & 1)
          }
          return None
        }
        off += 8 + size + (size & 1)
      }
      None
    } catch { case _: Exception => None }
  }

  /** Pure-JVM ISO-BMFF (MP4) metadata walk: big-endian size+fourcc
    * boxes, `moov → trak → mdia → (mdhd | hdlr | minf → stbl)`; reads
    * the FIRST video (`hdlr = 'vide'`) track's `stsd` codec entry,
    * `stts` sample table, and `stss` sync-sample table. This is the
    * H.264 *metadata* path: full frame decode needs native codec libs
    * this container lacks, but the keyframe cadence, duration, and
    * sample structure parse fine in pure JVM — enough for video dedup
    * to block on duration+keyframe-cadence for stub formats, and for
    * profiling to see real structure instead of an opaque blob. None
    * for payloads that are not MP4 or carry no video track.
    */
  private[graft] def parseMp4Meta(payload: Array[Byte]): Option[Mp4Meta] = {
    if (sniff(payload) != "mp4") return None
    try {
      val bb = java.nio.ByteBuffer.wrap(payload) // big-endian default
      def fourcc(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // find the first child box of [start, end) named `name`
      def child(start: Int, end: Int, name: String): Option[(Int, Int)] = {
        var off = start
        while (off + 8 <= end) {
          val size = bb.getInt(off)
          if (size < 8 || off + size > end) return None
          if (fourcc(off + 4) == name) return Some((off + 8, off + size))
          off += size
        }
        None
      }
      def children(start: Int, end: Int, name: String): Seq[(Int, Int)] = {
        val out = Seq.newBuilder[(Int, Int)]
        var off = start
        var bad = false
        while (!bad && off + 8 <= end) {
          val size = bb.getInt(off)
          if (size < 8 || off + size > end) bad = true
          else {
            if (fourcc(off + 4) == name) out += ((off + 8, off + size))
            off += size
          }
        }
        out.result()
      }
      val (moovS, moovE) = child(0, payload.length, "moov").getOrElse(return None)
      children(moovS, moovE, "trak").foreach { case (trakS, trakE) =>
        for {
          (mdiaS, mdiaE) <- child(trakS, trakE, "mdia")
          (hdlrS, _) <- child(mdiaS, mdiaE, "hdlr")
          if fourcc(hdlrS + 8) == "vide"
          (mdhdS, _) <- child(mdiaS, mdiaE, "mdhd")
          (minfS, minfE) <- child(mdiaS, mdiaE, "minf")
          (stblS, stblE) <- child(minfS, minfE, "stbl")
          (sttsS, _) <- child(stblS, stblE, "stts")
        } {
          val timescale = bb.getInt(mdhdS + 12).toLong & 0xffffffffL
          if (timescale > 0) {
            val nStts = bb.getInt(sttsS + 4)
            var nSamples = 0L
            var durTicks = 0L
            var e = 0
            while (e < nStts) {
              val cnt = bb.getInt(sttsS + 8 + e * 8).toLong
              val delta = bb.getInt(sttsS + 12 + e * 8).toLong
              nSamples += cnt
              durTicks += cnt * delta
              e += 1
            }
            val nKf = child(stblS, stblE, "stss") match {
              case Some((stssS, _)) => bb.getInt(stssS + 4).toLong
              case None => nSamples // no stss ⇒ every sample is sync
            }
            val stsd = child(stblS, stblE, "stsd")
              .filter { case (s, en) => en - s >= 16 }
            val codec = stsd.map { case (s, _) => fourcc(s + 12) }
              .getOrElse("????")
            // avcC inside the first sample entry (8-byte box header +
            // 78 bytes of visual-sample-entry fields, then child
            // boxes): first SPS NAL → coded width/height, the
            // dimension signal perceptual grouping blocks on without
            // any frame decode
            val dims = stsd.flatMap { case (s, en) =>
              val entryEnd = math.min(s + 8 + bb.getInt(s + 8), en)
              child(s + 8 + 8 + 78, entryEnd, "avcC")
            }.flatMap { case (a, aEnd) =>
              if (a + 8 > aEnd || (payload(a) & 0xff) != 1) None
              else {
                val nSps = payload(a + 5) & 0x1f
                val spsLen = ((payload(a + 6) & 0xff) << 8) |
                  (payload(a + 7) & 0xff)
                if (nSps < 1 || a + 8 + spsLen > aEnd) None
                else parseSpsDims(
                  java.util.Arrays.copyOfRange(payload, a + 8,
                    a + 8 + spsLen))
              }
            }
            return Some(Mp4Meta(codec, durTicks * 1000L / timescale,
              nSamples, nKf, dims.map(_._1).getOrElse(0),
              dims.map(_._2).getOrElse(0)))
          }
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** Tiny deterministic MP4 with an `avc1` (H.264) video track: real
    * ISO-BMFF structure (`ftyp`, `mdat`, `moov/trak/mdia/{mdhd, hdlr,
    * minf/stbl/{stsd, stts, stss, stsz, stsc, stco}}`) around
    * UNDECODABLE sample bytes — the H.264 bitstream itself would need
    * a native encoder, but every table the metadata path reads is
    * genuine. id drives the structure: `20 + id%10` samples at 25 fps
    * (timescale 1000, delta 40), a keyframe every `2 + id%3` samples.
    */
  private[graft] def encodeMp4AvcStub(id: Long): Array[Byte] = {
    val nSamples = 20 + (id % 10).toInt
    val kfStep = 2 + (id % 3).toInt
    val sampleSize = 64
    def box(name: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length)
      bb.put(name.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(body)
      bb.array()
    }
    def full(name: String, body: Array[Byte]): Array[Byte] =
      box(name, new Array[Byte](4) ++ body) // version 0, flags 0
    def be(ints: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(ints.length * 4)
      ints.foreach(bb.putInt)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes ++ be(0x200) ++ "isom".getBytes)
    val sampleBytes = new Array[Byte](nSamples * sampleSize)
    var i = 0
    while (i < sampleBytes.length) {
      sampleBytes(i) = ((id * 131 + i * 31) & 0xff).toByte
      i += 1
    }
    val mdat = box("mdat", sampleBytes)
    val mdatDataOff = ftyp.length + 8
    val keyframes = (1 to nSamples by kfStep).toArray
    // coded dimensions ride a GENUINE H.264 SPS inside avcC (the
    // only sample bytes this stub cannot fake are the frames; the
    // parameter sets are spec-conformant and id-derived)
    val vidW = 320 + 16 * (id % 8).toInt
    val vidH = 240 + 16 * (id % 5).toInt
    val sps = encodeSps(vidW, vidH)
    val avcC = box("avcC", Array[Byte](1, 66, 0, 30, // ver, profile, compat, level
      (0xfc | 3).toByte, (0xe0 | 1).toByte) ++ // 4-byte NALU lengths; 1 SPS
      Array[Byte]((sps.length >> 8).toByte, sps.length.toByte) ++ sps ++
      Array[Byte](0)) // 0 PPS
    val entryFields = {
      val bb = java.nio.ByteBuffer.allocate(78)
      bb.putShort(24, vidW.toShort) // sample-entry width/height too
      bb.putShort(26, vidH.toShort)
      bb.array()
    }
    val avc1 = box("avc1", entryFields ++ avcC)
    val stsd = full("stsd", be(1) ++ avc1)
    val stts = full("stts", be(1, nSamples, 40))
    val stss = full("stss", be(keyframes.length +: keyframes: _*))
    val stsz = full("stsz", be(0, nSamples) ++
      be(Array.fill(nSamples)(sampleSize): _*))
    val stsc = full("stsc", be(1, 1, nSamples, 1))
    val stco = full("stco", be(1, mdatDataOff))
    val stbl = box("stbl", stsd ++ stts ++ stss ++ stsz ++ stsc ++ stco)
    val vmhd = full("vmhd", be(0, 0))
    val minf = box("minf", vmhd ++ stbl)
    val hdlr = full("hdlr",
      be(0) ++ "vide".getBytes ++ new Array[Byte](12) ++ Array[Byte](0))
    val mdhd = full("mdhd", be(0, 0, 1000, nSamples * 40) ++
      Array[Byte](0x55, ((0xc4 & 0xff).toByte)) ++ Array[Byte](0, 0))
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = full("tkhd", be(0, 0, 1, 0, nSamples * 40) ++
      new Array[Byte](60))
    val trak = box("trak", tkhd ++ mdia)
    val mvhd = full("mvhd", be(0, 0, 1000, nSamples * 40, 0x10000, 0) ++
      new Array[Byte](76))
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Minimal spec-conformant H.264 SPS NAL (baseline profile 66, no
    * cropping, frame_mbs_only) coding `w`×`h` — both multiples of 16
    * by construction here. Emulation-prevention bytes inserted per
    * §7.4.1.1 (the writer twin of [[parseSpsDims]]'s stripper). */
  private[graft] def encodeSps(w: Int, h: Int): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "stub SPS codes uncropped MBs")
    val bits = new scala.collection.mutable.ArrayBuffer[Int]()
    def u(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    u(66, 8); u(0, 8); u(30, 8) // profile_idc, constraints, level_idc
    ue(0) // seq_parameter_set_id
    ue(0) // log2_max_frame_num_minus4
    ue(0) // pic_order_cnt_type
    ue(0) // log2_max_pic_order_cnt_lsb_minus4
    ue(1) // max_num_ref_frames
    u(0, 1) // gaps_in_frame_num_value_allowed_flag
    ue(w / 16 - 1) // pic_width_in_mbs_minus1
    ue(h / 16 - 1) // pic_height_in_map_units_minus1
    u(1, 1) // frame_mbs_only_flag
    u(0, 1) // direct_8x8_inference_flag
    u(0, 1) // frame_cropping_flag
    u(0, 1) // vui_parameters_present_flag
    u(1, 1) // rbsp_stop_one_bit
    while (bits.length % 8 != 0) bits += 0
    val raw = bits.grouped(8)
      .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    // NAL header + emulation prevention: 00 00 {00,01,02,03} → 00 00 03 xx
    val out = new java.io.ByteArrayOutputStream(raw.length + 4)
    out.write(0x67) // nal_ref_idc 3, nal_unit_type 7 (SPS)
    var zeros = 0
    raw.foreach { b =>
      if (zeros == 2 && (b & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** MP4 half of the encoded-media fixture: one `avc1` MP4 per doc,
    * ids offset by 1e6 so it unions cleanly with
    * [[syntheticMediaEncoded]]. Structure is pure id arithmetic
    * ([[encodeMp4AvcStub]]) — the keyframe-stats oracle recomputes
    * every column from `media_id − 1e6`.
    */
  def syntheticMp4Media(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val nSamples = 20 + (id % 10)
        MediaRecord(1000000L + id, "video", encodeMp4AvcStub(id),
          0, 0, nSamples * 40L)
      })
      .toDF()
      .select(col("media_id"), col("kind"), col("payload"),
        col("width"), col("height"), col("duration_ms"))
  }

  /** Per-clip keyframe/structure metadata over every video container
    * the engine can walk: AVI (MJPEG — intra-only, every frame is a
    * keyframe; duration from `avih.usPerFrame`) and MP4 (`stts`/`stss`
    * via [[parseMp4Meta]] — the H.264 metadata path). The signal
    * video dedup blocks on (duration + keyframe cadence) when full
    * decode is a native-lib stub. Non-video / unwalkable payloads are
    * dropped. Scale shape: per-partition parse, only skinny metadata
    * rows ever shuffle (the orderBy is presentation-only).
    */
  def videoKeyframeStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        sniff(payload) match {
          case "avi" => demuxAvi(payload).map { case (usPerFrame, frames) =>
            val (w, h) = parseAviDims(payload).getOrElse((0, 0))
            (id, "avi", "mjpeg", frames.length.toLong * usPerFrame / 1000L,
              frames.length.toLong, frames.length.toLong,
              w.toLong, h.toLong)
          }
          case "mp4" => parseMp4Meta(payload).map(m =>
            (id, "mp4", m.codec, m.durationMs, m.nSamples, m.nKeyframes,
              m.width.toLong, m.height.toLong))
          case _ => None
        }
      })
      .toDF("media_id", "format", "codec", "duration_ms", "n_samples",
        "n_keyframes", "width", "height")
  }

  /** Real video decode: demux the AVI, run every frame through the
    * image feature extractor, average — the whole-clip feature vector.
    * None when no frame decodes.
    */
  private[operators] def decodeAviFeatures(payload: Array[Byte]): Option[Array[Float]] =
    demuxAvi(payload).flatMap { case (_, frames) =>
      val fs = frames.flatMap(decodeImageFeatures)
      if (fs.isEmpty) None
      else {
        val out = new Array[Float](FeatureDim)
        fs.foreach { f =>
          var j = 0
          while (j < FeatureDim) { out(j) += f(j); j += 1 }
        }
        var j = 0
        while (j < FeatureDim) { out(j) /= fs.length; j += 1 }
        Some(out)
      }
    }

  /** Magic-byte format sniff — codec dispatch never trusts the `kind`
    * metadata column (at ingest scale the metadata is exactly what's
    * most often wrong).
    */
  private[graft] def sniff(payload: Array[Byte]): String = {
    def at(off: Int, magic: Int*): Boolean =
      payload.length >= off + magic.length &&
        magic.indices.forall(i => (payload(off + i) & 0xff) == magic(i))
    if (at(0, 0x89, 'P', 'N', 'G')) "image"
    else if (at(0, 'B', 'M')) "image"
    else if (at(0, 'G', 'I', 'F', '8')) "image"
    else if (at(0, 0xff, 0xd8, 0xff)) "image" // JPEG
    else if (at(0, 'R', 'I', 'F', 'F') && at(8, 'W', 'A', 'V', 'E')) "wav"
    else if (at(0, 'R', 'I', 'F', 'F') && at(8, 'A', 'V', 'I', ' ')) "avi"
    else if (at(4, 'f', 't', 'y', 'p')) "mp4" // ISO-BMFF: size + 'ftyp'
    else "unknown"
  }

  /** [[sniff]] at container-FORMAT granularity (png/gif/bmp/jpeg/wav/
    * avi/mp4/unknown) — the per-format decode-path pin's key.
    */
  private[graft] def sniffFormat(payload: Array[Byte]): String = {
    def at(off: Int, magic: Int*): Boolean =
      payload.length >= off + magic.length &&
        magic.indices.forall(i => (payload(off + i) & 0xff) == magic(i))
    if (at(0, 0x89, 'P', 'N', 'G')) "png"
    else if (at(0, 'B', 'M')) "bmp"
    else if (at(0, 'G', 'I', 'F', '8')) "gif"
    else if (at(0, 0xff, 0xd8, 0xff)) "jpeg"
    else if (at(0, 'R', 'I', 'F', 'F') && at(8, 'W', 'A', 'V', 'E')) "wav"
    else if (at(0, 'R', 'I', 'F', 'F') && at(8, 'A', 'V', 'I', ' ')) "avi"
    else if (at(4, 'f', 't', 'y', 'p')) "mp4"
    else "unknown"
  }

  /** Real image decode (pure JVM: `javax.imageio` handles PNG/BMP/GIF/
    * JPEG without native libs). Features: normalized dimensions, aspect
    * ratio, mean R/G/B, luminance mean and stddev. None if ImageIO
    * can't parse the payload.
    */
  private[operators] def decodeImageFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr, sg, sb, sl, sl2 = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      val meanL = sl / n
      val varL = math.max(sl2 / n - meanL * meanL, 0.0)
      Some(Array(
        w / 1024f, h / 1024f, (w.toDouble / h).toFloat,
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
        (meanL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat))
    }
  }

  /** Real audio decode: RIFF/WAVE chunk walk, 16-bit PCM only (the
    * format a JVM can parse with zero codec deps). Features: sample
    * rate (normalized), channels, duration, RMS, peak, zero-crossing
    * rate, mean |amplitude|, DC offset. None for non-PCM16 or
    * malformed payloads.
    */
  private[operators] def decodeWavFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      bb.position(12) // past RIFF<size>WAVE
      var sampleRate = 0
      var channels = 0
      var dataOff = -1
      var dataLen = 0
      while (bb.remaining() >= 8) {
        val id = new Array[Byte](4)
        bb.get(id)
        val size = bb.getInt()
        val body = bb.position()
        new String(id, java.nio.charset.StandardCharsets.US_ASCII) match {
          case "fmt " =>
            val audioFormat = bb.getShort()
            channels = bb.getShort()
            sampleRate = bb.getInt()
            bb.getInt(); bb.getShort() // byte rate, block align
            val bits = bb.getShort()
            if (audioFormat != 1 || bits != 16) return None
          case "data" =>
            dataOff = body
            dataLen = size
          case _ => ()
        }
        // chunks are word-aligned (odd sizes carry a pad byte)
        bb.position(math.min(body + size + (size & 1), payload.length))
      }
      if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
      val nSamples = math.min(dataLen, payload.length - dataOff) / 2
      if (nSamples == 0) return None
      var sum, sumSq, sumAbs, peak, prev = 0.0
      var zc = 0L
      var i = 0
      while (i < nSamples) {
        val s = bb.getShort(dataOff + i * 2) / 32768.0
        sum += s; sumSq += s * s; sumAbs += math.abs(s)
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && (s >= 0) != (prev >= 0)) zc += 1
        prev = s
        i += 1
      }
      val n = nSamples.toDouble
      val durSec = n / channels / sampleRate
      Some(Array(
        (sampleRate / 48000.0).toFloat, channels.toFloat, durSec.toFloat,
        math.sqrt(sumSq / n).toFloat, peak.toFloat, (zc / n).toFloat,
        (sumAbs / n).toFloat, (sum / n).toFloat))
    } catch { case _: Exception => None }
  }

  /** STUB decoder — the fallback for payloads no real codec
    * recognizes (e.g. H.264/MP4, which needs native libs): a
    * deterministic 8-dim byte-histogram moment vector, so the
    * plumbing stays testable on synthetic (text-byte) payloads.
    */
  private[graft] def fakeDecodeFeatures(payload: Array[Byte], dim: Int = FeatureDim): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(payload.length, 1); j += 1 }
    out
  }

  /** Codec dispatch for one payload: sniff the real format, decode with
    * the matching real codec, fall back to the deterministic stub.
    */
  private[graft] def decodeFeatures(payload: Array[Byte]): Array[Float] =
    sniff(payload) match {
      case "image" => decodeImageFeatures(payload).getOrElse(fakeDecodeFeatures(payload))
      case "wav"   => decodeWavFeatures(payload).getOrElse(fakeDecodeFeatures(payload))
      case "avi"   => decodeAviFeatures(payload).getOrElse(fakeDecodeFeatures(payload))
      // mp4: frame decode genuinely needs native codec libs (H.264) —
      // features take the stub; the METADATA path is real (parseMp4Meta)
      case _       => fakeDecodeFeatures(payload) // unknown container STUB
    }

  /** Per-partition batch decode: one codec init per partition, rows
    * streamed through it. Output is the feature relation (payload
    * dropped — never shuffle multi-MB blobs).
    */
  def decodeBatch(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec init: ImageIO's disk cache off once here
      // (a temp-file per decode would dominate small-image cost)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decodeFeatures(r.payload))
      }
    }
  }

  /** 64-bit average hash (aHash) of a decoded image: luminance sampled
    * on an 8×8 grid, one bit per cell = sample > grid mean. The
    * standard cheap perceptual fingerprint — byte-identical payloads
    * always collide, re-encodes/resizes of the same picture usually
    * do, unrelated pictures rarely. None when the payload doesn't
    * decode as an image.
    */
  private[operators] def aHash64(payload: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val samples = new Array[Double](64)
      var i = 0
      while (i < 64) {
        val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
        samples(i) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        i += 1
      }
      val mean = samples.sum / 64.0
      var bits = 0L
      i = 0
      while (i < 64) {
        if (samples(i) > mean) bits |= (1L << i)
        i += 1
      }
      Some(bits)
    }
  }

  /** Spectral fingerprint of a PCM16 WAV — the audio analog of
    * [[aHash64]] (a radically simplified chromaprint): 16 Goertzel
    * band energies over the WHOLE clip, one bit per band = energy
    * above the across-band mean. Mean-relative bits make the hash
    * amplitude-invariant; FREQUENCY bands make it pitch-sensitive
    * where any time-domain envelope is flat (a constant tone has a
    * featureless energy envelope — the naive "energy aHash" would
    * hash every tone to 0).
    *
    * RESAMPLING-INVARIANT by construction (r11) and by MEASUREMENT
    * (r12): bands sit at FIXED physical frequencies 125·(b+1) Hz
    * (125–2000 Hz, the melodic range) with the Goertzel coefficient
    * derived from the header sample rate (`2cos(2π·f/rate)`), and
    * multi-channel payloads walk channel 0 only — so a re-encode at
    * another rate (the commonest real-world audio dup) lands on the
    * SAME cells. A cycles-per-SAMPLE band layout (the pre-r11 design)
    * doubled every band frequency under 2× downsampling and never
    * collided. The r11 design sliced the clip into 8 wall-clock
    * windows of 8 bands each; measured under real linear-interp
    * re-encodes it flipped up to 5 bits per clip, because a ~21 ms
    * fixture clip gives each window ~21 samples — no stable spectral
    * estimate exists at that length, and no threshold has margin
    * (window-boundary rounding alone moves short-window band energies
    * ±30%). Full-clip energies are 8× longer estimates: measured
    * across 2×/2.75×/3×/4×/5.5×/6× re-encodes of the whole fixture
    * family, ZERO bits flip (the driver-gate
    * multimodal_audio_dup_check plants 22.05 kHz re-encodes and
    * counts the collisions exactly). The trade is temporal structure:
    * two clips with the same long-run spectrum collide — acceptable
    * for dedup (collisions are verified downstream by byte or
    * feature comparison where it matters, and the dup-groups row
    * documents group membership as perceptual, not exact).
    * Byte-identical payloads always collide, re-encodes at any
    * standard rate do (measured), different pitches do not. None for
    * non-PCM16 payloads.
    */
  private[graft] def audioHash64(payload: Array[Byte]): Option[Long] = {
    if (payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      bb.position(12) // past RIFF<size>WAVE
      var sampleRate = 0
      var channels = 0
      var dataOff = -1
      var dataLen = 0
      while (bb.remaining() >= 8) {
        val id = new Array[Byte](4)
        bb.get(id)
        val size = bb.getInt()
        val body = bb.position()
        new String(id, java.nio.charset.StandardCharsets.US_ASCII) match {
          case "fmt " =>
            val audioFormat = bb.getShort()
            channels = bb.getShort()
            sampleRate = bb.getInt()
            bb.getInt(); bb.getShort() // byte rate, block align
            val bits = bb.getShort()
            if (audioFormat != 1 || bits != 16) return None
          case "data" =>
            dataOff = body
            dataLen = size
          case _ => ()
        }
        bb.position(math.min(body + size + (size & 1), payload.length))
      }
      if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
      val nSamples = math.min(dataLen, payload.length - dataOff) / 2
      val nFrames = nSamples / channels
      if (nFrames == 0) return None
      val nBand = 16
      val energies = new Array[Double](nBand)
      var b = 0
      while (b < nBand) {
        val hz = 125.0 * (b + 1)
        if (hz < sampleRate / 2.0) { // above-Nyquist bands stay 0
          val coeff = 2.0 * math.cos(2.0 * math.Pi * hz / sampleRate)
          var s1 = 0.0
          var s2 = 0.0
          var i = 0
          while (i < nFrames) {
            val s0 = bb.getShort(dataOff + i * channels * 2) / 32768.0 +
              coeff * s1 - s2
            s2 = s1; s1 = s0
            i += 1
          }
          // normalize by length² so the statistic is duration-free
          energies(b) = (s1 * s1 + s2 * s2 - coeff * s1 * s2) /
            (nFrames.toDouble * nFrames)
        }
        b += 1
      }
      val mean = energies.sum / nBand
      var hash = 0L
      b = 0
      while (b < nBand) {
        if (energies(b) > mean) hash |= 1L << b
        b += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /** Perceptual-duplicate AUDIO groups — [[imageDupGroups]] with the
    * spectral fingerprint as the dedup key: clips that sound the same
    * (byte re-encodes, same tone) collapse even when bytes differ.
    * Same 100 TB shape: fingerprints compute per partition, only the
    * 8-byte hash ever shuffles.
    */
  def audioDupGroups(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.as[MediaRecord].mapPartitions { it =>
      it.flatMap(r =>
        if (r.kind != "audio") None
        else audioHash64(r.payload).map(h => (r.media_id, h)))
    }.toDF("media_id", "ahash")
    val groups = hashed.groupBy(col("ahash"))
      .agg(min(col("media_id")).as("group_rep"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
    hashed.join(broadcast(groups.drop("__n")), "ahash")
      .select(col("group_rep"), col("media_id"))
      .orderBy(col("group_rep"), col("media_id"))
  }

  /** Perceptual-duplicate image groups: decode per partition (payloads
    * never shuffle — only the 8-byte hash does), group by aHash, emit
    * (group_rep, media_id) for every member of a >1 group. The
    * multimodal twin of [[graft.operators.Dedup.dedupExact]]: the
    * dedup key comes from pixels, so byte-level re-encodes of the same
    * picture still collapse.
    */
  def imageDupGroups(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(r =>
        if (r.kind != "image") None
        else aHash64(r.payload).map(h => (r.media_id, h)))
    }.toDF("media_id", "ahash")
    val groups = hashed.groupBy(col("ahash"))
      .agg(min(col("media_id")).as("group_rep"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
    hashed.join(broadcast(groups.drop("__n")), "ahash")
      .select(col("group_rep"), col("media_id"))
      .orderBy(col("group_rep"), col("media_id"))
  }

  case class DecodePath(media_id: Long, kind: String, codec: String,
                        format: String, real: Boolean)

  case class FrameHash(media_id: Long, frame_idx: Int, ahash: Long)

  /** Per-keyframe perceptual hashes of every AVI payload: demux per
    * partition, decode each JPEG frame, aHash it — (media_id,
    * frame_idx, ahash). Payloads never shuffle; only 8-byte hashes
    * and two ids leave the row. Frames that fail to decode are
    * skipped (the decode-counts pin owns codec health).
    */
  def frameHashes(media: DataFrame): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        if (sniff(r.payload) != "avi") Iterator.empty
        else demuxAvi(r.payload).iterator.flatMap { case (_, frames) =>
          frames.iterator.zipWithIndex.flatMap { case (f, i) =>
            aHash64(f).map(h => FrameHash(r.media_id, i, h))
          }
        }
      }
    }
  }

  /** Perceptual-duplicate VIDEO-FRAME groups — [[imageDupGroups]]
    * lifted to the frames [[frameHashes]] extracts: frames sharing an
    * aHash across (or within) videos group together; groups of > 1
    * emit every member keyed by the group's (min media_id, min
    * frame_idx) representative. The video twin of span-level text
    * dedup: a clip re-cut from another clip's frames collapses at
    * frame granularity even when no whole-file hash matches.
    */
  def frameDupGroups(media: DataFrame): DataFrame = {
    val hashed = frameHashes(media).toDF()
    val groups = hashed.groupBy(col("ahash"))
      .agg(min(struct(col("media_id"), col("frame_idx"))).as("rep"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("ahash"), col("rep.media_id").as("rep_media"),
        col("rep.frame_idx").as("rep_frame"))
    hashed.join(groups, "ahash")
      .select(col("rep_media"), col("rep_frame"),
        col("media_id"), col("frame_idx"))
      .orderBy(col("rep_media"), col("rep_frame"),
        col("media_id"), col("frame_idx"))
  }

  /** Per-payload decode dispatch record: which container [[sniff]]
    * recognized and whether the REAL codec produced the features
    * (false = the deterministic stub served the row). Food for the
    * driver's decode-counter pin: feature values themselves are
    * engine-internal (rows-only forever), but the dispatch is exactly
    * checkable — a silent codec regression to the stub path changes
    * n_real_decoded without changing any row count.
    */
  def decodePaths(media: DataFrame): Dataset[DecodePath] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val (codec, real) = sniff(r.payload) match {
          case "image" => ("image", decodeImageFeatures(r.payload).isDefined)
          case "wav"   => ("wav", decodeWavFeatures(r.payload).isDefined)
          case "avi"   => ("avi", decodeAviFeatures(r.payload).isDefined)
          // the H.264 metadata path: "real" = the container walk got
          // genuine structure (stts/stss/stsd) out of the payload —
          // feature extraction still stubs (native codec), which is
          // exactly what the mp4-meta codec label records
          case "mp4"   => ("mp4-meta", parseMp4Meta(r.payload).isDefined)
          case other   => (other, false)
        }
        DecodePath(r.media_id, r.kind, codec, sniffFormat(r.payload), real)
      }
    }
  }

  case class ResizedMedia(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Image resize to a bounding box (aspect preserved), re-encoded as
    * PNG — the thumbnail/normalization pass before feature extraction
    * or vision-model batching. Real for any ImageIO-decodable payload
    * (Graphics2D bilinear, pure JVM); non-image payloads pass through
    * untouched with their original dimensions. Same per-partition
    * batch shape as [[decodeBatch]]; payload stays out of any shuffle.
    */
  def resizeBatch(media: DataFrame, maxDim: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        resizeImage(r.payload, maxDim) match {
          case Some((bytes, w, h)) => ResizedMedia(r.media_id, r.kind, bytes, w, h)
          case None => ResizedMedia(r.media_id, r.kind, r.payload, r.width, r.height)
        }
      }
    }
  }

  private[graft] def resizeImage(payload: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    if (sniff(payload) != "image") return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val (w, h) =
        if (scale >= 1.0) (img.getWidth, img.getHeight)
        else (math.max(1, (img.getWidth * scale).round.toInt),
          math.max(1, (img.getHeight * scale).round.toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some((bos.toByteArray, w, h))
    }
  }

  case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame_ms: Long,
      features: Array[Float])

  /** Frame sampling: every `everyMs` milliseconds of a video payload,
    * one frame row with its feature vector. MJPEG-AVI payloads demux
    * and decode for REAL ([[demuxAvi]] → per-frame JPEG through
    * ImageIO): each sampled timestamp maps to the frame at that point
    * in the clip's own timeline (avih µs-per-frame). Containers the
    * demuxer can't parse fall back to the deterministic stub
    * (byte-histogram + per-frame variation) so the Spark-side
    * contract — one row per sampled timestamp, typed (media_id,
    * frame_idx, frame_ms, features), payload never shuffled — holds
    * for every input; a deployment adds codecs (javacv/ffmpeg), not
    * plumbing.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.filter(_.kind == "video").flatMap { r =>
        demuxAvi(r.payload) match {
          case Some((usPerFrame, frames)) =>
            val durMs = math.max(usPerFrame * frames.length / 1000, 1L)
            val n = math.max(1, (durMs / everyMs).toInt)
            (0 until n).iterator.map { i =>
              val t = i * everyMs
              val idx = math.min(frames.length - 1, (t * 1000 / usPerFrame).toInt)
              val f = decodeImageFeatures(frames(idx))
                .getOrElse(fakeDecodeFeatures(frames(idx)))
              MediaFrame(r.media_id, i, t, f)
            }
          case None =>
            // unknown container: deterministic stub, per-frame variation
            val n = math.max(1, (r.duration_ms / everyMs).toInt)
            (0 until n).iterator.map { i =>
              val varied = fakeDecodeFeatures(r.payload)
              varied(i % varied.length) += (i + 1) / 1000.0f
              MediaFrame(r.media_id, i, i * everyMs, varied)
            }
        }
      }
    }
  }

  /** Feature summary per media kind — the downstream-aggregation shape
    * (joins features back to typed metadata, no payload in the plan).
    */
  def featureStats(media: DataFrame): DataFrame =
    decodeBatch(media).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(element_at(col("features"), 1)).as("mean_f0"))
      .orderBy(col("kind"))
}
