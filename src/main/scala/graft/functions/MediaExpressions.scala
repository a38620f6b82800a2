package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Multimodal (audio/video) columns, same seam as the image path: the payload
 * is an opaque `binary` column; decode/feature-extract happens row-local in a
 * native expression; malformed bytes yield NULL (the error channel), never a
 * task failure. The reference is image-only — these exist because a
 * training-data engine ingests mixed media through one pipeline shape.
 *
 * - [[AudioPcmStats]] is a REAL parser for RIFF/WAVE PCM16 (the format is a
 *   public 44-byte-header standard; no codec library needed).
 * - [[VideoFrameSample]] demuxes REAL RIFF-AVI containers
 *   ([[parseAviFrames]]): the chunk walk (RIFF → LIST 'movi' → '00dc'/'00db'
 *   frame chunks, word-aligned, 'rec ' LISTs recursed) follows the public
 *   AVI spec, and for MJPEG streams every '00dc' payload is a complete JPEG
 *   that [[graft.kernels.Imaging.decode]] can decode — a fully real
 *   demux→decode path with no codec library. Inter-frame codecs (H.264 etc.)
 *   would need decoders the sandbox lacks (zero egress); those frames still
 *   demux (refs are returned), they just cannot be pixel-decoded. The toy
 *   "GVID" container (magic, frame count, length-prefixed frames) is kept as
 *   a second accepted format and as the documented minimal seam.
 */
object MediaExpressions {

  final case class PcmStats(sampleRate: Int, channels: Int, nSamples: Long,
                            rms: Double, peak: Double)

  /** Parse RIFF/WAVE PCM16 and compute amplitude stats; None if malformed. */
  def parseWavPcm16(bytes: Array[Byte]): Option[PcmStats] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(off)
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = bb.getShort(off + 8).toInt
          if (audioFormat != 1) return None // PCM only
          channels = bb.getShort(off + 10).toInt
          sampleRate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22).toInt
          if (bits != 16) return None
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
    val n = dataLen / 2
    var i = 0; var sumSq = 0.0; var peak = 0.0
    while (i < n) {
      val s = bb.getShort(dataOff + 2 * i) / 32768.0
      sumSq += s * s
      val a = math.abs(s); if (a > peak) peak = a
      i += 1
    }
    Some(PcmStats(sampleRate, channels, n.toLong / math.max(channels, 1),
      if (n == 0) 0.0 else math.sqrt(sumSq / n), peak))
  }

  /** Encode a PCM16 WAV (test/synthesis side of the real parser). */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2); bb.putShort((channels * 2).toShort)
    bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  final case class FrameRef(idx: Int, offset: Int, size: Int)

  /**
   * REAL RIFF-AVI demux: walk the chunk tree to LIST 'movi' and collect the
   * video frame chunks in stream order. Frame chunk ids are '##dc'
   * (compressed) / '##db' (uncompressed) per the AVI spec; 'rec ' LISTs
   * (interleave groups) are recursed. Chunks are word-aligned (odd sizes pad
   * one byte). Returns every-`everyN`-th frame's (index, payload offset,
   * size) — for MJPEG streams the payload at each ref is a standalone JPEG.
   * None on anything malformed (bad magic, truncated chunk, negative size) —
   * the null-on-corrupt error channel, never an exception.
   */
  def parseAviFrames(bytes: Array[Byte], everyN: Int): Option[Seq[FrameRef]] = {
    if (bytes == null || bytes.length < 12 || everyN <= 0) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val riffEnd = {
      val size = bb.getInt(4)
      if (size < 4) return None
      math.min(bytes.length.toLong, 8L + size).toInt
    }
    val frames = Seq.newBuilder[(Int, Int)] // (payload offset, size)
    // video frame chunks only: '##dc' / '##db' ('##wb' audio is not a frame)
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    // walk one chunk sequence in [off, end); inMovi: collect frame chunks.
    // Bounds math in Long — a crafted chunk size near Int.MaxValue must fail
    // the `> end` check, not wrap negative and escape it. Depth is capped:
    // real AVI nests ≤3 LIST levels; thousands of nested 12-byte LISTs is a
    // malformed/adversarial file and must yield None, not StackOverflowError
    // (both would otherwise escape nullSafeEval and kill the task).
    def walk(start: Int, end: Int, inMovi: Boolean, depth: Int): Boolean = {
      if (depth > 16) return false
      var off = start
      while (off + 8 <= end) {
        val id = tag(off)
        val size = bb.getInt(off + 4)
        if (size < 0 || off.toLong + 8L + size > end) return false
        if (id == "LIST") {
          if (size < 4) return false
          val listType = tag(off + 8)
          val enter = listType == "movi" || (inMovi && listType == "rec ")
          if (enter || listType == "hdrl") {
            if (!walk(off + 12, off + 8 + size,
                enter && (inMovi || listType == "movi"), depth + 1))
              return false
          }
        } else if (inMovi && isFrameChunk(id)) {
          frames += ((off + 8, size))
        }
        off += 8 + size + (size & 1)
      }
      true
    }
    if (!walk(12, riffEnd, inMovi = false, depth = 0)) return None
    val all = frames.result()
    Some(all.zipWithIndex.collect {
      case ((o, s), i) if i % everyN == 0 => FrameRef(i, o, s)
    })
  }

  /** Minimal spec-conformant MJPEG-AVI writer (test/synthesis side of the
    * real demuxer): RIFF('AVI '){ LIST('hdrl'){ avih, LIST('strl'){ strh
    * 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST('movi'){ '00dc'… } }. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                     fps: Int = 25): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes); bb.putInt(body.length); bb.put(body)
      bb.array()
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.flatten.toArray
      val bb = ByteBuffer.allocate(12 + inner.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes); bb.putInt(4 + inner.length)
      bb.put(listType.getBytes); bb.put(inner)
      bb.array()
    }
    val maxBytes = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = { // MainAVIHeader (56 bytes)
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / math.max(fps, 1)) // usec per frame
      b.putInt(maxBytes * fps)             // max bytes/sec
      b.putInt(0)                          // padding granularity
      b.putInt(0x10)                       // flags: AVIF_HASINDEX off, interleaved off
      b.putInt(frames.length); b.putInt(0) // total frames, initial frames
      b.putInt(1)                          // streams
      b.putInt(maxBytes)                   // suggested buffer
      b.putInt(width); b.putInt(height)
      b.array() // 16 reserved bytes remain zero
    }
    val strh = { // AVIStreamHeader (56 bytes)
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes); b.put("MJPG".getBytes)
      b.putInt(0); b.putShort(0); b.putShort(0); b.putInt(0)
      b.putInt(1); b.putInt(math.max(fps, 1)) // scale, rate
      b.putInt(0); b.putInt(frames.length)    // start, length
      b.putInt(maxBytes); b.putInt(-1); b.putInt(0) // bufsize, quality, samplesize
      b.putShort(0); b.putShort(0)
      b.putShort(width.toShort); b.putShort(height.toShort)
      b.array()
    }
    val strf = { // BITMAPINFOHEADER (40 bytes)
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40); b.putInt(width); b.putInt(height)
      b.putShort(1); b.putShort(24)
      b.put("MJPG".getBytes)
      b.putInt(width * height * 3)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      b.array()
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + body.length); bb.put("AVI ".getBytes)
    bb.put(body)
    bb.array()
  }

  /** Demux the toy "GVID" container; every-nth frame refs. None if malformed. */
  def sampleGvidFrames(bytes: Array[Byte], everyN: Int): Option[Seq[FrameRef]] = {
    if (bytes == null || bytes.length < 8 || everyN <= 0) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (!(bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'I' && bytes(3) == 'D'))
      return None
    val nFrames = bb.getInt(4)
    if (nFrames < 0) return None
    var off = 8
    val out = Seq.newBuilder[FrameRef]
    var i = 0
    while (i < nFrames) {
      if (off + 4 > bytes.length) return None
      val size = bb.getInt(off)
      if (size < 0 || off + 4 + size > bytes.length) return None
      if (i % everyN == 0) out += FrameRef(i, off + 4, size)
      off += 4 + size
      i += 1
    }
    Some(out.result())
  }

  /** Build a GVID blob (test/synthesis side). */
  def encodeGvid(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes); bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  val pcmStatsType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  case class AudioPcmStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = pcmStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "audio_pcm_stats"
    override def nullSafeEval(b: Any): Any =
      parseWavPcm16(b.asInstanceOf[Array[Byte]]) match {
        case None => null
        case Some(s) => new GenericInternalRow(Array[Any](
          s.sampleRate, s.channels, s.nSamples, s.rms, s.peak))
      }
    override protected def withNewChildInternal(c: Expression): AudioPcmStats =
      copy(child = c)
  }

  val frameRefType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("offset", IntegerType, nullable = false),
    StructField("size", IntegerType, nullable = false))), containsNull = false)

  case class VideoFrameSample(child: Expression, everyN: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = frameRefType
    override def nullable: Boolean = true
    override def prettyName: String = "video_frame_sample"
    override def nullSafeEval(b: Any): Any = {
      val bytes = b.asInstanceOf[Array[Byte]]
      // real RIFF-AVI first (rejects non-AVI on magic in O(1)), toy GVID next
      parseAviFrames(bytes, everyN).orElse(sampleGvidFrames(bytes, everyN)) match {
        case None => null
        case Some(refs) => new GenericArrayData(refs.map(r =>
          new GenericInternalRow(Array[Any](r.idx, r.offset, r.size))))
      }
    }
    override protected def withNewChildInternal(c: Expression): VideoFrameSample =
      copy(child = c)
  }

  def audio_pcm_stats(bytes: Column): Column =
    GraftBridge.column(AudioPcmStats(GraftBridge.expression(bytes)))
  def video_frame_sample(bytes: Column, everyN: Int): Column =
    GraftBridge.column(VideoFrameSample(GraftBridge.expression(bytes), everyN))
}
