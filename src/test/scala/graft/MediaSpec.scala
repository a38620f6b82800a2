package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaExpressions
import graft.functions.MediaExpressions.{encodeAviMjpeg, encodeGvid, encodeWavPcm16, parseAviFrames, parseWavPcm16, sampleGvidFrames}

/** Multimodal binary columns: real PCM16-WAV parse (stats pinned to a scalar
  * recomputation), real RIFF-AVI demux with decodable MJPEG frames,
  * toy-container frame sampling, null error channel for corrupt payloads —
  * all row-local through native expressions. */
class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sine(sr: Int, n: Int, freq: Double): Array[Short] =
    Array.tabulate(n)(t => (math.sin(2 * math.Pi * freq * t / sr) * 12000).toShort)

  test("parseWavPcm16 round-trips encodeWavPcm16 and computes exact stats") {
    val samples = sine(8000, 800, 220.0)
    val stats = parseWavPcm16(encodeWavPcm16(8000, 1, samples)).get
    assert(stats.sampleRate == 8000 && stats.channels == 1 && stats.nSamples == 800)
    val ref = samples.map(_ / 32768.0)
    assert(math.abs(stats.rms - math.sqrt(ref.map(x => x * x).sum / ref.length)) < 1e-12)
    assert(math.abs(stats.peak - ref.map(math.abs).max) < 1e-12)
  }

  test("parseWavPcm16 rejects malformed payloads (short, bad magic, " +
    "non-PCM, truncated chunks)") {
    assert(parseWavPcm16(Array[Byte](1, 2, 3)).isEmpty)
    val good = encodeWavPcm16(8000, 1, sine(8000, 100, 440.0))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(parseWavPcm16(badMagic).isEmpty)
    val truncated = java.util.Arrays.copyOf(good, good.length - 50)
    assert(parseWavPcm16(truncated).isEmpty)
  }

  test("audio_pcm_stats expression: stats through the DataFrame, null for corrupt") {
    val rows = Seq(
      ("a", encodeWavPcm16(16000, 2, sine(16000, 640, 330.0))),
      ("b", Array[Byte](0, 0, 0, 0))).toDF("id", "bytes")
    val got = rows.select(col("id"),
      MediaExpressions.audio_pcm_stats(col("bytes")).as("s"))
      .orderBy("id").collect()
    assert(got(0).getStruct(1).getInt(0) == 16000)
    assert(got(0).getStruct(1).getInt(1) == 2)
    assert(got(0).getStruct(1).getLong(2) == 320) // 640 samples / 2 channels
    assert(got(1).isNullAt(1))
  }

  test("sampleGvidFrames: every-nth refs with exact offsets; corrupt → None") {
    val frames = Seq.tabulate(5)(i => Array.fill(10 + i)(i.toByte))
    val blob = encodeGvid(frames)
    val refs = sampleGvidFrames(blob, 2).get
    assert(refs.map(_.idx) == Seq(0, 2, 4))
    refs.foreach { r =>
      val payload = java.util.Arrays.copyOfRange(blob, r.offset, r.offset + r.size)
      assert(payload.sameElements(frames(r.idx)), s"frame ${r.idx}")
    }
    assert(sampleGvidFrames(Array[Byte](1, 2), 2).isEmpty)
    // declared frame larger than the blob → malformed, not a crash
    val bad = blob.clone(); bad(8) = 127 // first frame size byte
    assert(sampleGvidFrames(bad, 1).isEmpty)
  }

  test("parseAviFrames: real RIFF-AVI demux — every-nth refs whose payloads " +
    "decode as JPEG (MJPEG end-to-end, no codec library); corrupt → None") {
    import graft.kernels.Imaging
    val rasters = Seq.tabulate(6)(i =>
      Imaging.syntheticRaster(7L, i.toLong, 64, 48))
    val jpegs = rasters.map(r => Imaging.encodeJpeg(r))
    val avi = encodeAviMjpeg(jpegs, width = 64, height = 48)
    val refs = parseAviFrames(avi, 2).get
    assert(refs.map(_.idx) == Seq(0, 2, 4))
    refs.foreach { r =>
      val payload = java.util.Arrays.copyOfRange(avi, r.offset, r.offset + r.size)
      assert(payload.sameElements(jpegs(r.idx)), s"frame ${r.idx} payload")
      val dec = Imaging.decode(payload)
      assert(dec.nonEmpty && dec.get.w == 64 && dec.get.h == 48,
        s"frame ${r.idx} must decode as a standalone JPEG")
      assert(Imaging.psnr(rasters(r.idx), dec.get) >= 40.0,
        s"frame ${r.idx} PSNR gate")
    }
    // odd-sized frames exercise the word-alignment padding
    val odd = Seq(Array.tabulate(7)(_.toByte), Array.tabulate(10)(_.toByte),
      Array.tabulate(3)(_.toByte))
    val aviOdd = encodeAviMjpeg(odd, 4, 4)
    val all = parseAviFrames(aviOdd, 1).get
    assert(all.map(_.size) == Seq(7, 10, 3))
    all.foreach { r =>
      assert(java.util.Arrays.copyOfRange(aviOdd, r.offset, r.offset + r.size)
        .sameElements(odd(r.idx)))
    }
    // malformed: bad magic, truncated mid-chunk, negative size
    val badMagic = avi.clone(); badMagic(8) = 'X'.toByte
    assert(parseAviFrames(badMagic, 1).isEmpty)
    assert(parseAviFrames(java.util.Arrays.copyOf(avi, avi.length - 40), 1).isEmpty)
    assert(parseAviFrames(Array[Byte](1, 2, 3), 1).isEmpty)
    // adversarial: chunk size near Int.MaxValue must fail the bounds check,
    // not wrap negative and escape it (None, never an exception)
    val overflow = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    overflow.put("RIFF".getBytes); overflow.putInt(56); overflow.put("AVI ".getBytes)
    overflow.put("LIST".getBytes); overflow.putInt(0x7FFFFFF4); overflow.put("movi".getBytes)
    assert(parseAviFrames(overflow.array(), 1).isEmpty)
    // adversarial: deeply nested LISTs must hit the depth cap (None, not
    // StackOverflowError)
    val depth = 2000
    val nested = java.nio.ByteBuffer.allocate(12 + depth * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nested.put("RIFF".getBytes); nested.putInt(4 + depth * 12); nested.put("AVI ".getBytes)
    (0 until depth).foreach { lvl =>
      nested.put("LIST".getBytes)
      nested.putInt(4 + (depth - 1 - lvl) * 12)
      nested.put("movi".getBytes)
    }
    assert(parseAviFrames(nested.array(), 1).isEmpty)
  }

  test("video_frame_sample expression accepts BOTH containers: real AVI and " +
    "toy GVID rows in one column") {
    import graft.kernels.Imaging
    val jpegs = Seq.tabulate(4)(i =>
      Imaging.encodeJpeg(Imaging.syntheticRaster(3L, i.toLong, 16, 16)))
    val rows = Seq(
      ("avi", encodeAviMjpeg(jpegs, 16, 16)),
      ("gvid", encodeGvid(Seq.tabulate(4)(i => Array.fill(6)(i.toByte))))
    ).toDF("id", "bytes")
    val got = rows.select(col("id"),
      MediaExpressions.video_frame_sample(col("bytes"), 2).as("f"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1).map(_.getInt(0)) == Seq(0, 2), r.getString(0))
    }
  }

  test("video_frame_sample expression: sampled counts per row, null for corrupt") {
    val rows = Seq(
      ("v1", encodeGvid(Seq.tabulate(6)(i => Array.fill(8)(i.toByte)))),
      ("v2", Array[Byte](9, 9))).toDF("id", "bytes")
    val got = rows.select(col("id"),
      MediaExpressions.video_frame_sample(col("bytes"), 3).as("f"))
      .orderBy("id").collect()
    assert(got(0).getSeq[org.apache.spark.sql.Row](1).map(_.getInt(0)) == Seq(0, 3))
    assert(got(1).isNullAt(1))
  }
}
