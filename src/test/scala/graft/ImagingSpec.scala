package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Imaging
import graft.extract.{GridPatchExtractor, SurfLiteExtractor}

/** Decode / scale / hash parity gates (BASELINE input_hint: exact for PNG,
  * PSNR ≥ 40 dB for lossy JPEG). */
class ImagingSpec extends AnyFunSuite {

  private val raster = Imaging.syntheticRaster(42L, 7L, 96, 128)

  test("PNG encode/decode round-trip is exact (lossless parity path)") {
    val decoded = Imaging.decode(Imaging.encodePng(raster)).get
    assert(decoded.w == raster.w && decoded.h == raster.h)
    assert(decoded.pixels.sameElements(raster.pixels))
  }

  test("JPEG decode parity PSNR ≥ 40 dB (lossy gate, BASELINE input_hint)") {
    val decoded = Imaging.decode(Imaging.encodeJpeg(raster)).get
    val psnr = Imaging.psnr(raster, decoded)
    assert(psnr >= 40.0, s"JPEG PSNR $psnr < 40 dB")
  }

  test("corrupt bytes decode to None (null-image skip, FeatureExtraction.java:109–116)") {
    assert(Imaging.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Imaging.decode(Array.emptyByteArray).isEmpty)
    assert(Imaging.decode(null).isEmpty)
  }

  test("greyscale JPEG decodes (reference ImageIOGreyScale fallback case)") {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 32).foreach(y => (0 until 32).foreach(x =>
      img.setRGB(x, y, ((x * 8) << 16) | ((x * 8) << 8) | (x * 8))))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val decoded = Imaging.decode(bos.toByteArray)
    assert(decoded.nonEmpty && decoded.get.w == 32)
  }

  test("toRaster fast DataBuffer paths are bit-identical to the getRGB " +
    "oracle (3BYTE_BGR from JPEG/PNG decode, INT_RGB, INT_ARGB, BYTE_GRAY)") {
    import java.awt.image.BufferedImage
    def viaGetRgb(img: BufferedImage): Array[Int] = {
      val px = new Array[Int](img.getWidth * img.getHeight)
      img.getRGB(0, 0, img.getWidth, img.getHeight, px, 0, img.getWidth)
      px.map(_ & 0xffffff)
    }
    def check(img: BufferedImage, label: String): Unit = {
      assert(Imaging.toRaster(img).pixels.sameElements(viaGetRgb(img)),
        s"$label (type ${img.getType})")
    }
    // real decoder outputs: ImageIO gives 3BYTE_BGR for JPEG and RGB PNG
    check(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Imaging.encodeJpeg(raster))), "jpeg decode")
    check(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Imaging.encodePng(raster))), "png decode")
    // synthetic layouts incl. the alpha-masked and ColorModel-converted paths
    for (t <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_INT_ARGB,
      BufferedImage.TYPE_3BYTE_BGR, BufferedImage.TYPE_BYTE_GRAY,
      BufferedImage.TYPE_USHORT_565_RGB)) {
      val img = new BufferedImage(17, 11, t)
      val rnd = new java.util.Random(5 + t)
      (0 until 11).foreach(y => (0 until 17).foreach(x =>
        img.setRGB(x, y, rnd.nextInt() | 0xff000000)))
      check(img, s"synthetic type $t")
    }
  }

  test("maxPixelsScaling geometry matches reference formula (ImageScaling.java:96–116)") {
    // no-op when area <= target (ImageScaling.java:103–105)
    assert(Imaging.maxPixelsScaling(raster, 96L * 128L) eq raster)
    // else floor(dim * sqrt(target/area))
    val big = Imaging.syntheticRaster(42L, 8L, 512, 384)
    val target = 100000L
    val ratio = math.sqrt(target.toDouble / (512 * 384))
    val scaled = Imaging.maxPixelsScaling(big, target)
    assert(scaled.w == (512 * ratio).toInt && scaled.h == (384 * ratio).toInt)
    assert(scaled.w.toLong * scaled.h <= target)
  }

  test("bilinear resampler close to AWT bilinear (sanity, PSNR ≥ 30 dB)") {
    val src = Imaging.toBufferedImage(raster)
    val tw = 48; val th = 64
    val awt = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = awt.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g2.drawImage(src, 0, 0, tw, th, null)
    g2.dispose()
    val ours = Imaging.bilinearResize(raster, tw, th)
    val psnr = Imaging.psnr(Imaging.toRaster(awt), ours)
    assert(psnr >= 30.0, s"bilinear vs AWT PSNR $psnr")
  }

  test("averageHash: deterministic, 20%-skew hot key in synth table") {
    assert(Imaging.averageHash(raster) == Imaging.averageHash(raster))
    val other = Imaging.syntheticRaster(42L, 9L, 96, 128)
    assert(Imaging.averageHash(raster) != Imaging.averageHash(other))
  }

  test("differenceHash: gradient saturation, uniform zero, monotone " +
    "brightness-shift invariance (the property averageHash lacks), locality") {
    def ramp(w: Int, h: Int, asc: Boolean): Imaging.Raster = {
      val px = Array.tabulate(w * h) { i =>
        val x = i % w
        val v = (if (asc) x * 255 / (w - 1) else 255 - x * 255 / (w - 1)) & 0xff
        (v << 16) | (v << 8) | v
      }
      Imaging.Raster(w, h, px)
    }
    // strictly increasing left→right: every gradient bit set; decreasing: none
    assert(Imaging.differenceHash(ramp(36, 16, asc = true)) == -1L)
    assert(Imaging.differenceHash(ramp(36, 16, asc = false)) == 0L)
    assert(Imaging.differenceHash(Imaging.uniformRaster(64, 64, 0x707070)) == 0L)
    // monotone global brightness shift preserves every cell ordering.
    // The base must be TEXTURED (no exactly-tied adjacent cell means —
    // a tie's outcome is FP noise and legitimately flips under the
    // shifted products), and channels sit in [60, 180] so +40 can't clip.
    def mapChannels(r: Imaging.Raster)(f: Int => Int): Imaging.Raster =
      Imaging.Raster(r.w, r.h, r.pixels.map { p =>
        (f((p >> 16) & 0xff) << 16) | (f((p >> 8) & 0xff) << 8) | f(p & 0xff)
      })
    val base = Imaging.Raster(96, 128, Array.tabulate(96 * 128) { i =>
      val h = (i * 2654435761L) ^ ((i * 2654435761L) >>> 31)
      val v = 60 + (h & 0x7fffffffL).toInt % 121
      (v << 16) | (v << 8) | v
    })
    assert(Imaging.differenceHash(mapChannels(base)(_ + 40)) ==
      Imaging.differenceHash(base))
    // locality: a different synthetic image lands far away in Hamming space
    val other = Imaging.syntheticRaster(42L, 9L, 96, 128)
    val dist = java.lang.Long.bitCount(
      Imaging.differenceHash(base) ^ Imaging.differenceHash(other))
    assert(dist >= 12, s"distinct images only $dist bits apart")
    // and the expression matches the kernel through the decoder
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.functions.ImageExpressions
    val viaExpr = Seq(Tuple1(Imaging.encodePng(base))).toDF("img_bytes")
      .select(ImageExpressions.dhash64(
        ImageExpressions.decode_image(col("img_bytes"))).as("h"))
      .as[Long].head()
    assert(viaExpr == Imaging.differenceHash(base))
  }

  test("uniform raster yields zero descriptors → VLAD zero-vector edge row") {
    val flat = Imaging.uniformRaster(64, 64, 0x808080)
    assert(GridPatchExtractor().extract(flat).isEmpty)
    assert(SurfLiteExtractor().extract(flat).isEmpty)
  }

  test("GridPatchExtractor: deterministic, fixed length 8") {
    val ex = GridPatchExtractor()
    val d1 = ex.extract(raster); val d2 = ex.extract(raster)
    assert(d1.nonEmpty && d1.forall(_.length == 8))
    assert(d1.zip(d2).forall { case (a, b) => a.sameElements(b) })
  }

  test("RootTransformed applies SSR per descriptor (RootSIFTExtractor.java:31–38)") {
    import graft.extract.RootTransformed
    import graft.kernels.Kernels
    val ex = GridPatchExtractor()
    val root = RootTransformed(ex)
    val plain = ex.extract(raster)
    val rooted = root.extract(raster)
    assert(plain.length == rooted.length && plain.nonEmpty)
    plain.zip(rooted).foreach { case (p, r2) =>
      val expect = Kernels.normalizeSSR(p)
      assert(r2.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    }
  }

  test("ColorSurfLite: 192-d, same keypoints as grey detect, per-band unit norm " +
    "(ColorSURFExtractor.java:67–161)") {
    import graft.extract.{ColorSurfLiteExtractor, SurfLiteExtractor}
    import graft.kernels.Kernels
    val big = Imaging.syntheticRaster(42L, 3L, 200, 150)
    val color = ColorSurfLiteExtractor(detectThreshold = 1.0)
    val d = color.extract(big)
    assert(d.nonEmpty && d.forall(_.length == 192))
    // per-band normalization: each 64-d band slice is unit-norm
    d.foreach { v =>
      (0 until 3).foreach { b =>
        val slice = v.slice(b * 64, (b + 1) * 64)
        assert(math.abs(Kernels.l2Norm(slice) - 1.0) < 1e-9)
      }
    }
    // final-L2 variant: whole 192-d vector unit-norm
    val d2 = ColorSurfLiteExtractor(detectThreshold = 1.0,
      perBandNormalization = false).extract(big)
    d2.foreach(v => assert(math.abs(Kernels.l2Norm(v) - 1.0) < 1e-9))
    // keypoint count bounded by the grey detector's
    val greyPoints = SurfLiteExtractor(detectThreshold = 1.0).extract(big).length
    assert(d.length <= math.max(greyPoints, 1) || greyPoints == 0 || d.nonEmpty)
  }

  test("SiftLiteExtractor: 128-d unit-norm, 0.2-clamped, deterministic; " +
    "RootSIFT composes (SIFTExtractor.java:47–62, RootSIFTExtractor.java:31–38)") {
    import graft.extract.{RootTransformed, SiftLiteExtractor}
    import graft.kernels.Kernels
    val big = Imaging.syntheticRaster(42L, 3L, 200, 150)
    val ex = SiftLiteExtractor(detectThreshold = 1.0)
    val d = ex.extract(big)
    assert(d.nonEmpty && d.forall(_.length == 128))
    d.foreach { v =>
      assert(math.abs(Kernels.l2Norm(v) - 1.0) < 1e-9)
      // post-clamp renormalization can push entries slightly above 0.2
      assert(v.forall(x => x >= 0.0 && x <= 0.5))
    }
    val d2 = ex.extract(big)
    assert(d.length == d2.length && d.zip(d2).forall { case (a, b) => a.sameElements(b) })
    assert(ex.extract(Imaging.uniformRaster(64, 64, 0x808080)).isEmpty)
    // RootSIFT = SIFT then SSR
    val rooted = RootTransformed(ex).extract(big)
    rooted.zip(d).foreach { case (r2, p) =>
      val expect = Kernels.normalizeSSR(p)
      assert(r2.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    }
  }

  test("augmentation kernels: flip is a self-inverse mirror, rotate90 maps " +
    "(x,y)→(h−1−y,x) and is 4-periodic, crops are exact sub-rasters and the " +
    "seeded crop is a pure function of the seed") {
    val r = Imaging.syntheticRaster(7L, 3L, 20, 12)
    def px(a: Imaging.Raster, x: Int, y: Int): Int = a.pixels(y * a.w + x)
    // flip: mirror + self-inverse
    val f = Imaging.flipHorizontal(r)
    assert(f.w == r.w && f.h == r.h)
    (0 until r.h).foreach(y => (0 until r.w).foreach(x =>
      assert(px(f, x, y) == px(r, r.w - 1 - x, y))))
    assert(Imaging.flipHorizontal(f).pixels.sameElements(r.pixels))
    // rotate: dims swap, exact mapping, period 4, negative == mod 4
    val r1 = Imaging.rotate90(r, 1)
    assert(r1.w == r.h && r1.h == r.w)
    (0 until r.h).foreach(y => (0 until r.w).foreach(x =>
      assert(px(r1, r.h - 1 - y, x) == px(r, x, y))))
    assert(Imaging.rotate90(r, 4).pixels.sameElements(r.pixels))
    assert(Imaging.rotate90(r, -1).pixels.sameElements(Imaging.rotate90(r, 3).pixels))
    // center crop: exact sub-raster, clamped when larger than the source
    val c = Imaging.centerCrop(r, 10, 6)
    assert(c.w == 10 && c.h == 6)
    (0 until 6).foreach(y => (0 until 10).foreach(x =>
      assert(px(c, x, y) == px(r, 5 + x, 3 + y))))
    val big = Imaging.centerCrop(r, 999, 999)
    assert(big.w == r.w && big.h == r.h && big.pixels.sameElements(r.pixels))
    // seeded crop: in-bounds sub-raster, deterministic per seed
    val s1 = Imaging.seededCrop(r, 8, 8, seed = 5L)
    val s2 = Imaging.seededCrop(r, 8, 8, seed = 5L)
    assert(s1.w == 8 && s1.h == 8 && s1.pixels.sameElements(s2.pixels))
    // every seeded crop is an exact sub-raster of the source (recover its
    // offset by scanning all positions)
    (0L until 8L).foreach { s =>
      val cr = Imaging.seededCrop(r, 8, 8, s)
      val found = (0 to r.w - 8).exists(x0 => (0 to r.h - 8).exists(y0 =>
        (0 until 8).forall(y => (0 until 8).forall(xx =>
          px(cr, xx, y) == px(r, x0 + xx, y0 + y)))))
      assert(found, s"seed $s crop is not a sub-raster")
    }
    // different seeds reach different offsets (not a constant crop)
    val distinct = (0L until 32L).map(s =>
      Imaging.seededCrop(r, 8, 8, s).pixels.toSeq).distinct.size
    assert(distinct > 4, s"seeded crops should vary across seeds, got $distinct")
  }

  test("augmentation expressions: struct-level flip/rotate/crop agree with " +
    "the kernels through the codegen path") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.ImageExpressions._
    val bytes = Imaging.encodePng(Imaging.syntheticRaster(9L, 1L, 24, 16))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, bytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.BinaryType))))
    val out = df.select(
        decode_image(col("bytes")).as("img"))
      .select(
        col("img.w").as("w0"), col("img.h").as("h0"),
        img_flip_h(col("img")).as("f"),
        img_rotate90(col("img"), lit(1)).as("r1"),
        img_center_crop(col("img"), lit(10), lit(6)).as("cc"),
        img_seeded_crop(col("img"), lit(8), lit(8), lit(5L)).as("sc"))
      .selectExpr("w0", "h0", "f.w", "f.h", "r1.w", "r1.h", "cc.w", "cc.h",
        "sc.w", "sc.h", "f.pixels AS fp", "sc.pixels AS scp")
      .head()
    assert(out.getInt(0) == 24 && out.getInt(1) == 16)
    assert(out.getInt(2) == 24 && out.getInt(3) == 16) // flip keeps dims
    assert(out.getInt(4) == 16 && out.getInt(5) == 24) // rotate swaps dims
    assert(out.getInt(6) == 10 && out.getInt(7) == 6)
    assert(out.getInt(8) == 8 && out.getInt(9) == 8)
    val decoded = Imaging.decode(bytes).get
    assert(out.getSeq[Int](10) ==
      Imaging.flipHorizontal(decoded).pixels.toSeq)
    assert(out.getSeq[Int](11) ==
      Imaging.seededCrop(decoded, 8, 8, 5L).pixels.toSeq)
  }

  test("SurfLiteExtractor: deterministic 64-d unit-norm descriptors on structured image") {
    val ex = SurfLiteExtractor(detectThreshold = 1.0)
    val big = Imaging.syntheticRaster(42L, 3L, 200, 150)
    val d = ex.extract(big)
    assert(d.nonEmpty, "expected keypoints on structured raster")
    assert(d.forall(_.length == 64))
    d.foreach(v => assert(math.abs(graft.kernels.Kernels.l2Norm(v) - 1.0) < 1e-9))
    val d2 = ex.extract(big)
    assert(d.length == d2.length && d.zip(d2).forall { case (a, b) => a.sameElements(b) })
  }
}
