package graft.extract

import graft.kernels.Imaging.Raster
import graft.kernels.Imaging

/**
 * Local-descriptor extractors. The reference delegates to BoofCV
 * (ext/SURFExtractor.java:44–59, ext/SIFTExtractor.java:47–62) which is not
 * available offline, so extractors here are our own deterministic
 * implementations behind one interface (SURVEY.md §7 build step 4):
 *  - [[GridPatchExtractor]] — the test workhorse: fixed grid, moment-based
 *    descriptors, trivially deterministic. Downstream parity
 *    (VLAD→PCA→PQ→as-of) is gated on descriptor inputs, per SURVEY.md §5.
 *  - [[SurfLiteExtractor]] — Fast-Hessian-style interest points + 64-d
 *    Haar-wavelet descriptor, parameterized like the reference's
 *    ConfigFastHessian (ext/SURFExtractor.java:48).
 */
trait LocalFeatureExtractor extends Serializable {
  /** Descriptor dimensionality (constant per extractor). */
  def descriptorLength: Int
  /** Extract descriptors from a decoded raster; may be empty (zero-keypoint
    * images must yield an empty set so VLAD produces the zero vector,
    * agg/VladAggregator.java:37–39). */
  def extract(r: Raster): Array[Array[Double]]
}

/**
 * Deterministic grid extractor: splits the image into `grid`×`grid` cells and
 * emits one 8-d moment descriptor per cell with enough local variance.
 * Descriptor: [mean, std, meanDx, meanDy, q00, q01, q10, q11] over grey
 * values, each scaled to O(1) range. Uniform rasters emit zero descriptors.
 */
final case class GridPatchExtractor(grid: Int = 4, minStd: Double = 1.0)
    extends LocalFeatureExtractor {
  override val descriptorLength: Int = 8

  override def extract(r: Raster): Array[Array[Double]] = {
    // float32 luma plane: the grey image is read ~3x per pixel, so one
    // compact precomputed plane beats both double[] (2x memory) and inline
    // recompute (3x flops) — the pipeline is bandwidth-bound at full box load
    val g = Imaging.greyF(r)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var cy = 0
    while (cy < grid) {
      val y0 = cy * r.h / grid; val y1 = math.max(y0 + 2, (cy + 1) * r.h / grid)
      var cx = 0
      while (cx < grid) {
        val x0 = cx * r.w / grid; val x1 = math.max(x0 + 2, (cx + 1) * r.w / grid)
        if (y1 <= r.h && x1 <= r.w) {
          val d = cellDescriptor(g, r.w, x0, y0, x1, y1)
          if (d(1) * 64.0 >= minStd) out += d // std gate → uniform cell skipped
        }
        cx += 1
      }
      cy += 1
    }
    out.toArray
  }

  private def cellDescriptor(g: Array[Float], w: Int,
                             x0: Int, y0: Int, x1: Int, y1: Int): Array[Double] = {
    var sum = 0.0; var sumSq = 0.0; var n = 0
    var sumDx = 0.0; var sumDy = 0.0
    val mx = (x0 + x1) / 2; val my = (y0 + y1) / 2
    val q = new Array[Double](4); val qn = new Array[Int](4)
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) {
        val v: Double = g(y * w + x)
        sum += v; sumSq += v * v; n += 1
        if (x + 1 < x1) sumDx += g(y * w + x + 1) - v
        if (y + 1 < y1) sumDy += g((y + 1) * w + x) - v
        val qi = (if (y >= my) 2 else 0) + (if (x >= mx) 1 else 0)
        q(qi) += v; qn(qi) += 1
        x += 1
      }
      y += 1
    }
    val mean = sum / n
    val variance = math.max(0.0, sumSq / n - mean * mean)
    Array(
      mean / 128.0 - 1.0,
      math.sqrt(variance) / 64.0,
      sumDx / n / 32.0,
      sumDy / n / 32.0,
      (if (qn(0) > 0) q(0) / qn(0) else mean) / 128.0 - 1.0,
      (if (qn(1) > 0) q(1) / qn(1) else mean) / 128.0 - 1.0,
      (if (qn(2) > 0) q(2) / qn(2) else mean) / 128.0 - 1.0,
      (if (qn(3) > 0) q(3) / qn(3) else mean) / 128.0 - 1.0
    )
  }
}

/**
 * SURF-style extractor: integral-image Fast-Hessian detector (approximated
 * determinant-of-Hessian via box filters, 3×3×3 non-max suppression across a
 * small octave stack) + 64-d descriptor of Haar-wavelet responses summed over
 * a 4×4 grid of subregions (Σdx, Σdy, Σ|dx|, Σ|dy|), L2-normalized.
 * Parameter names mirror the reference's ConfigFastHessian(detectThreshold,
 * extractRadius=2, maxFeaturesPerScale, initialSampleSize=2, initialSize=9,
 * numberScalesPerOctave=4, numberOfOctaves=4) at ext/SURFExtractor.java:48.
 * Upright variant (no orientation assignment) — deterministic and sufficient
 * for pipeline semantics; BoofCV bit-parity is out of scope (SURVEY.md §5).
 */
final case class SurfLiteExtractor(
    detectThreshold: Double = 100.0,
    maxFeaturesPerScale: Int = 128,
    numberOfOctaves: Int = 3)
    extends LocalFeatureExtractor {
  override val descriptorLength: Int = 64

  override def extract(r: Raster): Array[Array[Double]] = {
    val ii = integralImage(Imaging.grey(r), r.w, r.h)
    val points = detect(ii, r.w, r.h)
    points.flatMap { case (x, y, s, _) => describe(ii, r.w, r.h, x, y, s) }
  }

  /** Keypoints on the grey integral image — shared with ColorSurfLite. */
  private[extract] def detectPoints(r: Raster): Array[(Int, Int, Int, Double)] =
    detect(integralImage(Imaging.grey(r), r.w, r.h), r.w, r.h)

  /** Summed-area table with 1-pixel zero border: ii(y)(x) = Σ g[0..y) [0..x). */
  private[extract] def integralImage(g: Array[Double], w: Int, h: Int): Array[Double] = {
    val ii = new Array[Double]((w + 1) * (h + 1))
    var y = 1
    while (y <= h) {
      var rowSum = 0.0
      var x = 1
      while (x <= w) {
        rowSum += g((y - 1) * w + (x - 1))
        ii(y * (w + 1) + x) = ii((y - 1) * (w + 1) + x) + rowSum
        x += 1
      }
      y += 1
    }
    ii
  }

  @inline private def boxSum(ii: Array[Double], w: Int, h: Int,
                             x0: Int, y0: Int, x1: Int, y1: Int): Double = {
    // sum over [x0,x1) × [y0,y1), clamped to image
    val cx0 = math.max(0, math.min(w, x0)); val cx1 = math.max(0, math.min(w, x1))
    val cy0 = math.max(0, math.min(h, y0)); val cy1 = math.max(0, math.min(h, y1))
    if (cx1 <= cx0 || cy1 <= cy0) 0.0
    else {
      val s = w + 1
      ii(cy1 * s + cx1) - ii(cy0 * s + cx1) - ii(cy1 * s + cx0) + ii(cy0 * s + cx0)
    }
  }

  /** Approximate det-of-Hessian response at (x,y) with box-filter lobe size l. */
  private def hessianResponse(ii: Array[Double], w: Int, h: Int,
                              x: Int, y: Int, l: Int): Double = {
    val norm = 1.0 / (9.0 * l * l * l * l) // (filter area)^2 normalization
    // Dyy: three stacked horizontal lobes (2l+1 wide × l tall each)
    val dyy = boxSum(ii, w, h, x - l, y - l - l / 2 - 1, x + l + 1, y - l / 2) -
      2.0 * boxSum(ii, w, h, x - l, y - l / 2, x + l + 1, y + l / 2 + 1) +
      boxSum(ii, w, h, x - l, y + l / 2 + 1, x + l + 1, y + l + l / 2 + 2)
    // Dxx: transpose
    val dxx = boxSum(ii, w, h, x - l - l / 2 - 1, y - l, x - l / 2, y + l + 1) -
      2.0 * boxSum(ii, w, h, x - l / 2, y - l, x + l / 2 + 1, y + l + 1) +
      boxSum(ii, w, h, x + l / 2 + 1, y - l, x + l + l / 2 + 2, y + l + 1)
    // Dxy: four diagonal quadrant lobes
    val dxy = boxSum(ii, w, h, x - l, y - l, x, y) +
      boxSum(ii, w, h, x + 1, y + 1, x + l + 1, y + l + 1) -
      boxSum(ii, w, h, x + 1, y - l, x + l + 1, y) -
      boxSum(ii, w, h, x - l, y + 1, x, y + l + 1)
    norm * (dxx * dyy - 0.81 * dxy * dxy)
  }

  /** Multi-scale detection with per-scale top-N and 3×3 spatial non-max. */
  private def detect(ii: Array[Double], w: Int, h: Int): Array[(Int, Int, Int, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double)]
    var octave = 0
    while (octave < numberOfOctaves) {
      val l = 3 << octave // lobe size 3, 6, 12, ...
      val step = 1 << octave
      val border = 2 * l + 2
      if (w > 2 * border && h > 2 * border) {
        val cols = (w - 2 * border) / step + 1
        val rows = (h - 2 * border) / step + 1
        val resp = Array.ofDim[Double](rows, cols)
        var ry = 0
        while (ry < rows) {
          var rx = 0
          while (rx < cols) {
            resp(ry)(rx) = hessianResponse(ii, w, h, border + rx * step, border + ry * step, l)
            rx += 1
          }
          ry += 1
        }
        val scaleHits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double)]
        ry = 1
        while (ry < rows - 1) {
          var rx = 1
          while (rx < cols - 1) {
            val v = resp(ry)(rx)
            if (v > detectThreshold) {
              var isMax = true
              var dy = -1
              while (dy <= 1 && isMax) {
                var dx = -1
                while (dx <= 1 && isMax) {
                  if ((dx != 0 || dy != 0) && resp(ry + dy)(rx + dx) >= v) isMax = false
                  dx += 1
                }
                dy += 1
              }
              if (isMax) scaleHits += ((border + rx * step, border + ry * step, l, v))
            }
            rx += 1
          }
          ry += 1
        }
        out ++= scaleHits.sortBy(t => (-t._4, t._2, t._1)).take(maxFeaturesPerScale)
      }
      octave += 1
    }
    out.toArray
  }

  /** 64-d upright SURF descriptor: 4×4 subregions × (Σdx, Σdy, Σ|dx|, Σ|dy|)
    * of Haar responses on a 20s×20s window, L2-normalized. */
  private[extract] def describe(ii: Array[Double], w: Int, h: Int,
                       px: Int, py: Int, l: Int): Option[Array[Double]] = {
    val s = math.max(1, l / 3) // sampling scale
    val half = 10 * s
    if (px - half < 0 || py - half < 0 || px + half >= w || py + half >= h) return None
    val d = new Array[Double](64)
    var sub = 0
    while (sub < 16) {
      val sx = sub % 4; val sy = sub / 4
      val x0 = px - half + sx * 5 * s
      val y0 = py - half + sy * 5 * s
      var j = 0
      while (j < 5) {
        var i = 0
        while (i < 5) {
          val cx = x0 + i * s; val cy = y0 + j * s
          val dx = boxSum(ii, w, h, cx, cy - s, cx + s, cy + s) -
            boxSum(ii, w, h, cx - s, cy - s, cx, cy + s)
          val dy = boxSum(ii, w, h, cx - s, cy, cx + s, cy + s) -
            boxSum(ii, w, h, cx - s, cy - s, cx + s, cy)
          val base = sub * 4
          d(base) += dx; d(base + 1) += dy
          d(base + 2) += math.abs(dx); d(base + 3) += math.abs(dy)
          i += 1
        }
        j += 1
      }
      sub += 1
    }
    var norm = 0.0; var i = 0
    while (i < 64) { norm += d(i) * d(i); i += 1 }
    if (norm <= 1e-12) None
    else {
      norm = math.sqrt(norm)
      i = 0
      while (i < 64) { d(i) /= norm; i += 1 }
      Some(d)
    }
  }
}

/**
 * SIFT-style extractor (P6, ext/SIFTExtractor.java:47–62 semantics — BoofCV's
 * ConfigSiftDetector(2, detectThreshold, maxFeaturesPerScale, 5) is the
 * reference parameterization): difference-of-blur (DoG-like) extrema detection
 * over a small scale stack + the classic 128-d descriptor — 4×4 spatial bins ×
 * 8 gradient-orientation bins over a 16s×16s window, L2-normalized with the
 * standard 0.2 clamp + renormalize. Upright, deterministic, pure Scala.
 */
final case class SiftLiteExtractor(
    detectThreshold: Double = 3.0,
    maxFeaturesPerScale: Int = 128,
    numberOfScales: Int = 3)
    extends LocalFeatureExtractor {
  override val descriptorLength: Int = 128

  override def extract(r: Raster): Array[Array[Double]] = {
    val g0 = Imaging.grey(r)
    // blur stack: repeated 3×3 box blur approximates increasing Gaussian σ
    val stack = Iterator.iterate(r)(Imaging.boxBlur3)
      .take(numberOfScales + 2).map(Imaging.grey).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var s = 0
    while (s < numberOfScales) {
      val dog = new Array[Double](g0.length)
      var i = 0
      while (i < g0.length) { dog(i) = stack(s)(i) - stack(s + 1)(i); i += 1 }
      val scaleHits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      val border = 8 * (s + 1)
      var y = math.max(1, border)
      while (y < r.h - math.max(1, border)) {
        var x = math.max(1, border)
        while (x < r.w - math.max(1, border)) {
          val v = dog(y * r.w + x)
          if (math.abs(v) > detectThreshold) {
            var isExt = true
            var dy = -1
            while (dy <= 1 && isExt) {
              var dx = -1
              while (dx <= 1 && isExt) {
                if (dx != 0 || dy != 0) {
                  val u = dog((y + dy) * r.w + (x + dx))
                  if ((v > 0 && u >= v) || (v < 0 && u <= v)) isExt = false
                }
                dx += 1
              }
              dy += 1
            }
            if (isExt) scaleHits += ((x, y, math.abs(v)))
          }
          x += 1
        }
        y += 1
      }
      scaleHits.sortBy(t => (-t._3, t._2, t._1)).take(maxFeaturesPerScale)
        .foreach { case (x, y, _) =>
          describe(stack(s), r.w, r.h, x, y, s + 1).foreach(out += _)
        }
      s += 1
    }
    out.toArray
  }

  /** 128-d: 4×4 spatial cells × 8 orientation bins of gradient votes over a
    * 16·scale window; L2 → clamp 0.2 → L2 (Lowe's normalization). */
  private def describe(g: Array[Double], w: Int, h: Int,
                       px: Int, py: Int, scale: Int): Option[Array[Double]] = {
    val half = 8 * scale
    if (px - half < 1 || py - half < 1 || px + half >= w - 1 || py + half >= h - 1)
      return None
    val d = new Array[Double](128)
    var y = py - half
    while (y < py + half) {
      var x = px - half
      while (x < px + half) {
        val dx = g(y * w + x + 1) - g(y * w + x - 1)
        val dy = g((y + 1) * w + x) - g((y - 1) * w + x)
        val mag = math.sqrt(dx * dx + dy * dy)
        if (mag > 1e-12) {
          val ori = math.atan2(dy, dx) // [-π, π]
          var ob = ((ori + math.Pi) / (2 * math.Pi) * 8).toInt
          if (ob >= 8) ob = 7
          val cx = (x - (px - half)) * 4 / (2 * half)
          val cy = (y - (py - half)) * 4 / (2 * half)
          d((cy * 4 + cx) * 8 + ob) += mag
        }
        x += 1
      }
      y += 1
    }
    val n1 = graft.kernels.Kernels.l2Norm(d)
    if (n1 <= 1e-12) return None
    var i = 0
    while (i < 128) { d(i) = math.min(d(i) / n1, 0.2); i += 1 }
    Some(graft.kernels.Kernels.normalizeL2(d))
  }
}

/** RootSIFT-style post-transform: per-descriptor power(0.5) then L2
  * (ext/RootSIFTExtractor.java:31–38), applicable to any extractor. */
final case class RootTransformed(inner: LocalFeatureExtractor) extends LocalFeatureExtractor {
  override def descriptorLength: Int = inner.descriptorLength
  override def extract(r: Raster): Array[Array[Double]] =
    inner.extract(r).map(d => graft.kernels.Kernels.normalizeSSR(d))
}

/**
 * ColorSURF-style extractor (ext/ColorSURFExtractor.java:67–161): detect
 * keypoints ONCE on the greyscale integral image, then describe each keypoint
 * on each RGB band separately and concatenate → 3×64 = 192-d. Per-band L2
 * normalization when `perBandNormalization` (the reference default), else a
 * single final L2 over the concatenation (ColorSURFExtractor.java:70–76).
 */
final case class ColorSurfLiteExtractor(
    detectThreshold: Double = 1.0,
    maxFeaturesPerScale: Int = 128,
    numberOfOctaves: Int = 3,
    perBandNormalization: Boolean = true)
    extends LocalFeatureExtractor {
  override val descriptorLength: Int = 192
  private val mono = SurfLiteExtractor(detectThreshold, maxFeaturesPerScale, numberOfOctaves)

  override def extract(r: Raster): Array[Array[Double]] = {
    val points = mono.detectPoints(r)
    if (points.isEmpty) return Array.empty
    // per-band integral images (R, G, B planes)
    val bandIIs = Array(16, 8, 0).map { shift =>
      val plane = new Array[Double](r.pixels.length)
      var i = 0
      while (i < r.pixels.length) {
        plane(i) = ((r.pixels(i) >> shift) & 0xff).toDouble; i += 1
      }
      mono.integralImage(plane, r.w, r.h)
    }
    points.flatMap { case (x, y, sc, _) =>
      val perBand = bandIIs.map(ii => mono.describe(ii, r.w, r.h, x, y, sc))
      if (perBand.exists(_.isEmpty)) None
      else {
        val bands = perBand.map(_.get).map(d =>
          if (perBandNormalization) graft.kernels.Kernels.normalizeL2(d) else d)
        val concat = bands.flatten
        Some(if (perBandNormalization) concat
             else graft.kernels.Kernels.normalizeL2(concat))
      }
    }
  }
}
