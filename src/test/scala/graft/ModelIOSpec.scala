package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Imaging, Kernels}
import graft.model.ModelIO

/** Reference on-disk model-format compatibility (FIXTURES.md §4): codebook
  * CSV (AbstractFeatureAggregator.java:234–254), PCA text file
  * (PCA.java:211–318), PQ CSV (PQ.java:210–223) — write → read → same model. */
class ModelIOSpec extends AnyFunSuite {

  test("codebook CSV round-trip; non-CSV header lines skipped") {
    val cb = Array(Array(1.0, 2.0, 3.0), Array(4.5, -5.0, 6.25))
    val text = "some header the reference tolerates\n" + ModelIO.writeCodebookCsv(cb)
    val got = ModelIO.parseCodebookCsv(text.linesIterator, 2, 3)
    assert(got.length == 2 && got.zip(cb).forall { case (a, b) => a.sameElements(b) })
  }

  test("PCA file round-trip; whitening folds λ^-0.5 at load (PCA.java:282–313)") {
    val means = Array(0.5, -1.5, 2.0)
    val eig = Array(4.0, 1.0)
    val vT = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val text = ModelIO.writePcaFile(means, eig, vT)
    val plain = ModelIO.parsePcaFile(text.linesIterator, 3, 2, whiten = false)
    assert(plain.means.sameElements(means))
    assert(plain.projection(0).sameElements(vT(0)))
    val white = ModelIO.parsePcaFile(text.linesIterator, 3, 2, whiten = true)
    assert(white.projection(0).sameElements(vT(0).map(_ * 0.5)))  // 4^-0.5
    assert(white.projection(1).sameElements(vT(1).map(_ * 1.0)))  // 1^-0.5
  }

  test("PQ CSV round-trip: m·k_s lines sub-quantizer-major (PQ.java:210–223)") {
    val pq = Kernels.PqModel(Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(5.0, 6.0), Array(7.0, 8.0))))
    val flat = pq.subQuantizers.flatten
    val text = ModelIO.writeCodebookCsv(flat)
    val got = ModelIO.parsePqCsv(text.linesIterator, 2, 2, 2)
    assert(got.numSubVectors == 2 && got.numProductCentroids == 2)
    for (m <- 0 until 2; k <- 0 until 2)
      assert(got.subQuantizers(m)(k).sameElements(pq.subQuantizers(m)(k)))
  }

  test("square thumbnail: min-dim scaled then center-crop (ImageScaling.java:167–242)") {
    val r = Imaging.syntheticRaster(42L, 5L, 120, 80)
    val thumb = Imaging.squareThumbScaling(r, 40)
    assert(thumb.w == 40 && thumb.h == 40)
  }

  test("rect scaling: max-dim to target, no-op when smaller (ImageScaling.java:274–334)") {
    val r = Imaging.syntheticRaster(42L, 5L, 120, 80)
    val s = Imaging.rectScaling(r, 60)
    assert(s.w == 60 && s.h == 40)
    assert(Imaging.rectScaling(r, 200) eq r)
  }
}
