package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Kernels
import graft.kernels.Kernels.{PcaModel, PqModel}

/** Scalar-oracle golden + property tests for the kernel layer (SURVEY.md §5.1–5.2).
  * Reference line citations mark which observable quirk each test pins. */
class KernelsSpec extends AnyFunSuite {

  /** seeded property loop (scalatest+scalacheck bridge unavailable offline) */
  private def forRandomVectors(n: Int = 100, dim: Int = 0)(f: Array[Double] => Unit): Unit = {
    val rnd = new scala.util.Random(12345)
    (0 until n).foreach { _ =>
      val d = if (dim > 0) dim else 2 + rnd.nextInt(15)
      f(Array.fill(d)((rnd.nextDouble() - 0.5) * 200))
    }
  }

  private val eps = 1e-9
  private def allclose(a: Array[Double], b: Array[Double], tol: Double = eps): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => math.abs(x - y) <= tol }

  // --- normalization quirks (utl/Normalization.java) -------------------------

  test("L2 normalize: zero vector → all ones (Normalization.java:29–31)") {
    assert(Kernels.normalizeL2(Array(0.0, 0.0, 0.0)).sameElements(Array(1.0, 1.0, 1.0)))
  }

  test("L1 normalize: zero vector → 1/len fill (Normalization.java:47–62)") {
    assert(Kernels.normalizeL1(Array(0.0, 0.0, 0.0, 0.0)).sameElements(Array.fill(4)(0.25)))
  }

  test("L2 norm of normalized non-zero vector is 1") {
    forRandomVectors() { v =>
      if (Kernels.l2Norm(v) > 1e-9)
        assert(math.abs(Kernels.l2Norm(Kernels.normalizeL2(v)) - 1.0) < 1e-9)
    }
  }

  test("power normalization sign(x)|x|^a (Normalization.java:74–79)") {
    val got = Kernels.normalizePower(Array(4.0, -9.0, 0.0), 0.5)
    assert(allclose(got, Array(2.0, -3.0, 0.0)))
  }

  test("SSR = power(0.5) then L2 (Normalization.java:89–93)") {
    forRandomVectors() { v =>
      assert(allclose(Kernels.normalizeSSR(v),
        Kernels.normalizeL2(Kernels.normalizePower(v, 0.5))))
    }
  }

  // --- centroid assignment ----------------------------------------------------

  test("nearestCentroid matches brute force (early-abandon is invisible)") {
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(10, 6)(rnd.nextDouble() * 10)
    (0 until 50).foreach { _ =>
      val v = Array.fill(6)(rnd.nextDouble() * 10)
      val brute = cents.indices.minBy(i => Kernels.squaredL2(v, cents(i)))
      assert(Kernels.nearestCentroid(v, cents) == brute)
    }
  }

  test("kNearestCentroids ascending by distance, lower index wins ties") {
    val cents = Array(Array(0.0), Array(1.0), Array(1.0), Array(3.0))
    val got = Kernels.kNearestCentroids(Array(0.9), cents, 3)
    assert(got.sameElements(Array(1, 2, 0)))
  }

  // --- VLAD (agg/VladAggregator.java, VladAggregatorMultipleVocabularies.java) -

  val codebook: Array[Array[Double]] = Array(Array(0.0, 0.0), Array(10.0, 10.0))

  test("VLAD zero descriptors → zero vector (VladAggregator.java:37–39)") {
    assert(Kernels.vlad(Array.empty, codebook).sameElements(Array(0.0, 0.0, 0.0, 0.0)))
  }

  test("VLAD accumulates descriptor − centroid in the NN slot (VladAggregator.java:40–46)") {
    val desc = Array(Array(1.0, 2.0), Array(9.0, 8.0))
    // d0 → c0 residual (1,2); d1 → c1 residual (−1,−2)
    assert(allclose(Kernels.vlad(desc, codebook), Array(1.0, 2.0, -1.0, -2.0)))
  }

  test("VLAD is permutation-invariant over descriptor order") {
    val rnd = new scala.util.Random(11)
    val desc = Array.fill(20, 2)(rnd.nextDouble() * 12)
    val shuffled = rnd.shuffle(desc.toSeq).toArray
    assert(allclose(Kernels.vlad(desc, codebook), Kernels.vlad(shuffled, codebook)))
  }

  test("multiVLAD: per-vocab power+L2, concat, final L2 iff >1 vocab " +
    "(VladAggregatorMultipleVocabularies.java:58–75)") {
    val cb2 = Array(Array(5.0, 5.0), Array(-5.0, -5.0))
    val desc = Array(Array(1.0, 2.0), Array(6.0, 4.0))
    val v1 = Kernels.normalizeL2(Kernels.normalizePower(Kernels.vlad(desc, codebook), 0.5))
    val v2 = Kernels.normalizeL2(Kernels.normalizePower(Kernels.vlad(desc, cb2), 0.5))
    val expect = Kernels.normalizeL2(v1 ++ v2)
    assert(allclose(Kernels.multiVlad(desc, Array(codebook, cb2)), expect))
    // single vocab: no final re-normalization
    assert(allclose(Kernels.multiVlad(desc, Array(codebook)), v1))
  }

  test("hard BoW histogram counts NN assignments (BowAggregator.java:39–74)") {
    val desc = Array(Array(1.0, 1.0), Array(2.0, 2.0), Array(9.0, 9.0))
    assert(Kernels.bow(desc, codebook).sameElements(Array(2.0, 1.0)))
  }

  test("soft BoW: each descriptor votes once per k-NN centroid (fixed semantics; " +
    "reference over-increment bug at BowAggregator.java:46–51 not reproduced)") {
    val desc = Array(Array(1.0, 1.0), Array(9.0, 9.0))
    val got = Kernels.bowSoft(desc, codebook, 2)
    assert(got.sameElements(Array(2.0, 2.0))) // both descriptors vote for both
    assert(got.sum == desc.length * 2.0)
  }

  // --- PCA (dim/PCA.java) ------------------------------------------------------

  test("PCA projection subtracts means then V_t·x (PCA.java:188–208)") {
    val model = PcaModel(
      means = Array(1.0, 2.0),
      projection = Array(Array(1.0, 0.0), Array(0.0, 2.0)),
      whitened = false)
    assert(allclose(Kernels.pcaProject(Array(3.0, 5.0), model), Array(2.0, 6.0)))
  }

  test("whitening folds eigenvalue^-0.5 into rows then L2-normalizes (PCA.java:282–313)") {
    val m = PcaModel(
      means = Array(0.0, 0.0),
      eigenvalues = Array(4.0, 0.25),
      vT = Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      whiten = true)
    // row0 scaled by 4^-0.5=0.5; row1 by 0.25^-0.5=2 → raw proj of (2,3) = (1,6), L2
    val expect = Kernels.normalizeL2(Array(1.0, 6.0))
    assert(allclose(Kernels.pcaProject(Array(2.0, 3.0), m), expect))
  }

  test("truncateRenorm keeps prefix and renormalizes (IndexTransformation.java:117–120)") {
    val v = Array(3.0, 4.0, 100.0)
    assert(allclose(Kernels.truncateRenorm(v, 2), Array(0.6, 0.8)))
    assert(Kernels.truncateRenorm(v, 3) eq v) // no-op when not shorter
  }

  // --- transforms ---------------------------------------------------------------

  test("random permutation is a bijection, deterministic by seed " +
    "(RandomPermutation.java:29–56)") {
    val idx = Kernels.randomPermutationIndices(1, 64)
    assert(idx.sorted.sameElements(0 until 64))
    assert(idx.sameElements(Kernels.randomPermutationIndices(1, 64)))
    assert(!idx.sameElements(Kernels.randomPermutationIndices(2, 64)))
    val v = Array.tabulate(64)(_.toDouble)
    val p = Kernels.permute(v, idx)
    assert(p.sorted.sameElements(v)) // same multiset
  }

  test("random rotation matrix is orthogonal and norm-preserving " +
    "(RandomRotation.java:30–49 contract)") {
    val r = Kernels.randomRotationMatrix(1, 8)
    // RᵀR = I
    for (i <- 0 until 8; j <- 0 until 8) {
      val dotIj = (0 until 8).map(k => r(k)(i) * r(k)(j)).sum
      assert(math.abs(dotIj - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    forRandomVectors(50, dim = 8) { v =>
      assert(math.abs(Kernels.l2Norm(Kernels.rotate(v, r)) - Kernels.l2Norm(v)) < 1e-9)
    }
  }

  test("residual = centroid − vector (IVFPQ.java:642–648 sign convention)") {
    assert(allclose(Kernels.residual(Array(1.0, 2.0), Array(5.0, 5.0)), Array(4.0, 3.0)))
  }

  // --- PQ (ds/PQ.java) -----------------------------------------------------------

  val pq: PqModel = PqModel(Array(
    Array(Array(0.0, 0.0), Array(10.0, 10.0)),
    Array(Array(0.0, 5.0), Array(5.0, 0.0))))

  test("PQ encode: per-sub-block nearest sub-centroid (PQ.java:232–268)") {
    assert(Kernels.pqEncode(Array(9.0, 9.0, 4.0, 1.0), pq).sameElements(Array(1, 1)))
    assert(Kernels.pqEncode(Array(1.0, 1.0, 0.5, 4.0), pq).sameElements(Array(0, 0)))
  }

  test("byte code −128 offset round-trips (PQ.java:552–558)") {
    val code = Array(0, 127, 128, 255)
    assert(Kernels.bytesToCode(Kernels.codeToBytes(code)).sameElements(code))
  }

  test("ADC LUT distance == direct subvector distances sum (PQ.java:290–322,387–399)") {
    val q = Array(1.0, 1.0, 2.0, 2.0)
    val lut = Kernels.adcLookupTable(q, pq)
    val code = Array(1, 0)
    val direct = Kernels.squaredL2(Array(1.0, 1.0), pq.subQuantizers(0)(1)) +
      Kernels.squaredL2(Array(2.0, 2.0), pq.subQuantizers(1)(0))
    assert(math.abs(Kernels.adcDistance(code, lut) - direct) < eps)
  }

  test("SDC distance sums sub-centroid table entries (PQ.java:334–374)") {
    val table = Kernels.sdcTable(pq)
    val a = Array(0, 1); val b = Array(1, 0)
    val direct = Kernels.squaredL2(pq.subQuantizers(0)(0), pq.subQuantizers(0)(1)) +
      Kernels.squaredL2(pq.subQuantizers(1)(1), pq.subQuantizers(1)(0))
    assert(math.abs(Kernels.sdcDistance(a, b, table) - direct) < eps)
  }
}
