package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.kernels.Kernels
import graft.kernels.Kernels.{PcaModel, PqModel}

/**
 * Offline model-learning jobs (SURVEY.md §2.6 A3–A6), Spark-distributed:
 *
 *  - [[lloydKMeans]] — deterministic Lloyd's k-means over a DataFrame of
 *    vectors, optionally blocked (one independent clustering per block —
 *    exactly the PQ sub-quantizer shape, qnt/ProductQuantizationLearning
 *    .java:212–306). Deterministic: init = top-k vectors per block by
 *    xxhash64 order (partitioning-independent), fixed iteration count;
 *    assignment is row-local against broadcast centroids; the per-iteration
 *    recompute is one groupBy over (block, cluster, dim) — map-side partial
 *    aggregation, centroid matrices (k×d, tiny) collect to the driver.
 *    Empty clusters keep their previous centroid unless `emptySentinel` is
 *    set (the reference pads missing PQ clusters with 1000-sentinels,
 *    qnt/ProductQuantizationLearning.java:285–303).
 *
 *  - [[learnPca]] — mean vector + Gram-matrix accumulation (one treeAggregate
 *    pass, d×d driver matrix) + Breeze eigendecomposition; eigenvalues sorted
 *    descending like dim/PCA.java:120–177. For the flagship 32768-dim config
 *    this switches to MLlib's distributed ARPACK path (documented; test dims
 *    are small).
 */
object Learning {

  /** data: (block: Int, vec: Array[Double]) rows. Returns block → k×d centroids. */
  def lloydKMeans(
      data: DataFrame,
      k: Int,
      iterations: Int = 8,
      emptySentinel: Option[Double] = None): Map[Int, Array[Array[Double]]] = {
    val spark = data.sparkSession
    val df = data.select(col("block").cast("int").as("block"), col("vec"))
    // deterministic init: k lowest-xxhash64 distinct vectors per block
    // (independent of partitioning / parallelism level)
    val init = df
      .withColumn("vkey", concat_ws(",", transform(col("vec"), _.cast("string"))))
      .dropDuplicates("block", "vkey")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("block")).orderBy(xxhash64(col("vkey")), col("vkey"))))
      .where(col("rk") <= k)
    var centroids: Map[Int, Array[Array[Double]]] = init
      .select("block", "rk", "vec").collect()
      .groupBy(_.getInt(0))
      .map { case (b, rows) =>
        b -> rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }
    // fewer distinct vectors than k: pad with the reference's unreachable
    // sentinel centroids (qnt/ProductQuantizationLearning.java:285–303)
    emptySentinel.foreach { s =>
      centroids = centroids.map { case (b, cents) =>
        if (cents.length >= k) b -> cents
        else b -> (cents ++ Array.fill(k - cents.length)(
          Array.fill(cents(0).length)(s)))
      }
    }
    require(centroids.values.forall(_.length == k),
      s"need >= $k distinct vectors per block")
    val blocks = centroids.keys.toArray.sorted
    val blockIdx = blocks.zipWithIndex.toMap
    val d = centroids(blocks(0))(0).length

    val rdd = df.rdd.map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).cache()
    try {
      var iter = 0
      while (iter < iterations) {
        val bc = spark.sparkContext.broadcast(centroids)
        // one treeAggregate pass: per (block, cluster) → (Σvec, count)
        val nB = blocks.length
        val (sums, counts) = rdd.treeAggregate(
          (Array.ofDim[Double](nB * k * d), Array.ofDim[Long](nB * k)))(
          seqOp = { case ((s, c), (b, v)) =>
            val bi = blockIdx(b)
            val cl = Kernels.nearestCentroid(v, bc.value(b))
            val off = (bi * k + cl) * d
            var i = 0
            while (i < d) { s(off + i) += v(i); i += 1 }
            c(bi * k + cl) += 1
            (s, c)
          },
          combOp = { case ((s1, c1), (s2, c2)) =>
            var i = 0
            while (i < s1.length) { s1(i) += s2(i); i += 1 }
            i = 0
            while (i < c1.length) { c1(i) += c2(i); i += 1 }
            (s1, c1)
          })
        bc.destroy()
        centroids = blocks.map { b =>
          val bi = blockIdx(b)
          val fresh = centroids(b).map(_.clone())
          var cl = 0
          while (cl < k) {
            val n = counts(bi * k + cl)
            if (n > 0L) {
              val off = (bi * k + cl) * d
              var i = 0
              while (i < d) { fresh(cl)(i) = sums(off + i) / n; i += 1 }
            } else emptySentinel.foreach(s => java.util.Arrays.fill(fresh(cl), s))
            cl += 1
          }
          b -> fresh
        }.toMap
        iter += 1
      }
      centroids
    } finally { rdd.unpersist(); () }
  }

  /** Single-block convenience: vectors DataFrame with `vec` column → k×d. */
  def lloydKMeansSingle(vectors: DataFrame, k: Int, iterations: Int = 8): Array[Array[Double]] =
    lloydKMeans(vectors.withColumn("block", lit(0)), k, iterations)(0)

  /**
   * PCA learning: one distributed pass accumulating (n, Σx, Σxxᵀ) via
   * treeAggregate, then Breeze eigSym of the covariance on the driver;
   * components sorted by eigenvalue descending (dim/PCA.java:172).
   * Returns (means, eigenvalues, V_t rows) — whitening is folded in by the
   * caller via Kernels.PcaModel (load-path parity, dim/PCA.java:282–313).
   */
  def learnPca(vectors: DataFrame, numComponents: Int)
      : (Array[Double], Array[Double], Array[Array[Double]]) = {
    import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
    val rdd = vectors.select("vec").rdd.map(_.getSeq[Double](0).toArray)
    val d = rdd.first().length
    val (n, sumX, gram) = rdd.treeAggregate(
      (0L, new Array[Double](d), new Array[Double](d * d)))(
      seqOp = { case ((cnt, s, g), v) =>
        var i = 0
        while (i < d) {
          s(i) += v(i)
          var j = 0
          while (j < d) { g(i * d + j) += v(i) * v(j); j += 1 }
          i += 1
        }
        (cnt + 1, s, g)
      },
      combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { g1(i) += g2(i); i += 1 }
        (c1 + c2, s1, g1)
      })
    require(n > 1, "PCA needs more than one sample")
    val means = sumX.map(_ / n)
    // covariance = (Σxxᵀ − n·μμᵀ) / (n − 1)
    val cov = BDM.tabulate(d, d) { (i, j) =>
      (gram(i * d + j) - n * means(i) * means(j)) / (n - 1)
    }
    val es = eigSym(cov)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(numComponents)
    val eigenvalues = order.map(_._1)
    val vT = order.map { case (_, idx) =>
      val colV = es.eigenvectors(::, idx)
      // sign convention: make the largest-|component| entry positive (deterministic)
      val arr = colV.toArray
      val maxI = arr.indices.maxBy(i => math.abs(arr(i)))
      if (arr(maxI) < 0) arr.map(-_) else arr
    }
    (means, eigenvalues, vT)
  }

  /** PQ sub-quantizer learning: split vectors into m blocks, one independent
    * k-means per block in a single blocked job; empty clusters padded with
    * the reference's 1000.0 sentinel (qnt/ProductQuantizationLearning
    * .java:285–303). */
  def learnPq(vectors: DataFrame, m: Int, kS: Int, iterations: Int = 8): PqModel = {
    val sub = vectors.select(
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        i => slice(col("vec"), i * (size(col("vec")) / m) + 1,
          size(col("vec")) / m))).as(Seq("block", "vec")))
    val centroids = lloydKMeans(sub, kS, iterations, emptySentinel = Some(1000.0))
    PqModel(Array.tabulate(m)(centroids(_)))
  }

  implicit private class RichDf(df: DataFrame) {
    def sparkSessionCompat: SparkSession = df.sparkSession
  }
}
