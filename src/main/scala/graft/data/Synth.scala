package graft.data

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.extract.GridPatchExtractor
import graft.kernels.{Imaging, Kernels}
import graft.kernels.Kernels.PcaModel
import graft.ml.Learning
import graft.model.{ModelBundle, PermutationTransform}
import graft.pipeline.FeaturePipeline
import graft.pipeline.FeaturePipeline.PipelineConfig

/**
 * Deterministic synthetic data (FIXTURES.md §1–2): the image+caption input
 * table of BASELINE.json's `input_hint` shape, and versioned model bundles
 * minted by the distributed learning jobs. Every row is a pure function of
 * (seed, row index) — partitioning-independent, no external data.
 */
object Synth {

  val imageSchema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType, nullable = false),
    StructField("phash", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("entity_id", StringType, nullable = false)))

  private val sizes = Array((64, 64), (96, 128), (128, 80), (200, 150), (512, 384))
  private val colors = Array("red", "green", "blue", "amber", "violet")
  private val shapes = Array("disc", "square", "stripe", "wedge", "ring")
  private val bgs = Array("dark", "light", "gradient", "noisy", "plain")

  /** Epoch millis of 2026-01-01T00:00:00Z (computed without tz lookup). */
  val baseTsMillis: Long = 1767225600000L
  val tsStepMillis: Long = 7 * 60 * 1000L // 7 minutes per row index
  val hotPhash: Long = 0x5a5a5a5a5a5a5a5aL
  val numEntities: Int = 10

  def tsOf(i: Long): Timestamp = new Timestamp(baseTsMillis + i * tsStepMillis)

  /** One deterministic row keyed by (seed, i). Edge rows (FIXTURES.md §1):
    * i==0 uniform raster (zero keypoints), i==1 corrupt bytes, i==2 greyscale
    * JPEG. ~20% of rows share one hot phash (skew for salting). */
  def imageRow(seed: Long, i: Long): Row = imageRow(seed, i, jpegBias = false)

  /** jpegBias=true → 7/8 JPEG rows: decode workload is equivalent but
    * generation avoids the slow JDK PNG deflate (bench-input profile). */
  def imageRow(seed: Long, i: Long, jpegBias: Boolean): Row = {
    val (w, h) = sizes((i % sizes.length).toInt)
    val rnd = new java.util.Random(seed * 7919L + i)
    val caption = s"a ${colors(rnd.nextInt(colors.length))} " +
      s"${shapes(rnd.nextInt(shapes.length))} on a ${bgs(rnd.nextInt(bgs.length))} background"
    val raster =
      if (i == 0L) Imaging.uniformRaster(w, h, 0x808080)
      else Imaging.syntheticRaster(seed, i, w, h)
    val fmt =
      if (i == 1L) "png" // corrupt row — fmt label irrelevant
      else if (i % 37L == 5L) "gif"
      else if (jpegBias) { if (i % 8L == 0L) "png" else "jpeg" }
      else if (i % 2L == 0L) "png"
      else "jpeg"
    val bytes: Array[Byte] =
      if (i == 1L) Array[Byte](1, 2, 3, 4) // undecodable
      else if (i == 2L) greyJpeg(raster)
      else fmt match {
        case "png" => Imaging.encodePng(raster)
        case "jpeg" => Imaging.encodeJpeg(raster)
        case "gif" => encodeGif(raster)
      }
    val phash =
      if (i == 1L) 0L
      else if (i % 5L == 3L) hotPhash
      else Imaging.averageHash(raster)
    Row(f"img_$i%08d", bytes, w, h, fmt, caption, phash, tsOf(i), s"e${i % numEntities}")
  }

  /** Distributed deterministic image table of n rows. */
  def imageTable(spark: SparkSession, n: Long, seed: Long = 42L,
                 partitions: Int = 0, jpegBias: Boolean = false): DataFrame = {
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val rdd = spark.range(0, n, 1, parts).rdd.map(i => imageRow(seed, i, jpegBias))
    spark.createDataFrame(rdd, imageSchema)
  }

  private def greyJpeg(r: Imaging.Raster): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(r.w, r.h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = Imaging.grey(r)
    var y = 0
    while (y < r.h) {
      var x = 0
      while (x < r.w) {
        val v = math.max(0, math.min(255, g(y * r.w + x).toInt))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def encodeGif(r: Imaging.Raster): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(Imaging.toBufferedImage(r), "gif", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------- models

  /** Test-scale dims (FIXTURES.md §2; flagship ratios preserved). */
  final case class ModelDims(
      codebookK: Int = 16, // descriptors d=8 → VLAD 128
      pcaDim: Int = 16,
      coarseK: Int = 8,
      pqM: Int = 4,
      pqK: Int = 16)

  /** Learn one ModelBundle from a training subset of the image table via the
    * distributed learning jobs (SURVEY.md §7 step 9). Deterministic given
    * (images, version). */
  def mintBundle(images: DataFrame, version: Int, dims: ModelDims = ModelDims(),
                 cfg: PipelineConfig = defaultConfig, iterations: Int = 8): ModelBundle = {
    val desc = FeaturePipeline.descriptorTable(images, cfg).cache()
    val codebook = Learning.lloydKMeansSingle(desc, dims.codebookK, iterations)
    desc.unpersist()
    val codebooks = Array(codebook)
    val vlads = FeaturePipeline.vladTable(images, codebooks, cfg).cache()
    val (means, eig, vT) = Learning.learnPca(vlads, dims.pcaDim)
    val pca = PcaModel(means, eig, vT, whiten = true)
    // project VLADs for coarse-quantizer + PQ training
    val spark = images.sparkSession
    val bcPca = spark.sparkContext.broadcast(pca)
    val projSchema = StructType(Seq(
      StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val projected = spark.createDataFrame(
      vlads.rdd.map(r =>
        Row(Kernels.pcaProject(r.getSeq[Double](0).toArray, bcPca.value).toSeq)),
      projSchema).cache()
    val coarse = Learning.lloydKMeansSingle(projected, dims.coarseK, iterations)
    val transform = PermutationTransform(
      Kernels.randomPermutationIndices(1, dims.pcaDim)) // seed=1, ds/PQ.java:108
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val residuals = spark.createDataFrame(
      projected.rdd.map { r =>
        val v = r.getSeq[Double](0).toArray
        val li = Kernels.nearestCentroid(v, bcCoarse.value)
        Row(transform(Kernels.residual(v, bcCoarse.value(li))).toSeq)
      }, projSchema)
    val pq = Learning.learnPq(residuals, dims.pqM, dims.pqK, iterations)
    projected.unpersist(); vlads.unpersist()
    ModelBundle(version, codebooks, pca, coarse, pq, transform)
  }

  val defaultConfig: PipelineConfig =
    PipelineConfig(maxPixels = 100L * 1000L, extractor = GridPatchExtractor())

  /**
   * Mint two model versions (v1: trained on even rows, valid before all image
   * timestamps; v2: odd rows, valid from 60% through the ts range) + the model
   * table DataFrame for the as-of join. Deterministic.
   */
  def mintModels(spark: SparkSession, images: DataFrame, n: Long,
                 dims: ModelDims = ModelDims(), cfg: PipelineConfig = defaultConfig,
                 iterations: Int = 8)
      : (DataFrame, Map[Int, ModelBundle]) = {
    val clean = images.where(col("image_id") =!= "img_00000001") // corrupt row out
    val v1 = mintBundle(clean.where(pmod(xxhash64(col("image_id")), lit(2)) === 0), 1, dims, cfg, iterations)
    val v2 = mintBundle(clean.where(pmod(xxhash64(col("image_id")), lit(2)) === 1), 2, dims, cfg, iterations)
    val v2From = new Timestamp(baseTsMillis + (n * 6 / 10) * tsStepMillis)
    val modelDf = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, new Timestamp(baseTsMillis - 86400000L)),
        Row(2, v2From)),
      StructType(Seq(
        StructField("model_version", IntegerType, nullable = false),
        StructField("valid_from", TimestampType, nullable = false))))
    (modelDf, Map(1 -> v1, 2 -> v2))
  }
}
