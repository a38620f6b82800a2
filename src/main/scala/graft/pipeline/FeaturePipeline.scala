package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.extract.LocalFeatureExtractor
import graft.kernels.{Imaging, Kernels}
import graft.model.ModelBundle

/**
 * The extract→encode pipeline as one narrow typed transform (SURVEY.md §3.1
 * Spark shape): `decode → maxPixelsScaling → extract → multiVLAD → PCA →
 * coarse-assign → residual → transform → PQ-encode`, all inside a single
 * `mapPartitions` — descriptors and rasters never leave the row, image bytes
 * are never shuffled, and the broadcast model bundles are resolved once per
 * partition (mirroring the reference's per-JVM singletons,
 * vec/ImageVectorization.java:55–65). Corrupt images produce an error-channel
 * row instead of failing the job (exm/FeatureExtraction.java:109–116).
 */
object FeaturePipeline {

  final case class PipelineConfig(
      maxPixels: Long = 1024L * 768L, // reference default, ext/ImageScaling.java:53
      extractor: LocalFeatureExtractor)

  val featureSchema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("entity_id", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("caption", StringType, nullable = true),
    StructField("phash", LongType, nullable = true),
    StructField("model_version", IntegerType, nullable = false),
    StructField("n_descriptors", IntegerType, nullable = false),
    StructField("vector", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("pq_code", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("list_id", IntegerType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /**
   * images: DataFrame with (image_id, bytes, fmt, caption, phash, ts,
   * entity_id, model_version) — model_version typically bound by
   * Temporal.asOfJoin. Returns the feature table (featureSchema).
   */
  def featurize(images: DataFrame, bundles: Map[Int, ModelBundle],
                cfg: PipelineConfig): DataFrame = {
    val spark = images.sparkSession
    val bc = spark.sparkContext.broadcast(bundles)
    val input = images.selectExpr("image_id", "bytes", "caption", "phash",
      "ts", "entity_id", "model_version")
    val rdd = input.rdd.mapPartitions { it =>
      val bundleMap = bc.value
      it.map { row =>
        val imageId = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        val caption = row.getString(2)
        val phash = if (row.isNullAt(3)) null else java.lang.Long.valueOf(row.getLong(3))
        val ts = row.getAs[java.sql.Timestamp](4)
        val entity = row.getString(5)
        val version = row.getInt(6)
        val bundle = bundleMap(version)
        Imaging.decode(bytes) match {
          case None =>
            Row(imageId, entity, ts, caption, phash, version, 0, null, null, null,
              "decode_failed")
          case Some(raster) =>
            val scaled = Imaging.maxPixelsScaling(raster, cfg.maxPixels)
            val descriptors = cfg.extractor.extract(scaled)
            val vec = encodeVector(descriptors, bundle)
            val listId = Kernels.nearestCentroid(vec, bundle.coarseQuantizer)
            val res = Kernels.residual(vec, bundle.coarseQuantizer(listId))
            val code = Kernels.pqEncode(bundle.transform(res), bundle.pq)
            Row(imageId, entity, ts, caption, phash, version, descriptors.length,
              vec.toSeq, code.toSeq, listId, null)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** descriptors → multiVLAD → (PCA iff it reduces) — the reference's
    * transformToVector order (vec/ImageVectorization.java:169–208). */
  def encodeVector(descriptors: Array[Array[Double]], bundle: ModelBundle): Array[Double] = {
    val vlad = Kernels.multiVlad(descriptors, bundle.codebooks)
    if (bundle.projectedLength < bundle.vladLength) Kernels.pcaProject(vlad, bundle.pca)
    else vlad
  }

  // ------------------------------------------------ learning-time helpers

  private val vecSchema = StructType(Seq(
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** All local descriptors of all decodable images, one row per descriptor —
    * training input for codebook learning. */
  def descriptorTable(images: DataFrame, cfg: PipelineConfig): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("bytes").rdd.mapPartitions { it =>
      it.flatMap { row =>
        Imaging.decode(row.getAs[Array[Byte]](0)).toSeq.flatMap { raster =>
          cfg.extractor.extract(Imaging.maxPixelsScaling(raster, cfg.maxPixels))
            .map(d => Row(d.toSeq))
        }
      }
    }
    spark.createDataFrame(rdd, vecSchema)
  }

  /** Per-image multiVLAD vectors (training input for PCA learning). */
  def vladTable(images: DataFrame, codebooks: Array[Array[Array[Double]]],
                cfg: PipelineConfig): DataFrame = {
    val spark = images.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val rdd = images.select("bytes").rdd.mapPartitions { it =>
      it.flatMap { row =>
        Imaging.decode(row.getAs[Array[Byte]](0)).map { raster =>
          val descriptors = cfg.extractor
            .extract(Imaging.maxPixelsScaling(raster, cfg.maxPixels))
          Row(Kernels.multiVlad(descriptors, bc.value).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, vecSchema)
  }
}
