package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.data.Synth
import graft.functions.ImageExpressions._
import graft.model.ModelBundle
import graft.pipeline.FeaturePipeline
import graft.temporal.Temporal

/**
 * Image-pipeline queries for the driver contract. These operate on the
 * deterministic synthetic image table (no external data; TESTDATA has no
 * image table) — so they are rows-only checks for the driver; their real
 * correctness gate is the scalar-oracle ScalaTest suite (SURVEY.md §5).
 */
object ImageQueries {

  /** Synthetic row count per scale dir (keeps Verify/Bench runtimes sane). */
  private def nFor(dir: String): Long =
    if (dir.contains("sf0.1")) 1200L
    else if (dir.contains("sf0.01")) 400L
    else 120L

  // One pipeline materialization per (session, dir): the three downstream
  // queries share features + bundles.
  final case class Cached(features: DataFrame, bundles: Map[Int, ModelBundle])
  private val cache = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Cached]

  def pipeline(s: SparkSession, dir: String): Cached =
    cache.getOrElseUpdate((s, dir), {
      val n = nFor(dir)
      val images = Synth.imageTable(s, n).cache()
      // fewer Lloyd iterations than the test suite's default: model quality is
      // irrelevant to these rows-only checks, verify wall-clock is not
      val (modelDf, bundles) = Synth.mintModels(s, images, n, iterations = 4)
      // F1 extension filter, then point-in-time model binding (J4 north rule)
      val bound = Temporal.asOfJoin(
        images.where(col("fmt").isin("png", "jpeg")),
        modelDf, leftTs = "ts", rightTs = "valid_from")
      val features = FeaturePipeline
        .featurize(bound, bundles, Synth.defaultConfig)
        .persist()
      features.count() // materialize once
      images.unpersist()
      Cached(features, bundles)
    })

  private def sqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Catalyst-native decode + scale + phash expressions (P1/P2 + input col).
    "q_image_decode" -> ((s, dir) => {
      val images = Synth.imageTable(s, nFor(dir))
      images
        .withColumn("img", decode_image(col("bytes")))
        .where(col("img").isNotNull)
        .withColumn("scaled", scale_max_pixels(col("img"), lit(100000L)))
        .select(col("image_id"),
          col("img.w").as("decoded_w"), col("img.h").as("decoded_h"),
          col("scaled.w").as("scaled_w"), col("scaled.h").as("scaled_h"),
          phash64(col("img")).as("phash_computed"))
        .orderBy("image_id")
    }),

    // Flagship end-to-end: decode→extract→VLAD→PCA→PQ with as-of-bound models.
    "q_image_pipeline" -> ((s, dir) => {
      pipeline(s, dir).features
        .select(col("image_id"), col("model_version"), col("list_id"),
          col("n_descriptors"),
          round(sqrt(aggregate(transform(col("vector"), x => x * x),
            lit(0.0), (acc, v) => acc + v)), 6).as("vec_norm"),
          col("error"))
        .orderBy("image_id")
    }),

    // Zero-leakage diagnostic: per model version, the bound ts range (v2 rows
    // must all be ≥ v2.valid_from; asserted exactly in ScalaTest).
    "q_image_model_binding" -> ((s, dir) => {
      pipeline(s, dir).features
        .groupBy(col("model_version"))
        .agg(count(lit(1)).as("n_images"),
          min(col("ts")).cast("long").as("min_ts_epoch"),
          max(col("ts")).cast("long").as("max_ts_epoch"))
        .orderBy("model_version")
    }),

    // Exhaustive k-NN over the PCA feature vectors (T1 Linear shape:
    // broadcast queries → narrow scan → per-partition partial top-k).
    "q_image_knn" -> ((s, dir) => {
      val feats = pipeline(s, dir).features.where(col("error").isNull)
        .select(col("image_id"), col("vector"))
      val queries = broadcast(feats
        .where(col("image_id").isin("img_00000002", "img_00000004", "img_00000007"))
        .select(col("image_id").as("query_id"), col("vector").as("qv")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("dist").asc, col("image_id").asc)
      queries.join(feats, col("query_id") =!= col("image_id"))
        .withColumn("dist", round(sqL2(col("qv"), col("vector")), 9))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("query_id"), col("image_id").as("neighbor_id"), col("dist"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // PQ ADC k-NN (T2): driver-computed LUT as a literal, distance =
    // Σ_j LUT[j][code_j] over the stored codes — scan never touches vectors.
    "q_image_adc_knn" -> ((s, dir) => {
      val c = pipeline(s, dir)
      val feats = c.features.where(col("error").isNull)
      val queryRow = feats.where(col("image_id") === "img_00000002")
        .select("vector", "model_version").head()
      val qv = queryRow.getSeq[Double](0).toArray
      val bundle = c.bundles(queryRow.getInt(1))
      // reference ADC-on-IVF: per-list LUT of the residual-transformed query
      // (ds/IVFPQ.java:408–450). Here: one LUT per coarse list, selected by
      // the row's list_id.
      val luts: Array[Array[Array[Double]]] =
        bundle.coarseQuantizer.indices.map { li =>
          val res = graft.kernels.Kernels.residual(qv, bundle.coarseQuantizer(li))
          graft.kernels.Kernels.adcLookupTable(bundle.transform(res), bundle.pq)
        }.toArray
      val lutLit = array(luts.map(lut =>
        array(lut.map(rowArr => array(rowArr.map(lit): _*)): _*)): _*)
      val m = bundle.pq.numSubVectors
      val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, j) => acc + element_at(
          element_at(element_at(lutLit, col("list_id") + 1), j + 1),
          element_at(col("pq_code"), j + 1) + 1))
      feats.where(col("image_id") =!= "img_00000002")
        .withColumn("adc_dist", round(adc, 9))
        .orderBy(col("adc_dist").asc, col("image_id").asc)
        .limit(5)
        .select(col("image_id").as("neighbor_id"), col("adc_dist"), col("list_id"))
    }),

    // SURF-style extraction (P5, ext/SURFExtractor.java:44–59 — our own
    // Fast-Hessian + 64-d Haar descriptor, SurfLiteExtractor): per-image
    // keypoint/descriptor stats over larger structured rasters.
    "q_image_surf" -> ((s, dir) => {
      val ex = graft.extract.SurfLiteExtractor(detectThreshold = 1.0)
      val images = graft.data.Synth.imageTable(s, 60L)
        .where(col("fmt").isin("png", "jpeg"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("image_id",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_keypoints",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("mean_desc_norm",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val rdd = images.select("image_id", "bytes").rdd.mapPartitions { it =>
        it.flatMap { r =>
          graft.kernels.Imaging.decode(r.getAs[Array[Byte]](1)).map { raster =>
            val d = ex.extract(raster)
            val meanNorm = if (d.isEmpty) 0.0
              else d.map(graft.kernels.Kernels.l2Norm).sum / d.length
            org.apache.spark.sql.Row(r.getString(0), d.length,
              math.rint(meanNorm * 1e6) / 1e6)
          }
        }
      }
      s.createDataFrame(rdd, schema).orderBy("image_id")
    }),

    // BoW aggregation (P12, agg/BowAggregator.java:39–74, hard assignment):
    // per-image histogram of nearest-centroid counts over the v1 codebook.
    "q_image_bow" -> ((s, dir) => {
      val c = pipeline(s, dir)
      val codebook = c.bundles(1).codebooks(0)
      val bc = s.sparkContext.broadcast(codebook)
      val cfg = graft.data.Synth.defaultConfig
      val images = graft.data.Synth.imageTable(s, math.min(nFor(dir), 200L))
        .where(col("fmt").isin("png", "jpeg"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("image_id",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_desc",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("top_bin",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("top_count",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val rdd = images.select("image_id", "bytes").rdd.mapPartitions { it =>
        it.flatMap { r =>
          graft.kernels.Imaging.decode(r.getAs[Array[Byte]](1)).map { raster =>
            val descs = cfg.extractor.extract(
              graft.kernels.Imaging.maxPixelsScaling(raster, cfg.maxPixels))
            val hist = graft.kernels.Kernels.bow(descs, bc.value)
            val top = hist.indices.maxBy(i => (hist(i), -i))
            org.apache.spark.sql.Row(r.getString(0), descs.length, top, hist(top))
          }
        }
      }
      s.createDataFrame(rdd, schema).orderBy("image_id")
    }),

    // IVFPQ k-NN (T4, ds/IVFPQ.java:408–450): probe only the w nearest coarse
    // lists — the `list_id` predicate prunes partitions when the code table is
    // partitioned by list_id (SnapshotSink does this; proven in
    // IvfSnapshotSpec), then ADC within the surviving lists.
    "q_image_ivf_knn" -> ((s, dir) => {
      val c = pipeline(s, dir)
      val feats = c.features.where(col("error").isNull)
      val queryRow = feats.where(col("image_id") === "img_00000002")
        .select("vector", "model_version").head()
      val qv = queryRow.getSeq[Double](0).toArray
      val bundle = c.bundles(queryRow.getInt(1))
      val w = 2 // probe width (reference default: 10% of k_c, IVFPQ.java:188)
      val probed = graft.kernels.Kernels.kNearestCentroids(qv, bundle.coarseQuantizer, w)
      val luts = probed.map { li =>
        val res = graft.kernels.Kernels.residual(qv, bundle.coarseQuantizer(li))
        li -> graft.kernels.Kernels.adcLookupTable(bundle.transform(res), bundle.pq)
      }
      // per-probed-list LUT selected by a chained when() on list_id
      val m = bundle.pq.numSubVectors
      val lutFor = luts.map { case (li, lut) =>
        li -> array(lut.map(rowArr => array(rowArr.map(lit): _*)): _*)
      }
      val lutCol = lutFor.tail.foldLeft(
        when(col("list_id") === lutFor.head._1, lutFor.head._2)) {
        case (acc, (li, c2)) => acc.when(col("list_id") === li, c2)
      }
      val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, j) => acc + element_at(element_at(lutCol, j + 1),
          element_at(col("pq_code"), j + 1) + 1))
      feats
        .where(col("list_id").isin(probed.map(Integer.valueOf): _*) &&
          col("image_id") =!= "img_00000002")
        .withColumn("adc_dist", round(adc, 9))
        .orderBy(col("adc_dist").asc, col("image_id").asc)
        .limit(5)
        .select(col("image_id").as("neighbor_id"), col("adc_dist"), col("list_id"))
    })
  )
}
