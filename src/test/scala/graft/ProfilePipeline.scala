package graft

/** Stage profiler for the flagship per-image kernel (NOT a test — run with
  * `sbt "Test/runMain graft.ProfilePipeline"`): times decode / scale /
  * extract / VLAD / PCA / coarse+PQ separately on the synthetic bench images,
  * single-threaded, to locate the throughput-dominant stage before touching
  * anything. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 1200L
    val images = graft.data.Synth.imageTable(spark, n, jpegBias = true)
      .where(org.apache.spark.sql.functions.col("fmt").isin("png", "jpeg"))
      .select("image_id", "bytes").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
    val (_, bundles) = graft.data.Synth.mintModels(spark,
      graft.data.Synth.imageTable(spark, 300), 300)
    val bundle = bundles(1)
    val cfg = graft.data.Synth.defaultConfig
    spark.stop()

    import graft.kernels.{Imaging, Kernels}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass (${images.length} images, 1 thread) ---")
      val rasters = time("decode")(images.flatMap(i => Imaging.decode(i._2)))
      val scaled = time("maxPixelsScaling")(rasters.map(r =>
        Imaging.maxPixelsScaling(r, cfg.maxPixels)))
      val descs = time("extract (GridPatch)")(scaled.map(cfg.extractor.extract))
      val vlads = time("multiVLAD")(descs.map(d => Kernels.multiVlad(d, bundle.codebooks)))
      val vecs = time("pcaProject")(vlads.map(v =>
        if (bundle.projectedLength < bundle.vladLength) Kernels.pcaProject(v, bundle.pca) else v))
      time("coarse+residual+PQ")(vecs.map { v =>
        val li = Kernels.nearestCentroid(v, bundle.coarseQuantizer)
        Kernels.pqEncode(bundle.transform(Kernels.residual(v, bundle.coarseQuantizer(li))), bundle.pq)
      })
    }
  }
}
