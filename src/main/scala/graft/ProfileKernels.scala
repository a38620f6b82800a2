package graft

import java.nio.file.Files

/** Round-8 diagnostic: single-thread per-image kernel breakdown of the
  * flagship featurize path (decode → scale → extract → multiVLAD → PCA →
  * coarse assign → residual → transform → PQ) over a sample of the bench
  * cache input, to locate the dominant kernel before optimizing it.
  * Reads target/bench_cache (run graft.Bench first). Not a driver artifact.
  */
object ProfileKernels {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300
    val cacheDir = java.nio.file.Paths.get("/root/repo/target/bench_cache/images_200000")
    val modelsBin = cacheDir.resolve("models.bin")
    require(Files.exists(modelsBin), "run graft.Bench first")
    val in = new java.io.ObjectInputStream(Files.newInputStream(modelsBin))
    val bundles =
      try { in.readObject(); in.readObject().asInstanceOf[Map[Int, graft.model.ModelBundle]] }
      finally in.close()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.read.parquet(cacheDir.resolve("images").toString)
      .select("bytes").limit(n).collect()
    spark.stop()
    val cfg = graft.data.Synth.defaultConfig
    import graft.kernels.{Imaging, Kernels}
    // phases
    var tDecode = 0L; var tScale = 0L; var tExtract = 0L; var tVlad = 0L
    var tPca = 0L; var tAssign = 0L; var tRest = 0L
    var nd = 0
    (1 to 3).foreach { rep =>
      tDecode = 0; tScale = 0; tExtract = 0; tVlad = 0; tPca = 0; tAssign = 0; tRest = 0
      rows.foreach { r =>
        val bytes = r.getAs[Array[Byte]](0)
        val bundle = bundles(bundles.keys.min)
        var t0 = System.nanoTime()
        val raster = Imaging.decode(bytes).get
        tDecode += System.nanoTime() - t0
        t0 = System.nanoTime()
        val scaled = Imaging.maxPixelsScaling(raster, cfg.maxPixels)
        tScale += System.nanoTime() - t0
        t0 = System.nanoTime()
        val desc = cfg.extractor.extract(scaled)
        tExtract += System.nanoTime() - t0
        nd += desc.length
        t0 = System.nanoTime()
        val vlad = Kernels.multiVlad(desc, bundle.codebooks)
        tVlad += System.nanoTime() - t0
        t0 = System.nanoTime()
        val vec = if (bundle.projectedLength < bundle.vladLength)
          Kernels.pcaProject(vlad, bundle.pca) else vlad
        tPca += System.nanoTime() - t0
        t0 = System.nanoTime()
        val listId = Kernels.nearestCentroid(vec, bundle.coarseQuantizer)
        tAssign += System.nanoTime() - t0
        t0 = System.nanoTime()
        val res = Kernels.residual(vec, bundle.coarseQuantizer(listId))
        val code = Kernels.pqEncode(bundle.transform(res), bundle.pq)
        tRest += System.nanoTime() - t0
        if (code.length == -1) println("?")
      }
      println(f"rep$rep n=$n decode=${tDecode/1e6}%.0fms scale=${tScale/1e6}%.0fms " +
        f"extract=${tExtract/1e6}%.0fms vlad=${tVlad/1e6}%.0fms pca=${tPca/1e6}%.0fms " +
        f"assign=${tAssign/1e6}%.0fms residual+pq=${tRest/1e6}%.0fms descriptors=$nd")
    }
  }
}
