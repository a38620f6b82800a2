package graft
import org.apache.spark.sql.functions._
import graft.kernels.Imaging
object Probe {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val cpus = args(1).toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (2L*1024*1024).toString)
      .config("spark.sql.files.openCostInBytes", (128L*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.data.Synth.defaultConfig
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = spark.read.parquet(input).where(col("fmt").isin("png","jpeg"))
        .select("bytes").rdd.mapPartitions { it =>
          it.map { r =>
            Imaging.decode(r.getAs[Array[Byte]](0)) match {
              case Some(raster) =>
                val scaled = Imaging.maxPixelsScaling(raster, cfg.maxPixels)
                cfg.extractor.extract(scaled).length
              case None => 0
            }
          }
        }.sum()
      println(f"rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s (desc sum ${n}%.0f)")
    }
    spark.stop()
  }
}
