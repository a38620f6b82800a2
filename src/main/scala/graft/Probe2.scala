package graft
import org.apache.spark.sql.functions._
import graft.data.Synth
import graft.pipeline.FeaturePipeline
import graft.temporal.Temporal
import graft.sink.SnapshotSink
object Probe2 {
  def log(m: String): Unit = System.err.println(s"[probe ${java.time.Instant.now()}] $m")
  def main(args: Array[String]): Unit = {
    val input = args(0); val cpus = args(1).toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("probe2")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L*1024*1024).toString)
      .config("spark.sql.files.openCostInBytes", (128L*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    log("minting models (300 imgs)")
    val (modelDf, bundles) = Synth.mintModels(spark,
      spark.read.parquet(input).limit(300), 80000L)
    log("featurize -> noop")
    val images = spark.read.parquet(input).where(col("fmt").isin("png","jpeg"))
    val bound = Temporal.asOfJoin(images, modelDf, "ts", "valid_from")
    var t0 = System.nanoTime()
    FeaturePipeline.featurize(bound, bundles, Synth.defaultConfig)
      .write.mode("overwrite").format("noop").save()
    log(f"featurize noop done in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val feats = FeaturePipeline.featurize(bound, bundles, Synth.defaultConfig)
      .withColumn("salt", pmod(col("phash"), lit(16)).cast("int"))
      .repartition(16, col("salt"))
    val work = java.nio.file.Files.createTempDirectory("probe2")
    val snap = SnapshotSink.append(feats, work.resolve("t").toString, "image_id", Seq("salt"))
    log(f"snapshot append done in ${(System.nanoTime()-t0)/1e9}%.1f s (${snap.rowCount} rows)")
    spark.stop()
  }
}
