package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.FeaturePipeline
import graft.sink.SnapshotSink
import graft.temporal.Temporal

/** Diagnostic main: decompose the flagship pipeline's wall time into
  * cumulative phases (scan → as-of → featurize → +repartition → +snapshot
  * write) at two parallelism levels, to locate the parallelism-independent
  * fixed cost that caps N→4N scaling efficiency. Reuses the Bench input
  * cache; run AFTER graft.Bench has populated target/bench_cache. */
object ProfileFixedCost {
  def main(args: Array[String]): Unit = {
    val cacheDir = java.nio.file.Paths.get("/root/repo/target/bench_cache/images_200000")
    val inputPath = cacheDir.resolve("images").toString
    val modelsBin = cacheDir.resolve("models.bin")
    require(Files.exists(modelsBin), "run graft.Bench first to build the cache")
    val in = new java.io.ObjectInputStream(Files.newInputStream(modelsBin))
    val (modelRows, bundles) =
      try {
        (in.readObject().asInstanceOf[Array[org.apache.spark.sql.Row]],
          in.readObject().asInstanceOf[Map[Int, graft.model.ModelBundle]])
      } finally in.close()

    def newSession(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-profile-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (128L * 1024).toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    def modelDf(spark: SparkSession): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(modelRows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("model_version",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("valid_from",
            org.apache.spark.sql.types.TimestampType, nullable = false))))

    val work = Files.createTempDirectory("graft_profile")
    def phases(spark: SparkSession, cpus: Int, tag: String): Unit = {
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[$tag] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      val images = spark.read.parquet(inputPath)
        .where(col("fmt").isin("png", "jpeg"))
      time("scan_only")(images.select("image_id").write.mode("overwrite")
        .format("noop").save())
      val bound = Temporal.asOfJoin(images, modelDf(spark), "ts", "valid_from")
      val features = FeaturePipeline.featurize(bound, bundles,
        graft.data.Synth.defaultConfig)
      time("featurize_noop")(features.write.mode("overwrite")
        .format("noop").save())
      val numSalts = 16
      val k = math.max(2, cpus / 4) // keep in sync with Bench.runPipeline
      val repart = features
        .withColumn("salt", pmod(col("phash"), lit(numSalts)).cast("int"))
        .repartition(numSalts * k,
          col("salt") * k + pmod(xxhash64(col("image_id")), lit(k)))
      time("repartition_noop")(repart.write.mode("overwrite")
        .format("noop").save())
      time("full_snapshot")(
        { SnapshotSink.append(repart,
            work.resolve(s"out_${tag}_${System.nanoTime()}").toString,
            "image_id", Seq("salt"), Map.empty); () })
    }

    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 4, 16)
    levels.zipWithIndex.foreach { case (c, i) =>
      val spark = newSession(c)
      if (i == 0) { // one JVM-wide warmup at the first level
        val warm = spark.read.parquet(inputPath).limit(1500)
        val p = work.resolve("warm_in").toString
        warm.write.mode("overwrite").parquet(p)
        val b = Temporal.asOfJoin(spark.read.parquet(p), modelDf(spark),
          "ts", "valid_from")
        FeaturePipeline.featurize(b, bundles, graft.data.Synth.defaultConfig)
          .write.mode("overwrite").format("noop").save()
      }
      phases(spark, c, s"local[$c]#$i")
      spark.stop()
    }
  }
}
