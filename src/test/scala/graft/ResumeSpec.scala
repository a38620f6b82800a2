package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Synth
import graft.pipeline.FeaturePipeline
import graft.sink.SnapshotSink
import graft.temporal.Temporal

/** North-rule resumability, end-to-end on the image pipeline: an interrupted
  * ingest (first half written) resumed with the FULL input produces a table
  * identical to a single-shot run, only recomputing the missing images, with
  * lineage recording both snapshots. */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("image pipeline resumes from snapshot checkpoint to identical state") {
    val n = 30L
    val images = Synth.imageTable(spark, n).cache()
    val (modelDf, bundles) = Synth.mintModels(spark, images, n)
    def featuresOf(in: org.apache.spark.sql.DataFrame) = {
      val bound = Temporal.asOfJoin(in.where(col("fmt").isin("png", "jpeg")),
        modelDf, "ts", "valid_from")
      FeaturePipeline.featurize(bound, bundles, Synth.defaultConfig)
        .withColumn("salt", pmod(col("phash"), lit(4)).cast("int"))
    }
    val oneShot = Files.createTempDirectory("graft_res").resolve("a").toString
    val resumed = Files.createTempDirectory("graft_res").resolve("b").toString

    SnapshotSink.append(featuresOf(images), oneShot, "image_id", Seq("salt"),
      Map("model_versions" -> "1,2"))
    // interrupted run: first 18 rows only, then resume with the full input
    SnapshotSink.append(featuresOf(images.where(col("image_id") < "img_00000018")),
      resumed, "image_id", Seq("salt"), Map("model_versions" -> "1,2"))
    val second = SnapshotSink.appendMissing(featuresOf(images), resumed,
      "image_id", Seq("salt"), Map("model_versions" -> "1,2"))
    assert(second.nonEmpty, "resume must find missing images")
    assert(second.get.id == 2 && second.get.parentId == 1)

    def canon(table: String) = SnapshotSink.read(spark, table)
      .select("image_id", "model_version", "vector", "pq_code", "list_id", "salt")
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getSeq[Double](2),
        if (r.isNullAt(3)) null else r.getSeq[Int](3),
        if (r.isNullAt(4)) null else r.getInt(4), r.getInt(5)))
      .sortBy(_._1)
    assert(canon(oneShot).sameElements(canon(resumed)),
      "resumed table must equal the single-shot table")
    // second resume is a no-op
    assert(SnapshotSink.appendMissing(featuresOf(images), resumed,
      "image_id", Seq("salt")).isEmpty)
    images.unpersist()
  }
}
