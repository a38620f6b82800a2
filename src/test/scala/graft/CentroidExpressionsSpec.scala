package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CentroidExpressions
import graft.kernels.Kernels

/** Native coarse-quantizer assignment (ds/IVFPQ.java:100–106, probe lists
  * :408–420) vs the scalar kernel, including the generated (whole-stage
  * codegen) path and a reference-scale plan test at k_c=8192, d=1024 — the
  * config a plan-literal formulation cannot compile. */
class CentroidExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 24
  private val rnd = new scala.util.Random(90210)
  private val centroids = Array.fill(11, dim)(rnd.nextGaussian())
  private lazy val bc = spark.sparkContext.broadcast(centroids)

  private def randVec() = Array.fill(dim)(rnd.nextGaussian())

  /** scalar probe-list oracle: all centroids sorted by (dist, idx). */
  private def scalarKNearest(v: Array[Double], w: Int): Seq[Int] =
    centroids.indices
      .map(i => (Kernels.squaredL2(v, centroids(i)), i))
      .sortBy(identity).take(w).map(_._2)

  test("nearest_centroid == Kernels.nearestCentroid (float and double arrays)") {
    val vecs = (0 until 60).map(i => (i.toLong, randVec()))
    val gotD = vecs.toDF("id", "v")
      .select(col("id"), CentroidExpressions.nearest_centroid(col("v"), bc).as("li"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotF = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("id", "v")
      .select(col("id"), CentroidExpressions.nearest_centroid(col("v"), bc).as("li"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, v) =>
      assert(gotD(i) == Kernels.nearestCentroid(v, centroids), s"double row $i")
      assert(gotF(i) == Kernels.nearestCentroid(v.map(_.toFloat.toDouble), centroids),
        s"float row $i")
    }
  }

  test("ties keep the lower centroid index (reference scan order)") {
    val dupC = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val b = spark.sparkContext.broadcast(dupC)
    val got = Seq((0L, Array(1.0, 0.0))).toDF("id", "v")
      .select(CentroidExpressions.nearest_centroid(col("v"), b).as("li"))
      .head().getInt(0)
    assert(got == 0)
  }

  test("k_nearest_centroids == scalar (dist asc, idx asc) prefix, " +
    "w > k_c clamps") {
    val vecs = (0 until 40).map(i => (i.toLong, randVec()))
    Seq(1, 3, 11, 25).foreach { w =>
      val got = vecs.toDF("id", "v")
        .select(col("id"),
          CentroidExpressions.k_nearest_centroids(col("v"), w, bc).as("ks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (i, v) =>
        assert(got(i) == scalarKNearest(v, w), s"w=$w row $i")
      }
    }
  }

  test("generated path (parquet-backed scan, whole-stage codegen) matches " +
    "the interpreted kernel") {
    val vecs = (0 until 30).map(i => (i.toLong, randVec().map(_.toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("graft_nc").resolve("t").toString
    vecs.toDF("id", "v").write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .select(col("id"),
        CentroidExpressions.nearest_centroid(col("v"), bc).as("li"),
        CentroidExpressions.k_nearest_centroids(col("v"), 4, bc).as("ks"))
    // local relations constant-fold through the interpreted path; a parquet
    // scan goes through WholeStageCodegen → doGenCode
    assert(scan.queryExecution.executedPlan.toString.contains("*("))
    val got = scan.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    vecs.foreach { case (i, vf) =>
      val v = vf.map(_.toDouble)
      assert(got(i)._1 == Kernels.nearestCentroid(v, centroids), s"row $i nearest")
      assert(got(i)._2 == scalarKNearest(v, 4), s"row $i probe list")
    }
  }

  test("reference-scale plan: k_c=8192, d=1024 assignment plans with O(1) " +
    "plan nodes and no centroid literals (plan-only, like the ADC dims test)") {
    val big = Array.fill(8192, 1024)(rnd.nextGaussian())
    val bigBc = spark.sparkContext.broadcast(big)
    val df = spark.range(1).select(
      transform(sequence(lit(1), lit(1024)), i => i.cast("double")).as("v"))
    val assigned = df.select(
      CentroidExpressions.nearest_centroid(col("v"), bigBc).as("list_id"),
      CentroidExpressions.k_nearest_centroids(col("v"), 64, bigBc).as("probes"))
    val plan = assigned.queryExecution.executedPlan.toString
    // the whole plan stays tiny — the 8.4M-value centroid matrix is not in it
    assert(plan.length < 20000, s"plan unexpectedly large: ${plan.length} chars")
    assert(plan.contains("nearest_centroid"))
    assert(plan.contains("k_nearest_centroids"))
    // executes too (1 row): broadcast resolves on the executor
    val row = assigned.head()
    assert(row.getInt(0) >= 0 && row.getInt(0) < 8192)
    assert(row.getSeq[Int](1).size == 64)
    bigBc.destroy()
  }

  test("dimension mismatch fails loudly") {
    val e = intercept[Exception] {
      Seq((0L, Array(1.0, 2.0))).toDF("id", "v")
        .select(CentroidExpressions.nearest_centroid(col("v"), bc)).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("dims"))
  }
}
