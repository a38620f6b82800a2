package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecAggregates

/** Native element-wise vector sum/mean aggregate: scalar parity, null
  * skipping, float + double inputs, the ObjectHashAggregate plan shape, and
  * the loud dimension-mismatch failure. */
class VecAggregatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    (0, Array(1.0f, 2.0f, 3.0f)),
    (0, Array(3.0f, 4.0f, 5.0f)),
    (1, Array(10.0f, 0.0f, -2.0f)))

  test("vec_mean / vec_sum match the scalar element-wise computation " +
    "(float input, double output)") {
    val df = rows.toDF("label", "v")
    val got = df.groupBy("label")
      .agg(VecAggregates.vec_mean(col("v")).as("m"),
        VecAggregates.vec_sum(col("v")).as("s"))
      .orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 3.0, 4.0))
    assert(got(0).getSeq[Double](2) == Seq(4.0, 6.0, 8.0))
    assert(got(1).getSeq[Double](1) == Seq(10.0, 0.0, -2.0))
  }

  test("double input works; null vectors are skipped; all-null group → null") {
    val df = Seq(
      (0, Option(Array(1.0, 3.0))), (0, None), (1, None))
      .toDF("label", "v")
    val got = df.groupBy("label")
      .agg(VecAggregates.vec_mean(col("v")).as("m")).orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(1.0, 3.0))
    assert(got(1).isNullAt(1))
  }

  test("partitioning-invariant (partial buffers merge)") {
    val big = (0 until 1000).map(i => (i % 7, Array(i.toDouble, (i * 3).toDouble)))
    def run(parts: Int) = big.toDF("label", "v").repartition(parts)
      .groupBy("label").agg(VecAggregates.vec_sum(col("v")).as("s"))
      .orderBy("label").collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    assert(run(1) == run(13))
  }

  test("plans as ObjectHashAggregate (partial per-task fold before the shuffle)") {
    val df = rows.toDF("label", "v")
      .groupBy("label").agg(VecAggregates.vec_mean(col("v")).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
  }

  test("dimension mismatch inside a group fails loudly") {
    val df = Seq((0, Array(1.0, 2.0)), (0, Array(1.0, 2.0, 3.0))).toDF("label", "v")
    val e = intercept[org.apache.spark.SparkException] {
      df.groupBy("label").agg(VecAggregates.vec_sum(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }
}
