package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedTopK
import graft.operators.Similarity

/** BoundedTopK aggregate: parity with the window-rank formulation it
  * replaced (including ties), partitioning invariance (the map-side partial
  * heap must not change results), payload carry, and the plan shape — partial
  * ObjectHashAggregate BEFORE the exchange, no Window anywhere. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // groups of varied size incl. ties on score and a group smaller than k
  private val rows: Seq[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(99)
    val big = for (g <- 0L until 6L; i <- 0L until 50L)
      yield (g, i, math.rint(rnd.nextDouble() * 20) / 2.0) // coarse → many ties
    big ++ Seq((100L, 0L, 1.0), (100L, 1L, 0.5)) // group of 2 with k=10
  }

  private def windowed(k: Int, ascending: Boolean) = {
    val df = rows.toDF("g", "id", "score")
    val ord = if (ascending) Seq(col("score").asc, col("id").asc)
      else Seq(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(Window.partitionBy("g").orderBy(ord: _*)))
      .where(col("rank") <= k)
      .select("g", "id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  private def heaped(k: Int, ascending: Boolean, parts: Int) = {
    val df = rows.toDF("g", "id", "score").repartition(parts)
    Similarity.topKPerGroup(df, Seq("g"), "score", "id", k, ascending)
      .select("g", "id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
  }

  test("matches row_number window ranking exactly, both directions, with ties") {
    assert(heaped(10, ascending = true, parts = 4) == windowed(10, ascending = true))
    assert(heaped(10, ascending = false, parts = 4) == windowed(10, ascending = false))
  }

  test("partitioning-invariant (map-side partial heaps don't change results)") {
    val base = heaped(7, ascending = true, parts = 1)
    assert(heaped(7, ascending = true, parts = 3) == base)
    assert(heaped(7, ascending = true, parts = 13) == base)
  }

  test("group smaller than k returns the whole group, ranks dense from 1") {
    val got = heaped(10, ascending = true, parts = 4).filter(_._1 == 100L).toSeq.sortBy(_._4)
    assert(got.map(t => (t._2, t._4)) == Seq((1L, 1), (0L, 2))) // 0.5 before 1.0
  }

  test("payload rides uncompared and comes back in rank order (k-means init shape)") {
    val df = Seq(
      (0, "a", Array(1.0, 2.0)), (0, "b", Array(3.0, 4.0)), (0, "c", Array(5.0, 6.0)))
      .toDF("block", "vkey", "vec")
    val out = df.groupBy(col("block"))
      .agg(BoundedTopK.topK(xxhash64(col("vkey")), col("vkey"), col("vec"), 2,
        ascending = true).as("tk"))
      .select(col("block"), posexplode(col("tk")))
      .select(col("pos"), col("col.id").cast("string").as("vkey"), col("col.payload"))
      .collect()
    assert(out.length == 2)
    // expected order = the two lowest xxhash64(vkey); recompute via Spark
    val hashes = Seq("a", "b", "c").map(s =>
      s -> Seq(s).toDF("vkey").select(xxhash64(col("vkey"))).head().getLong(0)).toMap
    val expect = Seq("a", "b", "c").sortBy(s => (hashes(s), s)).take(2)
    assert(out.map(_.getString(1)).toSeq == expect)
    val byKey = Map("a" -> Seq(1.0, 2.0), "b" -> Seq(3.0, 4.0), "c" -> Seq(5.0, 6.0))
    out.foreach(r => assert(r.getSeq[Double](2) == byKey(r.getString(1))))
  }

  test("plan: partial bounded_top_k before the exchange, no Window (T1 shape)") {
    val df = rows.toDF("g", "id", "score")
    val plan = Similarity.topKPerGroup(df, Seq("g"), "score", "id", 5, ascending = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bounded_top_k"), plan.take(800))
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(!plan.contains("Window"), "top-k must not plan a Window:\n" + plan.take(800))
    // the partial aggregate must appear BELOW the shuffle exchange
    val lines = plan.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning"))
    val partialIdx = lines.indexWhere(_.contains("partial_bounded_top_k"))
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial agg must be map-side (below the exchange): ex=$exchangeIdx partial=$partialIdx")
  }

  test("q_embed_knn / q_embed_ivf plans contain no Window (round-1 scale-killer gone)") {
    val sf = "/root/testdata/sf0.001"
    Seq("q_embed_knn", "q_embed_ivf").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q plans a Window:\n" + plan.take(600))
      assert(plan.contains("bounded_top_k"), s"$q missing bounded_top_k")
    }
  }
}
