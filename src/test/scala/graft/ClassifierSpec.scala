package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ClassifierExpressions
import graft.ml.Classifier

/** Hashed-n-gram logistic quality classifier: feature extraction pinned
  * against the scalar twin, training separates a synthetic good/noise
  * corpus, and weights are partitioning-invariant up to FP-sum noise. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hashed_features expression == scalar featureMap: bias at 0, " +
    "count-normalized values, bigram terms, collision accumulation") {
    val texts = Seq("the quick brown fox", "a a a", "", "  ", "one")
    val got = texts.toDF("t")
      .select(ClassifierExpressions.hashed_features(col("t"), 64).as("f"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap)
    texts.zip(got).foreach { case (t, g) =>
      val want = {
        val m = ClassifierExpressions.featureMap(t, 64, bigrams = true)
        val b = Map.newBuilder[Int, Double]
        m.forEach((k, v) => b += (k.intValue -> v.doubleValue))
        b.result()
      }
      assert(g == want, s"text '$t'")
      assert(g(0) == 1.0, "bias feature")
      // values sum to ≈ 2 − 1/nTerms … just check total term mass + bias
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val nTerms = toks.length + math.max(0, toks.length - 1)
      if (nTerms > 0)
        assert(math.abs(g.values.sum - 2.0) < 1e-9,
          "unigram+bigram mass normalizes to 1 (+1 bias)")
    }
    // "a a a": unigram "a" appears 3×, bigram "a a" 2× → collisions merge
    val aaa = got(1)
    assert(aaa.size == 3, s"bias + one unigram index + one bigram index: $aaa")
  }

  test("training separates good English from character noise; score " +
    "expression == scalar sigmoid dot; streaming-safe projection") {
    val rnd = new scala.util.Random(99)
    def noise(): String = (0 until 12).map(_ =>
      (0 until 6).map(_ => ('b' + rnd.nextInt(24)).toChar).mkString).mkString(" ")
    val good = (0 until 80).map(i =>
      (s"the quick document $i is made of real words and it reads well " +
        s"with the usual glue of english prose", 1.0))
    val bad = (0 until 80).map(_ => (noise(), 0.0))
    val train = (good ++ bad).toDF("text", "label")
    val model = Classifier.train(train, "text", "label",
      dims = 512, iters = 60, lr = 4.0)
    val scored = train.select(col("label"),
        Classifier.scoreColumn(col("text"), model, spark).as("s"))
      .as[(Double, Double)].collect()
    val goodMin = scored.filter(_._1 == 1.0).map(_._2).min
    val badMax = scored.filter(_._1 == 0.0).map(_._2).max
    assert(goodMin > 0.5 && badMax < 0.5,
      s"classifier must separate: goodMin=$goodMin badMax=$badMax")
    assert(goodMin - badMax > 0.2, s"margin too thin: $goodMin vs $badMax")
    // expression path == scalar twin
    scored.zip(train.select("text").as[String].collect().map(t =>
      Classifier.scoreScalar(t, model))).foreach { case ((_, e), s) =>
      assert(math.abs(e - s) < 1e-12)
    }
  }

  test("training is partitioning-invariant up to FP-sum noise (allclose)") {
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0) (s"the good and clean document $i with words", 1.0)
      else (s"zzq$i xkcd qqz jxq zzt", 0.0)
    }.toDF("text", "label")
    val m1 = Classifier.train(docs.repartition(1), "text", "label",
      dims = 128, iters = 10)
    val m7 = Classifier.train(docs.repartition(7), "text", "label",
      dims = 128, iters = 10)
    m1.weights.zip(m7.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
        s"weights diverge beyond FP-sum noise: $a vs $b")
    }
  }
}
