package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Model-based document-quality classification — the filter every production
 * LLM corpus runs (GPT-3's Wikipedia-vs-CommonCrawl logistic classifier,
 * arXiv:2005.14165 appendix A; LLaMA / RefinedWeb use the same
 * fastText-shaped recipe): hashed word uni+bigram features
 * ([[graft.functions.ClassifierExpressions.hashed_features]]) and
 * full-batch logistic regression.
 *
 * Shape at scale: the feature stage is computed ONCE (row-local compiled
 * expression) and persisted; each training iteration is a single
 * shuffle-free job — per-row error (row-local broadcast `sparse_logit`) ×
 * sparse features accumulated into a dense per-partition D-vector and
 * `treeAggregate`d (depth 2) to the driver. The wire carries one D-double
 * array per task (32 KB at D=4096), never documents; the driver-side
 * gradient is D-bounded (the dimensionality of the model — the sanctioned
 * bounded model load, same as the k-means centroid collects). The driver
 * loop over iterations mirrors [[Learning.kmeans]].
 *
 * Determinism note: gradient sums are floating-point aggregates, so weight
 * bits can differ ~1e-12 across partitionings (the vec_mean caveat);
 * ClassifierSpec asserts allclose invariance, and the scoring query is
 * rows-only for this reason.
 */
object Classifier {

  /** A trained hashed-n-gram logistic model. `weights(0)` is the bias. */
  final case class LogisticModel(weights: Array[Double], dims: Int,
                                 bigrams: Boolean) extends Serializable

  /**
   * Full-batch gradient-descent logistic regression over
   * (textCol, labelCol ∈ {0, 1}) rows. `iters` jobs, each one aggregate;
   * learning rate `lr` on the mean gradient + `l2` ridge shrinkage.
   */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dims: Int = 4096, bigrams: Boolean = true,
            iters: Int = 50, lr: Double = 2.0, l2: Double = 0.0): LogisticModel = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    val feats = df.select(col(labelCol).cast("double").as("__y"),
        graft.functions.ClassifierExpressions.hashed_features(
          col(textCol), dims, bigrams).as("__f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count().toDouble
      require(n > 0, "train: empty input")
      var w = new Array[Double](dims)
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(w)
        // error e = σ(w·x) − y, gradient_i = Σ e·x_i / n. The per-row error
        // is still the compiled broadcast sparse_logit expression; the sum
        // over rows is a dense treeAggregate of the D-vector (D doubles per
        // task result, 32 KB at D=4096) — ONE job per iteration with no
        // shuffle, vs the previous explode→groupBy→collect which scheduled
        // a two-stage shuffle job per iteration (×50 per training run).
        val g = feats
          .select((graft.functions.ClassifierExpressions.sparse_logit(
            col("__f"), bc) - col("__y")).as("__e"), col("__f"))
          .rdd.treeAggregate(new Array[Double](dims))(
            seqOp = (acc, r) => {
              val e = r.getDouble(0)
              val f = r.getSeq[org.apache.spark.sql.Row](1)
              val n = f.length
              var k = 0
              while (k < n) {
                val t = f(k)
                acc(t.getInt(0)) += t.getDouble(1) * e
                k += 1
              }
              acc
            },
            combOp = (a, b) => {
              var j = 0
              while (j < dims) { a(j) += b(j); j += 1 }
              a
            }, depth = 2)
        val next = new Array[Double](dims)
        var j = 0
        while (j < dims) {
          next(j) = w(j) - lr * (g(j) / n + l2 * w(j))
          j += 1
        }
        w = next
        it += 1
      }
      LogisticModel(w, dims, bigrams)
    } finally { feats.unpersist(blocking = false); () }
  }

  /** Row-local quality score σ(w·x) ∈ (0, 1) under a trained model — one
    * compiled featurize+dot pass with the weights in one broadcast.
    * Stateless → streaming-safe (the in-flight quality gate). */
  def scoreColumn(text: Column, model: LogisticModel,
                  spark: org.apache.spark.sql.SparkSession): Column = {
    val bc = spark.sparkContext.broadcast(model.weights)
    graft.functions.ClassifierExpressions.sparse_logit(
      graft.functions.ClassifierExpressions.hashed_features(
        text, model.dims, model.bigrams), bc)
  }

  /** Scalar twin of [[scoreColumn]] for spec-level oracle checks. */
  def scoreScalar(text: String, model: LogisticModel): Double = {
    val m = graft.functions.ClassifierExpressions.featureMap(
      text, model.dims, model.bigrams)
    var z = 0.0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      z += model.weights(e.getKey.intValue) * e.getValue.doubleValue
    }
    val zc = math.max(-40.0, math.min(40.0, z))
    1.0 / (1.0 + math.exp(-zc))
  }
}
