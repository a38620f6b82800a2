package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hashed-n-gram linear-classifier primitives — the model-based quality
 * filter every production LLM corpus uses (GPT-3's Wikipedia-vs-crawl
 * logistic classifier, arXiv:2005.14165 app. A; LLaMA and RefinedWeb use
 * the same fastText-shaped recipe): hash word uni+bigrams into a fixed
 * D-dimensional space, score with a learned weight vector.
 *
 * Both ends are ROW-LOCAL compiled passes: `hashed_features` tokenizes,
 * hashes (FNV-1a 64 — public, engine-independent) and count-normalizes in
 * one loop; `sparse_logit` folds σ(w·x) over the sparse features with the
 * weight vector in ONE broadcast (the [[LmExpressions]] /
 * [[CentroidExpressions]] driver-state doctrine — a 2¹⁶-dim weight vector
 * must not be plan literals). Stateless → both run unchanged on Structured
 * Streaming micro-batches. Training lives in [[graft.ml.Classifier]].
 */
object ClassifierExpressions {

  val featureType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic, dependency-free. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Feature index of a term under dimensionality `d`: in [1, d−1] — index
    * 0 is RESERVED for the bias feature (constant 1.0). */
  def termIndex(term: String, d: Int): Int =
    1 + java.lang.Math.floorMod(fnv1a64(term), (d - 1).toLong).toInt

  /** Scalar twin of the expression: sparse (index → value) feature map of
    * `text` — whitespace unigrams (+ adjacent bigrams when `bigrams`),
    * values = term count / total terms (so feature scale is length-free),
    * plus the bias (0 → 1.0). Hash collisions accumulate. */
  def featureMap(text: String, d: Int,
                 bigrams: Boolean): java.util.TreeMap[Integer, java.lang.Double] = {
    val out = new java.util.TreeMap[Integer, java.lang.Double]()
    val toks = text.trim match {
      case "" => Array.empty[String]
      case s => s.split("\\s+")
    }
    val nTerms = toks.length + (if (bigrams && toks.length > 1) toks.length - 1 else 0)
    def add(idx: Int, v: Double): Unit =
      out.merge(Integer.valueOf(idx), java.lang.Double.valueOf(v),
        (a, b) => java.lang.Double.valueOf(a.doubleValue + b.doubleValue))
    if (nTerms > 0) {
      val unit = 1.0 / nTerms
      var i = 0
      while (i < toks.length) {
        add(termIndex(toks(i), d), unit)
        if (bigrams && i < toks.length - 1)
          add(termIndex(toks(i) + " " + toks(i + 1), d), unit)
        i += 1
      }
    }
    add(0, 1.0) // bias — present even for empty documents
    out
  }

  /** Static bridge for codegen: text → sorted sparse feature rows. */
  def featuresEval(text: UTF8String, d: Int, bigrams: Boolean): ArrayData = {
    val m = featureMap(text.toString, d, bigrams)
    val out = new Array[Any](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](e.getKey.intValue, e.getValue.doubleValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static bridge for codegen: σ(w·x) over sparse features. */
  def logitEval(features: ArrayData, w: Array[Double]): Double = {
    var z = 0.0
    var i = 0
    val n = features.numElements()
    while (i < n) {
      val row = features.getStruct(i, 2)
      val idx = row.getInt(0)
      if (idx >= 0 && idx < w.length) z += w(idx) * row.getDouble(1)
      i += 1
    }
    // clamp: exp overflow guard; σ is saturated far before |z| = 40 anyway
    val zc = math.max(-40.0, math.min(40.0, z))
    1.0 / (1.0 + math.exp(-zc))
  }

  case class HashedFeatures(child: Expression, d: Int, bigrams: Boolean)
      extends UnaryExpression {
    require(d >= 2, s"feature dimensionality must be >= 2, got $d")
    override def dataType: DataType = featureType
    override def prettyName: String = "hashed_features"

    override def nullSafeEval(text: Any): Any =
      featuresEval(text.asInstanceOf[UTF8String], d, bigrams)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = ClassifierExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $cls.featuresEval($c, $d, $bigrams);")
    }

    override protected def withNewChildInternal(c: Expression): HashedFeatures =
      copy(child = c)
  }

  case class SparseLogit(child: Expression, weights: Broadcast[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sparse_logit"

    @transient private lazy val w: Array[Double] = weights.value

    override def nullSafeEval(features: Any): Any =
      logitEval(features.asInstanceOf[ArrayData], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("wBc", weights,
        classOf[Broadcast[Array[Double]]].getName)
      val wArr = ctx.addMutableState("double[]", "clsWeights",
        v => s"$v = (double[]) $bcRef.value();")
      val cls = ClassifierExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $cls.logitEval($c, $wArr);")
    }

    override protected def withNewChildInternal(c: Expression): SparseLogit =
      copy(child = c)
  }

  def hashed_features(text: Column, d: Int, bigrams: Boolean = true): Column =
    GraftBridge.column(HashedFeatures(GraftBridge.expression(text), d, bigrams))

  def sparse_logit(features: Column, weights: Broadcast[Array[Double]]): Column =
    GraftBridge.column(SparseLogit(GraftBridge.expression(features), weights))
}
