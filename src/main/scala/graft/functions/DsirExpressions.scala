package graft.functions

import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Broadcast-model DSIR scoring — the row-local / streaming twin of
 * [[graft.operators.Dsir.dsirWeights]].
 *
 * The join path is the scale path (the ratio table stays a DataFrame);
 * but a fitted DSIR model is a FIXED-size dense array (`buckets` doubles
 * — 64 KB at the default 8192), so scoring can ride in one broadcast and
 * run per row with no shuffle at all: tokenize → for each word uni+bigram
 * md5-bucket → sum ratios[bucket]. Stateless → runs unchanged on
 * Structured Streaming micro-batches.
 *
 * Arithmetic is IDENTICAL to the join path term-by-term (same md5-prefix
 * bucket, same ratio values); only floating-point summation ORDER differs
 * (document order here vs aggregate merge order there) — asserted ~1e-9
 * in DsirSpec. Documents with no tokens have no features → NULL.
 */
object DsirExpressions {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** md5-prefix bucket of one n-gram — identical to the Column-side
    * pmod(conv(substring(md5(s),1,8),16,10), buckets). */
  def bucketEval(ngram: String, buckets: Int): Int = {
    val d = digest.get()
    d.reset()
    val h = d.digest(ngram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u32 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u32 % buckets).toInt
  }

  /** Σ ratios[bucket(ngram)] over word uni+bigrams of `text`; null when
    * the document has no tokens. */
  def scoreEval(ratios: Array[Double], text: UTF8String): java.lang.Double = {
    val toks = text.toString.trim match {
      case "" => Array.empty[String]
      case s => s.split("\\s+")
    }
    if (toks.length == 0) return null
    val b = ratios.length
    var s = 0.0
    var i = 0
    while (i < toks.length) { // unigrams
      s += ratios(bucketEval(toks(i), b))
      i += 1
    }
    i = 0
    while (i < toks.length - 1) { // bigrams
      s += ratios(bucketEval(toks(i) + " " + toks(i + 1), b))
      i += 1
    }
    s
  }

  case class DsirScore(child: Expression, ratios: Broadcast[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dsir_score"

    override def nullSafeEval(v: Any): Any =
      scoreEval(ratios.value, v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("dsirBc", ratios,
        classOf[Broadcast[Array[Double]]].getName)
      val model = ctx.addMutableState("double[]", "dsirModel",
        v => s"$v = (double[]) $bcRef.value();")
      val boxed = ctx.freshName("dsirBoxed")
      nullSafeCodeGen(ctx, ev, v => s"""
        java.lang.Double $boxed =
          graft.functions.DsirExpressions.scoreEval($model, $v);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }""")
    }

    override protected def withNewChildInternal(c: Expression): DsirScore =
      copy(child = c)
  }

  def dsir_score(text: Column, ratios: Broadcast[Array[Double]]): Column =
    GraftBridge.column(DsirScore(GraftBridge.expression(text), ratios))
}
