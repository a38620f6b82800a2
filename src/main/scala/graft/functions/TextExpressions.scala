package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot dedup path. The same semantics are
 * expressible with built-in higher-order functions (transform/aggregate), but
 * Spark evaluates HOF lambdas interpretively per element — at 64 hashes ×
 * hundreds of shingles per document that dominated the dedup benchmarks.
 * These expressions do the inner loop in compiled Scala (one virtual call per
 * ROW instead of per element) and plug into codegen via a static bridge —
 * the "custom Expression beats UDF beats interpreted" preference order.
 */
object TextExpressions {

  /** xxhash64 of a UTF8String with an explicit seed (Spark's own kernel). */
  @inline private def hash(s: UTF8String, seed: Long): Long =
    XxHash64Function.hash(s, StringType, seed)

  // --- static bridges for codegen --------------------------------------------

  /** SimHash over token array: bit b = sign of Σ ±1 votes from token-hash bits. */
  def simhashEval(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hash(tokens.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature via the 2-universal trick: g_i(x) = h1(x) + i·h2(x).
    * Returns null-equivalent (caller wraps) for empty input. */
  def minhashEval(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val h1 = hash(s, 0xA5A5A5A5L)
      val h2 = hash(s, 0x5A5A5A5AL) | 1L
      var k = 0
      var g = h1
      while (k < numHashes) {
        if (g < sig(k)) sig(k) = g
        g += h2 // wrapping add == h1 + (k+1)*h2
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  // --- expressions ------------------------------------------------------------

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def nullSafeEval(tokens: Any): Any =
      TextExpressions.simhashEval(tokens.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.simhashEval($c);")
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes > 0 && numHashes <= 1024)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_signature"
    override def nullSafeEval(shingles: Any): Any =
      TextExpressions.minhashEval(shingles.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = $cls.minhashEval($c, $numHashes);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  // --- Column API --------------------------------------------------------------

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), numHashes))
}
