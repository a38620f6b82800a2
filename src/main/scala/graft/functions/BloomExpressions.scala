package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Broadcast-Bloom membership counting — the row-local prefilter behind
 * [[graft.operators.Dedup.decontaminateBloom]].
 *
 * The filter is built once with the public `DataFrameStatFunctions
 * .bloomFilter` aggregate and shipped per executor in a Spark broadcast
 * (same driver-state pattern as [[CentroidExpressions]] — a 10⁷-shingle
 * benchmark suite is a few MB of bit array, never plan literals). The
 * per-element membership loop lives in a static JVM helper so the
 * expression stays inside whole-stage codegen; strings are probed as their
 * UTF-8 bytes (`mightContainBinary`), byte-identical to what the builder
 * aggregate inserts for string columns.
 *
 * Bloom semantics make the count CONSERVATIVE: false positives inflate it,
 * false negatives are impossible — exactly what a prune-then-verify
 * prefilter needs.
 */
object BloomExpressions {

  /** Number of non-null array elements the filter MIGHT contain. */
  def hitsEval(bloom: BloomFilter, arr: ArrayData): Int = {
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
          bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) hits += 1
      i += 1
    }
    hits
  }

  private val bloomClassName = classOf[BloomFilter].getName
  private val bcClassName = classOf[Broadcast[BloomFilter]].getName

  case class BloomHits(child: Expression, bloom: Broadcast[BloomFilter])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bloom_hits"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"bloom_hits expects array<string>, got $t")
      }

    override def nullSafeEval(v: Any): Any =
      hitsEval(bloom.value, v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcClassName)
      val bf = ctx.addMutableState(bloomClassName, "bloomFilter",
        v => s"$v = ($bloomClassName) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.BloomExpressions.hitsEval($bf, $v);")
    }

    override protected def withNewChildInternal(c: Expression): BloomHits =
      copy(child = c)
  }

  /** Long-element twin of [[hitsEval]]: probes with `mightContainLong` —
    * matching what the builder aggregate inserts for a LONG column. Used by
    * the hashed-shingle decontamination door (longs probe ~an order of
    * magnitude cheaper than re-hashing string bytes per element). */
  def hitsLongEval(bloom: BloomFilter, arr: ArrayData): Int = {
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && bloom.mightContainLong(arr.getLong(i))) hits += 1
      i += 1
    }
    hits
  }

  case class BloomHitsLong(child: Expression, bloom: Broadcast[BloomFilter])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bloom_hits_long"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"bloom_hits_long expects array<bigint>, got $t")
      }

    override def nullSafeEval(v: Any): Any =
      hitsLongEval(bloom.value, v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcClassName)
      val bf = ctx.addMutableState(bloomClassName, "bloomFilter",
        v => s"$v = ($bloomClassName) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.BloomExpressions.hitsLongEval($bf, $v);")
    }

    override protected def withNewChildInternal(c: Expression): BloomHitsLong =
      copy(child = c)
  }

  def bloom_hits(arr: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftBridge.column(BloomHits(GraftBridge.expression(arr), bloom))
  def bloom_hits_long(arr: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftBridge.column(BloomHitsLong(GraftBridge.expression(arr), bloom))
}
