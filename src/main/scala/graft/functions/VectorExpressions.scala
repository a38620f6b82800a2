package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst vector expressions for the similarity-search hot path.
 * The zip_with/aggregate HOF formulations evaluate an interpreted lambda per
 * element — at 64 dims × millions of candidate pairs that dominates ANN and
 * near-dup queries. These run the inner loop compiled, accept float or
 * double arrays, and compute in double.
 */
object VectorExpressions {

  private def toDoubles(a: ArrayData, elemType: DataType): Array[Double] =
    elemType match {
      case FloatType => a.toFloatArray().map(_.toDouble)
      case DoubleType => a.toDoubleArray()
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  private def requireSameLength(a: Array[Double], b: Array[Double], op: String): Unit =
    if (a.length != b.length) throw new IllegalArgumentException(
      s"$op: mismatched vector lengths ${a.length} vs ${b.length}")

  def cosineEval(a: Array[Double], b: Array[Double]): Double = {
    requireSameLength(a, b, "vec_cosine")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotEval(a: Array[Double], b: Array[Double]): Double = {
    requireSameLength(a, b, "vec_dot")
    var dot = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    dot
  }

  def hyperplaneEval(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var bits = 0L; var p = 0
    while (p < planes.length) {
      if (dotEval(v, planes(p)) > 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorExpressions.cosineEval(
        toDoubles(a.asInstanceOf[ArrayData], elemType(left)),
        toDoubles(b.asInstanceOf[ArrayData], elemType(right)))
    // eval path only: the per-row work (O(dim) loop) dwarfs the virtual call,
    // and interpreted-vs-generated here differs only in dispatch
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
      copy(left = l, right = r)
  }

  case class VecSquaredL2(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_squared_l2"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = toDoubles(a.asInstanceOf[ArrayData], elemType(left))
      val y = toDoubles(b.asInstanceOf[ArrayData], elemType(right))
      requireSameLength(x, y, "vec_squared_l2")
      var d = 0.0; var i = 0
      while (i < x.length) { val t = x(i) - y(i); d += t * t; i += 1 }
      d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSquaredL2 =
      copy(left = l, right = r)
  }

  case class HyperplaneHash(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_hash"
    override def nullSafeEval(v: Any): Any =
      VectorExpressions.hyperplaneEval(
        toDoubles(v.asInstanceOf[ArrayData], elemType(child)), planes)
    override protected def withNewChildInternal(c: Expression): HyperplaneHash =
      copy(child = c)
  }

  /** Truncate to `len` and L2-renormalize iff shortened, zero-vector → ones —
    * the index-transformation kernel as a Catalyst expression
    * (exm/IndexTransformation.java:117–120; Kernels.truncateRenorm parity is
    * pinned in FunctionsSqlSpec). */
  case class TruncateRenorm(child: Expression, len: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "truncate_renorm"
    override def nullSafeEval(v: Any): Any = {
      val x = toDoubles(v.asInstanceOf[ArrayData], elemType(child))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.kernels.Kernels.truncateRenorm(x, len))
    }
    override protected def withNewChildInternal(c: Expression): TruncateRenorm =
      copy(child = c)
  }

  def vec_cosine(a: Column, b: Column): Column =
    GraftBridge.column(VecCosine(GraftBridge.expression(a), GraftBridge.expression(b)))
  def vec_squared_l2(a: Column, b: Column): Column =
    GraftBridge.column(VecSquaredL2(GraftBridge.expression(a), GraftBridge.expression(b)))
  def hyperplane_hash(v: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneHash(GraftBridge.expression(v), planes))
  def truncate_renorm(v: Column, len: Int): Column =
    GraftBridge.column(TruncateRenorm(GraftBridge.expression(v), len))
}
