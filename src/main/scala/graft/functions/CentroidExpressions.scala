package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native coarse-quantizer assignment for the embedding IVF path — the
 * broadcast-state twin of [[PqExpressions.AdcDistance]].
 *
 * The reference's coarse quantizer (ds/IVFPQ.java:100–106) assigns each
 * vector to its nearest of k_c centroids (k_c = 8192 at the YFCC100M config,
 * exm/YFCC100MExample.java:86–90). Expressing that argmin with per-centroid
 * literal structs puts ~k_c·d literal nodes in the plan (8192 × 1024 ≈ 8.4M —
 * the plan never compiles) and evaluates an interpreted HOF chain per row.
 * Here the centroid matrix lives in a Spark broadcast (shipped once per
 * executor, O(1) plan nodes) and the scan loop is compiled: generated code
 * resolves the broadcast once per generated-class instance and calls a static
 * JVM helper per row, so the expression stays inside whole-stage codegen.
 *
 * Tie-breaking matches the reference scan order: equal distances keep the
 * LOWER centroid index (strict `<` while iterating ascending).
 */
object CentroidExpressions {

  /** Broadcast matrix → local double[][], validated once per task. */
  def resolveTable(bc: Broadcast[Array[Array[Double]]]): Array[Array[Double]] = {
    val t = bc.value
    require(t.nonEmpty, "centroid expressions: empty centroid matrix")
    t
  }

  private def copyVec(a: ArrayData, isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i); i += 1 }
      out
    } else a.toDoubleArray()

  private def checkDim(d: Int, table: Array[Array[Double]]): Unit =
    if (table(0).length != d) throw new IllegalArgumentException(
      s"nearest_centroid: vector has $d dims, centroids have ${table(0).length}")

  /** argmin_i ‖v − c_i‖²; ties → lower index. Early-abandons a centroid once
    * its partial sum exceeds the best seen (matters at k_c=8192). */
  def nearestEval(table: Array[Array[Double]], vec: ArrayData, isFloat: Boolean): Int = {
    val v = copyVec(vec, isFloat)
    checkDim(v.length, table)
    val d = v.length
    var best = 0; var bestDist = Double.MaxValue
    var i = 0
    while (i < table.length) {
      val c = table(i)
      var s = 0.0; var j = 0
      while (j < d && s < bestDist) { val t = v(j) - c(j); s += t * t; j += 1 }
      if (s < bestDist) { bestDist = s; best = i }
      i += 1
    }
    best
  }

  /** The `w` nearest centroid indices ordered by (distance asc, index asc) —
    * the probe-list selection (ds/IVFPQ.java:408–420). Bounded insertion into
    * a w-slot sorted buffer: O(k_c·(d + w)), no allocation beyond the result. */
  def kNearestEval(table: Array[Array[Double]], vec: ArrayData, isFloat: Boolean,
                   w: Int): ArrayData = {
    val v = copyVec(vec, isFloat)
    checkDim(v.length, table)
    val d = v.length
    val k = math.min(w, table.length)
    val dists = new Array[Double](k)
    val idxs = new Array[Int](k)
    java.util.Arrays.fill(dists, Double.MaxValue)
    var i = 0
    while (i < table.length) {
      val c = table(i)
      val worst = dists(k - 1)
      var s = 0.0; var j = 0
      while (j < d && s < worst) { val t = v(j) - c(j); s += t * t; j += 1 }
      if (s < worst) {
        // insertion sort step; strict < keeps the lower index on ties
        var p = k - 1
        while (p > 0 && s < dists(p - 1)) {
          dists(p) = dists(p - 1); idxs(p) = idxs(p - 1); p -= 1
        }
        dists(p) = s; idxs(p) = i
      }
      i += 1
    }
    new GenericArrayData(idxs)
  }

  private def isFloatArray(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"centroid expressions: unsupported element type $t")
    }

  private val bcClassName = classOf[Broadcast[Array[Array[Double]]]].getName

  case class NearestCentroid(child: Expression,
                             centroids: Broadcast[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"

    @transient private lazy val table: Array[Array[Double]] = resolveTable(centroids)
    @transient private lazy val isFloat: Boolean = isFloatArray(child)

    override def nullSafeEval(v: Any): Any =
      nearestEval(table, v.asInstanceOf[ArrayData], isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("centroidsBc", centroids, bcClassName)
      val tbl = ctx.addMutableState("double[][]", "centroidTable",
        v => s"$v = graft.functions.CentroidExpressions.resolveTable($bcRef);")
      val fl = isFloatArray(child)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.CentroidExpressions.nearestEval($tbl, $v, $fl);")
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  case class KNearestCentroids(child: Expression, w: Int,
                               centroids: Broadcast[Array[Array[Double]]])
      extends UnaryExpression {
    require(w > 0, s"k_nearest_centroids: w must be positive, got $w")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "k_nearest_centroids"

    @transient private lazy val table: Array[Array[Double]] = resolveTable(centroids)
    @transient private lazy val isFloat: Boolean = isFloatArray(child)

    override def nullSafeEval(v: Any): Any =
      kNearestEval(table, v.asInstanceOf[ArrayData], isFloat, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("centroidsBc", centroids, bcClassName)
      val tbl = ctx.addMutableState("double[][]", "centroidTable",
        v => s"$v = graft.functions.CentroidExpressions.resolveTable($bcRef);")
      val fl = isFloatArray(child)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.CentroidExpressions.kNearestEval($tbl, $v, $fl, $w);")
    }

    override protected def withNewChildInternal(c: Expression): KNearestCentroids =
      copy(child = c)
  }

  def nearest_centroid(vec: Column, centroids: Broadcast[Array[Array[Double]]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), centroids))

  def k_nearest_centroids(vec: Column, w: Int,
                          centroids: Broadcast[Array[Array[Double]]]): Column =
    GraftBridge.column(KNearestCentroids(GraftBridge.expression(vec), w, centroids))
}
