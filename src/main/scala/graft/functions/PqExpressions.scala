package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for PQ code-table scans (T2/T3/T4/T6,
 * ds/PQ.java:303–317 ADC, :334–374 SDC; ds/IVFPQ.java:464–497 pair distance).
 *
 * The round-1 formulation embedded the LUT as nested array literals and
 * summed with an interpreted `aggregate(sequence(...))` HOF — at the
 * reference config (k_c=8192, m=64, k_s=256, exm/YFCC100MExample.java:86–90)
 * that plan is ~134M literal nodes and never compiles. Here the LUTs live in
 * a Spark broadcast (shipped once per executor, not per task, and never in
 * the plan tree), keyed by the row's `list_id`; the distance is a compiled
 * m-step loop. At query time a reference-scale engine LUTs only the probed
 * lists (w ≈ k_c/10), which is exactly the map this expression carries.
 */
object PqExpressions {

  /**
   * Σ_j LUT[list_id][j][code_j] — ADC distance of the broadcast query LUTs
   * against a stored PQ code. `luts` maps list_id → (m × k_s) table; for
   * non-IVF (single global LUT) or SDC (LUT rows = sdcTable[j][queryCode_j])
   * pass a single-entry map and a literal list id.
   */
  /** Broadcast LUT map → direct-index jagged array (list_id-indexed; null =
    * un-probed). Built ONCE per generated-class instance / per interpreted
    * expression on the executor — the per-row path is plain array indexing. */
  def buildLutTable(luts: Broadcast[Map[Int, Array[Array[Double]]]])
      : Array[Array[Array[Double]]] = {
    val m = luts.value
    require(m.nonEmpty, "adc_distance: empty LUT map")
    val table = new Array[Array[Array[Double]]](m.keys.max + 1)
    m.foreach { case (li, lut) =>
      require(li >= 0, s"adc_distance: negative list_id $li")
      table(li) = lut
    }
    table
  }

  def lutMissing(listId: Int): Nothing = throw new IllegalArgumentException(
    s"adc_distance: no LUT for list_id=$listId (un-probed list reached the scan)")

  case class AdcDistance(
      left: Expression, // pq_code: array<int>
      right: Expression, // list_id: int
      luts: Broadcast[Map[Int, Array[Array[Double]]]])
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_distance"

    @transient private lazy val lutTable: Array[Array[Array[Double]]] =
      buildLutTable(luts)

    override def nullSafeEval(codeAny: Any, listAny: Any): Any = {
      val code = codeAny.asInstanceOf[ArrayData]
      val li = listAny.asInstanceOf[Int]
      val lut = if (li >= 0 && li < lutTable.length && lutTable(li) != null)
        lutTable(li) else lutMissing(li)
      require(code.numElements() == lut.length,
        s"adc_distance: code has ${code.numElements()} sub-codes, LUT has ${lut.length}")
      var d = 0.0; var j = 0
      val m = lut.length
      while (j < m) { d += lut(j)(code.getInt(j)); j += 1 }
      d
    }

    // generated: the broadcast resolves in the class init (once per task,
    // executor-side), the per-row path is two array indexes + an m-step loop —
    // the IVFPQ scan stays inside whole-stage codegen (ds/PQ.java:303-317's
    // tight loop, compiled)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("adcLuts", luts,
        classOf[Broadcast[Map[Int, Array[Array[Double]]]]].getName)
      val table = ctx.addMutableState("double[][][]", "adcLutTable",
        v => s"$v = graft.functions.PqExpressions.buildLutTable($bcRef);")
      nullSafeCodeGen(ctx, ev, (code, li) => {
        val lut = ctx.freshName("lut"); val j = ctx.freshName("j")
        val d = ctx.freshName("d"); val m = ctx.freshName("m")
        s"""
           |if ($li < 0 || $li >= $table.length || $table[$li] == null) {
           |  graft.functions.PqExpressions.lutMissing($li);
           |}
           |final double[][] $lut = $table[$li];
           |final int $m = $lut.length;
           |if ($code.numElements() != $m) {
           |  throw new IllegalArgumentException("adc_distance: code has " +
           |    $code.numElements() + " sub-codes, LUT has " + $m);
           |}
           |double $d = 0.0;
           |for (int $j = 0; $j < $m; $j++) {
           |  $d += $lut[$j][$code.getInt($j)];
           |}
           |${ev.value} = $d;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcDistance =
      copy(left = l, right = r)
  }

  def adc_distance(code: Column, listId: Column,
                   luts: Broadcast[Map[Int, Array[Array[Double]]]]): Column =
    GraftBridge.column(AdcDistance(
      GraftBridge.expression(code), GraftBridge.expression(listId), luts))

  /** Scalar kernel for [[IvfPqEncode]] — one fused pass: coarse-assign, form
    * the residual (centroid − v, IVFPQ.java:642–648), PQ-encode it
    * (PQ.java:232–268). Called from interpreted eval AND generated code. */
  def ivfPqEncodeEval(centroids: Array[Array[Double]],
                      pq: graft.kernels.Kernels.PqModel,
                      vec: ArrayData, isFloat: Boolean): InternalRow = {
    val d = vec.numElements()
    val v = new Array[Double](d)
    if (isFloat) { var i = 0; while (i < d) { v(i) = vec.getFloat(i); i += 1 } }
    else { var i = 0; while (i < d) { v(i) = vec.getDouble(i); i += 1 } }
    if (centroids(0).length != d) throw new IllegalArgumentException(
      s"ivf_pq_encode: vector has $d dims, coarse centroids have ${centroids(0).length}")
    val li = graft.kernels.Kernels.nearestCentroid(v, centroids)
    val code = graft.kernels.Kernels.pqEncode(
      graft.kernels.Kernels.residual(v, centroids(li)), pq)
    new GenericInternalRow(Array[Any](li, new GenericArrayData(code)))
  }

  /**
   * IVFADC index-build expression (ds/IVFPQ.java:100–117): vector →
   * struct(list_id, pq_code) in ONE compiled pass — the coarse scan is not
   * repeated for the residual the way separate list-assignment and encode
   * projections could be. Coarse centroids and the PQ model ride in
   * broadcasts (O(1) plan nodes at the reference k_c=8192 / m=64 / k_s=256).
   */
  case class IvfPqEncode(child: Expression,
                         centroids: Broadcast[Array[Array[Double]]],
                         pq: Broadcast[graft.kernels.Kernels.PqModel])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("list_id", IntegerType, nullable = false),
      StructField("pq_code", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "ivf_pq_encode"

    @transient private lazy val table: Array[Array[Double]] = centroids.value
    @transient private lazy val model: graft.kernels.Kernels.PqModel = pq.value
    @transient private lazy val isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(v: Any): Any =
      ivfPqEncodeEval(table, model, v.asInstanceOf[ArrayData], isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("coarseBc", centroids,
        classOf[Broadcast[Array[Array[Double]]]].getName)
      val pRef = ctx.addReferenceObj("pqBc", pq,
        classOf[Broadcast[graft.kernels.Kernels.PqModel]].getName)
      val tbl = ctx.addMutableState("double[][]", "coarseTable",
        v => s"$v = (double[][]) $cRef.value();")
      val mdl = ctx.addMutableState("graft.kernels.Kernels.PqModel", "pqModel",
        v => s"$v = (graft.kernels.Kernels.PqModel) $pRef.value();")
      val fl = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.PqExpressions.ivfPqEncodeEval($tbl, $mdl, $v, $fl);")
    }

    override protected def withNewChildInternal(c: Expression): IvfPqEncode =
      copy(child = c)
  }

  def ivf_pq_encode(vec: Column, centroids: Broadcast[Array[Array[Double]]],
                    pq: Broadcast[graft.kernels.Kernels.PqModel]): Column =
    GraftBridge.column(IvfPqEncode(GraftBridge.expression(vec), centroids, pq))
}
