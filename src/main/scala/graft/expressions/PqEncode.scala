package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization encode of a DOUBLE
  * vector against a constant codebook — codebook(m)(j) is the j-th
  * sub-centroid of subspace m, each of length dims/m. Per subspace the
  * L2-nearest sub-centroid wins, ties to the LOWER code id; the distance
  * is sqrt(left-to-right squared-diff fold), the exact arithmetic of
  * DuckDB's `list_distance` and of the composed
  * `sqrt(aggregate(zip_with(...)))` fold (LawsSpec pins expression ==
  * composition on fixture vectors).
  *
  * Why native: the composed argmin (array_min over ks structs of
  * aggregate/zip_with folds) is CodegenFallback — interpreted lambdas and
  * a per-candidate array allocation. This fuses into WholeStageCodegen as
  * three tight loops over a referenced double[][][], which is what makes
  * the q244 claim "encode is scan-speed projection" true rather than
  * aspirational.
  *
  * Null semantics: null input, null element, or a length != dims → null.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m: Int = codebook.length
  private val ks: Int = codebook.head.length
  private val subDim: Int = codebook.head.head.length
  private val dims: Int = m * subDim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    var i = 0
    while (i < dims) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val v = x.toDoubleArray()
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val off = mm * subDim
      var bestJ = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ks) {
        val c = codebook(mm)(j)
        var s = 0.0
        var dd = 0
        while (dd < subDim) {
          val diff = v(off + dd) - c(dd)
          s += diff * diff
          dd += 1
        }
        val dist = math.sqrt(s)
        if (dist < bestD) { bestD = dist; bestJ = j }
        j += 1
      }
      codes(mm) = bestJ
      mm += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val codes = ctx.freshName("codes")
      val mm = ctx.freshName("mm")
      val j = ctx.freshName("j")
      val dd = ctx.freshName("dd")
      val off = ctx.freshName("off")
      val bestJ = ctx.freshName("bestJ")
      val bestD = ctx.freshName("bestD")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val dist = ctx.freshName("dist")
      val c = ctx.freshName("c")
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dims; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    final double[] $v = $a.toDoubleArray();
         |    final int[] $codes = new int[$m];
         |    for (int $mm = 0; $mm < $m; $mm++) {
         |      final int $off = $mm * $subDim;
         |      int $bestJ = 0;
         |      double $bestD = Double.POSITIVE_INFINITY;
         |      for (int $j = 0; $j < $ks; $j++) {
         |        final double[] $c = $cbRef[$mm][$j];
         |        double $s = 0.0;
         |        for (int $dd = 0; $dd < $subDim; $dd++) {
         |          final double $diff = $v[$off + $dd] - $c[$dd];
         |          $s += $diff * $diff;
         |        }
         |        final double $dist = java.lang.Math.sqrt($s);
         |        if ($dist < $bestD) { $bestD = $dist; $bestJ = $j; }
         |      }
         |      $codes[$mm] = $bestJ;
         |    }
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Column-API entry point (classic-mode Column↔Expression bridge). */
  def apply(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      PqEncode(org.apache.spark.sql.graftbridge.toExpression(vec), codebook))
}
