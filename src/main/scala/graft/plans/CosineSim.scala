package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity over two float/double
  * array columns in ONE fused primitive loop (dot product + both norms).
  *
  * The built-in-composed variant ([[graft.functions.Similarity.cosine]]:
  * zip_with + 3×aggregate) traverses each array four times through
  * HigherOrderFunction lambda dispatch; this emits a tight codegen loop —
  * the hot-path variant for all-pairs / top-k similarity search over
  * millions of embeddings (SURVEY.md §4.3 custom-Expression criterion:
  * only where profiling shows built-ins hot).
  *
  * Each side may independently be `array<float>` or `array<double>`
  * (embeddings are float32; k-means centroids are float64 means — the
  * IVF training loop scores one against the other). Elements widen to
  * double exactly like the expr-chain twin's `.cast("double")`, so the
  * two spellings stay bit-equal (CosineSimSpec gate).
  *
  * Null elements count as 0; a null array yields null; zero-norm input
  * yields NaN (same as the algebra).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires (array<float|double>, array<float|double>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")

  private def isDouble(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = isDouble(left.dataType); val yd = isDouble(right.dataType)
    @inline def xAt(i: Int): Double =
      if (x.isNullAt(i)) 0.0 else if (xd) x.getDouble(i) else x.getFloat(i).toDouble
    @inline def yAt(i: Int): Double =
      if (y.isNullAt(i)) 0.0 else if (yd) y.getDouble(i) else y.getFloat(i).toDouble
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = xAt(i); val yv = yAt(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // tail of the longer array still contributes to its own norm
    var j = n
    val xn = x.numElements(); val yn = y.numElements()
    while (j < xn) { val v = xAt(j); nx += v * v; j += 1 }
    j = n
    while (j < yn) { val v = yAt(j); ny += v * v; j += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      def get(arr: String, side: DataType) =
        if (isDouble(side)) s"$arr.getDouble(graftI)"
        else s"(double) $arr.getFloat(graftI)"
      s"""
         |double graftDot = 0.0, graftNx = 0.0, graftNy = 0.0;
         |int graftXn = $xa.numElements(), graftYn = $ya.numElements();
         |int graftN = Math.min(graftXn, graftYn);
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  double xv = $xa.isNullAt(graftI) ? 0.0 : ${get(xa, left.dataType)};
         |  double yv = $ya.isNullAt(graftI) ? 0.0 : ${get(ya, right.dataType)};
         |  graftDot += xv * yv; graftNx += xv * xv; graftNy += yv * yv;
         |}
         |for (int graftI = graftN; graftI < graftXn; graftI++) {
         |  double v = $xa.isNullAt(graftI) ? 0.0 : ${get(xa, left.dataType)};
         |  graftNx += v * v;
         |}
         |for (int graftI = graftN; graftI < graftYn; graftI++) {
         |  double v = $ya.isNullAt(graftI) ? 0.0 : ${get(ya, right.dataType)};
         |  graftNy += v * v;
         |}
         |${ev.value} = graftDot / (Math.sqrt(graftNx) * Math.sqrt(graftNy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Register as `graft_cosine(a, b)` for use via `call_function`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSim(exprs.head, exprs(1)),
      "built-in")
}
