package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity over two `array<float>`
  * columns in ONE fused primitive loop (dot product + both norms).
  *
  * The built-in-composed variant ([[graft.functions.Similarity.cosine]]:
  * zip_with + 3×aggregate) traverses each array four times through
  * HigherOrderFunction lambda dispatch; this emits a tight codegen loop —
  * the hot-path variant for all-pairs / top-k similarity search over
  * millions of embeddings (SURVEY.md §4.3 custom-Expression criterion:
  * only where profiling shows built-ins hot).
  *
  * Null elements count as 0; a null array yields null; zero-norm input
  * yields NaN (same as the algebra).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cosine requires (array<float>, array<float>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // tail of the longer array still contributes to its own norm
    var j = n
    val xn = x.numElements(); val yn = y.numElements()
    while (j < xn) { val v = if (x.isNullAt(j)) 0.0 else x.getFloat(j).toDouble; nx += v * v; j += 1 }
    j = n
    while (j < yn) { val v = if (y.isNullAt(j)) 0.0 else y.getFloat(j).toDouble; ny += v * v; j += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      s"""
         |double graftDot = 0.0, graftNx = 0.0, graftNy = 0.0;
         |int graftXn = $xa.numElements(), graftYn = $ya.numElements();
         |int graftN = Math.min(graftXn, graftYn);
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  double xv = $xa.isNullAt(graftI) ? 0.0 : (double) $xa.getFloat(graftI);
         |  double yv = $ya.isNullAt(graftI) ? 0.0 : (double) $ya.getFloat(graftI);
         |  graftDot += xv * yv; graftNx += xv * xv; graftNy += yv * yv;
         |}
         |for (int graftI = graftN; graftI < graftXn; graftI++) {
         |  double v = $xa.isNullAt(graftI) ? 0.0 : (double) $xa.getFloat(graftI);
         |  graftNx += v * v;
         |}
         |for (int graftI = graftN; graftI < graftYn; graftI++) {
         |  double v = $ya.isNullAt(graftI) ? 0.0 : (double) $ya.getFloat(graftI);
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
