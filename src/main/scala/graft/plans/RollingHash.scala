package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: rolling polynomial hash over `array<int>`
  * — fold((acc * 31 + x) % 1000000007), null elements as 0.
  *
  * Semantically identical to the built-in-composed
  * `TextAnalysis.fingerprint` (aggregate/fold), but with whole-stage
  * codegen emitting a tight primitive loop instead of per-element
  * HigherOrderFunction lambda dispatch — the hot-path variant for
  * fingerprinting 10^10 token arrays. This is the one custom-Expression
  * case SURVEY.md §4.3 anticipated ("only if token-array hashing profiles
  * hot"); everything else in the engine stays on built-ins.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires array<int>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i   = 0
    val n   = arr.numElements()
    while (i < n) {
      val v = if (arr.isNullAt(i)) 0L else arr.getInt(i).toLong
      acc = (acc * 31L + v) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long graftAcc = 0L;
         |int graftN = $c.numElements();
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  long graftV = $c.isNullAt(graftI) ? 0L : (long) $c.getInt(graftI);
         |  graftAcc = (graftAcc * 31L + graftV) % 1000000007L;
         |}
         |${ev.value} = graftAcc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Register as a SQL function so `expr("graft_rolling_hash(tokens)")`
    * works without touching private Column internals. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash",
      exprs => RollingHash(exprs.head),
      "built-in")
}
