package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: word-trigram shingle hashes over a token
  * array, in one loop that evaluates the child ONCE.
  *
  * Semantics match [[graft.functions.DedupOps.shingles]] exactly
  * (shingle i = ((t_i·131 + t_{i+1})·131 + t_{i+2}) mod P over the
  * cross-engine tokens; empty for <3-token docs), but the HOF-composed
  * version hides an O(n²)-ish trap: its lambda body references the
  * OUTER `tokens(text)` expression, and Catalyst embeds that whole
  * subtree inside the lambda — so every `element_at(toks, i)` re-runs
  * split+filter+transform over the raw text. Measured at sf0.1:
  * 19.0 s for the composed chain vs 1.0 s for tokens alone; this
  * expression takes the materialized array as its child (evaluated once
  * per row) and loops in tight JIT'd Java.
  */
case class ShingleHash(child: Expression) extends UnaryExpression {
  import graft.functions.DedupOps.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires array<int> tokens, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n    = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      val t0 = if (toks.isNullAt(i)) 0L else toks.getInt(i).toLong
      val t1 = if (toks.isNullAt(i + 1)) 0L else toks.getInt(i + 1).toLong
      val t2 = if (toks.isNullAt(i + 2)) 0L else toks.getInt(i + 2).toLong
      out(i) = ((t0 * 131L + t1) * 131L + t2) % P
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int graftN = $c.numElements();
         |long[] graftSh = new long[graftN < 3 ? 0 : graftN - 2];
         |for (int graftI = 0; graftI + 2 < graftN; graftI++) {
         |  long t0 = $c.isNullAt(graftI) ? 0L : (long) $c.getInt(graftI);
         |  long t1 = $c.isNullAt(graftI + 1) ? 0L : (long) $c.getInt(graftI + 1);
         |  long t2 = $c.isNullAt(graftI + 2) ? 0L : (long) $c.getInt(graftI + 2);
         |  graftSh[graftI] = ((t0 * 131L + t1) * 131L + t2) % ${P}L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftSh);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  /** Register as `graft_shingles(tokens)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => ShingleHash(exprs.head),
      "built-in")
}
