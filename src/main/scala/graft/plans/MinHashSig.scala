package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.DedupOps

/** Native Catalyst expression: MinHash signature over a shingle array in
  * ONE pass — all K hash-family minima per element, no intermediate
  * arrays.
  *
  * Semantics match [[graft.functions.DedupOps.minhash]] exactly
  * (h_i(s) = (s·A_i + i²+7) mod P, A_i = ((2i+1)·M) mod P, empty input → P sentinel), but
  * the built-in-composed version materializes K transformed copies of the
  * shingle array per row through HigherOrderFunction lambda dispatch —
  * measured 70s for the sf0.1 MinHash+LSH dedup, dominated by signature
  * computation (recomputed on both sides of the band self-join).
  */
case class MinHashSig(child: Expression, numHashes: Int = DedupOps.NumHashes)
    extends UnaryExpression {
  import graft.functions.DedupOps.{M, P}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val out = Array.fill(numHashes)(P)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val h = (s * ((2L * k + 1) * M % P) + (k.toLong * k + 7)) % P
          if (h < out(k)) out(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] graftMins = new long[$numHashes];
         |java.util.Arrays.fill(graftMins, ${P}L);
         |int graftN = $c.numElements();
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  if (!$c.isNullAt(graftI)) {
         |    long graftS = $c.getLong(graftI);
         |    for (int graftK = 0; graftK < $numHashes; graftK++) {
         |      long graftH = (graftS * ((2L * graftK + 1) * ${M}L % ${P}L) + ((long) graftK * graftK + 7)) % ${P}L;
         |      if (graftH < graftMins[graftK]) graftMins[graftK] = graftH;
         |    }
         |  }
         |}
         |${ev.value} = new $gad(graftMins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Register as `graft_minhash(shingles[, numHashes])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs =>
        if (exprs.size > 1)
          MinHashSig(exprs.head,
            GraftExtensions.literalInt(exprs(1), "graft_minhash numHashes"))
        else MinHashSig(exprs.head),
      "built-in")
}
