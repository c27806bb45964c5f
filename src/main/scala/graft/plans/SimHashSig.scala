package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 60-bit shingle-SimHash in ONE fused loop.
  *
  * Semantics match [[graft.functions.DedupOps.simhash]]'s bit-plane
  * definition exactly (plane k votes on parity of
  * h_k(s) = (s·A_k + k²+7) mod P, A_k = ((2k+1)·M) mod P; bit set iff the vote sum is > 0),
  * but the built-in-composed version walks the shingle array once per
  * plane through HigherOrderFunction lambda dispatch — measured ~108 ms
  * PER DOCUMENT at sf0.1 (60 planes × ~500 shingles ≈ 3.6 µs/lambda);
  * this loop does the same work in tight JIT'd Java.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  import graft.functions.DedupOps.{M, P, SimBits}

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires array<bigint> shingles, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr   = input.asInstanceOf[ArrayData]
    val n     = arr.numElements()
    val votes = new Array[Int](SimBits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getLong(i)
        var k = 0
        while (k < SimBits) {
          val parity = ((s * ((2L * k + 1) * M % P) + (k.toLong * k + 7)) % P) & 1L
          votes(k) += (if (parity == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < SimBits) { if (votes(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int[] graftVotes = new int[$SimBits];
         |int graftN = $c.numElements();
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  if (!$c.isNullAt(graftI)) {
         |    long graftS = $c.getLong(graftI);
         |    for (int graftK = 0; graftK < $SimBits; graftK++) {
         |      long graftPar = ((graftS * ((2L * graftK + 1) * ${M}L % ${P}L) + ((long) graftK * graftK + 7)) % ${P}L) & 1L;
         |      graftVotes[graftK] += (graftPar == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long graftSig = 0L;
         |for (int graftK = 0; graftK < $SimBits; graftK++) {
         |  if (graftVotes[graftK] > 0) graftSig |= (1L << graftK);
         |}
         |${ev.value} = graftSig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Register as `graft_simhash(shingles)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashSig(exprs.head),
      "built-in")
}
