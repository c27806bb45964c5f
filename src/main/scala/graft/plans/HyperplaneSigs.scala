package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: L independent random-hyperplane LSH
  * signatures (`bits` sign-bits each) over an `array<float>` embedding,
  * in one fused loop. Returns `array<long>` of length `tables`.
  *
  * Hyperplane components are a deterministic integer hash so the DuckDB
  * oracle reproduces signatures exactly
  * ([[graft.functions.Similarity.hyperplaneSigsSql]]):
  * {{{
  *   idx = i + dim*(j + bits*t)        // component i, bit j, table t
  *   h   = (idx*M) % P;  h = (h*h) % P;  h = (h*M) % P   // M=2654435761
  *   w   = h % 7 - 3                   // integer weight in [-3, 3]
  * }}}
  * The SQUARING step is load-bearing: any affine map of idx stays affine
  * under mod P, so `((a*idx+b) % P) % 7` collapses to a function of
  * `idx mod 7` whenever the product hasn't wrapped P — which is how round
  * 1's family silently degenerated to seven distinct hyperplanes. h² mod
  * P is non-affine, making tables genuinely independent (verified:
  * candidate sets now grow with L; before they were identical for L=4 and
  * L=2048).
  *
  * Cross-engine float parity: w ≤ 3 bits of mantissa and a float widened
  * to double are both exact, so each product is exact in IEEE double and
  * both engines accumulate in the same (ascending-i) order — signatures
  * are bit-identical, not approximately equal.
  *
  * Cost: tables·bits·dim multiply-adds per row in tight JIT'd Java; the
  * HOF-composed twin pays lambda dispatch per element (same reason
  * [[SimHashSig]] exists — measured two orders of magnitude).
  */
case class HyperplaneSigs(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  import HyperplaneSigs.{M, P}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_sigs requires array<float>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v   = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        var dot = 0.0
        var i = 0
        while (i < dim) {
          val x = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
          val idx = i.toLong + dim.toLong * (j + bits.toLong * t)
          var h = (idx * M) % P
          h = (h * h) % P
          h = (h * M) % P
          dot += x * (h % 7 - 3).toDouble
          i += 1
        }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int graftDim = $c.numElements();
         |long[] graftSigs = new long[$tables];
         |for (int graftT = 0; graftT < $tables; graftT++) {
         |  long graftSig = 0L;
         |  for (int graftJ = 0; graftJ < $bits; graftJ++) {
         |    double graftDot = 0.0;
         |    for (int graftI = 0; graftI < graftDim; graftI++) {
         |      double graftX = $c.isNullAt(graftI) ? 0.0 : (double) $c.getFloat(graftI);
         |      long graftIdx = (long) graftI + (long) graftDim * (graftJ + (long) $bits * graftT);
         |      long graftH = (graftIdx * ${M}L) % ${P}L;
         |      graftH = (graftH * graftH) % ${P}L;
         |      graftH = (graftH * ${M}L) % ${P}L;
         |      graftDot += graftX * (double) (graftH % 7L - 3L);
         |    }
         |    if (graftDot > 0) graftSig |= (1L << graftJ);
         |  }
         |  graftSigs[graftT] = graftSig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftSigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {
  val P = 2147483647L // 2^31-1
  val M = 2654435761L // Knuth's 2^32/phi multiplier

  /** Register as `graft_hyperplane_sigs(emb, bits, tables)` (bits and
    * tables must be foldable int literals). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_sigs",
      exprs =>
        HyperplaneSigs(exprs.head,
          GraftExtensions.literalInt(exprs(1), "graft_hyperplane_sigs bits"),
          GraftExtensions.literalInt(exprs(2), "graft_hyperplane_sigs tables")),
      "built-in")
}
