package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: DISTINCT polynomial hashes of every
  * length-`w` sliding window of an `array<int>` token column — the fused
  * O(n) spelling of [[graft.functions.DedupOps.windowHashes]]'s
  * transform/slice/aggregate chain (which is O(n·w) through interpreted
  * HigherOrderFunction dispatch; its own scaladoc names this expression
  * as the 100-TB path).
  *
  * Value contract (bit-equal to the Column twin on the tokenizer's
  * domain — WindowHashesSpec gate):
  *  - hash = fold((acc·131 + t) mod P) over the window, P =
  *    [[graft.functions.DedupOps.P]]; the O(n) rolling update
  *    ((acc − t_out·131^(w-1))·131 + t_in) mod P yields the same
  *    residue because mod-P is a ring homomorphism;
  *  - result keeps FIRST-OCCURRENCE order exactly like `array_distinct`;
  *  - docs shorter than `w` yield an empty array; a null array yields
  *    null; null elements count as 0 (the same convention as
  *    [[RollingHash]]/[[CosineSim]] — the tokenizer never emits nulls).
  *
  * The window length must be a foldable positive literal: it shapes the
  * precomputed 131^(w-1) mod P constant.
  *
  * PRECONDITION (round-5 ADVICE): tokens must be NON-NEGATIVE (the
  * tokenizer's domain). For negative elements the rolling update here
  * normalizes the fold with +P while the Column twin's `%` keeps the
  * sign, so the two spellings can diverge — callers registering
  * `graft_window_hashes` over foreign int arrays must map into [0, ∞)
  * first.
  */
case class WindowHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) if right.foldable =>
        val w = right.eval().asInstanceOf[Int]
        if (w >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_window_hashes window length must be >= 1, got $w")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_window_hashes requires (array<int>, foldable int), " +
            s"got (${l.sql}, ${r.sql})")
    }

  private lazy val w: Int = right.eval().asInstanceOf[Int]
  private lazy val pow: Long = { // 131^(w-1) mod P
    var p = 1L
    (1 until w).foreach(_ => p = p * 131L % WindowHashes.P)
    p
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val P = WindowHashes.P
    @inline def tokAt(i: Int): Long =
      if (toks.isNullAt(i)) 0L else toks.getInt(i).toLong
    val m = n - w + 1 // window count
    val out = new Array[Long](m)
    // First-occurrence dedup state. Small docs keep the linear scan-back
    // (cache-friendly, no allocation); past the threshold an open-
    // addressing long set makes membership O(1) — the scan-back was
    // O(m²) per long document, contradicting the expression's O(n)
    // billing (round-5 ADVICE).
    val useSet = m > WindowHashes.LinearScanMax
    val mask = if (useSet) Integer.highestOneBit(m * 2 - 1) * 2 - 1 else 0
    val set  = if (useSet) {
      val t = new Array[Long](mask + 1); java.util.Arrays.fill(t, -1L); t
    } else null
    var k = 0 // distinct hashes emitted so far
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 131L + tokAt(i)) % P
      if (i >= w - 1) {
        if (useSet) {
          var idx = (((acc * WindowHashes.Mix) >>> 32).toInt) & mask
          while (set(idx) != -1L && set(idx) != acc) idx = (idx + 1) & mask
          if (set(idx) == -1L) { set(idx) = acc; out(k) = acc; k += 1 }
        } else {
          var seen = false
          var j = 0
          while (j < k && !seen) { if (out(j) == acc) seen = true; j += 1 }
          if (!seen) { out(k) = acc; k += 1 }
        }
        // roll the leading token out for the next window
        val drop = tokAt(i - w + 1) % P * pow % P
        acc = (acc - drop + P) % P
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ta, _) => {
      s"""
         |int graftN = $ta.numElements();
         |int graftM = Math.max(graftN - $w + 1, 0);
         |long[] graftOut = new long[graftM];
         |boolean graftUseSet = graftM > ${WindowHashes.LinearScanMax};
         |int graftMask = 0;
         |long[] graftSet = null;
         |if (graftUseSet) {
         |  graftMask = Integer.highestOneBit(graftM * 2 - 1) * 2 - 1;
         |  graftSet = new long[graftMask + 1];
         |  java.util.Arrays.fill(graftSet, -1L);
         |}
         |int graftK = 0;
         |long graftAcc = 0L;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  long graftT = $ta.isNullAt(graftI) ? 0L : (long) $ta.getInt(graftI);
         |  graftAcc = (graftAcc * 131L + graftT) % ${WindowHashes.P}L;
         |  if (graftI >= $w - 1) {
         |    if (graftUseSet) {
         |      int graftIdx = ((int) ((graftAcc * ${WindowHashes.Mix}L) >>> 32)) & graftMask;
         |      while (graftSet[graftIdx] != -1L && graftSet[graftIdx] != graftAcc) {
         |        graftIdx = (graftIdx + 1) & graftMask;
         |      }
         |      if (graftSet[graftIdx] == -1L) {
         |        graftSet[graftIdx] = graftAcc; graftOut[graftK++] = graftAcc;
         |      }
         |    } else {
         |      boolean graftSeen = false;
         |      for (int graftJ = 0; graftJ < graftK; graftJ++) {
         |        if (graftOut[graftJ] == graftAcc) { graftSeen = true; break; }
         |      }
         |      if (!graftSeen) { graftOut[graftK++] = graftAcc; }
         |    }
         |    int graftD = graftI - $w + 1;
         |    long graftTd = $ta.isNullAt(graftD) ? 0L : (long) $ta.getInt(graftD);
         |    graftAcc = (graftAcc - graftTd % ${WindowHashes.P}L * ${pow}L % ${WindowHashes.P}L
         |      + ${WindowHashes.P}L) % ${WindowHashes.P}L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf(graftOut, graftK));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowHashes =
    copy(left = newLeft, right = newRight)
}

object WindowHashes {
  val P: Long = graft.functions.DedupOps.P

  /** Above this many windows, first-occurrence dedup switches from the
    * linear scan-back to an open-addressing long set (O(m) total instead
    * of O(m²) per long document — round-5 ADVICE). Both branches emit
    * identical output (same values, same first-occurrence order); the
    * threshold only picks the membership structure. */
  val LinearScanMax = 64

  /** Multiply-shift mixer for the open-addressing probe (golden-ratio
    * constant); hash values are mod-P residues whose low bits alone
    * would cluster. */
  val Mix: Long = 0x9E3779B97F4A7C15L

  /** Register as `graft_window_hashes(tokens, w)` for `call_function`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_window_hashes",
      exprs => WindowHashes(exprs.head, exprs(1)),
      "built-in")
}
