package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All MinHash permutation minima in ONE codegen'd pass:
  * `minhash_mins(hs, coeffs)` = for each permutation j,
  * `min over h in hs of (h * a_j + b_j) mod P` — the per-row signature
  * form ([[graft.llm.LlmQueries.rowSignature]]) without 16 interpreted
  * `array_min(transform(...))` walks. Higher-order-function lambdas
  * don't participate in whole-stage codegen (each of the 16 passes
  * allocates an intermediate array and dispatches the lambda
  * interpreted); this is one tight JIT'd loop over the hashes with the
  * 16 running minima in locals — the same discipline as
  * [[LshPlaneBits]].
  *
  * `coeffs` must be a foldable `array<array<bigint>>` of exactly two
  * rows: the a-coefficients then the b-coefficients, one per
  * permutation. Inputs `hs` are base hashes in [0, P); products stay
  * within int64 (h < 2³¹, a < 2³¹). An empty `hs` yields NULL (no
  * signature), matching the aggregation form's absent group.
  */
case class MinhashMins(left: Expression, right: Expression)
    extends BinaryExpression {

  private val P = PortableHash.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_mins"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("minhash_mins coeffs must be foldable (a literal)")
        else {
          val evaled = right.eval() // once — analysis re-runs this check
          if (evaled == null)
            TypeCheckResult.TypeCheckFailure("minhash_mins coeffs must be a non-null literal")
          else {
            val rows = evaled.asInstanceOf[ArrayData]
            if (rows.numElements() != 2)
              TypeCheckResult.TypeCheckFailure(
                "minhash_mins coeffs must be [aCoeffs, bCoeffs]")
            // row-level null guard BEFORE dereferencing (the LshPlaneBits
            // discipline): a CAST(NULL AS ARRAY<BIGINT>) row must fail
            // analysis cleanly, not NPE out of the analyzer
            else if (rows.isNullAt(0) || rows.isNullAt(1))
              TypeCheckResult.TypeCheckFailure(
                "minhash_mins coeff rows must be non-null")
            else {
              val a = rows.getArray(0); val b = rows.getArray(1)
              if (a.numElements() != b.numElements() || a.numElements() == 0)
                TypeCheckResult.TypeCheckFailure(
                  "minhash_mins coeff rows must be equal-length and non-empty")
              else if ((0 until a.numElements()).exists(a.isNullAt) ||
                       (0 until b.numElements()).exists(b.isNullAt))
                TypeCheckResult.TypeCheckFailure(
                  "minhash_mins coefficients must be non-null")
              else TypeCheckResult.TypeCheckSuccess
            }
          }
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"minhash_mins requires (array<bigint>, array<array<bigint>>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  @transient private lazy val (aCo: Array[Long], bCo: Array[Long]) = {
    val rows = right.eval().asInstanceOf[ArrayData]
    (rows.getArray(0).toLongArray(), rows.getArray(1).toLongArray())
  }

  override protected def nullSafeEval(hsAny: Any, ignored: Any): Any = {
    val hs = hsAny.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = aCo.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * aCo(j) + bCo(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCo", aCo, "long[]")
    val bRef = ctx.addReferenceObj("bCo", bCo, "long[]")
    nullSafeCodeGen(ctx, ev, (hs, _) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$aRef.length];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $aRef.length; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinhashMins =
    copy(left = newLeft, right = newRight)
}
