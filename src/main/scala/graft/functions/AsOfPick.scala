package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The probe-side kernel of the broadcast as-of join
  * ([[graft.operators.AsOfJoin.asOfBroadcast]]): given a key's reference
  * timeline packed as parallel sorted arrays — `tsArr` (ascending epoch
  * micros) and `valArr` — return the value at the GREATEST `tsArr[i] <=
  * t`, or NULL when every reference timestamp is after `t`.
  *
  * One codegen'd binary search per probe row: O(log m) against the
  * broadcast timeline instead of shuffling + sorting the probe stream.
  * Equal-timestamp duplicates resolve to the LAST packed entry, matching
  * the union-window operator's `last()` tie-break; pre-deduplicate the
  * reference side for full determinism (same caveat as `asOf`).
  *
  * Timestamps in `tsArr` must be non-null (the packed structs are built
  * from the right side's own `rightTs`); `valArr` MAY contain null
  * elements (a reference row whose value column is null) — matching on
  * one yields NULL, in both interpreted and codegen paths. A null ARRAY
  * (left-join miss: key with no reference rows at all) also yields NULL
  * — the as-of LEFT join semantics.
  */
case class AsOfPick(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType =
    second.dataType.asInstanceOf[ArrayType].elementType
  override def nullable: Boolean = true
  override def prettyName: String = "asof_pick"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(_, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"asof_pick requires (array<bigint>, array<T>, bigint), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    }

  override protected def nullSafeEval(tsA: Any, valA: Any, t: Any): Any = {
    val ts = tsA.asInstanceOf[ArrayData]
    val vs = valA.asInstanceOf[ArrayData]
    val probe = t.asInstanceOf[Long]
    // upper bound: first index with ts[i] > probe; match = index - 1
    var lo = 0
    var hi = ts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ts.getLong(mid) <= probe) lo = mid + 1 else hi = mid
    }
    if (lo == 0) null else vs.get(lo - 1, dataType)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tsA, valA, t) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val getV = CodeGenerator.getValue(valA, dataType, s"$lo - 1")
      // the matched element may itself be null (e.g. a packed struct with
      // a null value) — must yield NULL, matching the interpreted path
      s"""
         |int $lo = 0;
         |int $hi = $tsA.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($tsA.getLong($mid) <= $t) $lo = $mid + 1; else $hi = $mid;
         |}
         |if ($lo == 0 || $valA.isNullAt($lo - 1)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $getV;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AsOfPick =
    copy(first = newFirst, second = newSecond, third = newThird)
}
