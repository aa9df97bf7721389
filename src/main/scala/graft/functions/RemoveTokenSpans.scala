package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `remove_token_spans(text, spans)`: splice token ranges out of a
  * document in ONE byte scan — the "apply the cut list" half of
  * substring dedup ([[graft.llm.SubstringDedup.applyCuts]]; the spans
  * come from `mergeSpans`, so they are sorted by start and disjoint).
  *
  * `spans` is `array<struct<span_start, span_end>>` (token indices of
  * the single-space split, end exclusive — `sort_array` over the
  * collected struct list gives exactly the required order since struct
  * ordering is leading-field-first). Kept tokens are copied straight
  * from the original bytes and rejoined with single spaces, so a
  * document with no cuts round-trips byte-identically — including
  * empty tokens from consecutive separators — and a fully-cut document
  * yields the empty string. Work is O(doc bytes + spans); no token
  * array, no per-token rows, no higher-order lambdas (a `filter` +
  * `array_join` formulation is `CodegenFallback` and drops the whole
  * stage to interpreted rows).
  */
case class RemoveTokenSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "remove_token_spans"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(st: StructType, _))
          if st.fields.length == 2 &&
            st.fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"remove_token_spans requires (string, array<struct<bigint, bigint>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(text: Any, spans: Any): Any =
    TextStatsUtil.removeTokenSpans(
      text.asInstanceOf[UTF8String], spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, sp) =>
      s"${ev.value} = graft.functions.TextStatsUtil.removeTokenSpans($t, $sp);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveTokenSpans =
    copy(left = newLeft, right = newRight)
}
