package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Slice assignment for [[graft.operators.Prefix]]: the number of
  * boundaries strictly below `key` — i.e. the lower-bound index of `key`
  * in the sorted boundary array — as a codegen'd BINARY SEARCH.
  *
  * The boundary count tracks `spark.sql.shuffle.partitions`; on a
  * 1000-executor cluster that is thousands of boundaries, where the
  * O(#slices)-per-row comparison chain this replaces stops being free.
  * O(log #slices) per row keeps slice tagging negligible at any
  * realistic partition count.
  *
  * `boundaries` must be a foldable, non-null, strictly-ascending
  * `array<double>` (the [[graft.operators.Prefix]] sampler constructs
  * exactly that); equal keys always land in the same slice (`key > b`
  * is false at equality — identical semantics to the chain form).
  */
case class SliceId(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "slice_id"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("slice_id boundaries must be foldable (a literal)")
        else {
          val evaled = right.eval() // once — analysis re-runs this check
          if (evaled == null)
            TypeCheckResult.TypeCheckFailure("slice_id boundaries must be a non-null literal")
          else {
            val arr = evaled.asInstanceOf[ArrayData]
            val n = arr.numElements()
            if ((0 until n).exists(arr.isNullAt))
              TypeCheckResult.TypeCheckFailure("slice_id boundaries must be non-null")
            // NaN is invisible to the ascending check (both <= compares
            // are false around it) yet poisons the binary search — keys
            // above a NaN boundary would get wrong slice ids silently
            else if ((0 until n).exists(i => arr.getDouble(i).isNaN))
              TypeCheckResult.TypeCheckFailure("slice_id boundaries must not contain NaN")
            else if ((1 until n).exists(i => arr.getDouble(i) <= arr.getDouble(i - 1)))
              TypeCheckResult.TypeCheckFailure("slice_id boundaries must be strictly ascending")
            else TypeCheckResult.TypeCheckSuccess
          }
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"slice_id requires (double, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  @transient private lazy val bounds: Array[Double] =
    right.eval().asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(k: Any, b: Any): Any = {
    val key = k.asInstanceOf[Double]
    // Spark's ordering puts NaN above every value — it must land in the
    // TOP slice (Java `<` is false for NaN, which would send it to 0 and
    // disagree with the per-slice window's sort)
    if (java.lang.Double.isNaN(key)) bounds.length
    else {
      var lo = 0
      var hi = bounds.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds(mid) < key) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, (k, _) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |if (java.lang.Double.isNaN($k)) {
         |  ${ev.value} = $boundsRef.length;
         |} else {
         |  int $lo = 0;
         |  int $hi = $boundsRef.length;
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($boundsRef[$mid] < $k) $lo = $mid + 1; else $hi = $mid;
         |  }
         |  ${ev.value} = $lo;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SliceId =
    copy(left = newLeft, right = newRight)
}
