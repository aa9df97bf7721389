package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expressions for the vector/similarity hot path.
  *
  * Spark's array higher-order functions (`zip_with`, `aggregate`) evaluate
  * their lambdas interpreted (CodegenFallback) — fine for the general
  * case, but the ANN inner loop (SURVEY §2.3 LLM extension) is exactly
  * the place the build brief's preference ladder says to drop to a
  * codegen'd `Expression`: per-pair cost becomes one tight JIT'd long
  * loop, no per-element boxing, no lambda dispatch.
  *
  * Semantics — quantized dot product (must stay bit-identical to the
  * DuckDB oracle):   Σᵢ  trunc(xᵢ·1e7) · trunc(yᵢ·1e7)   over int64.
  * Truncation-toward-zero is the one rounding every engine agrees on:
  * Java `(long)`, Spark `CAST(double AS LONG)`, DuckDB
  * `CAST(trunc(x) AS BIGINT)`. Sums are exact (64 dims × (3e7)² ≈ 6e16
  * < 2⁶³), hence order-free and shuffle-safe.
  *
  * Array elements must be non-null (embedding fixtures are); array
  * lengths may differ — the shorter prefix is used.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot requires (array<float>, array<float>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += (x.getFloat(i).toDouble * 1.0e7).toLong * (y.getFloat(i).toDouble * 1.0e7).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) (((double) $a.getFloat($i)) * 1.0E7)
         |      * (long) (((double) $b.getFloat($i)) * 1.0E7);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native expressions. The function is
  * registered by [[graft.GraftExtensions]] (`spark.sql.extensions`), so
  * the public `call_function` resolves it — no private Catalyst APIs on
  * the caller path, and `spark.sql("... quantized_dot(a,b) ...")` works
  * for SQL users too. */
object VectorOps {
  /** Σ trunc(xᵢ·1e7)·trunc(yᵢ·1e7) as int64 — exact, order-free. */
  def dotQ(a: Column, b: Column): Column = call_function("quantized_dot", a, b)

  /** Σ trunc(xᵢ·1e7)² as int64. */
  def sqNormQ(a: Column): Column = dotQ(a, a)
}
