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

/** Random-hyperplane LSH bucketing in one codegen'd pass: bit j of the
  * result is set iff  Σᵢ trunc(xᵢ·1e7) · wⱼᵢ > 0  (int64-exact, same
  * quantization contract as [[QuantizedDot]], bit-identical to the DuckDB
  * oracle's plane join). Replaces the previous 8 interpreted
  * `aggregate(zip_with(...))` passes per row — those allocate an
  * intermediate array per plane per row and dispatch the lambda
  * interpreted; this is one tight JIT'd nested loop over the row.
  *
  * `planes` must be a foldable `array<array<bigint>>` (the hyperplane
  * weights, one inner array per bit) — weights are extracted once at
  * codegen/first-eval time, never per row.
  */
case class LshPlaneBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_plane_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(LongType, _), _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("lsh_plane_bits planes must be foldable (a literal)")
        else if (right.eval() == null) // guard BEFORE forcing `planes`: a
          // foldable NULL (CAST(NULL AS ARRAY<ARRAY<BIGINT>>)) must fail
          // analysis cleanly, not NPE in the lazy val
          TypeCheckResult.TypeCheckFailure("lsh_plane_bits planes must be a non-null literal")
        else {
          val arr = right.eval().asInstanceOf[ArrayData]
          if (arr.numElements() > 63)
            TypeCheckResult.TypeCheckFailure(s"at most 63 planes, got ${arr.numElements()}")
          else if ((0 until arr.numElements()).exists(arr.isNullAt))
            TypeCheckResult.TypeCheckFailure("lsh_plane_bits plane rows must be non-null")
          else TypeCheckResult.TypeCheckSuccess
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lsh_plane_bits requires (array<float>, array<array<bigint>>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  /** Plane weights, materialized once from the foldable literal. */
  @transient private lazy val planes: Array[Array[Long]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { j =>
      arr.getArray(j).toLongArray()
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val w = planes(j)
      val n = math.min(x.numElements(), w.length)
      var s = 0L
      var i = 0
      while (i < n) {
        s += (x.getFloat(i).toDouble * 1.0e7).toLong * w(i)
        i += 1
      }
      if (s > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |for (int $j = 0; $j < $planesRef.length; $j++) {
         |  long[] $w = $planesRef[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long) (((double) $a.getFloat($i)) * 1.0E7) * $w[$i];
         |  }
         |  if ($s > 0) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LshPlaneBits =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native expressions. The function is
  * registered by [[graft.GraftExtensions]] (`spark.sql.extensions`), so
  * the public `call_function` resolves it — no private Catalyst APIs on
  * the caller path, and `spark.sql("... quantized_dot(a,b) ...")` works
  * for SQL users too. */
object VectorOps {
  /** THE quantization contract: components scale by 1e7 and truncate
    * toward zero to int64 — the one rounding Java `(long)`, Spark
    * `CAST AS LONG` and DuckDB `trunc()::BIGINT` agree on. Every
    * consumer (QuantizedDot, LlmQueries oracles, KMeans) must share
    * this constant or hash-gate parity silently breaks. */
  val QScale = 1.0e7

  /** Column-level quantization under the [[QScale]] contract. */
  def quant(x: Column): Column =
    (x.cast("double") * QScale).cast("long")

  /** Σ trunc(xᵢ·1e7)·trunc(yᵢ·1e7) as int64 — exact, order-free. */
  def dotQ(a: Column, b: Column): Column = call_function("quantized_dot", a, b)

  /** Σ trunc(xᵢ·1e7)² as int64. */
  def sqNormQ(a: Column): Column = dotQ(a, a)

  /** Random-hyperplane sign-bit bucket; `planes` = weight rows (≤ 63). */
  def lshBucket(emb: Column, planes: Seq[Seq[Long]]): Column =
    call_function("lsh_plane_bits", emb,
      org.apache.spark.sql.functions.typedLit(planes))
}
