package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaved Z-order (Morton) key over N bucket ids — the
  * space-filling-curve clustering key for multi-dimensional file
  * pruning ([[graft.sources.Compaction]]): rows sorted by this key land
  * in files whose min/max bounds are narrow in EVERY clustered
  * dimension, so parquet row-group statistics prune selective
  * predicates on any of them — unlike a lexicographic composite sort,
  * which only prunes the leading column.
  *
  * Inputs are non-negative bucket ids (`bigint`); bit i of child j
  * becomes bit `i·N + j` of the result. Each child contributes
  * `63 / N` bits (callers must bucket into at most that many — the
  * Compaction caller caps its bucket count accordingly). Codegen'd:
  * one tight JIT'd loop per row, no boxing.
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"

  private def n = children.length
  private def bitsPerCol = 63 / n

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.length > 8)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires 1..8 bucket columns, got ${children.length}")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires bigint bucket ids, got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val b = v.asInstanceOf[Long]
      var i = 0
      while (i < bitsPerCol) {
        z |= ((b >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val parts = evals.zipWithIndex.map { case (e, j) =>
      val i = ctx.freshName("i")
      val loop =
        s"""for (int $i = 0; $i < $bitsPerCol; $i++) {
           |  ${ev.value} |= ((${e.value} >> $i) & 1L) << ($i * $n + $j);
           |}""".stripMargin
      val nullCheck =
        if (nullable) s"if (${e.isNull}) { ${ev.isNull} = true; } else {\n$loop\n}"
        else loop
      s"${e.code}\n$nullCheck"
    }.mkString("\n")
    val initNull = if (nullable) s"boolean ${ev.isNull} = false;" else ""
    val base = ev.copy(code =
      code"""
        $initNull
        long ${ev.value} = 0L;
        $parts
      """)
    // non-nullable contract: consumers only skip the null branch when
    // isNull == FalseLiteral; leaving the default fresh variable would
    // make generated code reference a never-declared isNull_N (Janino
    // compile failure → whole-stage falls back to interpretation)
    if (nullable) base else base.copy(isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
}

/** Column-API surface (function registered by [[graft.GraftExtensions]],
  * same discipline as [[VectorOps]]). */
object ZOrderOps {
  /** Morton interleave of non-negative bigint bucket ids. */
  def zOrderKey(buckets: Column*): Column = call_function("zorder_key", buckets: _*)
}
