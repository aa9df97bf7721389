package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.scalatest.funsuite.AnyFunSuite

/** [[CodegenGate]] must (a) self-test its logging hook at install time
  * and (b) count a REAL codegen fallback — not just its own synthetic
  * event. The trigger is the exact production path: an expression whose
  * generated Java fails Janino compilation, driven through
  * `UnsafeProjection.create`, which catches the compile error, logs the
  * "falling back to interpreter mode" WARN the gate asserts on, and
  * silently returns the interpreted projection (the r8 ShingleHashes
  * static-forwarder failure mode, reproduced deliberately). */
class CodegenGateSpec extends AnyFunSuite {

  /** Generated code is syntactically invalid Java; interpreted path is
    * the identity — so the fallback is observable AND correct, exactly
    * the silent degradation the gate exists to catch. */
  private case class BrokenCodegen(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override protected def nullSafeEval(input: Any): Any = input
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, _ => "this is deliberately not java;")
    override protected def withNewChildInternal(newChild: Expression): BrokenCodegen =
      copy(child = newChild)
  }

  test("a real Janino compile failure is counted; interpreted result still correct") {
    TestSpark.spark // initialize the log4j context the way every main does
    CodegenGate.install() // would require() on a broken hook — (a)
    val before = CodegenGate.warnCount
    val proj = UnsafeProjection.create(Seq[Expression](BrokenCodegen(Literal(7))))
    // the fallback is SILENT: the projection works (interpreted)…
    assert(proj(InternalRow.empty).getInt(0) == 7)
    // …and only the gate knows the stage never ran generated code
    assert(CodegenGate.warnCount == before + 1,
      "UnsafeProjection's fallback WARN was not observed by the gate")
  }

  test("install is idempotent and does not double-count") {
    CodegenGate.install()
    val before = CodegenGate.warnCount
    CodegenGate.install() // second install must not add a second appender
    val proj = UnsafeProjection.create(Seq[Expression](BrokenCodegen(Literal(1L))))
    assert(proj(InternalRow.empty).getLong(0) == 1L)
    assert(CodegenGate.warnCount == before + 1)
  }
}
