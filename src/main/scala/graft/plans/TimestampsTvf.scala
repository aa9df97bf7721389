package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Cast, Expression, Literal, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range}
import org.apache.spark.sql.types.LongType

/** `graft_timestamps(start_us, step_us, n)` — a SQL table-valued function
  * (SURVEY §2.1 P9): the first `n` elements of the reference's timestamp
  * generator `testing.timestamps(start, delay)`
  * (reference testing.py:6-10 — yields `start`, then `start + delay`, …),
  * bounded because SQL tables are finite where the Python generator is lazy.
  *
  * Registered by [[graft.GraftExtensions]] via `injectTableFunction`, so
  * pure-SQL users can seed timer grids without any Scala:
  *
  * {{{ SELECT ts_us FROM graft_timestamps(0, 1000000, 10) }}}
  *
  * The plan is a [[Range]] (Spark's distributed, codegen'd generator —
  * splits across executors, no driver materialization) with the affine
  * timestamp projection on top, so a grid of a billion ticks is as
  * distributable as `spark.range`. `n` must fold to a constant (it sizes
  * the Range); `start_us`/`step_us` stay expressions and constant-fold in
  * the optimizer.
  */
object TimestampsTvf {
  val name = "graft_timestamps"

  def build(children: Seq[Expression]): LogicalPlan = {
    require(children.size == 3,
      s"$name(start_us, step_us, n) requires exactly 3 arguments, got ${children.size}")
    val Seq(start, step, n) = children
    // Range's Expression constructor enforces foldable-integer `n` with a
    // proper AnalysisException; ticks are ordered so keep one slice pair
    // semantics identical to spark.range(n).
    val range = new Range(Literal(0L), n, Literal(1L))
    val id = range.output.head
    val tsUs = Alias(
      Add(Cast(start, LongType), Multiply(Cast(step, LongType), id)), "ts_us")()
    Project(Seq(tsUs), range)
  }
}
