package graft.plans

import org.apache.spark.RangePartitioner
import org.apache.spark.rdd.{RDD, ShuffledRDD}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The whole-operator extension path (SURVEY §7.3 option c): a custom
  * logical operator + optimizer rule + planner strategy + physical
  * operator, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]).
  *
  * The operator it implements is the engine's signature total-order
  * primitive: `row_number() OVER (ORDER BY …)` with NO partition key —
  * the reference's global delivery sequence (processor.py:64-100). Stock
  * Spark plans this as a single-task `WindowExec` ("No Partition
  * Defined … serious performance degradation"): every row moves to ONE
  * task, unbounded at scale. [[RewriteGlobalRowNumber]] intercepts
  * exactly that shape and replaces it with [[DistributedSeqExec]], which
  * computes identical numbers fully distributed. Users keep writing the
  * stock Window API; the fix is transparent — the same discipline AQE
  * applies to skew, extended to the global-window trap.
  *
  * The [[graft.operators.Prefix]] API remains the richer programmatic
  * form (running sums, last-carry, shared slicing); this plan-level path
  * covers the SQL/Window surface where the engine cannot assume callers
  * know about `Prefix`.
  */
case class GlobalSeq(order: Seq[SortOrder], seqAttr: Attribute, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ seqAttr
  override def producedAttributes: AttributeSet = AttributeSet(seqAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalSeq =
    copy(child = newChild)
}

/** Optimizer rule: a Window node computing ONLY `row_number()` over a
  * global (un-partitioned) order becomes [[GlobalSeq]]. The rewrite
  * preserves the output attribute (same exprId), so parents resolve
  * unchanged. Partitioned windows, other window functions, and
  * multi-function windows are left to stock planning. */
object RewriteGlobalRowNumber extends Rule[LogicalPlan] {
  private def rowFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame                                               => true
    case _                                                              => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Window(Seq(a @ Alias(WindowExpression(RowNumber(), spec), _)), Nil, order, child, _)
        if order.nonEmpty && spec.partitionSpec.isEmpty && rowFrame(spec.frameSpecification) =>
      GlobalSeq(order, a.toAttribute, child)
  }
}

/** Planner strategy for [[GlobalSeq]]. */
object GlobalSeqStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalSeq(order, seqAttr, child) =>
      DistributedSeqExec(order, seqAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Distributed global row numbering: an RDD-level range shuffle (sampled
  * boundaries, sorted shuffle read), ONE extra lightweight job to count
  * rows per partition (its map stage is the shuffle write, which the
  * main pass then reuses — Spark skips completed map stages of the same
  * `ShuffledRDD`), and a streaming zip with the per-partition offset.
  * The same dataflow as `RDD.zipWithIndex`, keyed by the window's sort
  * order instead of arrival order. Wall-clock scales with
  * rows/partitions; nothing ever lands on a single task. */
case class DistributedSeqExec(order: Seq[SortOrder], seqAttr: Attribute, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ seqAttr
  override def producedAttributes: AttributeSet = AttributeSet(seqAttr :: Nil)
  // rows leave sorted by the window order within range-ordered partitions
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = UnknownPartitioning(0)

  override protected def doExecute(): RDD[InternalRow] = {
    val n = conf.numShufflePartitions
    val childOutput = child.output
    val orderExprs = order
    val keyed: RDD[(UnsafeRow, UnsafeRow)] = child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(orderExprs.map(_.child), childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      it.map(r => (keyProj(r).copy(), rowProj(r).copy()))
    }
    val boundOrder = orderExprs.zipWithIndex.map { case (so, i) =>
      so.copy(child = BoundReference(i, so.child.dataType, so.child.nullable))
    }
    implicit val ord: Ordering[UnsafeRow] =
      new LazilyGeneratedOrdering(boundOrder).asInstanceOf[Ordering[UnsafeRow]]
    val part = new RangePartitioner(n, keyed, ascending = true)
    val shuffled = new ShuffledRDD[UnsafeRow, UnsafeRow, UnsafeRow](keyed, part)
      .setKeyOrdering(ord)
    // count job: map stage = the shuffle write, reused by the main pass
    val counts = shuffled
      .mapPartitions(it => Iterator.single(it.length.toLong), preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val outAttrs = output
    shuffled.mapPartitionsWithIndex { (pid, it) =>
      val join = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val seqRow = new SpecificInternalRow(Seq(seqAttr.dataType))
      var i = offsets(pid)
      it.map { case (_, row) =>
        i += 1
        seqRow.setInt(0, i.toInt) // RowNumber is IntegerType, as in stock Spark
        proj(join(row, seqRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): DistributedSeqExec =
    copy(child = newChild)
}
