package graft.plans

import org.apache.spark.RangePartitioner
import org.apache.spark.rdd.RDD
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
  * The operators it implements are the global ranking windows —
  * `row_number()` / `rank()` / `dense_rank()` `OVER (ORDER BY …)` with
  * NO partition key — the engine's total-order primitives (the
  * reference's global delivery sequence, processor.py:64-100). Stock
  * Spark plans these as a single-task `WindowExec` ("No Partition
  * Defined … serious performance degradation"): every row moves to ONE
  * task, unbounded at scale. [[RewriteGlobalRankWindow]] intercepts
  * exactly that shape and replaces it with [[DistributedRankExec]],
  * which computes identical numbers fully distributed. Users keep
  * writing the stock Window API; the fix is transparent — the same
  * discipline AQE applies to skew, extended to the global-window trap.
  *
  * STACKED windows over prefix-compatible orders collapse into ONE
  * node: `rank() OVER (ORDER BY q)` + `row_number() OVER (ORDER BY q,
  * k1, k2)` shuffle once on the finer key, with each function tagged by
  * how many leading sort keys define its own order. A prefix group CAN
  * straddle a range-partition boundary (the partitioner only keeps
  * FULL-key ties together), so the per-partition offset job also
  * records each partition's first/last key and trailing-run length, and
  * the driver chains boundary corrections before the output pass — the
  * same merge `RDD.zipWithIndex` does for counts, extended to tie
  * groups. One shuffle instead of one per ORDER BY prefix.
  *
  * The [[graft.operators.Prefix]] API remains the richer programmatic
  * form (running sums, last-carry, shared slicing); this plan-level path
  * covers the SQL/Window surface where the engine cannot assume callers
  * know about `Prefix`.
  */
sealed trait GlobalRankFunction
case object GlobalRowNumber extends GlobalRankFunction
case object GlobalRank extends GlobalRankFunction
case object GlobalDenseRank extends GlobalRankFunction

/** `funcs`: every ranking expression of the (possibly merged) Window
  * nodes — all computed in ONE shuffle pass. The `Int` is the function's
  * prefix length: how many leading elements of `order` form the ORDER BY
  * it was written with (`order.length` when they coincide). */
case class GlobalSeq(funcs: Seq[(GlobalRankFunction, Attribute, Int)],
                     order: Seq[SortOrder], child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ funcs.map(_._2)
  override def producedAttributes: AttributeSet = AttributeSet(funcs.map(_._2))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalSeq =
    copy(child = newChild)
}

/** Optimizer rule: a Window node computing ONLY ranking functions over
  * a global (un-partitioned) order becomes [[GlobalSeq]] — including
  * collapsed multi-function nodes (row_number + rank + dense_rank over
  * one order compute in one pass). A [[GlobalSeq]] stacked directly on
  * another whose order is a prefix of its own additionally merges into
  * one node (one shuffle), provided every function of the SHORTER order
  * is rank/dense_rank — those are pure functions of their prefix key,
  * while a row_number's tie order is pinned to its own full ORDER BY.
  * The rewrite preserves each output attribute (same exprId), so parents
  * resolve unchanged. Partitioned windows and non-ranking functions are
  * left to stock planning. */
object RewriteGlobalRankWindow extends Rule[LogicalPlan] {
  // row_number carries ROWS UNBOUNDED PRECEDING..CURRENT ROW; rank-like
  // functions carry the RANGE form; both fixed frames are value-identical
  // to the whole-order computation these functions define
  private def fixedFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame                                        => true
    case _                                                       => false
  }
  private def rankFunc(e: Expression): Option[GlobalRankFunction] = e match {
    case RowNumber()  => Some(GlobalRowNumber)
    case Rank(_)      => Some(GlobalRank)
    case DenseRank(_) => Some(GlobalDenseRank)
    case _            => None
  }
  // a collapsed Window node may carry several ranking expressions —
  // rewrite only when EVERY expression qualifies (all become one pass)
  private def qualifies(e: NamedExpression): Option[(GlobalRankFunction, Attribute)] =
    e match {
      case a @ Alias(WindowExpression(f, spec), _)
          if spec.partitionSpec.isEmpty && fixedFrame(spec.frameSpecification) =>
        rankFunc(f).map(_ -> a.toAttribute)
      case _ => None
    }

  private def isPrefix(short: Seq[SortOrder], long: Seq[SortOrder]): Boolean =
    short.length <= long.length && short.zip(long).forall { case (a, b) =>
      a.child.semanticEquals(b.child) && a.direction == b.direction &&
        a.nullOrdering == b.nullOrdering
    }
  // rank/dense_rank depend only on their prefix key; row_number's tie
  // order would silently change under a finer sort, so it only merges
  // when its order IS the full merged order
  private def prefixSafe(fs: Seq[(GlobalRankFunction, Attribute, Int)],
                         fullLen: Int): Boolean =
    fs.forall { case (f, _, len) => len == fullLen || f != GlobalRowNumber }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w @ Window(exprs, Nil, order, child, _)
        if order.nonEmpty && exprs.nonEmpty => // qualify each expr ONCE
      val quals = exprs.map(qualifies)
      if (quals.forall(_.isDefined))
        GlobalSeq(
          quals.map { q => val (f, a) = q.get; (f, a, order.length) },
          order, child)
      else w
    case GlobalSeq(fo, oo, GlobalSeq(fi, oi, child))
        if (isPrefix(oi, oo) || isPrefix(oo, oi)) &&
          // the outer order must be computable from the child alone (an
          // order over an attribute the inner node PRODUCES cannot merge)
          AttributeSet(oo.flatMap(_.references)).subsetOf(child.outputSet) && {
          val full = math.max(oi.length, oo.length)
          prefixSafe(fi, full) && prefixSafe(fo, full)
        } =>
      GlobalSeq(fi ++ fo, if (oo.length >= oi.length) oo else oi, child)
  }
}

/** Planner strategy for [[GlobalSeq]]. */
object GlobalSeqStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalSeq(funcs, order, child) =>
      DistributedRankExec(funcs, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Distributed global ranking: an RDD-level range shuffle (sampled
  * boundaries, sorted shuffle read), ONE extra lightweight job per query
  * computing each partition's per-prefix-length summary — its map stage
  * is the shuffle write, which the main pass then reuses (Spark skips
  * completed map stages of the same `ShuffledRDD`) — and a streaming zip
  * with the merged offsets:
  *
  *   row_number = row-offset + local position
  *   rank       = row-offset + local group start − boundary carry-in
  *   dense_rank = distinct-offset − boundary duplicates + local dense rank
  *
  * Full-key ties never split (range partitioning binary-searches the
  * key against the bounds), but a PREFIX group can; the summary job
  * therefore records each partition's (rows, first key, last key, and
  * per prefix length: distinct-group count + trailing-run length), and
  * the driver chains corrections across partition boundaries — `A(p)`,
  * the rows a partition's first group already counted upstream, and the
  * running number of groups merged across boundaries. The same dataflow
  * as `RDD.zipWithIndex`, keyed by the window's sort order instead of
  * arrival order. Wall-clock scales with rows/partitions; nothing ever
  * lands on a single task. */
object DistributedRankExec {
  /** Per-partition summary of the sorted run: row count, first/last key
    * (prefix fields are valid for every tracked length), and per prefix
    * length the number of distinct groups + the trailing run length.
    * Top-level on purpose: an inner class would capture the exec node
    * (and its whole child plan) via `$outer` into every summary task
    * closure and every collected result. */
  private[plans] case class PartSummary(
      rows: Long, first: UnsafeRow, last: UnsafeRow,
      distinct: Array[Long], trailing: Array[Long])
}

case class DistributedRankExec(funcs: Seq[(GlobalRankFunction, Attribute, Int)],
                               order: Seq[SortOrder], child: SparkPlan)
  extends UnaryExecNode {
  import DistributedRankExec.PartSummary

  override def output: Seq[Attribute] = child.output ++ funcs.map(_._2)
  override def producedAttributes: AttributeSet = AttributeSet(funcs.map(_._2))
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
    // distinct prefix lengths, ascending: shorter-prefix-equal implies
    // nothing, but shorter-prefix-DIFFERENT implies every longer prefix
    // differs too — change detection walks levels shortest-first
    val lens: Array[Int] = funcs.map(_._3).distinct.sorted.toArray
    val prefixOrds: Array[Ordering[UnsafeRow]] = lens.map(l =>
      new LazilyGeneratedOrdering(boundOrder.take(l)).asInstanceOf[Ordering[UnsafeRow]])
    // smallest level whose prefix differs between prev and k (levels
    // [i, lens.length) all changed); lens.length = nothing changed.
    // A function VALUE, not a local def: scalac lifts a local def to a
    // private method of the exec node, so closures calling it would
    // capture `this` and serialize the whole child plan per task — the
    // same $outer hazard PartSummary's scaladoc documents.
    val firstChanged: (UnsafeRow, UnsafeRow) => Int = (prev, k) => {
      var i = 0
      while (i < lens.length && prefixOrds(i).compare(prev, k) == 0) i += 1
      i
    }
    val part = new RangePartitioner(n, keyed, ascending = true)
    // Kryo, not the default Java serializer: UnsafeRow's KryoSerializable
    // writes length+bytes — the closest accessible analogue of SQL's own
    // UnsafeRowSerializer for an RDD-level exchange
    val shuffled = new org.apache.spark.rdd.ShuffledRDD[UnsafeRow, UnsafeRow, UnsafeRow](keyed, part)
      .setKeyOrdering(ord)
      .setSerializer(new org.apache.spark.serializer.KryoSerializer(sparkContext.getConf))
    // summary job: map stage = the shuffle write, reused by the main pass
    val nLens = lens.length
    val summaries: Array[PartSummary] = shuffled.mapPartitions({ it =>
      var rows = 0L
      var first: UnsafeRow = null
      var prev: UnsafeRow = null
      val distinct = new Array[Long](nLens)
      val trailing = new Array[Long](nLens)
      while (it.hasNext) {
        val k = it.next()._1
        rows += 1
        val fc = if (prev == null) 0 else firstChanged(prev, k)
        if (prev == null) first = k.copy()
        var i = fc
        while (i < nLens) { distinct(i) += 1; trailing(i) = 0L; i += 1 }
        i = 0
        while (i < nLens) { trailing(i) += 1; i += 1 }
        if (fc < nLens) prev = k.copy()
      }
      Iterator.single(PartSummary(rows, first, prev, distinct, trailing))
    }, preservesPartitioning = true).collect()

    val nParts = summaries.length
    val rowOffsets = summaries.map(_.rows).scanLeft(0L)(_ + _)
    val distinctOffsets = Array.tabulate(nLens)(i =>
      summaries.map(_.distinct(i)).scanLeft(0L)(_ + _))
    // boundary merge per level: carryIn(i)(p) = rows upstream that belong
    // to partition p's FIRST level-i group (chained through partitions
    // that are entirely one group); dups(i)(p) = groups double-counted at
    // boundaries up to and including p's own
    val carryIn = Array.ofDim[Long](nLens, nParts)
    val dups = Array.ofDim[Long](nLens, nParts)
    var i = 0
    while (i < nLens) {
      var prevP = -1
      var d = 0L
      var p = 0
      while (p < nParts) {
        val s = summaries(p)
        if (s.rows > 0) {
          if (prevP >= 0) {
            val q = summaries(prevP)
            if (prefixOrds(i).compare(s.first, q.last) == 0) {
              d += 1
              carryIn(i)(p) = q.trailing(i) +
                (if (q.trailing(i) == q.rows) carryIn(i)(prevP) else 0L)
            }
          }
          prevP = p
        }
        dups(i)(p) = d
        p += 1
      }
      i += 1
    }
    val outAttrs = output
    val fs = funcs.map(_._1).toArray
    val funcLevel = funcs.map(f => lens.indexOf(f._3)).toArray
    shuffled.mapPartitionsWithIndex { (pid, it) =>
      val join = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val seqRow = new SpecificInternalRow(fs.map(_ => org.apache.spark.sql.types.IntegerType).toSeq)
      var pos = 0L
      val denseLocal = new Array[Long](nLens)
      val groupStart = new Array[Long](nLens)
      var prev: UnsafeRow = null
      it.map { case (k, row) =>
        pos += 1
        val fc = if (prev == null) 0 else firstChanged(prev, k)
        var j = fc
        while (j < nLens) { denseLocal(j) += 1; groupStart(j) = pos; j += 1 }
        if (fc < nLens) prev = k.copy()
        var f = 0
        while (f < fs.length) {
          val li = funcLevel(f)
          val value = fs(f) match {
            case GlobalRowNumber => rowOffsets(pid) + pos
            case GlobalRank =>
              val gs = groupStart(li)
              rowOffsets(pid) + gs - (if (gs == 1L) carryIn(li)(pid) else 0L)
            case GlobalDenseRank =>
              distinctOffsets(li)(pid) - dups(li)(pid) + denseLocal(li)
          }
          // ranking fns are IntegerType in Spark; past Int.MaxValue rows
          // fail LOUDLY instead of wrapping to negative "ranks"
          seqRow.setInt(f, Math.toIntExact(value))
          f += 1
        }
        proj(join(row, seqRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): DistributedRankExec =
    copy(child = newChild)
}
