package graft

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import scala.collection.mutable

/** The ONE materialization seam for every diamond-reuse point in the
  * engine (LSH signatures/bands, bounded-bucket tables, iterative
  * rank/edge tables, replay slice bounds): a self-join's two branches
  * are separate subtrees to Catalyst, so without materialization the
  * whole upstream pipeline computes and shuffles once per consumer —
  * and an iterative loop's lineage grows without bound. Every operator
  * that needs a reuse point calls [[Materialize.apply]] (lazy) or
  * [[Materialize.eager]] (iterative loops) instead of hard-coding a
  * strategy; the session conf picks the strategy:
  *
  *  - **`local`** (default): `localCheckpoint` — blocks live in executor
  *    block managers (MEMORY_AND_DISK), zero extra I/O beyond the store,
  *    and for the eager form the PARTITIONING of the checkpointed plan
  *    is preserved (PageRank/ConnectedComponents ride one shuffle layout
  *    across all rounds exchange-free). The cost is fault tolerance:
  *    lineage is truncated and local blocks are NOT recomputable, so an
  *    executor loss after materialization fails the query instead of
  *    recomputing — acceptable for interactive/bench runs, wrong for a
  *    1000-executor job where some executor loss is CERTAIN.
  *  - **`table`**: the dataset is written to parquet under
  *    [[Materialize.DirKey]] and read back. Durable against executor
  *    loss (the fault-injection spec kills an executor JVM mid-pipeline
  *    and proves this mode completes where `local` cannot), at the cost
  *    of a write+read round trip per reuse point and — on read-back — a
  *    fresh scan with NO inherited partitioning (downstream
  *    co-partitioned joins re-shuffle; a production deployment that
  *    needs both durability AND layout writes a bucketed table,
  *    [[graft.operators.Skew.writeBucketed]]). The scratch dir must be
  *    storage every executor can reach (shared FS / object store on a
  *    real cluster; any local dir under `local-cluster`/`local`).
  *
  * Mode is read from the dataset's own session at call time, so a
  * caller flips the whole pipeline with one conf — no operator
  * signatures change. `table` mode is necessarily EAGER (the write must
  * happen before the read-back plan exists), so in that mode query
  * CONSTRUCTION runs jobs; `local` keeps construction plan-only
  * (`eager = false`), the r5 discipline.
  */
object Materialize {
  /** `local` (localCheckpoint, default) | `table` (durable parquet). */
  val ModeKey = "spark.graft.materialize.mode"
  /** Scratch root for `table` mode. Default: a per-session directory
    * under java.io.tmpdir — fine for local/local-cluster; point it at
    * shared storage on a real cluster. */
  val DirKey = "spark.graft.materialize.dir"

  // per-session scratch id + written paths (for cleanup); tiny — paths
  // only. Weak keys: a dropped session must not pin its path list.
  private val written =
    new java.util.WeakHashMap[SparkSession, mutable.Buffer[String]]()
  private def sessionTag(spark: SparkSession): String =
    s"${spark.sparkContext.applicationId}-${System.identityHashCode(spark)}"

  /** Lazy reuse point: materializes on first downstream action. */
  def apply[T](ds: Dataset[T]): Dataset[T] = mat(ds, lazyLocal = true)

  /** Eager reuse point for iterative loops: each round's table is
    * materialized NOW, truncating lineage so round N's plan does not
    * embed rounds 1..N-1 (and, in `local` mode, preserving the round's
    * shuffle partitioning for exchange-free co-partitioned joins). */
  def eager[T](ds: Dataset[T]): Dataset[T] = mat(ds, lazyLocal = false)

  private def mat[T](ds: Dataset[T], lazyLocal: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "table" =>
        val root = spark.conf.get(DirKey,
          s"${sys.props("java.io.tmpdir")}/graft-mat-${sessionTag(spark)}")
        val path = s"$root/${java.util.UUID.randomUUID()}"
        ds.toDF().write.parquet(path)
        written.synchronized {
          var buf = written.get(spark)
          if (buf == null) { buf = mutable.Buffer.empty; written.put(spark, buf) }
          buf += path
        }
        val back = spark.read.parquet(path)
        if (ds.encoder.clsTag.runtimeClass == classOf[Row])
          back.asInstanceOf[Dataset[T]]
        else back.as(ds.encoder)
      case _ => ds.localCheckpoint(eager = !lazyLocal)
    }
  }

  /** Delete every `table`-mode file this session wrote. Call when the
    * pipeline's results are fully consumed (parquet'd / collected) —
    * NOT between a materialization and its downstream reads. */
  def cleanup(spark: SparkSession): Unit = {
    val paths = written.synchronized {
      val buf = written.remove(spark)
      if (buf == null) Nil else buf.toSeq
    }
    paths.foreach { p =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      rm(new java.io.File(p))
    }
  }
}
