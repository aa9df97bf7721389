package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge table — bounded-iteration weighted
  * graph analytics (the iterative sibling of
  * [[ConnectedComponents]]' connectivity fixpoint).
  *
  * Arithmetic is FIXED-POINT int64 (ranks scaled by `Scale`), not
  * double: integer division truncates identically in every engine, so
  * the final ranks are bit-exact reproducible (the q47/q108 quantized
  * discipline applied to an iterative algorithm — a float PageRank sums
  * contributions in partition order and never hash-gates).
  *
  * Each iteration is the Pregel shape: one join of ranks to edges (the
  * contribution scatter) + one groupBy on dst (the gather) — two
  * shuffles per round, linear in |E|, independent of graph diameter.
  * Each round `localCheckpoint`s the rank table to truncate the
  * iterative lineage (the [[ConnectedComponents]] discipline; at
  * production scale the rank table is written to storage per round).
  * Dangling nodes keep the damping base (their outflow is dropped —
  * the standard simplification; both engines drop it identically).
  */
object PageRank {
  val Scale = 1000000000000L // 1e12 fixed-point

  /** `edges`: (src: Long, dst: Long) — directed, deduplicated by the
    * caller if multiplicity is not intended. Returns (node, rank). */
  def run(edges: DataFrame, iterations: Int, dampingPct: Int = 85): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.select(col("node"), lit(0L).as("rank"))
    // materialized once — a lazy plan here re-runs the |E| aggregation
    // every iteration and silently breaks the two-shuffles-per-round cost
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val init = Scale / n
    val base = (100 - dampingPct) * init / 100
    var ranks = nodes.select(col("node"), lit(init).as("rank"))
    for (_ <- 1 to iterations) {
      // scatter: each node sends rank DIV deg to its out-neighbours;
      // gather: damped sum per destination. Nodes receiving nothing
      // (including dangling) fall back to the base via the left join.
      // All division is integer DIV — `/` on longs is double division,
      // whose round-to-nearest can cross an integer boundary and break
      // bit-exact reproducibility.
      val contrib = e.join(ranks.join(outDeg, "node"),
          e("src") === col("node"))
        .select(col("dst").as("node"), expr("rank DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"${base}L + (${dampingPct}L * coalesce(in_sum, 0L)) DIV 100L")
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
