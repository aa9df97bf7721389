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
  * contribution scatter) + one groupBy on dst (the gather) — and only
  * the GATHER shuffles. The edge table is hash-partitioned on `src`
  * ONCE up front; the node base table (node, out-degree) and each
  * round's rank table come out of node-hashed shuffles and
  * `localCheckpoint` (the default [[graft.Materialize]] strategy)
  * PRESERVES that partitioning (r10: Materialize plans the checkpoint
  * AQE-off precisely so the LogicalRDD records it), so every scatter
  * join and the rank rebuild are exchange-free co-partitioned joins —
  * one shuffle per round, linear in |E|, independent of graph diameter
  * (reusing one partitioning across all rounds is exactly the
  * discipline a 1000-executor run needs: the edge table never moves
  * again after its first shuffle). The out-degree is loop-invariant and
  * rides the rank table, so a round is ONE join, not two.
  * Each round materializes the rank table ([[graft.Materialize.eager]])
  * to truncate the iterative lineage (the [[ConnectedComponents]]
  * discipline; `mode=table` writes each round durably — re-shuffling
  * per round in exchange for surviving executor loss).
  * Dangling nodes keep the damping base (their outflow is dropped —
  * the standard simplification; both engines drop it identically).
  */
object PageRank {
  val Scale = 1000000000000L // 1e12 fixed-point

  /** `edges`: (src: Long, dst: Long) — directed, deduplicated by the
    * caller if multiplicity is not intended. Returns (node, rank). */
  def run(edges: DataFrame, iterations: Int, dampingPct: Int = 85): DataFrame = {
    // ONE partition count for every graph table: co-partitioned joins
    // require matching partitioning, and AQE's per-shuffle coalescing
    // would otherwise hand each table a different count
    val p = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // src-partition the edges ONCE; every later scatter join keys on
    // src and rides this layout exchange-free
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(p, col("src"))
      .transform(graft.Materialize.eager(_))
    // ONE node-keyed base table carrying the out-degree (r10: the old
    // separate nodes/outDeg tables cost two extra repartition exchanges
    // up front AND a ranks⋈outDeg join EVERY round — the degree is
    // loop-invariant, so it rides the rank table instead). deg defaults
    // to 1 for sink-only nodes: they never appear as a scatter src, so
    // the value is never read — the coalesce only keeps the column
    // non-null. Both the distinct and the groupBy land on
    // hash(node, p) (p = spark.sql.shuffle.partitions), so this join
    // and every round's rebuild are co-partitioned and exchange-free.
    val nd = e.select(explode(array(col("src"), col("dst"))).as("node")).distinct()
      .join(e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(1L)).as("deg"))
      .transform(graft.Materialize.eager(_))
    val n = nd.count()
    if (n == 0) return nd.select(col("node"), lit(0L).as("rank"))
    val init = Scale / n
    val base = (100 - dampingPct) * init / 100
    var ranks = nd.select(col("node"), col("deg"), lit(init).as("rank"))
    for (_ <- 1 to iterations) {
      // scatter: each node sends rank DIV deg to its out-neighbours;
      // gather: damped sum per destination. Nodes receiving nothing
      // (including dangling) fall back to the base via the left join.
      // All division is integer DIV — `/` on longs is double division,
      // whose round-to-nearest can cross an integer boundary and break
      // bit-exact reproducibility.
      val contrib = e.join(ranks, e("src") === col("node"))
        .select(col("dst").as("node"), expr("rank DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      // eagerReplacing: once the new round's table is written, the
      // previous round's scratch is fully consumed — release it so
      // `table` mode holds O(1) round tables, not one per iteration
      ranks = nd
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"),
          expr(s"${base}L + (${dampingPct}L * coalesce(in_sum, 0L)) DIV 100L")
            .as("rank"))
        .transform(graft.Materialize.eagerReplacing(_, ranks))
    }
    ranks.select(col("node"), col("rank"))
  }
}
