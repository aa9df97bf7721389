package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step of a dedup pipeline (near-dup candidate PAIRS → duplicate
  * GROUPS), sized for edge sets produced by bounded candidate generation
  * (LSH banding), where |edges| = O(n · bucket occupancy), not O(n²).
  *
  * Algorithm: alternating **large-star / small-star** (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — each
  * round is two shuffles (a groupBy for per-node minima and a join to
  * re-target edges), and the edge set converges to a star forest in
  * O(log² n) rounds (O(log n) in practice), independent of component
  * diameter. A label-propagation loop would need O(diameter) rounds —
  * unbounded on chain-shaped duplicate clusters — which is why the star
  * form is the one that survives scale.
  *
  *  - large-star: every node u connects its LARGER neighbors to
  *    m = min(N(u) ∪ u) — long chains shortcut toward small ids;
  *  - small-star: every node u connects its smaller-or-equal closure
  *    (N(u) ∪ u, edges oriented big→small) to m — stars consolidate.
  *
  * Both steps only ever re-target an edge to a SMALLER endpoint, so a
  * fixpoint (checked with an anti-join, which is exact, not a hash
  * heuristic) is reached monotonically; at fixpoint every non-root node
  * holds exactly the edge (node → component-min).
  *
  * Each round materializes the edge set through the
  * [[graft.Materialize]] seam to truncate the iterative lineage —
  * `localCheckpoint` by default; on a cluster with executor-loss
  * concerns, flip `spark.graft.materialize.mode=table` for durable
  * round tables (proven by the executor-kill spec).
  */
object ConnectedComponents {

  /** Cluster the undirected graph `edges` (two numeric/string node
    * columns `src`, `dst`). Returns one row per distinct node that
    * appears in any edge: (node, component) with component = the
    * smallest node id in its connected component. Singleton nodes never
    * appear in an edge list — union them back at the call site.
    *
    * Hybrid execution: when the deduplicated edge set fits comfortably
    * on the driver (`driverThreshold`, default 1M edges), an exact
    * union-find solves it in ONE collect — cheaper than even a single
    * distributed round (a near-dup candidate graph is usually a few
    * edges per duplicated doc, so small corpora land here). Above the
    * threshold, the star alternation runs fully distributed; that is
    * the 100 TB path and the spec exercises it explicitly with
    * `driverThreshold = 0`. */
  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
          maxIter: Int = 25, driverThreshold: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical working form: distinct, self-loop-free, small endpoint last
    var e = edges
      .select(greatest(col(src), col(dst)).as("u"), least(col(src), col(dst)).as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .transform(graft.Materialize.eager(_))

    // eCount rides along: e is always either the initial checkpointed
    // set (counted once here) or the previous round's `small` (already
    // counted for ITS fixpoint test) — re-counting it every round would
    // be one redundant Spark job per iteration
    var eCount = e.count()
    if (eCount <= driverThreshold) return driverUnionFind(e)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: symmetrize, m = min(N(u) ∪ u), re-target LARGER nbrs
      val sym = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      val large = sym.join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .distinct()
      // small-star: edges already oriented u > v; m = min neighbor;
      // connect N(u) ∪ {u} (minus m itself) to m
      val sMins = large.groupBy($"u").agg(min($"v").as("m"))
      val small = large.join(sMins, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(sMins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .distinct()
        .transform(graft.Materialize.eager(_))
      // exact fixpoint test: same row count and nothing new ⇒ equal sets
      val smallCount = small.count()
      converged = smallCount == eCount &&
        small.join(e, Seq("u", "v"), "left_anti").isEmpty
      // the anti-join above was the LAST read of the previous round's
      // table — release it so `table` mode holds O(1) scratch tables
      graft.Materialize.release(e)
      e = small
      eCount = smallCount
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")

    // star forest: every non-root points at its root; roots label themselves
    e.select($"u".as("node"), $"v".as("component"))
      .union(e.select($"v".as("node"), $"v".as("component")).distinct())
  }

  /** Exact union-find over a collected edge list (path compression +
    * union-by-min so each root is its component's smallest id — node ids
    * compared via their natural Comparable order). One pass, O(E α(E)). */
  private def driverUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    def lt(a: Any, b: Any): Boolean = a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    e.collect().foreach { row =>
      val (ru, rv) = (find(row.get(0)), find(row.get(1)))
      if (ru != rv) {
        if (lt(ru, rv)) parent.put(rv, ru) else parent.put(ru, rv)
      }
      // seed both endpoints so pure roots still appear in the key set
      parent.putIfAbsent(row.get(0), find(row.get(0)))
      parent.putIfAbsent(row.get(1), find(row.get(1)))
    }
    val nodeType = e.schema("u").dataType
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    parent.keySet().forEach(n => rows += org.apache.spark.sql.Row(n, find(n)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("component", nodeType))))
  }
}
