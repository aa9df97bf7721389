package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for the 100 TB path.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) already
  * splits skewed SHUFFLE JOIN partitions at runtime; these helpers cover
  * the two places AQE doesn't reach:
  *
  *  - **Skewed aggregation** ([[saltedAgg]]): a groupBy where one key
  *    holds a large share of all rows bottlenecks on a single reducer.
  *    Two-phase aggregation over a salted key fixes it for any
  *    algebraic aggregate (sum/count/min/max — anything with a merge).
  *  - **Co-located joins** ([[writeBucketed]]): repeated large-fact joins
  *    on the same key should not re-shuffle per query; bucketed tables
  *    join with ZERO Exchange when bucket specs match.
  *
  * Salting is schema discipline, not an engine change (SURVEY §4): the
  * salt column is ordinary data, Catalyst plans both phases as standard
  * partial/final hash aggregates.
  */
object Skew {

  /** Two-phase salted aggregation: Σ-style aggregates grouped by `keys`,
    * computed as groupBy(keys :+ salt) → partial, then groupBy(keys) →
    * merge. `aggs` maps output column name → (partialExpr, mergeExpr)
    * where mergeExpr operates on the partial column.
    *
    * {{{
    * Skew.saltedAgg(df, Seq("user_id"), 16, Map(
    *   "total" -> (sum($"value"),  s => sum(s)),
    *   "n"     -> (count(lit(1)),  s => sum(s))))
    * }}}
    *
    * The salt fans the hot key across `saltBuckets` reducers in phase 1;
    * phase 2 merges `saltBuckets` rows per key — negligible. Rows per
    * reducer drop from O(hotKeyCount) to O(hotKeyCount / saltBuckets).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    // deterministic salt: spread rows without rand() (replayable plans).
    // The salt value depends on the physical partition layout, so the
    // GROUPING of partial rows can differ across runs — the merged RESULT
    // cannot (phase-2 re-aggregates; salt only fans out; q58's oracle
    // hash proves run-invariance).
    val salt = (abs(hash(monotonically_increasing_id())) % saltBuckets).as("_salt")
    val partial = df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2._1.as("_p_" + aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as("_p_" + n) }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col("_p_" + aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col("_p_" + n)).as(n) }.toSeq: _*)
  }

  /** Persist `df` bucketed+sorted by `key` so subsequent equi-joins and
    * aggregations on `key` between co-bucketed tables plan with NO
    * Exchange (verified by [[graft.operators]] specs via `.explain`).
    * This is the ahead-of-time co-location strategy for fact-fact joins
    * repeated across a workload — shuffle once at write time, never
    * again. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Salted equi-join for a SKEWED probe side against a build side too
    * big to broadcast: `big`'s hot join keys would pile onto single
    * reducers in a plain shuffle join (and AQE's skew splitting only
    * re-partitions the probe side — the matching build partition is
    * still read whole by every split). Salting fans each hot key across
    * `saltBuckets` reducers: the big side gets a deterministic
    * per-row salt (from non-join attributes via the engine-portable
    * pattern — any spread works, the JOIN RESULT is salt-invariant),
    * the small-but-not-broadcastable side is replicated `saltBuckets`×
    * (explode over a literal range — a narrow map, no shuffle), and the
    * join runs on (key, salt). Rows per reducer drop from O(hotKeyRows)
    * to O(hotKeyRows / saltBuckets) at the cost of a `saltBuckets`×
    * build-side shuffle volume — the standard trade for large-large
    * skewed joins.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Candidate pairs from hash buckets with a POPULATION CAP — the
    * LSH-specific skew guard. A bucket self-join emits Σ pop² pairs
    * over buckets, so ONE degenerate bucket (boilerplate text,
    * bit-identical corpus shards, empty-signature documents) turns a
    * pair-bounded near-dup scan quadratic: the round-5 shuffle probe
    * measured exactly this on the identical-replica embedding fixture —
    * records-growth exponent 1.91 for the uncapped chain (SCALING.md).
    * Buckets over `cap` are dropped WHOLE: at corpus scale an over-cap
    * bucket is either exact-duplicate material (the digest groupBy,
    * q40, handles it in linear time) or a degenerate signature with no
    * pairwise value — enumerating its pairs is the one thing a 100 TB
    * run must never do. Output is bounded by buckets × cap² pairs —
    * linear in the corpus for fixed cap.
    *
    * Plan shape: one windowed count over hashpartitioning(`keys`), then
    * the capped table is MATERIALIZED once ([[graft.Materialize]] — the
    * diamond-reuse discipline, q68/q91: a self-join's two branches are
    * separate subtrees to Catalyst, so without the materialization the
    * whole upstream signature pipeline computes and shuffles TWICE;
    * verified against the executed plan, exchange reuse does not rescue
    * it; `spark.graft.materialize.mode=table` makes the reuse point an
    * executor-loss-durable parquet table). At 100 TB the
    * materialization is the signatures table written
    * to storage. `buckets`: one row per (member `idCol`,
    * bucket `keys...`). */
  def boundedBucketPairs(buckets: DataFrame, keys: Seq[String], idCol: String,
                         cap: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val kept = buckets
      .withColumn("_pop", count(lit(1)).over(w))
      .filter(col("_pop") <= cap)
      .drop("_pop")
      .transform(graft.Materialize(_))
    kept.as("a").join(kept.as("b"),
        keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
  }

  /** Recall-preserving variant of [[boundedBucketPairs]]: over-cap
    * buckets, instead of being dropped whole, contribute O(pop) STAR
    * edges from the bucket's representative (min `idCol`) to every other
    * member. Work stays bounded — buckets × cap² enumerated pairs plus
    * Σ_overcap pop star edges, linear in the corpus for fixed cap — while
    * CONNECTIVITY is fully preserved: a hot bucket's members remain one
    * connected set through the representative, so connected components
    * over this pair set (the q64 clustering / q65 survivor pipelines —
    * the artifact dedup actually consumes) are IDENTICAL to components
    * over the unbounded enumeration. What the cap still loses vs
    * unbounded is only the in-bucket pair ENUMERATION (pairwise-verify
    * workloads); q139 measures both pair recalls and gates component
    * equality, closing the drop-mode blind spot VERDICT r5 flagged
    * (a hot bucket of NON-identical near-dups silently lost all pairs).
    *
    * Plan shape: ONE windowed (count, min) pass over
    * hashpartitioning(`keys`), materialized once ([[graft.Materialize]];
    * a persisted bucket table at 100 TB — see [[boundedBucketPairs]]),
    * then the under-cap self-join + the over-cap star projection read
    * that one materialization. */
  def boundedBucketPairsStar(buckets: DataFrame, keys: Seq[String], idCol: String,
                             cap: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val withPop = buckets
      .withColumn("_pop", count(lit(1)).over(w))
      .withColumn("_rep", min(col(idCol)).over(w))
      .transform(graft.Materialize(_))
    val kept = withPop.filter(col("_pop") <= cap)
    val full = kept.as("a").join(kept.as("b"),
        keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
    val star = withPop
      .filter(col("_pop") > cap && col(idCol) =!= col("_rep"))
      .select(col("_rep").as("a_id"), col(idCol).as("b_id"))
    full.union(star).distinct()
  }
}
