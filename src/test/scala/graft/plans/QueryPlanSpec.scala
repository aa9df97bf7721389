package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan-shape regression gate for the scale-sensitive queries: the
  * oracle proves VALUES; these asserts pin the PLAN — a silent fallback
  * (broadcast → shuffle join, distributed window → single task) would
  * pass the value gate at fixture scale and fall over at 100 TB. */
class QueryPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q74 decontamination probes a BROADCAST of the benchmark shingles") {
    val p = plan("q74_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("q77/q79 prefix-sum packing runs with no single-task stage") {
    for (q <- Seq("q77_pack_sequences", "q79_corpus_pipeline")) {
      val p = plan(q)
      assert(!p.contains("SinglePartition"), s"$q has a single-partition stage:\n$p")
      assert(p.contains("__graft_pid"), s"$q lost the slice-id window:\n$p")
    }
  }

  test("q81 decorrelated subquery broadcasts the 25-row nation aggregate") {
    val p = plan("q81_scalar_subquery")
    assert(p.contains("BroadcastHashJoin"), s"nation aggregate not broadcast:\n$p")
  }

  test("q83 KMV UDAF is a two-phase aggregate (map-side partial)") {
    val p = plan("q83_kmv_udaf")
    // ObjectHashAggregate with partial_kmvsketch before the exchange —
    // the sketch merges map-side; rows never cross the shuffle raw
    assert(p.contains("ObjectHashAggregate"), s"no object hash aggregate:\n$p")
    assert(p.toLowerCase.contains("partial_kmvsketch"),
      s"no map-side partial sketch:\n$p")
  }

  test("q103 segment dedup: decision travels as longs, text shuffles once") {
    val p = plan("q103_segment_dedup")
    assert(!p.contains("SinglePartition"), s"single-task stage:\n$p")
    // segmentation is the codegen'd byte scan, and segment TEXT is never
    // a shuffle key — the corpus-wide duplicate count aggregates the
    // 60-bit hash column, the removal set comes back keyed by doc_id
    assert(p.contains("space_segments"), s"byte-scan segmentation lost:\n$p")
    assert(!p.contains("hashpartitioning(seg"), s"segment text used as shuffle key:\n$p")
    assert(p.contains("hashpartitioning(h") && p.contains("hashpartitioning(doc_id"),
      s"hash-count / removal-set exchanges lost:\n$p")
    // no Window node: the window-by-segment-string form shuffled the
    // full corpus text twice
    assert(!"Window\\b".r.findAllIn(p).hasNext, s"segment window came back:\n$p")
  }

  test("q105 cross-corpus dedup joins on hashes/bands, never raw text") {
    val p = plan("q105_cross_corpus_dedup")
    // every exchange ships hashes / band keys / ids; raw text columns
    // must never be a shuffle partition key
    assert(!p.contains("hashpartitioning(text"), s"raw text used as shuffle key:\n$p")
    // the probe side signs rows with the codegen'd row-form signature
    // (one projection, no aggregation shuffle before the index joins)
    assert(p.contains("minhash_mins"), s"row-form signature lost:\n$p")
  }

  test("q90 broadcast as-of join never shuffles the probe stream") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val exec0 = SparkEntry.queries("q90_asof_broadcast")(spark, sf)
      .queryExecution.executedPlan
    val exec = exec0 match { // AQE wrapper is opaque to collect()
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val p = exec.toString
    assert(p.contains("asof_pick"), s"binary-search kernel missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe stream shuffled:\n$p")
    // structural check: the STREAMED side of the broadcast join must be
    // shuffle-free all the way to the scan (the build side's groupBy
    // exchanges are expected and allowed)
    val join = exec.collectFirst { case j: BroadcastHashJoinExec => j }
      .getOrElse(fail(s"no BroadcastHashJoin in plan:\n$p"))
    val streamed = join.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => join.left
      case _ => join.right
    }
    val shuffles = streamed.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"probe side re-partitioned before the join:\n$streamed")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // The 100 TB shape Catalyst provides when neither join side broadcasts:
    // a bloom filter built from the (selectively filtered) creation side is
    // injected as a semi-join-style predicate on the probe-side SCAN, so
    // most probe rows die before the shuffle. Off at fixture scale only
    // because of the 10 GB application-side threshold — this pins that the
    // rewrite actually fires for our plans once thresholds are met.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = graft.core.Tables.lineitem(spark, sf)
      val ord = graft.core.Tables.orders(spark, sf)
        .filter("o_orderpriority = '1-URGENT'")
      val p = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no bloom-filter probe on the application side:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("q108 PQ encode never shuffles the vector table") {
    val p = plan("q108_pq_ann")
    // codes are per-row argmins over the broadcast codebook (codegen'd
    // quantized dots); the only big-side exchange is the top-k window
    assert(p.contains("quantized_dot"), s"codegen'd dot kernel missing:\n$p")
    assert(!p.contains("hashpartitioning(vec_id"),
      s"encode shuffles by vec_id (argmin fell back to groupBy):\n$p")
    assert(p.contains("hashpartitioning(q_id"), s"top-k window lost:\n$p")
  }

  test("q110 fuzzy ER joins the materialized name table, not raw parts") {
    val p = plan("q110_fuzzy_names")
    // names is localCheckpoint'd — all four consumers (two token
    // branches + two count joins) must read it, never re-scan part
    assert(!p.contains("part.parquet"), s"raw part table re-scanned:\n$p")
    assert(p.contains("levenshtein"), s"edit-distance verify lost:\n$p")
  }

  test("q114 LATERAL LIMIT subquery decorrelates to a rank window") {
    val p = plan("q114_lateral_topk")
    // the correlated per-row LIMIT must plan as ONE partitioned top-k
    // pass + a broadcast dimension join — never per-dimension-row
    // re-execution of the subquery
    assert(p.contains("WindowGroupLimit"), s"top-k window lost:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dimension join not broadcast:\n$p")
  }

  test("q111 inverted index shuffles (term, doc) pairs, never text") {
    val p = plan("q111_inverted_index")
    assert(!p.contains("hashpartitioning(text"),
      s"raw text used as shuffle key:\n$p")
    assert(p.contains("hashpartitioning(term"),
      s"posting aggregation not partitioned by term:\n$p")
  }

  test("q121 point-in-time join is equi-keyed with the interval as a filter") {
    val p = plan("q121_pit_join")
    // the SCD2 lookup must ride a hash join on the dimension key
    // (broadcast at fixture scale, SMJ at cluster scale) — a range-only
    // condition would fall back to a nested-loop product
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"no equi hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval predicate planned as a nested loop:\n$p")
  }

  test("q118 SCD2 computes both windows from ONE hash exchange") {
    val p = plan("q118_scd2")
    // lag (compaction) + lead (validity) share the user_id partitioning;
    // the only other exchange is the output ORDER BY
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"windows not sharing one exchange:\n$p")
    assert(!p.contains("SinglePartition"), s"single-task stage:\n$p")
  }

  test("q124 bloom probe is a literal bit test + broadcast classify — probe never shuffles pre-agg") {
    val p = plan("q124_bloom_prune")
    // the mask rides the projection as a literal (shiftright bit test);
    // the truth join is a broadcast; the only shuffles are the final
    // aggregation + order
    assert(p.contains("shiftright"), s"mask bit test lost:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"truth side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe side shuffled into a join:\n$p")
  }

  test("q126 interval join is equi-keyed on (nation, bucket), never a nested loop") {
    val p = plan("q126_interval_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"no equi join on the bucket key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap predicate planned as a product:\n$p")
  }

  test("q127 wedge join is equi-keyed on the oriented source, never a product") {
    val p = plan("q127_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"wedge enumeration planned as a product:\n$p")
    assert(!p.contains("SinglePartition"), s"single-task stage:\n$p")
  }

  test("q128 moment sums partial-aggregate map-side") {
    val p = plan("q128_correlation")
    // one hash aggregation with a partial phase before the exchange —
    // the six integer sums collapse per partition, rows never cross raw
    assert(p.contains("HashAggregate") && p.toLowerCase.contains("partial"),
      s"no map-side partial aggregation:\n$p")
  }

  test("LSH self-joins read the materialized band table, not the pipeline twice") {
    // a self-join's two branches are separate subtrees to Catalyst
    // (exchange reuse does not apply across the alias split), so
    // without materialization the signature pipeline computes and scans
    // TWICE. The localCheckpoint makes the final plan read ExistingRDD:
    // parquet scans remaining in the plan = pipelines still recomputed.
    for ((q, maxScans) <- Seq(
        "q44_lsh_pairs" -> 0,          // both branches from the checkpoint
        "q137_bounded_banding" -> 0,   // capped variant likewise
        "q61_neardup_banded" -> 2)) {  // 2 = the verify joins back to base
      val p = plan(q)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans <= maxScans,
        s"$q recomputes its pipeline: $scans parquet scans (max $maxScans):\n$p")
    }
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact scan") {
    // The dominant scan saver for star joins at 100 TB: the fact is laid
    // out partitionBy(dim key); a filter that only exists on the DIM side
    // must still reach the fact scan's partitionFilters at runtime as a
    // DynamicPruningExpression — otherwise the engine reads every
    // partition of a 100 TB fact to honor a 1-row dim predicate.
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val fact = sp.range(0, 10000)
      .select($"id", ($"id" % 8).as("r"), ($"id" * 3).as("v"))
    fact.write.mode("overwrite").partitionBy("r").parquet(s"$dir/fact")
    val dim = sp.range(0, 8)
      .select($"id".as("r"), concat(lit("n"), $"id").as("name"))

    val pruned = sp.read.parquet(s"$dir/fact")
      .join(broadcast(dim.filter($"name" === "n3")), "r")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val p = pruned.queryExecution.executedPlan.toString
    // (the plan string truncates long filter lists — match the stable
    // "dynamicpruning" prefix of DynamicPruningExpression)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"fact scan not dynamically pruned (no DPP filter in PartitionFilters):\n$p")

    // value identity vs the unpartitioned plan — pruning must never
    // change results, only the partitions touched
    val flat = fact.join(dim.filter($"name" === "n3"), "r")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
    assert(pruned.collect().toSeq == flat.collect().toSeq)
  }
}
