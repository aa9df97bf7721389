package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.operators.{Skew, Windows}

/** Relational operator coverage over the TPC-H-ish star schema
  * (SURVEY §2.3): scans, projection/filter with parquet pushdown, hash
  * joins (broadcast for dims), semi/anti joins, range join, hash/sort
  * aggregation, rollup/cube, window functions, sorts/limits/top-k, set
  * ops, scalar + JSON + array functions.
  *
  * These are not in the reference (it has no relational layer — SURVEY
  * §2.3 marks them "absent"); they come free with the DataFrame-native
  * design and are mandated by the driver's north star.
  *
  * Numeric discipline: money aggregates are exact and fold-order
  * independent so Spark's parallel partial aggregation and a serial
  * oracle cannot drift (see [[QuerySpec]]) — either DECIMAL sums
  * emitted as DOUBLE, or the scaled-integer fast path ([[moneySum]])
  * on head-to-head-flagged hot aggregates.
  */
object Relational {

  /** ext*(1-disc) has exactly 4 decimal digits; the double product is
    * within 1e-10 of it, so DECIMAL(18,4) rounding recovers the exact
    * value in both engines. */
  private val discPrice = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"

  /** Exact money sum on the scaled-integer fast path.
    *
    * A DECIMAL(18,x) sum widens the accumulator past the long-compact
    * precision 18, forcing Spark's BigDecimal object path — measured
    * 4.9 s vs 0.87 s for the q1 aggregate on the 10× bench fixture.
    * Instead: the input doubles carry a fixed number of decimal digits,
    * so `floor(x*scale + 0.5)` recovers the exact integer (all money
    * values here are non-negative; floor pins the same rounding in
    * Spark and any IEEE-754 oracle), and `try_sum` accumulates with
    * CHECKED int64 adds — overflow is a loud NULL (a hash-gate
    * failure), never a silent wrap. Integer sums are fold-order
    * independent, so partial aggregation and salting stay bit-equal to
    * a serial oracle. Capacity: 9.2e18 scaled units per GROUP (~9.2e12
    * dollars at the 1e-6 charge scale); a corpus whose single group
    * exceeds that keeps the DECIMAL formulation (q18 does) and pays
    * the object-agg tax knowingly.
    */
  private def moneySum(c: Column, scale: Long): Column =
    try_sum(floor(c * scale + lit(0.5))) / scale.toDouble
  private def moneySumSql(expr: String, scale: Long): String =
    s"sum(CAST(FLOOR(($expr) * $scale + 0.5) AS BIGINT)) / $scale.0"

  val specs: Seq[QuerySpec] = Seq(

    // ---- hash aggregation: TPC-H Q1-style pricing summary ----
    QuerySpec.sql("q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${moneySumSql("l_quantity", 100)} AS sum_qty,
         |  ${moneySumSql("l_extendedprice", 100)} AS sum_base_price,
         |  ${moneySumSql("l_extendedprice * (1 - l_discount)", 10000)} AS sum_disc_price,
         |  ${moneySumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000)} AS sum_charge,
         |  ${moneySumSql("l_quantity", 100)} / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          moneySum($"l_quantity", 100).as("sum_qty"),
          moneySum($"l_extendedprice", 100).as("sum_base_price"),
          moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 10000).as("sum_disc_price"),
          moneySum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 1000000).as("sum_charge"),
          (moneySum($"l_quantity", 100) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- multi-way join with broadcast dims: revenue per nation ----
    // Dims (region/nation/customer) are broadcast; only lineitem⋈orders
    // shuffles — the layout that survives 100 TB (fact-fact shuffle on the
    // join key, AQE handles skew).
    QuerySpec.sql("q2_join_revenue",
      s"""SELECT n_name, ${moneySumSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 10000).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---- TPC-H Q5 shape: star join with a CROSS-dimension correlation —
    // customer and supplier must share a nation, so the supplier join
    // carries both the fact key (l_suppkey) and the dim-dim constraint
    // (c_nationkey = s_nationkey). Selective region + date filters reach
    // the scans as pushed predicates; every dim broadcasts, so the only
    // shuffle is lineitem⋈orders and the final tiny aggregation. ----
    QuerySpec.sql("q98_local_supplier",
      s"""SELECT n_name, ${moneySumSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" < lit("1997-01-01").cast("timestamp")),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, d)),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 10000).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---- data-quality constraint report (the deequ/expectations
    // shape): every invariant the pipeline asserts before shipping a
    // snapshot, into one (check, n_violations) report a pipeline gates
    // on (sum = 0). Plan discipline at 100 TB: all of a table's
    // single-table checks ride ONE scan (conditional aggregates
    // unpivoted via stack), BOTH cross-table lineitem↔orders checks
    // (date ordering + orphan FK) ride ONE left join — a fact-fact
    // shuffle that can't broadcast — and the dimension FK check
    // (orders→customer) is a broadcast anti join. ----
    QuerySpec.sql("q101_quality_checks",
      """SELECT check_name, n_violations FROM (
        |  SELECT 'lineitem_negative_qty' AS check_name,
        |    CAST(count(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_null_orderkey',
        |    CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_ship_before_order',
        |    CAST(count(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 END) AS BIGINT)
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'orders_orphan_customer', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'lineitem_orphan_order', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'documents_empty_text',
        |    CAST(count(CASE WHEN len(text) = 0 THEN 1 END) AS BIGINT) FROM documents
        |) ORDER BY check_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      // one lineitem scan for both single-table lineitem checks
      val liChecks = li
        .agg(count(when($"l_quantity" <= 0, 1)).as("neg_qty"),
          count(when($"l_orderkey".isNull, 1)).as("null_key"))
        .select(expr("""stack(2,
          'lineitem_negative_qty', neg_qty,
          'lineitem_null_orderkey', null_key) AS (check_name, n_violations)"""))
      // one lineitem⋈orders LEFT join for both cross-table checks:
      // a missing match (null o_orderkey) is the orphan; a present one
      // feeds the date-ordering check
      val crossChecks = li
        .join(ord.select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey", "left")
        .agg(count(when($"l_shipdate" < $"o_orderdate", 1)).as("ship_before"),
          count(when($"o_orderkey".isNull, 1)).as("orphan"))
        .select(expr("""stack(2,
          'lineitem_ship_before_order', ship_before,
          'lineitem_orphan_order', orphan) AS (check_name, n_violations)"""))
      val orphanCust = ord
        .join(broadcast(Tables.customer(s, d)),
          $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orders_orphan_customer").as("check_name"), $"n_violations")
      val emptyDoc = Tables.documents(s, d)
        .agg(count(when(length($"text") === 0, 1)).as("n_violations"))
        .select(lit("documents_empty_text").as("check_name"), $"n_violations")
      Seq(liChecks, crossChecks, orphanCust, emptyDoc)
        .reduce(_.unionByName(_))
        .orderBy($"check_name")
    },

    // ---- top-k per group (ranking window; partial top-k pushdown) ----
    QuerySpec.sql("q3_topk_per_group",
      """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part) WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin) { (s, d) =>
      Windows.topKPerGroup(Tables.part(s, d), Seq("p_brand"),
          Seq($"p_retailprice".desc, $"p_partkey"), 3)
        .select($"p_brand", $"p_partkey", $"p_retailprice", $"rnk")
        .orderBy($"p_brand", $"rnk")
    },

    // ---- semi join (EXISTS) ----
    QuerySpec.sql("q4_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin) { (s, d) =>
      // r10 sweep: trailing presentational sorts on data-proportional
      // outputs dropped query-and-oracle together (order-insensitive
      // gate; each was a result-sized range exchange — guide §2.4).
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter($"o_orderstatus" === "O"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    },

    // ---- anti join (NOT EXISTS) ----
    QuerySpec.sql("q5_anti_join",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_acctbal")
    },

    // ---- selective filter + projection (parquet pushdown: the scan must
    // show PushedFilters + 3-column ReadSchema) ----
    QuerySpec.sql("q6_filter_pushdown",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_discount < 0.02""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 45 && $"l_discount" < 0.02)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    },

    // ---- range (interval) join: equi key carries the shuffle, the time
    // range is a residual predicate — the scalable interval-join layout ----
    QuerySpec.sql("q7_range_join",
      """SELECT o_orderpriority, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },

    // ---- set operations: (A UNION B) EXCEPT C ----
    QuerySpec.sql("q8_setops",
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |) EXCEPT SELECT c_custkey FROM customer WHERE c_nationkey < 5""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
        .union(c.filter($"c_acctbal" > 5000).select($"c_custkey")).distinct()
        .except(c.filter($"c_nationkey" < 5).select($"c_custkey"))
    },

    // ---- rollup with grouping id ----
    QuerySpec.sql("q9_rollup",
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |  count(*) AS n_cust,
        |  CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("total_bal"),
          count(lit(1)).as("n_cust"),
          (grouping($"r_name") * 2 + grouping($"n_name")).cast("long").as("gid"))
        .orderBy($"gid", $"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    },

    // ---- cube ----
    QuerySpec.sql("q10_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          (grouping($"l_returnflag") * 2 + grouping($"l_linestatus")).cast("long").as("gid"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- explicit grouping sets (beyond rollup/cube): chosen set list ----
    QuerySpec.sql("q53_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          (grouping($"l_returnflag") * 2 + grouping($"l_linestatus")).cast("long").as("gid"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- analytic window functions: rank / dense_rank / lag ----
    QuerySpec.sql("q11_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  lag(o_totalprice) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          lag($"o_totalprice", 1).over(w).as("prev_price"))
    },

    // ---- global sort + limit (distributed top-k via TakeOrderedAndProject) ----
    QuerySpec.sql("q12_sort_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey").limit(100)
    },

    // ---- scalar functions: string / date / math ----
    QuerySpec.sql("q13_scalar_funcs",
      """SELECT o_orderkey,
        |  upper(substr(o_orderpriority, 1, 8)) AS pri_up,
        |  length(o_orderstatus) AS status_len,
        |  concat(o_orderstatus, '-', o_orderpriority) AS tag,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  abs(o_totalprice - 1000.0) AS adj,
        |  CAST(floor(o_totalprice / 100) AS BIGINT) AS bucket,
        |  o_orderkey % 7 AS mod7
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter($"o_orderkey" % 10 === 0)
        .select($"o_orderkey",
          upper(substring($"o_orderpriority", 1, 8)).as("pri_up"),
          length($"o_orderstatus").as("status_len"),
          concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("tag"),
          year($"o_orderdate").cast("int").as("yr"),
          month($"o_orderdate").cast("int").as("mo"),
          dayofmonth($"o_orderdate").cast("int").as("dom"),
          abs($"o_totalprice" - 1000.0).as("adj"),
          floor($"o_totalprice" / 100).cast("long").as("bucket"),
          ($"o_orderkey" % 7).as("mod7"))
    },

    // ---- JSON extraction over the events.props column ----
    QuerySpec.sql("q14_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n
        |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((get_json_object($"props", "$.k").cast("long") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n")).orderBy($"k_mod")
    },

    // ---- theta / nested-loop join: cross product with a non-equi
    // residual predicate (no equi key at all → BroadcastNestedLoopJoin;
    // the small side MUST be the broadcast one at scale) ----
    QuerySpec.sql("q16_theta_join",
      """SELECT s.s_suppkey, count(*) AS n_cheaper
        |FROM supplier s JOIN part p ON p.p_retailprice < s.s_acctbal / 3
        |GROUP BY s.s_suppkey""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d); val p = broadcast(Tables.part(s, d))
      sup.join(p, p("p_retailprice") < sup("s_acctbal") / 3)
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_cheaper"))
    },

    // ---- intersect (completes the set-op family with q8) ----
    QuerySpec.sql("q17_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 1000""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
        .intersect(c.filter($"c_acctbal" > 1000).select($"c_custkey"))
    },

    // ---- TPC-H Q3 shape: selective filters both sides of a fact-fact
    // join, aggregate, top-10 — the classic "shipping priority" plan
    // (filters reach both parquet scans; TakeOrderedAndProject caps the
    // result without a full sort at scale) ----
    QuerySpec.sql("q18_shipping_priority",
      s"""SELECT l_orderkey, CAST(sum($discPrice) AS DOUBLE) AS revenue,
         |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_us
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter($"l_shipdate" > "1995-03-15")
        .join(Tables.orders(s, d).filter($"o_orderdate" < "1995-03-15"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")),
          $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)"))
          .cast("double").as("revenue"))
        .select($"l_orderkey", $"revenue",
          unix_micros($"o_orderdate".cast("timestamp")).as("orderdate_us"))
        .orderBy($"revenue".desc, $"l_orderkey").limit(10)
    },

    // ---- TPC-H Q12 shape: conditional aggregation (CASE inside sum) ----
    QuerySpec.sql("q19_priority_by_status",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"l_linestatus")
        .agg(sum(when(hi, 1).otherwise(0)).as("high_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_count"))
        .orderBy($"l_linestatus")
    },

    // ---- array higher-order functions over embeddings (sequential folds
    // on both sides → bit-identical doubles) ----
    QuerySpec.sql("q15_array_hof",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding::DOUBLE[], x -> abs(x))), (a, x) -> a + x) AS l1,
        |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding::DOUBLE[], x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END)), (a, x) -> a + x) AS n_pos
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).filter($"vec_id" < 50)
        .select($"vec_id",
          size($"embedding").as("dim"),
          aggregate(transform($"embedding", x => abs(x.cast("double"))),
            lit(0.0), (a, x) => a + x).as("l1"),
          aggregate(transform($"embedding",
              x => when(x.cast("double") > 0, 1.0).otherwise(0.0)),
            lit(0.0), (a, x) => a + x).as("n_pos"))
        .orderBy($"vec_id")
    },

    // ---- pivot: one column per event_type of daily DECIMAL sums — the
    // `groupBy(ts).pivot(name)` shape SURVEY §2.1 P11 names for
    // merge_timeseries' intended semantics. Spark's pivot with explicit
    // values compiles to ONE conditional aggregation pass (no extra
    // shuffle vs plain groupBy); the oracle spells the same CASEs. ----
    QuerySpec.sql("q56_pivot",
      """SELECT epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day_us,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY day_us ORDER BY day_us""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(unix_micros(date_trunc("day", $"ts")).as("day_us"))
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(sum($"value".cast("decimal(18,2)")).cast("double"))
        .orderBy($"day_us")
    },

    // ---- unpivot (melt): wide → long over the lineitem money columns;
    // Spark's Unpivot node is a zero-shuffle row expansion (narrow), the
    // oracle is the standard UNION ALL spelling. The output is
    // data-sized (3 rows per lineitem) and deliberately UNSORTED: a
    // presentational global ORDER BY on a melted 100 TB fact table is a
    // full-range exchange that buys nothing (the hash gate is
    // order-insensitive; downstream consumers re-cluster anyway) ----
    QuerySpec.sql("q57_unpivot",
      """SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax' AS metric, l_tax AS val FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("price", $"l_extendedprice")
        .withColumn("discount", $"l_discount")
        .withColumn("tax", $"l_tax")
        .unpivot(Array($"l_orderkey", $"l_linenumber"),
          Array($"price", $"discount", $"tax"), "metric", "val")
    },

    // ---- skew-proof aggregation through the gate: l_returnflag has only
    // 3 values over all of lineitem — the textbook hot-key groupBy whose
    // single reducer bottlenecks at scale. Skew.saltedAgg fans each key
    // over 16 salt buckets (phase 1) and merges 16 partials per key
    // (phase 2); scaled-integer sums (see moneySum) make the two-phase
    // result bit-equal to the oracle's one-phase GROUP BY regardless of
    // fold order, with checked adds at both phases. ----
    QuerySpec.sql("q58_salted_agg",
      s"""SELECT l_returnflag,
         |  ${moneySumSql("l_quantity", 100)} AS total_qty,
         |  ${moneySumSql("l_extendedprice", 100)} AS total_price,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Skew.saltedAgg(Tables.lineitem(s, d), Seq("l_returnflag"), 16, Map(
          "total_qty" -> ((try_sum(floor($"l_quantity" * 100 + lit(0.5))), (c: Column) => try_sum(c))),
          "total_price" -> ((try_sum(floor($"l_extendedprice" * 100 + lit(0.5))), (c: Column) => try_sum(c))),
          "n" -> ((count(lit(1)), (c: Column) => sum(c)))))
        .select($"l_returnflag",
          ($"total_qty" / 100.0).as("total_qty"),
          ($"total_price" / 100.0).as("total_price"),
          $"n".cast("long").as("n"))
        .orderBy($"l_returnflag")
    },

    // ---- global ranking windows through the gate: written with the
    // STOCK Window API (no partition key — Spark's single-task WindowExec
    // trap), planned by the engine's extension path as
    // [[graft.plans.DistributedRankExec]] (GraftExtensions rewrite; plan
    // shape asserted in GlobalSeqSpec). l_quantity has ~50 distinct
    // values over all of lineitem — maximal tie groups, so the oracle
    // hash-checks the distributed rank/dense_rank tie math exactly. ----
    QuerySpec.sql("q71_global_rank",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(rank() OVER (ORDER BY l_quantity) AS INT) AS rnk,
        |  CAST(dense_rank() OVER (ORDER BY l_quantity) AS INT) AS drnk,
        |  CAST(row_number() OVER (ORDER BY l_quantity, l_orderkey, l_linenumber) AS INT) AS rn
        |FROM lineitem""".stripMargin) { (s, d) =>
      // No trailing ORDER BY rn: the ranks themselves are the surface
      // (computed distributively by DistributedRankExec); re-sorting the
      // data-sized output for presentation would add a second full-range
      // exchange the order-insensitive gate never observes.
      Tables.lineitem(s, d)
        .withColumn("rnk", rank().over(Window.orderBy($"l_quantity")))
        .withColumn("drnk", dense_rank().over(Window.orderBy($"l_quantity")))
        .withColumn("rn", row_number().over(
          Window.orderBy($"l_quantity", $"l_orderkey", $"l_linenumber")))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"rnk", $"drnk", $"rn")
    },

    // ---- salted large-large join through the gate: lineitem ⋈ part on
    // partkey with a 8-way salt — the shape for a probe side with hot
    // keys against a build side too big to broadcast (at 100 TB `part`
    // is ~2 TB: no broadcast). The result is salt-invariant, which is
    // exactly what the oracle (plain join) proves. ----
    QuerySpec.sql("q66_skew_join",
      s"""SELECT p_brand, CAST(sum($discPrice) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Skew.saltedJoin(
          Tables.lineitem(s, d),
          Tables.part(s, d).withColumnRenamed("p_partkey", "l_partkey"),
          "l_partkey", 8, saltSource = $"l_orderkey")
        .groupBy($"p_brand")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    },

    // ---- correlated scalar subquery: customers whose balance exceeds
    // their nation's average. The DataFrame form is the DECORRELATED
    // plan the optimizer produces anyway — a per-nation aggregate
    // (25 rows) broadcast back against the fact side, no per-row
    // re-evaluation. The oracle states it in subquery form; the hash
    // match proves the decorrelation equivalent. The average is
    // compared multiply-through (bal·n > Σbal) in DECIMAL so the
    // boundary is exact — a double avg is fold-order-dependent. ----
    QuerySpec.sql("q81_scalar_subquery",
      """SELECT c_custkey, c_nationkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM customer i WHERE i.c_nationkey = c.c_nationkey)
        |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer i
        |       WHERE i.c_nationkey = c.c_nationkey)""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
        .withColumn("balD", $"c_acctbal".cast("decimal(18,2)"))
      val nav = c.groupBy($"c_nationkey")
        .agg(sum($"balD").as("tot"), count(lit(1)).as("cnt"))
      c.join(broadcast(nav), "c_nationkey")
        .filter($"balD" * $"cnt" > $"tot")
        .select($"c_custkey", $"c_nationkey", $"balD".cast("double").as("bal"))
    },

    // ---- EXCEPT ALL (bag difference, multiplicity-aware — the set-op
    // q8 doesn't cover): lineitem ship modes minus a per-key sample of
    // them; duplicates survive by count difference. One shuffle on the
    // value, the engine's native ExceptAll node. ----
    QuerySpec.sql("q82_except_all",
      """SELECT l_returnflag FROM (
        |  SELECT l_returnflag FROM lineitem WHERE l_quantity > 45
        |  EXCEPT ALL
        |  SELECT l_returnflag FROM lineitem WHERE l_quantity > 48
        |)""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      l.filter($"l_quantity" > 45).select($"l_returnflag")
        .exceptAll(l.filter($"l_quantity" > 48).select($"l_returnflag"))
    },

    // ---- recursive CTE surface (Spark 4's WITH RECURSIVE): a monthly
    // calendar spine generated by bounded recursion, LEFT-joined to
    // per-month order totals so empty months surface as zero — the
    // classic reason a spine exists. Scale-safe recursion: depth = the
    // number of months (80), independent of data volume; the data-side
    // work is one ordinary month-truncated aggregation. Both engines run
    // the recursion in their own dialect; the hash gate proves the
    // surfaces agree. ----
    QuerySpec.sql("q104_recursive_cte",
      """WITH RECURSIVE months(m) AS (
        |  SELECT TIMESTAMP '1995-01-01 00:00:00'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < TIMESTAMP '2001-08-01 00:00:00'),
        |mo AS (SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |       FROM orders GROUP BY 1)
        |SELECT epoch_us(months.m) AS month_us,
        |  CAST(coalesce(mo.n_orders, 0) AS BIGINT) AS n_orders,
        |  coalesce(mo.revenue, 0.0) AS revenue
        |FROM months LEFT JOIN mo ON mo.m = months.m
        |ORDER BY month_us""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_q104_orders")
      s.sql(
        """WITH RECURSIVE months(m) AS (
          |  SELECT TIMESTAMP '1995-01-01 00:00:00'
          |  UNION ALL
          |  SELECT m + INTERVAL '1' MONTH FROM months
          |  WHERE m < TIMESTAMP '2001-08-01 00:00:00'),
          |mo AS (SELECT date_trunc('MONTH', o_orderdate) AS m, count(*) AS n_orders,
          |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |       FROM graft_q104_orders GROUP BY 1)
          |SELECT unix_micros(months.m) AS month_us,
          |  coalesce(mo.n_orders, 0L) AS n_orders,
          |  coalesce(mo.revenue, 0.0D) AS revenue
          |FROM months LEFT JOIN mo ON mo.m = months.m
          |ORDER BY month_us""".stripMargin)
    },

    // ---- PageRank (bounded-iteration weighted graph analytics — the
    // iterative sibling of ConnectedComponents' connectivity fixpoint):
    // 3 damped rounds over the customer↔supplier bipartite trade graph
    // (both directions of every distinct (cust, supp) trading pair).
    // Fixed-point int64 ranks (scale 1e12): integer DIV truncates
    // identically in both engines, so the ESTIMATES hash-gate — a float
    // PageRank sums in partition order and never would. Each round is
    // one edges⋈ranks join + one groupBy(dst) — two shuffles, linear in
    // |E|, independent of diameter; the oracle unrolls the same three
    // rounds as CTEs. ----
    QuerySpec.sql("q115_pagerank",
      """WITH und AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        |             FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT 2*c AS src, 2*s+1 AS dst FROM und
        |      UNION ALL SELECT 2*s+1, 2*c FROM und),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |p AS (SELECT 1000000000000 // count(*) AS init,
        |        (15 * (1000000000000 // count(*))) // 100 AS base FROM nodes),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(p.init AS BIGINT) AS rank FROM nodes, p),
        |s1 AS (SELECT e.dst AS node, CAST(sum(r.rank // d.deg) AS BIGINT) AS in_sum
        |       FROM e JOIN r0 r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(p.base + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n CROSS JOIN p LEFT JOIN s1 s ON s.node = n.node),
        |s2 AS (SELECT e.dst AS node, CAST(sum(r.rank // d.deg) AS BIGINT) AS in_sum
        |       FROM e JOIN r1 r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(p.base + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n CROSS JOIN p LEFT JOIN s2 s ON s.node = n.node),
        |s3 AS (SELECT e.dst AS node, CAST(sum(r.rank // d.deg) AS BIGINT) AS in_sum
        |       FROM e JOIN r2 r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(p.base + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n CROSS JOIN p LEFT JOIN s3 s ON s.node = n.node)
        |SELECT node, CAST(node % 2 AS INT) AS is_supplier, rank
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val und = Tables.orders(s, d).join(Tables.lineitem(s, d),
          $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("c"), $"l_suppkey".as("sk")).distinct()
      // both edge directions in ONE pass over `und`: the old
      // unionAll(und.select, und.select) planned the orders⋈lineitem
      // join + distinct TWICE (Catalyst does not share subtrees across
      // union branches) — explode(array(...)) emits the same two rows
      // per pair from a single computation (r10, guide §2.4)
      val edges = und.select(explode(array(
          struct(($"c" * 2).cast("long").as("src"),
            ($"sk" * 2 + 1).cast("long").as("dst")),
          struct(($"sk" * 2 + 1).cast("long").as("src"),
            ($"c" * 2).cast("long").as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      graft.operators.PageRank.run(edges, 3)
        .select($"node", ($"node" % 2).cast("int").as("is_supplier"), $"rank")
        .orderBy($"rank".desc, $"node").limit(20)
    },

    // ---- correlated LATERAL subquery (SQL-surface sibling of the
    // q3/q18 top-k-per-group operators): per-nation top-2 customers by
    // balance, written the way a SQL user writes it. Catalyst
    // DECORRELATES the per-row LIMIT subquery into a partitioned rank
    // window — same executed shape as Windows.topKPerGroup, no
    // nation-by-nation re-execution (which is what a naive lateral
    // loop would do 25× here and 10⁶× on a real dimension). ----
    QuerySpec.sql("q114_lateral_topk",
      """SELECT n.n_name AS nation, t.c_name AS c_name, t.c_acctbal AS acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY nation, acctbal DESC, c_name""".stripMargin) { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("graft_q114_nation")
      Tables.customer(s, d).createOrReplaceTempView("graft_q114_customer")
      s.sql(
        """SELECT n.n_name AS nation, t.c_name AS c_name, t.c_acctbal AS acctbal
          |FROM graft_q114_nation n, LATERAL (
          |  SELECT c_name, c_acctbal FROM graft_q114_customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
          |ORDER BY nation, acctbal DESC, c_name""".stripMargin)
    },

    // ---- FULL OUTER join (the one join shape q2/q4/q5/q7/q16/q26
    // didn't cover): high-balance customers vs urgent-order activity —
    // keys exclusive to EITHER side survive with nulls flagged. Both
    // inputs are keyed subsets of their tables, so the join shuffles on
    // custkey like any fact-fact join; nullable outputs are surfaced as
    // has_* flags + coalesced values (portable across engines'
    // null-rendering). ----
    QuerySpec.sql("q106_full_outer",
      """WITH c AS (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |           FROM customer WHERE c_acctbal > 5000),
        |o AS (SELECT o_custkey, count(*) AS n_urgent FROM orders
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |  CAST(c.bal IS NOT NULL AS INT) AS has_bal,
        |  CAST(coalesce(c.bal, 0) AS DOUBLE) AS bal,
        |  CAST(o.n_urgent IS NOT NULL AS INT) AS has_urgent,
        |  CAST(coalesce(o.n_urgent, 0) AS BIGINT) AS n_urgent
        |FROM c FULL OUTER JOIN o ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter($"c_acctbal" > 5000)
        .select($"c_custkey", $"c_acctbal".cast("decimal(18,2)").as("bal"))
      val o = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_urgent"))
      c.join(o, $"o_custkey" === $"c_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
          $"bal".isNotNull.cast("int").as("has_bal"),
          coalesce($"bal", lit(0)).cast("double").as("bal"),
          $"n_urgent".isNotNull.cast("int").as("has_urgent"),
          coalesce($"n_urgent", lit(0L)).as("n_urgent"))
    },

    // ---- PORTABLE Bloom-filter join pruning — the cross-job runtime
    // filter: build a bloom mask over the selective side's keys ONCE
    // (m=8192 bits = 1 KiB, driver-sized BY DEFINITION like the KMeans
    // codebook), fold it into the probe scan as a literal — probe rows
    // failing the k=4 bit tests never reach the join/shuffle. Spark's
    // own runtime bloom (gated in QueryPlanSpec) lives inside ONE query;
    // this one is engine-portable (md5 positions — the same mask built
    // here can prune next week's job, or a DuckDB/Trino consumer).
    // The gated output is the CALIBRATION shape: per priority, how many
    // orders pass the bloom vs truly match vs false-positive — the
    // fp-rate table a pipeline consults before sizing m (rule: m ≳ 10
    // bits/key for ~1% fp at k=4; the knob scales with the BUILD side
    // only, never the probed 100 TB). Production use is
    // `.filter(pass)`; here every row is kept and counted. ----
    QuerySpec.sql("q124_bloom_prune", {
      def posSql(j: Int, e: String): String =
        s"(${graft.functions.PortableHash.md5ModSql(s"'bloom$j|' || CAST($e AS VARCHAR)")} % 8192)"
      val inPos = (0 to 3).map(j =>
        s"${posSql(j, "o_custkey")} IN (SELECT p FROM pos)").mkString(" AND ")
      s"""WITH keys AS (SELECT DISTINCT c_custkey AS ck FROM customer
         |              WHERE c_mktsegment = 'BUILDING'),
         |pos AS (SELECT DISTINCT p FROM (
         |  ${(0 to 3).map(j => s"SELECT ${posSql(j, "ck")} AS p FROM keys")
              .mkString("\n  UNION ALL ")})),
         |flags AS (SELECT o_orderpriority,
         |    CAST($inPos AS INT) AS pass,
         |    CAST(o_custkey IN (SELECT ck FROM keys) AS INT) AS is_true
         |  FROM orders)
         |SELECT o_orderpriority, count(*) AS n_orders,
         |  CAST(sum(pass) AS BIGINT) AS n_bloom_pass,
         |  CAST(sum(is_true) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN pass = 1 AND is_true = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
         |FROM flags GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    }) { (s, d) =>
      import graft.functions.PortableHash
      val m = 8192
      def pos(j: Int, key: Column): Column =
        PortableHash.md5Mod(concat(lit(s"bloom$j|"), key.cast("string"))) % m
      val keys = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("ck")).distinct()
      // build: ≤8192 distinct bit positions collect to a 1 KiB driver
      // mask — the broadcastable-by-definition artifact. All 4 hash
      // positions per key in ONE pass (explode) instead of a 4-branch
      // union that re-scanned the key table per branch (r10, guide
      // §2.4; the filtered scan itself stays pushed-down + cheap, so
      // the two remaining key computations — mask build and broadcast
      // truth join — deliberately recompute rather than checkpoint).
      val mask = new Array[Long](m / 64)
      keys.select(explode(array((0 to 3).map(j => pos(j, $"ck")): _*)).as("p"))
        .distinct()
        .collect().foreach { r =>
          val p = r.getLong(0).toInt; mask(p / 64) |= (1L << (p % 64))
        }
      val maskCol = typedLit(mask.toIndexedSeq)
      def hit(p: Column): Column =
        call_function("shiftright",
          element_at(maskCol, floor(p / 64).cast("int") + 1),
          p.mod(64).cast("int")).bitwiseAND(lit(1L)) === 1
      val pass = (0 to 3).map(j => hit(pos(j, $"o_custkey"))).reduce(_ && _)
      Tables.orders(s, d)
        .join(broadcast(keys.withColumn("tr", lit(1))),
          $"o_custkey" === $"ck", "left")
        .select($"o_orderpriority",
          pass.cast("int").as("pass"),
          $"tr".isNotNull.cast("int").as("is_true"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum($"pass").cast("long").as("n_bloom_pass"),
          sum($"is_true").cast("long").as("n_true"),
          sum(when($"pass" === 1 && $"is_true" === 0, 1L).otherwise(0L))
            .cast("long").as("n_false_pos"))
        .orderBy($"o_orderpriority")
    },

    // ---- INTERVAL OVERLAP join (the interval-interval sibling of the
    // q7 value-range join): order activity windows [orderdate, +7d) ×
    // same-nation promo windows, matched on `a.start < b.end AND
    // b.start < a.end`. The naive form is a theta join — O(|A|·|B|)
    // comparisons per nation. The scale form used here is TEMPORAL
    // BINNING: each interval explodes into the 7-day buckets it spans
    // (bounded by interval length — ≤2 each here), candidates meet on
    // an EQUI key (nation, bucket), the exact predicate then filters.
    // Pair space = per-bucket locality instead of per-nation totality —
    // the binning that makes interval joins shuffle-bounded at 100 TB
    // (bucket width ~ typical interval length is the knob; overlap
    // duplicates across buckets are removed by the pair DISTINCT).
    // Oracle: the naive theta join — the closure is the test harness,
    // the binning is the algorithm (the q64 discipline). Overlap length
    // in whole days via integer µs DIV — exact both engines. ----
    QuerySpec.sql("q126_interval_join", {
      val day = 86400000000L
      val t0 = 788918400000000L // 1995-01-01 UTC
      s"""WITH promos AS (
         |  SELECT n_nationkey AS nation, n_nationkey AS promo_id,
         |    ${t0} + CAST(n_nationkey AS BIGINT) * ${3 * day} AS p_start,
         |    ${t0} + CAST(n_nationkey AS BIGINT) * ${3 * day} + ${5 * day} AS p_end
         |  FROM nation),
         |act AS (
         |  SELECT o.o_orderkey, c.c_nationkey AS nation,
         |    epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS a_start,
         |    epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) + ${7 * day} AS a_end
         |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
         |SELECT a.o_orderkey, p.promo_id,
         |  CAST((least(a.a_end, p.p_end) - greatest(a.a_start, p.p_start))
         |       // ${day} AS BIGINT) AS overlap_days
         |FROM act a JOIN promos p
         |  ON p.nation = a.nation AND a.a_start < p.p_end AND p.p_start < a.a_end""".stripMargin
    }) { (s, d) =>
      val day = 86400000000L
      val week = 7 * day
      val t0 = 788918400000000L
      val promos = Tables.nation(s, d).select(
        $"n_nationkey".cast("long").as("nation"),
        $"n_nationkey".cast("long").as("promo_id"),
        (lit(t0) + $"n_nationkey".cast("long") * lit(3 * day)).as("p_start"),
        (lit(t0) + $"n_nationkey".cast("long") * lit(3 * day) + lit(5 * day)).as("p_end"))
      val act = Tables.orders(s, d)
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_nationkey".cast("long").as("nation"),
          // NTZ → TIMESTAMP is identity under the UTC session, matching
          // the oracle's epoch_us(CAST(...))
          unix_micros($"o_orderdate".cast("timestamp")).as("a_start"),
          (unix_micros($"o_orderdate".cast("timestamp")) + lit(7 * day)).as("a_end"))
      // explode each interval into its week buckets (integer DIV — no
      // float boundary); candidates meet on the equi key (nation, b)
      def bucketed(df: DataFrame, s0: String, e0: String): DataFrame =
        df.withColumn("b", explode(expr(s"sequence($s0 DIV $week, ($e0 - 1) DIV $week)")))
      val cand = bucketed(act, "a_start", "a_end")
        .join(broadcast(bucketed(promos, "p_start", "p_end")), Seq("nation", "b"))
        .drop("b").distinct() // an overlap spanning 2 shared buckets appears twice
      cand.filter($"a_start" < $"p_end" && $"p_start" < $"a_end")
        .select($"o_orderkey", $"promo_id",
          ((least($"a_end", $"p_end") - greatest($"a_start", $"p_start"))
            .cast("long") / lit(day)).cast("long").as("overlap_days"))
    },

    // ---- triangle counting over the part co-purchase affinity graph —
    // the local-clustering primitive next to PageRank (global
    // importance) and ConnectedComponents (reachability). Edges: two
    // SAME-BRAND parts co-occurring in ≥1 order (the brand constraint
    // is the affinity-graph definition — without it random co-occurrence
    // makes every part pair an edge and clustering is meaningless noise;
    // with it the graph is 25 brand-local subgraphs). The scale
    // algorithm is DEGREE ORIENTATION: direct every edge from its
    // (degree, id)-smaller to its (degree, id)-larger endpoint,
    // enumerate wedges from each node's OUT-neighbors only, close
    // against the oriented edge set. Out-degree is bounded by O(√E) for
    // ANY graph (a node of degree d only points at nodes of degree
    // ≥ d), so the wedge count is Σ d_out² ≤ E^1.5 — the hub that
    // breaks the naive wedge join (d_hub² wedges) contributes almost
    // nothing oriented. Orientation key = deg·2⁴⁰ + node (one BIGINT,
    // portable; node ids < 2⁴⁰ ≈ 10¹², deg < 2²³ — holds through any
    // ScaleUp replication of the 10⁷-stride part keys). Output: top-10
    // parts by triangle participation. ----
    QuerySpec.sql("q127_triangles",
      """WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p, pt.p_brand AS br
        |            FROM lineitem JOIN part pt ON pt.p_partkey = l_partkey),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM pp a JOIN pp b ON b.o = a.o AND a.p < b.p AND b.br = a.br),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY node),
        |ok AS (SELECT node, deg * 1099511627776 + node AS okey FROM deg),
        |oe AS (SELECT CASE WHEN ou.okey < ov.okey THEN e.u ELSE e.v END AS src,
        |              CASE WHEN ou.okey < ov.okey THEN e.v ELSE e.u END AS dst,
        |              CASE WHEN ou.okey < ov.okey THEN ov.okey ELSE ou.okey END AS dkey
        |       FROM e JOIN ok ou ON ou.node = e.u JOIN ok ov ON ov.node = e.v),
        |tri AS (SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
        |        FROM oe w1 JOIN oe w2 ON w2.src = w1.src AND w1.dkey < w2.dkey
        |        WHERE EXISTS (SELECT 1 FROM oe x WHERE x.src = w1.dst AND x.dst = w2.dst)),
        |corners AS (SELECT a AS node FROM tri UNION ALL
        |            SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |SELECT node AS part, CAST(count(*) AS BIGINT) AS n_tri
        |FROM corners GROUP BY node
        |ORDER BY n_tri DESC, part LIMIT 10""".stripMargin) { (s, d) =>
      val pp = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select($"p_partkey", $"p_brand".as("br"))), $"p_partkey" === $"l_partkey")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p"), $"br").distinct()
      val e = pp.as("a").join(pp.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p") &&
            col("b.br") === col("a.br"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
        .transform(graft.Materialize(_)) // reused 3× (deg + both wedge sides)
      val deg = e.select(explode(array($"u", $"v")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      val ok = deg.select($"node", ($"deg" * 1099511627776L + $"node").as("okey"))
      val oe = e
        .join(ok.select($"node".as("u"), $"okey".as("uk")), "u")
        .join(ok.select($"node".as("v"), $"okey".as("vk")), "v")
        .select(when($"uk" < $"vk", $"u").otherwise($"v").as("src"),
          when($"uk" < $"vk", $"v").otherwise($"u").as("dst"),
          greatest($"uk", $"vk").as("dkey"))
        .transform(graft.Materialize(_)) // reused 3× (two wedge sides + closing semi-join)
      val tri = oe.as("w1").join(oe.as("w2"),
          col("w2.src") === col("w1.src") && col("w1.dkey") < col("w2.dkey"))
        .select(col("w1.src").as("a"), col("w1.dst").as("b"), col("w2.dst").as("c"))
        .join(oe.select($"src".as("b"), $"dst".as("c")), Seq("b", "c"), "left_semi")
      // ONE wedge enumeration, not three: the old unionAll of
      // tri.select(a)/(b)/(c) re-executed the whole wedge join + closing
      // semi-join per branch (three SortMergeJoin subtrees in the r10
      // before-plan) — explode(array(a,b,c)) emits the same corner
      // multiset from a single pass (r10, guide §2.4)
      tri.select(explode(array($"a", $"b", $"c")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("n_tri"))
        .select($"node".as("part"), $"n_tri")
        .orderBy($"n_tri".desc, $"part").limit(10)
    },

    // ---- global sequence through the PURE-SQL surface: the prefix
    // op's SQL form IS the plain global window — no TVF needed, because
    // RewriteGlobalRankWindow rewrites any spark.sql global
    // row_number() to the distributed DistributedRankExec (range
    // shuffle + per-partition offsets; never a single-task window —
    // plan-gated in GlobalSeqSpec, here gated end-to-end from SQL
    // text). Ordering key (n_chars, doc_id) matches the z-order/packing
    // pipelines' layout key. ----
    // No trailing ORDER BY: the gate is order-insensitive and the output is
    // one row per document, so a presentational sort would add a corpus-sized
    // range exchange at scale (same discipline as q57/q71).
    QuerySpec.sql("q150_sql_global_seq",
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS seq
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).createOrReplaceTempView("graft_q150_docs")
      s.sql("""SELECT doc_id,
              |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS seq
              |FROM graft_q150_docs""".stripMargin)
    }
  )

}
