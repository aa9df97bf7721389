package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Events, Tables}
import graft.operators.{AsOfJoin, Windows}

/** The reference's event-stream semantics (SURVEY §2.1 L1 + §2.2 L2)
  * re-expressed as declarative Spark plans over the driver's `events`
  * fixture (`event_id, ts, user_id, event_type, value, props`), each with a
  * DuckDB oracle:
  *
  *  - replay ordering / FIFO tie-breaks  → explicit (ts, event_id) sort keys
  *    (reference processor.py:61-62,96-97)
  *  - call_later / timer                 → synthetic derived rows + sequence()
  *    (processor.py:41-62, 140-150)
  *  - merge_timeseries (both semantics)  → zip-join / ordered union
  *    (examples/common.py:18-22)
  *  - last-value combine, as-of join     → union + last(ignoreNulls) window
  *    (e3_show_graph.py:11-29, e4_trade_pnl.py:51-63)
  *  - running aggregation                → unbounded-preceding window
  *    (e2_ticking.py:10-27)
  *  - sliding/tumbling VWAP              → window() grouping (e2_stats.py:35-65)
  *  - sessionization, first-seen dedup   → session_window / ranked dedup
  *    (e5_retail_cart.py, examples/common.py:25-34)
  *
  * Event streams are modelled as filtered sub-streams of `events`
  * (event_type = 'purchase' plays "trades", 'view' plays "quotes", …) so
  * every query is oracle-checkable on the driver's own fixtures.
  *
  * Timestamps are emitted as epoch microseconds (`unix_micros` /
  * DuckDB `epoch_us`) — integer, no format/zone ambiguity. Running double
  * sums go through DECIMAL so partial-aggregation order cannot drift
  * (see [[QuerySpec]] numeric discipline).
  */
object AspSemantics {

  /** DuckDB-side cast: events.ts is parquet timestamp[ns]; normalize both
    * engines to plain microsecond epoch. */
  private val tsUs = "epoch_us(CAST(ts AS TIMESTAMP))"

  /** q132 machine I/O (top-level so Spark derives Encoders). */
  final case class EmaIn(user_id: Long, ts_us: Long, event_id: Long, xq: Long)
  final case class EmaOut(user_id: Long, ts_us: Long, event_id: Long, ema: Long)

  /** q133 machine output: one row per CLOSED position. */
  final case class TradeOut(user_id: Long, ts_us: Long, event_id: Long,
                            entry_xq: Long, exit_xq: Long, pnl: Long)

  /** q141 spliced-replay I/O (integer cents domain — see q141). */
  final case class SpliceIn(user_id: Long, ts_us: Long, event_id: Long, cents: Long)
  final case class SpliceOut(user_id: Long, ts_us: Long, event_id: Long,
                             run_cents: Long, run_n: Long)

  val specs: Seq[QuerySpec] = Seq(

    // ---- P1/P2 replay: global delivery order with FIFO tie-break ----
    // (single total order = single-task sort by design; keyed form below
    // is the scalable one — SURVEY §1.3.7.)
    QuerySpec.sql("q20_replay_seq",
      s"""SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS seq,
         |  event_id, $tsUs AS ts_us
         |FROM events""".stripMargin) { (s, d) =>
      // r10 sweep: trailing presentational sorts on data-proportional
      // outputs dropped query-and-oracle together across this module —
      // the gate hashes order-insensitively, and each one was a full
      // range exchange of the result at scale (guide §2.4).
      Events.replaySeq(Tables.events(s, d))
        .select($"seq".cast("long").as("seq"), $"event_id", unix_micros($"ts").as("ts_us"))
    },

    // ---- per-key delivery order (scalable: shuffles once on the key) ----
    QuerySpec.sql("q21_keyed_seq",
      s"""SELECT user_id,
         |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq,
         |  event_id, $tsUs AS ts_us
         |FROM events""".stripMargin) { (s, d) =>
      Events.keyedSeq(Tables.events(s, d), "user_id")
        .select($"user_id", $"seq".cast("long").as("seq"), $"event_id", unix_micros($"ts").as("ts_us"))
    },

    // ---- P3 call_later: derived timer rows at ts+5min, event_time = due
    // time, interleaved with the base stream (processor.py:57-60) ----
    QuerySpec.sql("q22_call_later",
      s"""SELECT kind, event_id, due_us FROM (
         |  SELECT 'event' AS kind, event_id, $tsUs AS due_us FROM events
         |  UNION ALL
         |  SELECT 'timer_5m' AS kind, event_id,
         |    epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE) AS due_us FROM events
         |)""".stripMargin) { (s, d) =>
      Events.callLater(Tables.events(s, d), expr("INTERVAL 5 MINUTES"), "timer_5m")
        .select($"kind", $"event_id", unix_micros($"ts").as("due_us"))
    },

    // ---- P6 timer: first tick at start+step, every step, while <= end —
    // exactly the reference tick count semantics (tests/test_past.py:104-119) ----
    QuerySpec.sql("q23_timer_ticks",
      """SELECT epoch_us(tick_ts) AS tick_us FROM (
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 6 HOUR,
        |    TIMESTAMP '2024-01-31 00:00:00', INTERVAL 6 HOUR)) AS tick_ts
        |) ORDER BY tick_us""".stripMargin) { (s, d) =>
      Events.timerTicks(s,
          to_timestamp(lit("2024-01-01 00:00:00")),
          to_timestamp(lit("2024-01-31 00:00:00")),
          expr("INTERVAL 6 HOURS"))
        .select(unix_micros($"tick_ts").as("tick_us"))
        .orderBy($"tick_us")
    },

    // ---- P11 faithful positional zip-merge: k-th click with k-th view,
    // stamped with the FIRST stream's timestamp, truncated to the shorter
    // stream (examples/common.py:18-22, verified semantics SURVEY P11) ----
    QuerySpec.sql("q24_zip_merge",
      s"""WITH clicks AS (
         |  SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS k,
         |    $tsUs AS ts_us, value FROM events WHERE event_type = 'click'),
         |views AS (
         |  SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS k,
         |    value FROM events WHERE event_type = 'view')
         |SELECT c.k AS k, c.ts_us AS ts_us, c.value AS click, v.value AS view
         |FROM clicks c JOIN views v ON c.k = v.k""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      Events.zipMerge(Seq(
          "click" -> ev.filter($"event_type" === "click"),
          "view"  -> ev.filter($"event_type" === "view")))
        .select($"k".cast("long").as("k"), unix_micros($"ts").as("ts_us"),
          $"click", $"view")
    },

    // ---- P11 intended time-ordered merge + W5 last-value combine:
    // bid=purchase, ask=error; spread = ask - bid once both sides seen
    // (e3_show_graph.py:11-29: "Calculator.spread") ----
    QuerySpec.sql("q25_last_value_combine",
      s"""WITH merged AS (
         |  SELECT ts, event_id, value AS bid, NULL::DOUBLE AS ask
         |    FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT ts, event_id, NULL::DOUBLE AS bid, value AS ask
         |    FROM events WHERE event_type = 'error'),
         |carried AS (
         |  SELECT $tsUs AS ts_us, event_id,
         |    last_value(bid IGNORE NULLS) OVER w AS bid,
         |    last_value(ask IGNORE NULLS) OVER w AS ask
         |  FROM merged
         |  WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT ts_us, event_id, bid, ask, ask - bid AS spread
         |FROM carried WHERE bid IS NOT NULL AND ask IS NOT NULL""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val merged = Events.timeMerge(Seq(
        "bid" -> ev.filter($"event_type" === "purchase"),
        "ask" -> ev.filter($"event_type" === "error")))
      Events.lastValueCombine(merged, Seq("bid", "ask"))
        .filter($"bid".isNotNull && $"ask".isNotNull)
        .select(unix_micros($"ts").as("ts_us"), $"event_id", $"bid", $"ask",
          ($"ask" - $"bid").as("spread"))
    },

    // ---- W7 as-of join: each purchase sees the most recent view (at or
    // before it) for the same user — e4_trade_pnl.py trades↔quotes.
    // One shuffle on the key; DuckDB's native ASOF JOIN is the oracle. ----
    // The quote side is pre-deduplicated per (user_id, ts) — max_by(value,
    // event_id) — identically in both engines: with duplicate equal-ts
    // quotes both Spark's union+last-value operator and DuckDB's ASOF JOIN
    // pick an *arbitrary* survivor, so the gate would be fixture-dependent
    // without this (ADVICE r1).
    QuerySpec.sql("q26_asof_join",
      s"""SELECT t.event_id AS event_id, t.user_id AS user_id,
         |  epoch_us(CAST(t.ts AS TIMESTAMP)) AS ts_us,
         |  t.value AS trade_value, q.value AS quote_value
         |FROM (SELECT * FROM events WHERE event_type = 'purchase') t
         |ASOF LEFT JOIN (
         |  SELECT user_id, ts, max_by(value, event_id) AS value
         |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) q
         |  ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val trades = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value".as("trade_value"))
      val quotes = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts")
        .agg(max_by($"value", $"event_id").as("quote_value"))
      AsOfJoin.asOf(trades, quotes, Seq("user_id"), "ts", "ts", Seq("quote_value"))
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"trade_value", $"quote_value")
    },

    // ---- W6 running (cumulative) aggregation per key; DECIMAL accumulator
    // so the prefix sums cannot drift between engines ----
    QuerySpec.sql("q27_running_sum",
      s"""SELECT user_id, event_id, $tsUs AS ts_us,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
         |  CAST(count(*) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
         |FROM events""".stripMargin) { (s, d) =>
      val w = Windows.runningFrame(Seq("user_id"), "ts", "event_id")
      Tables.events(s, d)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          sum($"value".cast("decimal(18,2)")).over(w).cast("double").as("running_total"),
          count(lit(1)).over(w).cast("long").as("n_so_far"))
    },

    // ---- W10 tumbling event-time window VWAP: value weighted by the
    // props.k JSON field (e2_stats.py:35-65 without the hand-rolled buffer) ----
    QuerySpec.sql("q28_vwap_tumbling",
      """SELECT epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start_us,
        |  CAST(sum(CAST(value * CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS vwap,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_weight,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY w_start_us HAVING sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) > 0
        |ORDER BY w_start_us""".stripMargin) { (s, d) =>
      val weighted = Tables.events(s, d)
        .withColumn("weight", get_json_object($"props", "$.k").cast("long"))
      Windows.hoppingAgg(weighted, "1 day", "1 day", Nil,
          Seq(
            (sum(($"value" * $"weight").cast("decimal(18,2)")).cast("double") /
              sum($"weight").cast("double")).as("vwap"),
            sum($"weight").cast("long").as("total_weight"),
            count(lit(1)).as("n_events")))
        .filter($"total_weight" > 0)
        .select(unix_micros($"window.start").as("w_start_us"),
          $"vwap", $"total_weight", $"n_events")
        .orderBy($"w_start_us")
    },

    // ---- W10 sliding (hopping) window: width 2 days, slide 1 day — each
    // event lands in exactly 2 windows; Spark expands map-side and
    // partial-aggregates before the shuffle ----
    QuerySpec.sql("q29_sliding_window",
      """SELECT epoch_us(w_start) AS w_start_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(*) AS n_events
        |FROM (
        |  SELECT unnest([date_trunc('day', CAST(ts AS TIMESTAMP)),
        |                 date_trunc('day', CAST(ts AS TIMESTAMP)) - INTERVAL 1 DAY]) AS w_start,
        |    value
        |  FROM events)
        |GROUP BY w_start ORDER BY w_start_us""".stripMargin) { (s, d) =>
      Windows.hoppingAgg(Tables.events(s, d), "2 days", "1 day", Nil,
          Seq(sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"),
            count(lit(1)).as("n_events")))
        .select(unix_micros($"window.start").as("w_start_us"),
          $"total_value", $"n_events")
        .orderBy($"w_start_us")
    },

    // ---- session windows: 30-min inactivity gap per user (W8's cart/
    // expiry pattern as sessionization); oracle = gaps-and-islands ----
    QuerySpec.sql("q30_session_window",
      """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN CAST(ts AS TIMESTAMP) >=
        |      lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        + INTERVAL 30 MINUTE
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM islands GROUP BY user_id, sid""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
        .select($"user_id", unix_micros($"session_window.start").as("session_start_us"),
          unix_micros($"session_window.end").as("session_end_us"),
          $"n_events", $"total_value")
    },

    // ---- W1 first-seen dedup (Greeter): deterministic WHICH-row-survives
    // via (ts, event_id) ranking, not dropDuplicates ----
    QuerySpec.sql("q31_first_seen",
      s"""SELECT user_id, event_id, $tsUs AS ts_us, event_type FROM (
         |  SELECT user_id, event_id, ts, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      Windows.firstSeen(Tables.events(s, d), Seq("user_id"))
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"event_type")
    },

    // ---- seen-before annotation (Greeter's "Hello" vs "Hello again"):
    // every event tagged with its per-key visit number ----
    QuerySpec.sql("q32_greeter",
      s"""SELECT event_id, user_id, $tsUs AS ts_us,
         |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
         |    THEN 'hello' ELSE 'hello_again' END AS greeting
         |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("greeting",
          when(row_number().over(
            Window.partitionBy($"user_id").orderBy($"ts", $"event_id")) === 1,
            "hello").otherwise("hello_again"))
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"greeting")
    },

    // ---- P7 unpack_kwargs: dict payload → struct → column expansion
    // (processor.py:153-166; the `$"value.*"` mapping of SURVEY §1.4) ----
    QuerySpec.sql("q33_struct_unpack",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select($"event_id",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("payload"))
        .select($"event_id", $"payload.*") // struct expansion = unpack_kwargs
    },

    // ---- positional unpack: the tuple → positional-args form of
    // `unpack_args` (reference processor.py:153-166, tested
    // tests/test_past.py:45-68) — the sibling of q33's kwargs/struct
    // form. The payload is an ORDERED collection; each positional slot
    // becomes a named argument by element index (element_at is 1-based
    // in both engines). Pure per-row projection — no shuffle. ----
    QuerySpec.sql("q63_unpack_positional",
      """SELECT event_id, pay[1] AS arg1, pay[2] AS arg2
        |FROM (SELECT event_id, [event_type, CAST(user_id AS VARCHAR)] AS pay
        |      FROM events)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select($"event_id", array($"event_type", $"user_id".cast("string")).as("pay"))
        .select($"event_id",
          element_at($"pay", 1).as("arg1"), // positional expansion =
          element_at($"pay", 2).as("arg2")) // unpack_args
    },

    // ---- distinct / sort-based aggregation over the stream ----
    QuerySpec.sql("q34_distinct_agg",
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").cast("long").as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    },

    // ---- custom typed UDAF surface: `Aggregator[IN, BUF, OUT]` — the
    // reference's MovingAverage object (e2_stats.py:35-65) as a real
    // Catalyst two-phase aggregate (partial reduce map-side, merge after
    // the shuffle; one small decimal buffer per group per partition).
    // Exact-decimal accumulation keeps it bit-identical to the oracle. ----
    QuerySpec.sql("q35_typed_udaf",
      """SELECT event_type,
        |  CAST(sum(CAST(value * k AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(sum(CAST(k AS DECIMAL(18,2))) AS DOUBLE) AS vwap,
        |  CAST(sum(k) AS BIGINT) AS total_weight
        |FROM (SELECT event_type, value,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |WHERE k IS NOT NULL AND k > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val wm = udaf(graft.functions.TypedAggs.WeightedMean)
      Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .filter($"k".isNotNull && $"k" > 0)
        .groupBy($"event_type")
        .agg(wm($"value", $"k").as("wm"))
        .select($"event_type", $"wm.vwap".as("vwap"),
          $"wm.total_weight".as("total_weight"))
        .orderBy($"event_type")
    },

    // ---- time-series resample to a regular grid with forward-fill: the
    // reference's timer grid (P6) + last-value combine (W5) composed —
    // downsampling a tick stream to daily marks. Grid = users × days
    // (broadcast bounds, one explode), fill = the as-of operator (one
    // shuffle on user_id). The quote side is (user_id, ts)-deduped for
    // determinism, as in q26. ----
    QuerySpec.sql("q36_resample",
      """WITH b AS (SELECT date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS mn,
        |                  date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS mx FROM events),
        |grid AS (SELECT u.user_id, unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY)) AS gts
        |         FROM (SELECT DISTINCT user_id FROM events) u, b),
        |q AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max_by(value, event_id) AS value
        |      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT g.user_id AS user_id, epoch_us(g.gts) AS grid_us, q.value AS value
        |FROM grid g ASOF LEFT JOIN q ON g.user_id = q.user_id AND g.gts >= q.ts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val bounds = ev.agg(date_trunc("day", min($"ts")).as("mn"),
        date_trunc("day", max($"ts")).as("mx"))
      val grid = ev.select($"user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select($"user_id",
          explode(sequence($"mn", $"mx", expr("interval 1 day"))).as("gts"))
      val quotes = ev.groupBy($"user_id", $"ts")
        .agg(max_by($"value", $"event_id").as("value"))
      AsOfJoin.asOf(grid, quotes, Seq("user_id"), "gts", "ts", Seq("value"))
        .select($"user_id", unix_micros($"gts").as("grid_us"), $"value")
    },

    // ---- exact interpolated percentiles per group (Spark `percentile` ≡
    // DuckDB `quantile_cont`, both linear interpolation over the sorted
    // group). Exact quantiles imply a per-group sort — at 100 TB use
    // `approx_percentile` (t-digest style, mergeable map-side sketch); the
    // exact form is the oracle-checkable baseline. ----
    QuerySpec.sql("q37_percentile",
      """SELECT event_type,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(percentile($"value", lit(0.25)).as("p25"),
          percentile($"value", lit(0.5)).as("p50"),
          percentile($"value", lit(0.9)).as("p90"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    },

    // ---- sketch percentile — the 100 TB path q37's exact form is traded
    // against: `approx_percentile` (Greenwald-Khanna, mergeable partial
    // sketches, bounded state per group vs exact percentile's full-sort).
    // SELF-VALIDATING gate (the q52 discipline): the raw estimates are
    // engine-specific (GK here, t-digest in DuckDB), so each engine
    // checks its OWN median estimate against the SAME exact median and
    // emits a within_bound flag. Bound: 5% relative value error — GK at
    // accuracy 1000 (ε=0.1% rank) and t-digest are both far inside it on
    // any non-pathological distribution; deterministic per engine, so
    // once green the gate stays green. Hashed columns: (event_type,
    // p50_exact, n, within_bound). ----
    QuerySpec.sql("q62_approx_percentile",
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50_exact,
        |  count(*) AS n,
        |  CAST(CASE WHEN abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
        |         <= 0.05 * abs(quantile_cont(value, 0.5))
        |       THEN 1 ELSE 0 END AS BIGINT) AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          approx_percentile($"value", lit(0.5), lit(1000)).as("est"),
          percentile($"value", lit(0.5)).as("p50_exact"),
          count(lit(1)).as("n"))
        .select($"event_type", $"p50_exact", $"n",
          when(abs($"est" - $"p50_exact") <= lit(0.05) * abs($"p50_exact"), 1L)
            .otherwise(0L).as("within_bound"))
        .orderBy($"event_type")
    },

    // ---- histogram binning: fixed-width value buckets per event_type —
    // one hash aggregation over (type, bin); bin edges via exact integer
    // floor so both engines bucket identically ----
    QuerySpec.sql("q38_histogram",
      """SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bin_min,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bin_max
        |FROM events GROUP BY event_type, bin ORDER BY event_type, bin""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy($"event_type", floor($"value" / 5.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          min($"value".cast("decimal(18,2)")).cast("double").as("bin_min"),
          max($"value".cast("decimal(18,2)")).cast("double").as("bin_max"))
        .orderBy($"event_type", $"bin")
    },

    // ---- lead/lag/ntile window surface: per-user inter-event gaps and
    // activity quartiles. One shuffle on user_id; the navigation
    // functions are frame-free (no buffering beyond the sorted
    // partition), ntile needs only the partition count — all scale as
    // plain per-key windows. ----
    QuerySpec.sql("q84_lead_lag",
      """SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
        |  lead(event_id) OVER w AS next_event,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"event_id",
          (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
          lead($"event_id", 1).over(w).as("next_event"),
          ntile(4).over(w).cast("long").as("quartile"))
    },

    // ---- windowed (TTL'd) dedup: first event per (user, type) per hour.
    // Deliberately NOT a row_number window: `min(struct(ts, event_id))`
    // is an algebraic aggregate, so it partial-aggregates map-side before
    // the shuffle — at 100 TB the shuffle carries one row per
    // (user, type, hour), not every event, and no per-group sort exists.
    // This is the batch form of streaming dedup-with-TTL
    // (`dropDuplicatesWithinWatermark`): state per key is bounded by the
    // window, the reference's unbounded first-seen set (W1) made safe for
    // endless streams. ----
    QuerySpec.sql("q86_hourly_dedup",
      s"""SELECT user_id, event_type,
         |  epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
         |  event_id, $tsUs AS ts_us FROM (
         |  SELECT user_id, event_type, ts, event_id,
         |    row_number() OVER (
         |      PARTITION BY user_id, event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
         |      ORDER BY ts, event_id) AS rn
         |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type", date_trunc("hour", $"ts").as("hour"))
        .agg(min(struct($"ts", $"event_id")).as("w"))
        .select($"user_id", $"event_type", unix_micros($"hour").as("hour_us"),
          $"w.event_id".as("event_id"), unix_micros($"w.ts").as("ts_us"))
    },

    // ---- linear-interpolation resample: q36's daily grid, but each grid
    // point blends its two neighbor observations instead of holding the
    // last one flat. `AsOfJoin.asOfNeighbors` finds BOTH neighbors in the
    // one-shuffle union pass (backward + forward frames share one sort /
    // one WindowExec); the blend itself is per-row arithmetic whose IEEE
    // shape is written identically in both engines. Edges extrapolate
    // flat from the available side. ----
    QuerySpec.sql("q88_interpolate",
      """WITH b AS (SELECT date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS mn,
        |                  date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS mx FROM events),
        |grid AS (SELECT u.user_id, unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY)) AS gts
        |         FROM (SELECT DISTINCT user_id FROM events) u, b),
        |q AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max_by(value, event_id) AS value
        |      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |prev AS (SELECT g.user_id, g.gts, q.ts AS t0, q.value AS v0
        |         FROM grid g ASOF LEFT JOIN q ON g.user_id = q.user_id AND g.gts >= q.ts),
        |nxt AS (SELECT g.user_id, g.gts, q.ts AS t1, q.value AS v1
        |        FROM grid g ASOF LEFT JOIN q ON g.user_id = q.user_id AND g.gts < q.ts)
        |SELECT p.user_id AS user_id, epoch_us(p.gts) AS grid_us,
        |  epoch_us(p.t0) AS prev_us, epoch_us(n.t1) AS next_us,
        |  CASE WHEN p.t0 IS NULL THEN n.v1 WHEN n.t1 IS NULL THEN p.v0
        |       ELSE p.v0 + (n.v1 - p.v0) *
        |         (CAST(epoch_us(p.gts) - epoch_us(p.t0) AS DOUBLE)
        |          / CAST(epoch_us(n.t1) - epoch_us(p.t0) AS DOUBLE)) END AS value
        |FROM prev p JOIN nxt n ON n.user_id = p.user_id AND n.gts = p.gts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val bounds = ev.agg(date_trunc("day", min($"ts")).as("mn"),
        date_trunc("day", max($"ts")).as("mx"))
      val grid = ev.select($"user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select($"user_id",
          explode(sequence($"mn", $"mx", expr("interval 1 day"))).as("gts"))
      val quotes = ev.groupBy($"user_id", $"ts")
        .agg(max_by($"value", $"event_id").as("value"))
      AsOfJoin.asOfNeighbors(grid, quotes, Seq("user_id"), "gts", "ts", "value")
        .select($"user_id", unix_micros($"gts").as("grid_us"),
          unix_micros($"t0").as("prev_us"), unix_micros($"t1").as("next_us"),
          when($"t0".isNull, $"v1").when($"t1".isNull, $"v0")
            .otherwise($"v0" + ($"v1" - $"v0") *
              ((unix_micros($"gts") - unix_micros($"t0")).cast("double") /
               (unix_micros($"t1") - unix_micros($"t0")).cast("double")))
            .as("value"))
    },

    // ---- broadcast as-of join: q26's semantics, ZERO shuffle of the
    // probe stream. The quote side packs into per-key sorted arrays and
    // broadcasts; each trade resolves its as-of quote with a codegen'd
    // binary search (`asof_pick`). The 100 TB shape when the reference
    // side is dimension-sized — the fact stream never moves. Oracle =
    // the same DuckDB ASOF LEFT JOIN as q26, proving the two operator
    // forms implement one semantics. ----
    QuerySpec.sql("q90_asof_broadcast",
      s"""SELECT t.event_id AS event_id, t.user_id AS user_id,
         |  epoch_us(CAST(t.ts AS TIMESTAMP)) AS ts_us,
         |  t.value AS trade_value, q.value AS quote_value
         |FROM (SELECT * FROM events WHERE event_type = 'purchase') t
         |ASOF LEFT JOIN (
         |  SELECT user_id, ts, max_by(value, event_id) AS value
         |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) q
         |  ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val trades = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value".as("trade_value"))
      val quotes = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts")
        .agg(max_by($"value", $"event_id").as("quote_value"))
      AsOfJoin.asOfBroadcast(trades, quotes, Seq("user_id"), "ts", "ts", "quote_value")
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"trade_value", $"quote_value")
    },

    // ---- ordered-step funnel: view → click-after-view →
    // purchase-after-that-click, per user, then stage totals +
    // conversion rates. Each stage is one conditional aggregation
    // joined against the previous stage's per-user anchor time — three
    // shuffles on user_id total (and the per-user anchor tables are
    // dimension-sized, so at 100 TB stages 2/3 are broadcast joins
    // against the full event stream, which never moves). ----
    QuerySpec.sql("q93_funnel",
      """WITH s1 AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t1
        |  FROM events GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s2.t2
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT CAST(count(t1) AS BIGINT) FROM s1) AS n_view,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_after,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_after,
        |  CAST((SELECT count(*) FROM s2) AS DOUBLE)
        |    / CAST((SELECT count(t1) FROM s1) AS DOUBLE) AS click_rate,
        |  CAST((SELECT count(*) FROM s3) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM s2) AS DOUBLE) AS purchase_rate""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val s1 = ev.groupBy($"user_id")
        .agg(min(when($"event_type" === "view", $"ts")).as("t1"))
      val s2 = ev.filter($"event_type" === "click")
        .join(broadcast(s1), "user_id")
        .filter($"ts" >= $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val s3 = ev.filter($"event_type" === "purchase")
        .join(broadcast(s2), "user_id")
        .filter($"ts" >= $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      val a = s1.agg(count($"t1").as("n_view"))
      val b = s2.agg(count(lit(1)).as("n_click_after"))
      val c = s3.agg(count(lit(1)).as("n_purchase_after"))
      a.crossJoin(b).crossJoin(c)
        .select($"n_view", $"n_click_after", $"n_purchase_after",
          ($"n_click_after".cast("double") / $"n_view".cast("double")).as("click_rate"),
          ($"n_purchase_after".cast("double") / $"n_click_after".cast("double")).as("purchase_rate"))
    },

    // ---- cohort retention: users grouped by first-seen week; cell
    // (cohort, k) = how many returned k weeks later. Two aggregations
    // and one broadcast of the per-user cohort table — the event stream
    // is read once and never shuffled on anything but (cohort, k)
    // group keys. ----
    QuerySpec.sql("q94_retention",
      """WITH firsts AS (SELECT user_id,
        |    date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort
        |  FROM events GROUP BY user_id),
        |activity AS (SELECT DISTINCT e.user_id, f.cohort,
        |    CAST(date_diff('week', f.cohort,
        |      date_trunc('week', CAST(e.ts AS TIMESTAMP))) AS BIGINT) AS k
        |  FROM events e JOIN firsts f ON f.user_id = e.user_id),
        |cohort_size AS (SELECT cohort, count(*) AS n_users FROM firsts GROUP BY cohort)
        |SELECT epoch_us(a.cohort) AS cohort_us, a.k AS k,
        |  CAST(count(*) AS BIGINT) AS n_active, s.n_users AS n_users,
        |  CAST(count(*) AS DOUBLE) / CAST(s.n_users AS DOUBLE) AS retention
        |FROM activity a JOIN cohort_size s ON s.cohort = a.cohort
        |GROUP BY a.cohort, a.k, s.n_users
        |ORDER BY cohort_us, k""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val firsts = ev.groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("cohort"))
      val activity = ev.join(broadcast(firsts), "user_id")
        .select($"user_id", $"cohort",
          ((unix_date(to_date(date_trunc("week", $"ts"))) -
            unix_date(to_date($"cohort"))) / 7).cast("long").as("k"))
        .distinct()
      val cohortSize = firsts.groupBy($"cohort").agg(count(lit(1)).as("n_users"))
      activity.groupBy($"cohort", $"k")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(cohortSize), "cohort")
        .select(unix_micros($"cohort").as("cohort_us"), $"k", $"n_active", $"n_users",
          ($"n_active".cast("double") / $"n_users".cast("double")).as("retention"))
        .orderBy($"cohort_us", $"k")
    },

    // ---- event-sequence transition counts (first-order Markov view):
    // per user, consecutive event-type pairs in (ts, event_id) order,
    // counted corpus-wide with the per-source transition probability.
    // One lag window per key + one aggregation — the sequence-mining
    // primitive behind session-path and next-action analyses. ----
    QuerySpec.sql("q95_transitions",
      """WITH seq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |cnt AS (SELECT prev AS from_type, event_type AS to_type, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type),
        |tot AS (SELECT from_type, sum(n) AS n_from FROM cnt GROUP BY from_type)
        |SELECT c.from_type AS from_type, c.to_type AS to_type, c.n AS n,
        |  CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM cnt c JOIN tot t ON t.from_type = c.from_type
        |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val seq0 = Tables.events(s, d)
        .select($"user_id", $"event_type", lag($"event_type", 1).over(w).as("prev"))
      val cnt = seq0.filter($"prev".isNotNull)
        .groupBy($"prev".as("from_type"), $"event_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy($"from_type").agg(sum($"n").as("n_from"))
      cnt.join(broadcast(tot), "from_type")
        .select($"from_type", $"to_type", $"n",
          ($"n".cast("double") / $"n_from".cast("double")).as("p"))
        .orderBy($"from_type", $"to_type")
    },

    // ---- sequence-pattern detection (CEP MATCH_RECOGNIZE-lite): users
    // whose event stream contains the CONSECUTIVE pattern
    // view → click → purchase, with match count and first-match time.
    // The pattern window is two leads over one per-user sort — one
    // shuffle on the key; a pattern of length k costs k−1 leads on the
    // SAME window (no extra shuffle, no self-joins on time). The live
    // form of this shape is a per-key machine (Machines.scala) carrying
    // the last k−1 types as state. ----
    QuerySpec.sql("q112_seq_pattern",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             event_type FROM events),
        |s AS (SELECT user_id, ts, event_type,
        |        lead(event_type, 1) OVER w AS e1,
        |        lead(event_type, 2) OVER w AS e2
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
        |  epoch_us(min(ts)) AS first_us
        |FROM s WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
        |GROUP BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_type",
          lead($"event_type", 1).over(w).as("e1"),
          lead($"event_type", 2).over(w).as("e2"))
        .filter($"event_type" === "view" && $"e1" === "click" &&
          $"e2" === "purchase")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_matches"),
          unix_micros(min($"ts")).as("first_us"))
    },

    // ---- OHLC bars: the market-data resample (reference domain —
    // csp's trade/quote examples live on exactly this shape): per
    // (key, hour) open/high/low/close/volume in ONE two-phase hash
    // aggregation — min_by/max_by are algebraic (partial-aggregate
    // map-side), so no per-key sort and no window. Simultaneous ticks
    // are resolved first by the q36 rule (max event_id wins the
    // timestamp), making ts alone a total order for open/close.
    // DECIMAL bar sum for engine-exact volume-weighted math. ----
    QuerySpec.sql("q113_ohlc_bars",
      """WITH q AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             max_by(value, event_id) AS value
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id, epoch_us(date_trunc('hour', ts)) AS bar_us,
        |  arg_min(value, ts) AS open_v, max(value) AS high_v,
        |  min(value) AS low_v, arg_max(value, ts) AS close_v,
        |  CAST(count(*) AS BIGINT) AS n_ticks,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM q GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ticks = Tables.events(s, d)
        .groupBy($"user_id", $"ts")
        .agg(max_by($"value", $"event_id").as("value"))
      ticks
        .groupBy($"user_id",
          unix_micros(date_trunc("hour", $"ts")).as("bar_us"))
        .agg(min_by($"value", $"ts").as("open_v"),
          max($"value").as("high_v"), min($"value").as("low_v"),
          max_by($"value", $"ts").as("close_v"),
          count(lit(1)).as("n_ticks"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("sum_v"))
    },

    // ---- trailing time-RANGE frame: per event, the sum/count of the
    // key's events in the last hour — a RANGE (value-based) frame over
    // epoch micros, not a ROWS frame and not a grouped window()
    // aggregation: every row gets its own trailing window. One shuffle
    // on the key + per-key sort; the frame is evaluated incrementally
    // (sliding endpoints), not re-scanned per row. DECIMAL accumulator
    // for engine-exact sums. The reference's MovingAverage eviction
    // (e2_stats.py:49-51) is exactly this frame. ----
    QuerySpec.sql("q96_trailing_window",
      s"""SELECT user_id, event_id, $tsUs AS ts_us,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_sum,
         |  CAST(count(*) OVER w AS BIGINT) AS hour_n
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
         |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, d)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          sum($"value".cast("decimal(18,2)")).over(w).cast("double").as("hour_sum"),
          count(lit(1)).over(w).cast("long").as("hour_n"))
    },

    // ---- distribution window functions: percent_rank (rank-1)/(n-1)
    // and cume_dist (peers-at-or-below)/n — the remaining ranking-family
    // members (q11 rank/dense_rank, q84 lead/lag/ntile). Both are exact
    // rational values of integer window state, so the doubles agree
    // bit-for-bit across engines. ----
    QuerySpec.sql("q99_percent_rank",
      """SELECT user_id, event_id,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"event_id",
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    },

    // ---- deterministic array aggregation: each user's event-type
    // sequence packed into ONE array column, ordered by (ts, event_id) —
    // the grouping shape that feeds sequence models (per-document token
    // arrays, per-session action lists). Determinism discipline:
    // collect_list order is partition-dependent, so the list is built
    // from (sortable struct) then sorted — same rows, same array, any
    // cluster layout. The array is serialized to ONE comma-joined string
    // column for the gate: the driver's checker sorts every output
    // column (pandas lexsort) and cannot order list cells, so both
    // engines emit the scalar serialization of the same sorted array. ----
    QuerySpec.sql("q100_event_arrays",
      s"""SELECT user_id,
         |  array_to_string(list(event_type ORDER BY ts, event_id), ',') AS types,
         |  CAST(len(list(event_type ORDER BY ts, event_id)) AS BIGINT) AS n
         |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(expr("array_join(transform(sort_array(collect_list(struct(ts, event_id, event_type))), r -> r.event_type), ',')").as("types"),
          count(lit(1)).as("n"))
    },

    // ---- the SQL TVF surface: `graft_timestamps(start, step, n)`
    // ([[graft.plans.TimestampsTvf]], injected table function — the
    // reference's testing.timestamps generator, testing.py:6-10, for
    // pure-SQL users). The whole query is spark.sql text: a 6-hourly
    // tick grid over January joined to per-bucket event counts — the
    // timer-driven sampling shape (W10) with the grid coming from the
    // TVF instead of Scala. Bucketing is integer (ts-start) DIV step on
    // epoch µs — exact on both engines; the 120-row grid side broadcasts. ----
    QuerySpec.sql("q102_sql_tvf",
      """WITH g AS (
        |  SELECT (1704067200000000 + 21600000000 * i) AS tick_us
        |  FROM range(0, 120) t(i)),
        |b AS (
        |  SELECT 1704067200000000 + 21600000000 *
        |      ((epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) // 21600000000) AS tick_us,
        |    count(*) AS n_events
        |  FROM events
        |  WHERE epoch_us(CAST(ts AS TIMESTAMP)) >= 1704067200000000
        |    AND epoch_us(CAST(ts AS TIMESTAMP)) < 1704067200000000 + 21600000000 * 120
        |  GROUP BY 1)
        |SELECT g.tick_us AS tick_us, CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events
        |FROM g LEFT JOIN b ON b.tick_us = g.tick_us
        |ORDER BY tick_us""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("graft_q102_events")
      s.sql(
        """WITH g AS (
          |  SELECT ts_us AS tick_us
          |  FROM graft_timestamps(1704067200000000, 21600000000, 120)),
          |b AS (
          |  SELECT 1704067200000000 + 21600000000 *
          |      ((unix_micros(ts) - 1704067200000000) DIV 21600000000) AS tick_us,
          |    count(*) AS n_events
          |  FROM graft_q102_events
          |  WHERE unix_micros(ts) >= 1704067200000000
          |    AND unix_micros(ts) < 1704067200000000 + 21600000000 * 120
          |  GROUP BY 1)
          |SELECT g.tick_us AS tick_us, CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events
          |FROM g LEFT JOIN b ON b.tick_us = g.tick_us
          |ORDER BY tick_us""".stripMargin)
    },

    // ---- SCD2 dimension build: the change feed → versioned-dimension
    // op every warehouse pipeline runs. Two steps, ONE shuffle: (1) CDC
    // compaction — drop rows whose attribute equals its predecessor's
    // (lag window), so storage scales with the VERSION count, not the
    // event count; (2) validity intervals — valid_from = change ts,
    // valid_to = next change's ts (lead window over survivors),
    // is_current = no successor. Both windows partition on the dimension
    // key with the same (ts, event_id) tie rule (q36), so Catalyst
    // computes them from one hash exchange + sort. Point-in-time lookups
    // against the result are the q26 as-of join. ----
    QuerySpec.sql("q118_scd2",
      s"""WITH ev AS (SELECT user_id, event_id, $tsUs AS ts_us, event_type
         |            FROM events),
         |chg AS (SELECT *, lag(event_type) OVER
         |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM ev),
         |ver AS (SELECT user_id, event_type, ts_us, event_id FROM chg
         |        WHERE prev IS NULL OR event_type <> prev),
         |scd AS (SELECT user_id, event_type, ts_us AS valid_from,
         |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS vt
         |  FROM ver)
         |SELECT user_id, event_type, valid_from,
         |  coalesce(vt, 9223372036854775807) AS valid_to,
         |  CAST(vt IS NULL AS INT) AS is_current
         |FROM scd""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"event_type")
      graft.operators.Scd2.build(ev, "user_id", "ts_us", "event_id", "event_type")
    },

    // ---- point-in-time read against the SCD2 dimension (q118's
    // output consumed the way a warehouse consumes it): each purchase
    // event looks up the version VALID AT ITS TIMESTAMP via the
    // standard interval predicate — which works unmodified on current
    // versions because the open end is Long.MaxValue, the exact reason
    // for that sentinel. Plan: equi-join on the dimension key carries
    // the interval as a join filter (one hash shuffle on user_id; the
    // per-key version list is small by construction — step 1 of the
    // SCD2 build compacted it). Probes at ts+1µs so ties with a
    // same-instant version change resolve to the new version
    // deterministically. ----
    QuerySpec.sql("q121_pit_join",
      s"""WITH ev AS (SELECT user_id, event_id, $tsUs AS ts_us, event_type
         |            FROM events),
         |chg AS (SELECT *, lag(event_type) OVER
         |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM ev),
         |ver AS (SELECT user_id, event_type, ts_us, event_id FROM chg
         |        WHERE prev IS NULL OR event_type <> prev),
         |scd AS (SELECT user_id, event_type AS attr, ts_us AS valid_from,
         |    coalesce(lead(ts_us) OVER
         |      (PARTITION BY user_id ORDER BY ts_us, event_id),
         |      9223372036854775807) AS valid_to
         |  FROM ver),
         |probes AS (SELECT user_id, event_id, ts_us + 1 AS t
         |  FROM ev WHERE event_type = 'purchase')
         |SELECT p.user_id AS user_id, p.event_id, s.attr,
         |  CAST(count(*) OVER (PARTITION BY p.user_id) AS BIGINT) AS n_lookups
         |FROM probes p JOIN scd s
         |  ON s.user_id = p.user_id
         | AND s.valid_from <= p.t AND p.t < s.valid_to""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"event_type")
      val scd = graft.operators.Scd2
        .build(ev, "user_id", "ts_us", "event_id", "event_type")
        .select($"user_id", $"event_type".as("attr"), $"valid_from", $"valid_to")
      // Both sides share the `ev` lineage: alias them explicitly so the
      // equi-key is unambiguous (unaliased, the analyzer logs a
      // "trivially true equals predicate" and has to rescue the join).
      val probes = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", ($"ts_us" + 1).as("t")).as("p")
      probes.join(scd.as("sc"),
          col("p.user_id") === col("sc.user_id") &&
            col("sc.valid_from") <= col("p.t") && col("p.t") < col("sc.valid_to"))
        .select(col("p.user_id").as("user_id"), $"event_id", $"attr",
          count(lit(1)).over(Window.partitionBy(col("p.user_id")))
            .as("n_lookups"))
    },

    // ---- anomaly detection against the PRIOR day's baseline: per
    // event type, each value's z-score vs yesterday's mean/stddev —
    // the baseline never includes the observation (no self-bias) and
    // the plan is the 100 TB shape: one tiny (type, day) aggregate +
    // a broadcast join back to the events, O(n) total. The obvious
    // alternative — an exact trailing RANGE frame — is O(n·frame) in
    // Spark (SlidingWindowFunctionFrame recomputes the frame per row;
    // measured 4 s at sf0.1 vs 0.5 s for this plan) and serializes
    // each type into one task. Numeric discipline: values quantize to
    // int64 (×1e3, truncate) AND clamp to ±1e6, making the Σx²
    // overflow bound unconditional (needs >9.2e6 rows/day to overflow;
    // unclamped, one huge double would wrap Spark's non-ANSI sum while
    // DuckDB errors — a silent gate divergence); n/Σx/Σx² are exact
    // integers and z is a fixed IEEE sequence on them. ----
    QuerySpec.sql("q122_anomaly",
      s"""WITH q AS (SELECT event_id, event_type, $tsUs AS ts_us,
         |    ($tsUs) // 86400000000 AS day,
         |    LEAST(GREATEST(CAST(trunc(value * 1000) AS BIGINT), -1000000), 1000000) AS xq
         |  FROM events),
         |daystats AS (SELECT event_type, day, count(*) AS n,
         |    sum(xq) AS sx, sum(xq * xq) AS sxx
         |  FROM q GROUP BY event_type, day),
         |z AS (SELECT q.event_id, q.event_type, q.ts_us,
         |    (CAST(q.xq AS DOUBLE) - CAST(b.sx AS DOUBLE) / b.n) /
         |      sqrt(CAST(b.sxx AS DOUBLE) / b.n
         |           - (CAST(b.sx AS DOUBLE) / b.n) * (CAST(b.sx AS DOUBLE) / b.n)) AS z
         |  FROM q JOIN daystats b
         |    ON b.event_type = q.event_type AND b.day = q.day - 1
         |  WHERE b.n >= 30 AND CAST(b.sxx AS DOUBLE) / b.n
         |          - (CAST(b.sx AS DOUBLE) / b.n) * (CAST(b.sx AS DOUBLE) / b.n) > 0)
         |SELECT event_id, event_type, ts_us, z FROM z
         |WHERE z >= 2 OR z <= -2""".stripMargin) { (s, d) =>
      // integer DIV, not `/`: long / long is DOUBLE division in Spark,
      // and its round-to-nearest can cross a day boundary where
      // DuckDB's floor `//` does not (the PageRank discipline)
      val q = Tables.events(s, d)
        .select($"event_id", $"event_type", unix_micros($"ts").as("ts_us"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          least(greatest(($"value" * 1000).cast("long"), lit(-1000000L)),
            lit(1000000L)).as("xq"))
      val daystats = q.groupBy($"event_type".as("b_type"), $"day".as("b_day"))
        .agg(count(lit(1)).as("n"), sum($"xq").as("sx"),
          sum($"xq" * $"xq").as("sxx"))
      val mean = $"sx".cast("double") / $"n"
      val variance = $"sxx".cast("double") / $"n" - mean * mean
      q.join(broadcast(daystats),
          $"b_type" === $"event_type" && $"b_day" === $"day" - 1)
        .filter($"n" >= 30 && variance > 0)
        .select($"event_id", $"event_type", $"ts_us",
          (($"xq".cast("double") - mean) / sqrt(variance)).as("z"))
        .filter($"z" >= 2 || $"z" <= -2)
    },

    // ---- Pearson correlation, exact-integer components — the stats
    // aggregate family (corr/covar). Built-in corr() is a parallel
    // float sum: association order differs between Spark's partial
    // aggregation and DuckDB's serial pass, so the raw value can't
    // hash-gate. Instead BOTH moment sums run on the q122 quantized
    // integer domain (x = trunc(value·100), y = hour-of-day — exact
    // int64 through sf≈1; at 100 TB the same sums ride DECIMAL(38,0)),
    // and corr is derived from the exact integers by ONE identical
    // IEEE expression: num/√(dx·dy) with num = n·Σxy − Σx·Σy,
    // dx = n·Σx² − (Σx)², dy likewise. The integer components are in
    // the output too — a reader can audit the derivation, and any
    // engine recomputing them must match bit-for-bit. One map-side-
    // partial hash aggregation per group; no shuffle beyond it. ----
    QuerySpec.sql("q128_correlation",
      s"""WITH q AS (SELECT event_type,
         |    CAST(trunc(value * 100) AS BIGINT) AS x,
         |    (($tsUs) // 3600000000) % 24 AS y
         |  FROM events),
         |m AS (SELECT event_type, count(*) AS n,
         |    sum(x) AS sx, sum(y) AS sy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
         |  FROM q GROUP BY event_type),
         |mm AS (SELECT event_type, n,
         |    CAST(n * sxy - sx * sy AS BIGINT) AS num,
         |    CAST(n * sxx - sx * sx AS BIGINT) AS dx,
         |    CAST(n * syy - sy * sy AS BIGINT) AS dy
         |  FROM m)
         |SELECT event_type, n, num, dx, dy,
         |  CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) AS corr
         |FROM mm ORDER BY event_type""".stripMargin) { (s, d) =>
      val q = Tables.events(s, d)
        .select($"event_type",
          ($"value" * 100).cast("long").as("x"),
          expr("(unix_micros(ts) DIV 3600000000) % 24").as("y"))
      val m = q.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
          sum($"x" * $"y").as("sxy"))
      val num = $"n" * $"sxy" - $"sx" * $"sy"
      val dx = $"n" * $"sxx" - $"sx" * $"sx"
      val dy = $"n" * $"syy" - $"sy" * $"sy"
      m.select($"event_type", $"n",
          num.cast("long").as("num"), dx.cast("long").as("dx"),
          dy.cast("long").as("dy"),
          (num.cast("double") / sqrt(dx.cast("double") * dy.cast("double")))
            .as("corr"))
        .orderBy($"event_type")
    },

    // ---- TWAP (time-weighted average) — W10's other half: VWAP
    // (q28/q29) weights by traded volume, TWAP weights each observation
    // by HOW LONG it was the live value — the mark a position is carried
    // at between updates. Per (user, day): each event holds from its ts
    // until the next event or day end (so sparse updates aren't
    // over-counted and the day's tail is covered); twap = Σ value·dur /
    // Σ dur. All weights are exact integer µs and values ride the q122
    // ×1000 quantization, so numerator/denominator are exact int64 on
    // both engines and the division is one IEEE op. One hash shuffle on
    // user_id: the lead window and the aggregation share it. ----
    QuerySpec.sql("q131_twap",
      s"""WITH ev AS (SELECT user_id,
         |    $tsUs AS ts_us, ($tsUs) // 86400000000 AS day,
         |    CAST(trunc(value * 1000) AS BIGINT) AS xq, event_id
         |  FROM events),
         |held AS (SELECT user_id, day, xq,
         |    coalesce(lead(ts_us) OVER (PARTITION BY user_id, day
         |        ORDER BY ts_us, event_id),
         |      (day + 1) * 86400000000) - ts_us AS dur_us
         |  FROM ev)
         |SELECT user_id, day, count(*) AS n,
         |  CAST(sum(xq * dur_us) AS BIGINT) AS num,
         |  CAST(sum(dur_us) AS BIGINT) AS den,
         |  CAST(CAST(sum(xq * dur_us) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(dur_us) AS BIGINT) AS DOUBLE) / 1000.0 AS twap
         |FROM held GROUP BY user_id, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"user_id", $"day").orderBy($"ts_us", $"event_id")
      val ev = Tables.events(s, d)
        .select($"user_id", unix_micros($"ts").as("ts_us"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          ($"value" * 1000).cast("long").as("xq"), $"event_id")
      ev.withColumn("dur_us",
          coalesce(lead($"ts_us", 1).over(w), ($"day" + 1) * lit(86400000000L)) - $"ts_us")
        .groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n"),
          sum($"xq" * $"dur_us").cast("long").as("num"),
          sum($"dur_us").cast("long").as("den"))
        .select($"user_id", $"day", $"n", $"num", $"den",
          ($"num".cast("double") / $"den".cast("double") / 1000.0).as("twap"))
    },

    // ---- integer EMA THROUGH THE REPLAY MACHINE, under the hash gate:
    // an exponential moving average is inherently RECURSIVE (each output
    // depends on the previous one), so no window frame expresses it —
    // exactly the shape the reference's per-key callback model exists
    // for. Until now the machine path (Replay.run: one hash shuffle +
    // secondary sort + streamed per-key machines) was gated indirectly
    // (q20/q21 order contracts) and spec-gated (golden timelines); here
    // the MACHINE'S per-row state evolution is hash-compared against a
    // DuckDB recursive CTE replaying the identical recurrence. α = 1/2
    // on the ×1000-quantized integer domain with floor division
    // (Math.floorDiv ≡ DuckDB `//`) — bit-exact, no float drift over
    // any sequence length. Scale: the machine form is the 100 TB path
    // (per-key linear state, one shuffle); the recursive CTE is the
    // fixture-sized test harness (the q64 closure discipline). ----
    QuerySpec.sql("q132_ema_machine",
      s"""WITH RECURSIVE ev AS (SELECT user_id, event_id, $tsUs AS ts_us,
         |    CAST(trunc(value * 1000) AS BIGINT) AS xq
         |  FROM events),
         |seqd AS (SELECT user_id, event_id, ts_us, xq,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
         |  FROM ev),
         |ema AS (
         |  SELECT user_id, event_id, ts_us, rn, xq AS ema FROM seqd WHERE rn = 1
         |  UNION ALL
         |  SELECT s.user_id, s.event_id, s.ts_us, s.rn, (e.ema + s.xq) // 2
         |  FROM ema e JOIN seqd s ON s.user_id = e.user_id AND s.rn = e.rn + 1)
         |SELECT user_id, ts_us, event_id, ema FROM ema""".stripMargin) { (s, d) =>
      // explicit Encoders (spark.implicits' StringToColumn would clash
      // with the package-level $ interpolator)
      implicit val inEnc: org.apache.spark.sql.Encoder[EmaIn] =
        org.apache.spark.sql.Encoders.product[EmaIn]
      implicit val outEnc: org.apache.spark.sql.Encoder[EmaOut] =
        org.apache.spark.sql.Encoders.product[EmaOut]
      val ds = Tables.events(s, d)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
          ($"value" * 1000).cast("long").as("xq"))
        .as[EmaIn]
      graft.streaming.Replay.run(ds, "user_id", "ts_us", "event_id")(
          _.user_id, _.ts_us) { _ =>
          new graft.streaming.KeyedStateMachine[Long, EmaIn, EmaOut] {
            private var ema = 0L
            private var seeded = false
            def onEvent(ts: Long, e: EmaIn,
                        ctx: graft.streaming.ReplayCtx[EmaOut]): Unit = {
              ema = if (!seeded) { seeded = true; e.xq }
                    else Math.floorDiv(ema + e.xq, 2)
              ctx.emit(EmaOut(e.user_id, e.ts_us, e.event_id, ema))
            }
          }
        }
        .toDF()
    },

    // ---- threshold-triggered position machine under the hash gate —
    // the W8/W9 SHAPE (state whose transitions depend on state) that was
    // previously only spec-gated (golden cart timelines), now
    // oracle-compared row-for-row: over each user's purchase stream,
    // enter a position when the price drops below 30.0, exit on take-
    // profit (+10.0) or stop-loss (−5.0), emit one row per CLOSED trade.
    // Entry/exit decisions depend on the held entry price — recursive
    // state, inexpressible as a window frame, natural as a machine. The
    // oracle carries (entry) through a recursive CTE with the identical
    // integer thresholds (×1000 domain). Re-entry is allowed from the
    // NEXT event after an exit (machine and CTE agree by construction).
    // Scale: same Replay.run layout as q132 — one shuffle, per-key
    // linear; the recursive CTE is the fixture-sized harness. ----
    QuerySpec.sql("q133_position_machine",
      s"""WITH RECURSIVE ev AS (SELECT user_id, event_id, $tsUs AS ts_us,
         |    CAST(trunc(value * 1000) AS BIGINT) AS xq
         |  FROM events WHERE event_type = 'purchase'),
         |seqd AS (SELECT user_id, event_id, ts_us, xq,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
         |  FROM ev),
         |st AS (
         |  SELECT user_id, rn, ts_us, event_id, xq,
         |    CASE WHEN xq < 30000 THEN xq ELSE CAST(NULL AS BIGINT) END AS entry,
         |    CAST(NULL AS BIGINT) AS closed_entry,
         |    CAST(NULL AS BIGINT) AS exit_xq
         |  FROM seqd WHERE rn = 1
         |  UNION ALL
         |  SELECT s.user_id, s.rn, s.ts_us, s.event_id, s.xq,
         |    CASE
         |      WHEN p.entry IS NOT NULL
         |           AND (s.xq >= p.entry + 10000 OR s.xq <= p.entry - 5000)
         |        THEN CAST(NULL AS BIGINT)
         |      WHEN p.entry IS NOT NULL THEN p.entry
         |      WHEN s.xq < 30000 THEN s.xq
         |      ELSE CAST(NULL AS BIGINT) END AS entry,
         |    CASE WHEN p.entry IS NOT NULL
         |           AND (s.xq >= p.entry + 10000 OR s.xq <= p.entry - 5000)
         |      THEN p.entry ELSE CAST(NULL AS BIGINT) END AS closed_entry,
         |    CASE WHEN p.entry IS NOT NULL
         |           AND (s.xq >= p.entry + 10000 OR s.xq <= p.entry - 5000)
         |      THEN s.xq ELSE CAST(NULL AS BIGINT) END AS exit_xq
         |  FROM st p JOIN seqd s ON s.user_id = p.user_id AND s.rn = p.rn + 1)
         |SELECT user_id, ts_us, event_id,
         |  closed_entry AS entry_xq, exit_xq,
         |  exit_xq - closed_entry AS pnl
         |FROM st WHERE exit_xq IS NOT NULL""".stripMargin) { (s, d) =>
      implicit val inEnc: org.apache.spark.sql.Encoder[EmaIn] =
        org.apache.spark.sql.Encoders.product[EmaIn]
      implicit val outEnc: org.apache.spark.sql.Encoder[TradeOut] =
        org.apache.spark.sql.Encoders.product[TradeOut]
      val ds = Tables.events(s, d)
        .filter($"event_type" === "purchase")
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
          ($"value" * 1000).cast("long").as("xq"))
        .as[EmaIn]
      graft.streaming.Replay.run(ds, "user_id", "ts_us", "event_id")(
          _.user_id, _.ts_us) { _ =>
          new graft.streaming.KeyedStateMachine[Long, EmaIn, TradeOut] {
            private var entry = Long.MinValue // MinValue = flat
            def onEvent(ts: Long, e: EmaIn,
                        ctx: graft.streaming.ReplayCtx[TradeOut]): Unit = {
              if (entry != Long.MinValue) {
                if (e.xq >= entry + 10000 || e.xq <= entry - 5000) {
                  ctx.emit(TradeOut(e.user_id, e.ts_us, e.event_id,
                    entry, e.xq, e.xq - entry))
                  entry = Long.MinValue // flat; re-entry from the NEXT event
                }
              } else if (e.xq < 30000) entry = e.xq
            }
          }
        }
        .toDF()
        .select($"user_id", $"ts_us", $"event_id", $"entry_xq", $"exit_xq", $"pnl")
    },

    // ---- the W8 CART MACHINE under the hash gate — list-valued state
    // with qty matching + timer discount expiry (reference
    // e5_retail_cart.py:34-68), previously only golden-spec'd. Fixture
    // mapping (arbitrary but deterministic, exercises every branch):
    // non-purchase events ADD 1-or-2 units of one of 5 item names at
    // the ×1000-quantized cost; purchases REMOVE one unit of that name
    // (multi-lot partial removal stays covered by the golden spec and
    // the streaming parity spec — the CTE implements the single-unit
    // rule the mapping guarantees). The discount timer is scheduled at
    // simulation start + 7 days (the reference's absolute-expiry shape,
    // e5_retail_cart.py:46-48 note); replay fires timers BEFORE
    // same-time events, so "discounted" ≡ ts_us < expiry strictly —
    // which is exactly the oracle's predicate. Discounted cost =
    // floorDiv(cost·9, 10) ≡ DuckDB `//` (the q132 integer
    // portability discipline). The oracle carries the WHOLE cart as a
    // LIST OF STRUCTS through a recursive CTE — rn=0 seeds an empty
    // cart per user so the transition expression exists exactly once.
    // Scale: machine side is the standard Replay.run layout — one
    // shuffle, per-key linear state, nothing driver-sized but the
    // 8-byte expiry scalar. ----
    QuerySpec.sql("q135_cart_machine", {
      val idx = "list_position(list_transform(p.items, l -> l.name), s.name)"
      s"""WITH RECURSIVE ev AS (SELECT user_id, event_id, $tsUs AS ts_us,
         |    'i' || CAST(event_id % 5 AS VARCHAR) AS name,
         |    CAST(trunc(value * 1000) AS BIGINT) AS cost,
         |    (event_type <> 'purchase') AS add_f,
         |    CASE WHEN event_type <> 'purchase' THEN event_id % 2 + 1 ELSE 1 END AS qty
         |  FROM events),
         |x AS (SELECT min(ts_us) + 604800000000 AS expiry FROM ev),
         |seqd AS (SELECT ev.*, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id) AS rn FROM ev),
         |cart AS (
         |  SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS ts_us,
         |    CAST(NULL AS BIGINT) AS event_id,
         |    CAST([] AS STRUCT(name VARCHAR, cost BIGINT, qty BIGINT)[]) AS items
         |  FROM (SELECT DISTINCT user_id FROM ev)
         |  UNION ALL
         |  SELECT s.user_id, s.rn, s.ts_us, s.event_id,
         |    CASE WHEN s.add_f THEN list_append(p.items,
         |        {'name': s.name,
         |         'cost': CASE WHEN s.ts_us < (SELECT expiry FROM x)
         |                      THEN (s.cost * 9) // 10 ELSE s.cost END,
         |         'qty': s.qty})
         |      WHEN COALESCE($idx, 0) = 0 THEN p.items
         |      WHEN p.items[$idx].qty > 1
         |        THEN p.items[:$idx - 1]
         |          || [{'name': s.name, 'cost': p.items[$idx].cost,
         |               'qty': p.items[$idx].qty - 1}]
         |          || p.items[$idx + 1:]
         |      ELSE p.items[:$idx - 1] || p.items[$idx + 1:]
         |    END AS items
         |  FROM cart p JOIN seqd s ON s.user_id = p.user_id AND s.rn = p.rn + 1)
         |SELECT user_id, ts_us, event_id,
         |  CAST(COALESCE(list_sum(list_transform(items, l -> l.cost * l.qty)), 0) AS BIGINT) AS total_milli,
         |  CAST(COALESCE(list_sum(list_transform(items, l -> l.qty)), 0) AS BIGINT) AS n_items
         |FROM cart WHERE rn > 0""".stripMargin
    }) { (s, d) =>
      implicit val outEnc: org.apache.spark.sql.Encoder[graft.streaming.Machines.CartTotalQ] =
        org.apache.spark.sql.Encoders.product[graft.streaming.Machines.CartTotalQ]
      val (ev, expiry) = cartOps(s, d)
      graft.streaming.Replay.run(ev, "user_id", "ts_us", "event_id")(
          _.user_id, _.ts_us)(
          uid => new graft.streaming.Machines.CartMachineQ(uid, expiry))
        .toDF()
    },

    // ---- the W9 FEEDBACK MACHINE under the hash gate (reference
    // e1_feedback.py:27-66): the order ⇄ ACK cycle — inexpressible as a
    // DAG of operators, so it lives inside ONE keyed machine whose
    // timers carry both parties' latencies (0.3 s to the exchange,
    // 0.7 s back). Each user's first event seeds a session; the machine
    // then generates the whole timeline from timers alone: order k at
    // seed+(k−1)·1 s, exec_report k at seed+k·1 s triggering order k+1,
    // stop after order 10 (→ 10 orders, 9 ACKs — the reference's exact
    // counts). The oracle replays the SAME recurrence in a recursive
    // CTE; the price walk accumulates +0.01 step by step on BOTH sides
    // (iterative IEEE adds in identical order — bit-exact), never the
    // closed form (100 + k·0.01 rounds differently). 'exec_report' <
    // 'order' lexically, so the (ts, kind) sort is deterministic at the
    // ACK/next-order tie. Scale: one seed row per key through the
    // standard Replay.run layout — state is two scalars per machine. ----
    QuerySpec.sql("q136_feedback_machine",
      s"""WITH RECURSIVE seeds AS (
         |  SELECT user_id AS session_id, min($tsUs) AS ts0
         |  FROM events GROUP BY user_id),
         |ord AS (
         |  SELECT session_id, 1 AS k, ts0 AS ts_us, CAST(100.0 AS DOUBLE) AS price
         |  FROM seeds
         |  UNION ALL
         |  SELECT session_id, k + 1, ts_us + 1000000, price + 0.01
         |  FROM ord WHERE k < 10)
         |SELECT session_id, ts_us, kind, order_id, price FROM (
         |  SELECT session_id, ts_us, 'order' AS kind,
         |    CAST(k AS BIGINT) AS order_id, price FROM ord
         |  UNION ALL
         |  SELECT session_id, ts_us + 1000000, 'exec_report',
         |    CAST(k AS BIGINT), 0.0 FROM ord WHERE k <= 9)""".stripMargin) { (s, d) =>
      implicit val inEnc: org.apache.spark.sql.Encoder[graft.streaming.Machines.SessionSeed] =
        org.apache.spark.sql.Encoders.product[graft.streaming.Machines.SessionSeed]
      implicit val outEnc: org.apache.spark.sql.Encoder[graft.streaming.Machines.FeedbackEvent] =
        org.apache.spark.sql.Encoders.product[graft.streaming.Machines.FeedbackEvent]
      val seeds = Tables.events(s, d)
        .groupBy($"user_id".as("session_id"))
        .agg(min(unix_micros($"ts")).as("ts_us"), min($"event_id").as("seq"))
      graft.streaming.Replay.run(
          seeds.as[graft.streaming.Machines.SessionSeed],
          "session_id", "ts_us", "seq")(_.session_id, _.ts_us)(
          sid => new graft.streaming.Machines.FeedbackMachine(sid))
        .toDF()
        .select($"session_id", $"ts_us", $"kind", $"order_id", $"price")
    },

    // ---- HOT-KEY-SAFE replay ([[Replay.runSpliced]]) under the hash
    // gate: the W6 running aggregation executed as a parallel prefix
    // scan — per-(key, time-slice) summary fold, O(slices) per-key
    // exclusive scan, co-partitioned re-fold — instead of Replay.run's
    // one-task-per-key sequential chain. Same emissions row-for-row
    // (integer cents domain: truncation and addition are associative,
    // so the slice-tree fold ≡ the sequential fold ≡ the oracle's
    // window frame). This is the mitigation for the skew cliff a 90%
    // hot key opens in the per-key machine model; the degradation curve
    // of the unspliced path and this bound are measured in SCALING.md
    // ("Hot-key replay"). ----
    QuerySpec.sql("q141_spliced_replay",
      s"""SELECT user_id, $tsUs AS ts_us, event_id,
         |  CAST(sum(CAST(trunc(value * 100) AS BIGINT)) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
         |  CAST(count(*) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_n
         |FROM events""".stripMargin) { (s, d) =>
      implicit val inEnc: org.apache.spark.sql.Encoder[SpliceIn] =
        org.apache.spark.sql.Encoders.product[SpliceIn]
      implicit val outEnc: org.apache.spark.sql.Encoder[SpliceOut] =
        org.apache.spark.sql.Encoders.product[SpliceOut]
      implicit val kEnc: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
      implicit val sEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)
      val ds = Tables.events(s, d)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
          ($"value" * 100).cast("long").as("cents"))
        .as[SpliceIn]
      graft.streaming.Replay.runSpliced(ds, slices = 32)(
          _.user_id, _.ts_us, _.event_id)(RunningCents)
        .toDF()
    },

    // ---- the W7 as-of join through the PURE-SQL surface: the Spark
    // side is nothing but spark.sql text — trades/quotes views derived
    // with SQL DDL, the join invoked as the graft_asof TVF
    // (plans/GraftTvfs.scala), which builds the exact q26 operator plan
    // (one shuffle, union + last-over-window). Oracle = DuckDB's native
    // ASOF LEFT JOIN, the q26 discipline. ----
    QuerySpec.sql("q148_sql_asof",
      s"""SELECT t.event_id AS event_id, t.user_id AS user_id,
         |  epoch_us(CAST(t.ts AS TIMESTAMP)) AS ts_us,
         |  t.trade_value AS trade_value, q.quote_value AS quote_value
         |FROM (SELECT event_id, user_id, ts, value AS trade_value
         |      FROM events WHERE event_type = 'purchase') t
         |ASOF LEFT JOIN (
         |  SELECT user_id, ts, max_by(value, event_id) AS quote_value
         |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) q
         |  ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("graft_q148_events")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_q148_trades AS
              |SELECT event_id, user_id, ts, value AS trade_value
              |FROM graft_q148_events WHERE event_type = 'purchase'""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_q148_quotes AS
              |SELECT user_id, ts, max_by(value, event_id) AS quote_value
              |FROM graft_q148_events WHERE event_type = 'view'
              |GROUP BY user_id, ts""".stripMargin)
      s.sql("""SELECT event_id, user_id, unix_micros(ts) AS ts_us,
              |  trade_value, quote_value
              |FROM graft_asof('graft_q148_trades', 'graft_q148_quotes',
              |                'user_id', 'ts', 'ts', 'quote_value')""".stripMargin)
    }
  )

  /** q141's monoid machine: running (cents, count) per key. Top-level
    * object — serializable without closure capture. */
  object RunningCents
      extends graft.streaming.SplicedMachine[SpliceIn, SpliceOut, (Long, Long)] {
    def zero: (Long, Long) = (0L, 0L)
    def unit(ts: Long, v: SpliceIn): (Long, Long) = (v.cents, 1L)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def output(p: (Long, Long), ts: Long, v: SpliceIn): SpliceOut =
      SpliceOut(v.user_id, v.ts_us, v.event_id, p._1, p._2)
  }

  /** The q135 cart-op derivation (fixture events → integer-domain cart
    * updates) + the discount-expiry scalar — ONE definition shared by
    * the gate and the streaming parity spec, so the mapping cannot fork
    * between the oracle-gated batch path and the live path. */
  private[graft] def cartOps(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.Dataset[graft.streaming.Machines.CartOpQ], Long) = {
    implicit val inEnc: org.apache.spark.sql.Encoder[graft.streaming.Machines.CartOpQ] =
      org.apache.spark.sql.Encoders.product[graft.streaming.Machines.CartOpQ]
    val isAdd = $"event_type" =!= "purchase"
    val ev = Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        concat(lit("i"), ($"event_id" % 5).cast("string")).as("name"),
        ($"value" * 1000).cast("long").as("cost"),
        when(isAdd, ($"event_id" % 2 + 1)).otherwise(lit(1L))
          .cast("int").as("qty"),
        isAdd.as("add"))
      .as[graft.streaming.Machines.CartOpQ]
    // 8-byte driver scalar — the reference's simulation-start anchor
    val expiry = ev.agg(min($"ts_us")).head.getLong(0) + 7L * 86400000000L
    (ev, expiry)
  }
}
