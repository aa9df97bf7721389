#!/usr/bin/env python3
"""Engine-vs-DuckDB wall-time head-to-head (VERDICT r7 #1).

`bench_vs_baseline` has been 1.0 "by convention" because BASELINE.md
publishes no numbers — but the oracle harness already runs every query
in DuckDB on the same parquet. This tool turns the convention into a
measurement: per-query DuckDB wall time (same protocol as Bench: one
warm-up, then min of 2 timed runs, full materialization) merged with
the Spark per-query map Bench writes to target/bench_full.json.

Usage:
  python3 tools/headtohead.py --out HEADTOHEAD_r08.json \
      --scale sf0.1:/root/testdata/sf0.1:/tmp/v01/oracle_sql.json:/tmp/bench_sf01.json \
      --scale x10:/tmp/sfx10:/tmp/v01/oracle_sql.json:/tmp/bench_x10.json

Interpretation contract (documented in SURVEY §8.11): DuckDB here is a
single-process engine on the same 32-core box reading the same parquet;
Spark pays a distributed-execution floor (planning, task scheduling,
shuffle materialization, codegen compile) that buys the 1000-executor
scale-out DuckDB does not have. The gate in the artifact is the ratio
DISTRIBUTION, and any query >5x slower than DuckDB at the 10x scale is
individually explained or fixed.
"""
import argparse, json, math, os, subprocess, sys, tempfile, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def child_run(sf_dir, oracle_path, name, cap_sec, mem_limit, tmp_limit):
    """Run ONE query in this (child) process and print a JSON result.

    Isolation rationale: a fresh duckdb connection does NOT isolate
    allocator-level exhaustion — one OOM'd query left the C++ allocator
    unable to serve even a 32 KiB block for the NEXT query's
    CREATE VIEW, killing the whole run. A subprocess per query makes an
    OOM kill exactly one measurement. The OS page cache survives across
    processes, so the warm-up still warms I/O.
    """
    import duckdb, shutil, threading
    sql = json.load(open(oracle_path))[name]
    spill_dir = tempfile.mkdtemp(prefix="h2h_duck_spill_")
    result = {}
    try:
        con = duckdb.connect()
        con.sql(f"SET memory_limit='{mem_limit}'")
        con.sql(f"SET temp_directory='{spill_dir}'")
        con.sql(f"SET max_temp_directory_size='{tmp_limit}'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):  # Spark-written table: a dir of parts
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
            elif os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

        def run_capped():
            timer = threading.Timer(cap_sec, con.interrupt)
            timer.start()
            try:
                return con.execute(sql).fetchall()
            finally:
                timer.cancel()

        try:
            run_capped()  # warm-up (I/O cache, plan cache)
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                rows = run_capped()
                best = min(best, time.perf_counter() - t0)
            result = {"sec": round(best, 4), "rows": len(rows)}
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:200]}"
            if isinstance(e, duckdb.InterruptException) \
                    or "INTERRUPT" in msg.upper():
                result = {"sec": float(cap_sec), "timed_out": True}
            elif isinstance(e, (duckdb.OutOfMemoryException, MemoryError)) \
                    or "Out of Memory" in msg or "temp_directory" in msg \
                    or "No space" in msg or "bad allocation" in msg:
                result = {"sec": -1.0, "infeasible": True, "error": msg}
            else:
                result = {"sec": -1.0, "error": msg}
    finally:
        shutil.rmtree(spill_dir, ignore_errors=True)
    print("H2H_RESULT " + json.dumps(result), flush=True)


def duck_times(sf_dir, oracle_path, state_path, cap_sec=300,
               mem_limit="48GB", tmp_limit="30GB"):
    """Per-QUERY subprocess (see child_run). Results stream into
    state_path after every query, so a crashed or killed run resumes
    where it left off instead of re-paying completed measurements.

    cap_sec: per-query wall cap (con.interrupt in the child; a hard
    kill from here as backstop). A capped query is recorded as
    sec=cap_sec with timed_out=true — the published ratio is then a
    LOWER bound on Spark's win (DuckDB needed MORE than the cap). A
    query DuckDB cannot complete on this box (OOM / temp-dir budget)
    is recorded as infeasible=true and EXCLUDED from ratio stats —
    conservative, since only Spark LOSSES gate anything.
    """
    oracle = json.load(open(oracle_path))
    out = {}
    if os.path.exists(state_path):
        out = json.load(open(state_path))
        print(f"[h2h] resuming: {len(out)} results already in {state_path}",
              flush=True)
    for name in sorted(oracle):
        if name in out:
            continue
        t_all = time.perf_counter()
        # warmup + 2 reps can each run up to cap_sec before interrupt
        # lands; hard-kill backstop covers an interrupt that never takes.
        hard_cap = 3 * cap_sec + 120
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 sf_dir, oracle_path, name, str(cap_sec), mem_limit,
                 tmp_limit],
                capture_output=True, text=True, timeout=hard_cap)
            res = None
            for line in proc.stdout.splitlines():
                if line.startswith("H2H_RESULT "):
                    res = json.loads(line[len("H2H_RESULT "):])
            if res is None:  # child died before reporting (hard OOM kill)
                tail = (proc.stderr or proc.stdout or "").strip()[-200:]
                res = {"sec": -1.0, "infeasible": True,
                       "error": f"child exit {proc.returncode}: {tail}"}
        except subprocess.TimeoutExpired:
            res = {"sec": float(cap_sec), "timed_out": True,
                   "error": "hard kill: interrupt did not land"}
        out[name] = res
        if res.get("timed_out"):
            print(f"[h2h] {name}: CAPPED at {cap_sec}s", flush=True)
        elif res.get("infeasible"):
            print(f"[h2h] {name}: INFEASIBLE single-process "
                  f"({res.get('error', '')[:120]})", flush=True)
        elif "error" in res:
            print(f"[h2h] duckdb FAIL {name}: {res['error'][:120]}",
                  flush=True)
        else:
            print(f"[h2h] {name}: {res['sec']:.3f}s "
                  f"(total {time.perf_counter() - t_all:.1f}s)", flush=True)
        with open(state_path, "w") as f:
            json.dump(out, f)
    return out


def merge(scale, sf_dir, duck, bench_path):
    bench = json.load(open(bench_path))
    spark = bench.get("queries", {})
    rows, ratios = [], []
    for name in sorted(duck):
        d = duck[name]["sec"]
        s = spark.get(name, -1)
        r = round(s / d, 3) if (d and d > 0 and s and s > 0) else None
        if r:
            ratios.append(r)
        rows.append({"query": name, "spark_sec": s, "duck_sec": d,
                     "spark_over_duck": r,
                     **({"duck_timed_out": True}
                        if duck[name].get("timed_out") else {}),
                     **({"duck_infeasible": True}
                        if duck[name].get("infeasible") else {}),
                     **({"duck_error": duck[name]["error"]}
                        if "error" in duck[name] else {})})
    ratios.sort()
    geo = round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3) \
        if ratios else None
    losses = [r for r in rows if r["spark_over_duck"] and r["spark_over_duck"] > 5]
    wins = sum(1 for r in ratios if r < 1)
    return {
        "scale": scale, "sf_dir": sf_dir, "n": len(rows),
        "spark_total_sec": bench.get("value"),
        "duck_total_sec": round(sum(d["sec"] for d in duck.values()
                                    if d["sec"] > 0), 2),
        "ratio_geomean": geo,
        "ratio_p50": ratios[len(ratios) // 2] if ratios else None,
        "ratio_p90": ratios[int(0.9 * len(ratios))] if ratios else None,
        "ratio_max": ratios[-1] if ratios else None,
        "spark_wins": wins,
        "duck_timed_out": [r["query"] for r in rows if r.get("duck_timed_out")],
        "duck_infeasible": [r["query"] for r in rows
                            if r.get("duck_infeasible")],
        "over_5x": [{"query": r["query"], "spark_over_duck": r["spark_over_duck"]}
                    for r in sorted(losses, key=lambda x: -x["spark_over_duck"])],
        "queries": rows,
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _, _, sf_dir, oracle, name, cap, mem, tmp = sys.argv
        child_run(sf_dir, oracle, name, float(cap), mem, tmp)
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", action="append", required=True,
                    help="label:sfdir:oracle_sql.json:bench_full.json")
    args = ap.parse_args()
    scales = []
    for s in args.scale:
        label, sf_dir, oracle, bench = s.split(":")
        print(f"[h2h] timing DuckDB at {label} ({sf_dir})")
        state = args.out + f".state.{label}.json"
        scales.append(merge(label, sf_dir,
                            duck_times(sf_dir, oracle, state), bench))
    body = {"protocol": "both engines min-of-2 after 1 warm-up, full "
                        "materialization, same parquet, same 32-core host; "
                        "DuckDB default threading (all cores), fresh process "
                        "per query; Spark side is the per-query MIN across 2 "
                        "bench sessions (SCALING.md min-of-k discipline — "
                        "wall noise is +10-25% per session and only ever "
                        "adds), so ratios compare floors to floors",
            "scales": scales}
    with open(args.out, "w") as f:
        json.dump(body, f, indent=1)
    for sc in scales:
        print(f"[h2h] {sc['scale']}: n={sc['n']} geomean={sc['ratio_geomean']} "
              f"p50={sc['ratio_p50']} p90={sc['ratio_p90']} max={sc['ratio_max']} "
              f"spark_wins={sc['spark_wins']} over_5x={len(sc['over_5x'])}")


if __name__ == "__main__":
    main()
