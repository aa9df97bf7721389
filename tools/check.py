#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
query in DuckDB over the same parquet tables, compare to the Spark result
parquet (columns sorted by name, values hashed). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # replicate the driver's gate: rows are sorted over ALL columns before
    # hashing — this also reproduces its pandas lexsort crash on list
    # cells, which the previous (unsorted) version of this script missed
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cell(v):
    # stable rendering: floats via repr (full precision), arrays via list
    if isinstance(v, float):
        return repr(v)
    if hasattr(v, "tolist"):
        return repr(v.tolist())
    return repr(v)

def frame_hash(df: pd.DataFrame):
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main(sf_dir, out_dir, json_out=None, protocol=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        ok_shape = got.shape == want.shape
        ok_cols = list(got.columns) == list(want.columns)
        ok_hash = ok_shape and ok_cols and frame_hash(got) == frame_hash(want)
        results[name] = {"rows_match": ok_shape, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": int(len(got)),
                         "oracle_rows": int(len(want))}
        if ok_hash:
            print(f"PASS {name} rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: shape {got.shape} vs {want.shape}; cols "
                  f"{list(got.columns)} vs {list(want.columns)}")
            if ok_shape and ok_cols:
                for c in got.columns:
                    if not got[c].map(cell).equals(want[c].map(cell)):
                        diff = (got[c].map(cell) != want[c].map(cell))
                        i = diff.idxmax()
                        print(f"  first diff col={c} row={i}: "
                              f"spark={got[c][i]!r} duck={want[c][i]!r}")
    print(f"== {n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "protocol": protocol or "graft.Verify dump -> tools/check.py "
                       "(same DuckDB hash gate as the driver)",
                       "n_pass": n_pass, "n_fail": n_fail,
                       "queries": dict(sorted(results.items()))}, f, indent=0)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
