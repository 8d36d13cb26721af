#!/usr/bin/env python3
"""Dev-only pre-check that mimics the driver's DuckDB-oracle compare.

NOT part of the Scala library (driver-side python per the environment
contract). Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

For each query: load the Spark result parquet, run the oracle SQL in DuckDB
(with each fixture table registered as a view), sort columns by name and
rows by all columns, and compare values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    frames = [con.execute(f"select * from '{f}'").df() for f in sorted(files)]
    return pd.concat(frames, ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(os.path.join(outdir, name)):
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"rowsonly {name}: rows={len(got)} (no oracle)"); continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        mism = []
        # The driver hashes typed values, so an int64-vs-float64 column
        # (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64) fails there even
        # when == says equal. Treat dtype drift as failure here too.
        dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if g[c].dtype != w[c].dtype]
        if dt:
            print(f"FAIL {name}: dtype drift {dt}"); n_fail += 1; continue
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mism.append((c, a[i], b[i], int((~eq).sum())))
        if mism:
            print(f"FAIL {name}: {mism[:3]}"); n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
