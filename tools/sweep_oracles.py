"""Driver-replica oracle sweep: run every __ray_entry__ query at sf0.01
and compare against its DuckDB oracle — row count, sorted column names,
and a value hash over canonicalized cells (floats at %.9g, the driver's
tolerance; rows sorted). The standalone twin of the round driver's
correctness gate, for sweeping the FULL inventory (the driver samples a
prefix per round).

Usage:  python tools/sweep_oracles.py [query names...]
        (no names = the whole inventory; exits 1 on any failure)
"""
import hashlib
import importlib.util
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa

import ray

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[int, list, str]:
    df = df.copy()
    df = df[sorted(df.columns)]
    cells = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            cells.append(col.map(lambda v: "null" if pd.isna(v) else "%.9g" % v))
        else:
            cells.append(col.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)))
    s = pd.DataFrame(dict(enumerate(cells)))
    rows = ["\x1f".join(r) for r in s.itertuples(index=False, name=None)] if len(s) else []
    rows.sort()
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), sorted(df.columns), h


def main():
    # Ray FIRST: oracle_sql()'s fixture synthesis (PQ codebook / DSIR
    # weights) runs Ray Data jobs on a cache-miss, which would auto-init
    # Ray and make the explicit init below raise
    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    spec = importlib.util.spec_from_file_location("re_", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()
    o = m.oracle_sql()
    names = sys.argv[1:] or list(q)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    fails = []
    for name in names:
        if name not in q:
            print(f"{name}: NO SUCH QUERY"); fails.append(name); continue
        try:
            res = to_df(q[name](SF_DIR))
        except Exception as e:
            print(f"{name}: ENGINE ERR {e!r:.200}"); fails.append(name); continue
        if name not in o:
            print(f"{name}: rows-only, rows={len(res)}")
            continue
        try:
            ora = con.execute(o[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e!r:.200}"); fails.append(name); continue
        try:
            rn, cn, hn = canon(res)
            ro, co, ho = canon(ora)
        except Exception as e:
            print(f"{name}: CANON ERR {e!r:.200}"); fails.append(name); continue
        ok = (rn == ro) and (cn == co) and (hn == ho)
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={rn}/{ro} cols={'=' if cn==co else (cn,co)} hash={'=' if hn==ho else (hn,ho)}")
        if not ok:
            fails.append(name)
    ray.shutdown()
    print(json.dumps({"n": len(names), "fails": fails}))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
