"""Driver-mimic correctness harness: run every queries() entry at sf0.01 and
compare against oracle_sql() through DuckDB (row count + columns + values;
floats exact, strings exact). Usage:
    python tools/oracle_check.py [entry ...]
"""
import os, sys, traceback
import duckdb, numpy as np, pandas as pd
import ray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def to_df(x):
    if isinstance(x, pd.DataFrame): return x
    if hasattr(x, "to_pandas"): return x.to_pandas()
    return pd.DataFrame(x)

def canon(df):
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

qs, sqls = E.queries(), E.oracle_sql()
only = sys.argv[1:] or None
results = {}
for name, fn in qs.items():
    if only and name not in only: continue
    sql = sqls.get(name)
    try:
        mine = canon(to_df(fn(SF)))
    except Exception as e:
        results[name] = f"RAY-ERROR {type(e).__name__}: {e}"
        traceback.print_exc()
        continue
    if sql is None:
        results[name] = f"rows-only: {len(mine)} rows, cols {list(mine.columns)}"
        continue
    try:
        oracle = canon(con.sql(sql).df())
    except Exception as e:
        results[name] = f"SQL-ERROR {type(e).__name__}: {e}"
        continue
    ok_rows = len(mine) == len(oracle)
    ok_cols = list(mine.columns) == list(oracle.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            mm, oo = mine, oracle
            ok_vals = True
            for c in mm.columns:
                a, b = mm[c].values, oo[c].values
                if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(np.asarray(b).dtype, np.floating):
                    same = np.allclose(np.asarray(a, float), np.asarray(b, float), rtol=0, atol=0, equal_nan=True)
                else:
                    same = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
                if not same:
                    ok_vals = False
                    bad = np.flatnonzero(~(pd.Series(a).astype(str) == pd.Series(b).astype(str)).values)[:3]
                    print(f"  [{name}] col {c} mismatch rows {bad}: mine={np.asarray(a)[bad]}, oracle={np.asarray(b)[bad]}")
        except Exception as e:
            print(f"  [{name}] compare error {e}")
    status = "OK" if (ok_rows and ok_cols and ok_vals) else f"MISMATCH rows={ok_rows}({len(mine)}/{len(oracle)}) cols={ok_cols} vals={ok_vals}"
    if not ok_cols:
        print(f"  [{name}] cols mine={list(mine.columns)} oracle={list(oracle.columns)}")
    results[name] = status
for k, v in results.items():
    print(f"{k:24} {v}")
ray.shutdown()
