"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() twin at a given sf, compare row-count + sorted-column
value equality. Usage: python tools/check_oracle.py [sf_dir] [name ...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):  # Dataset or pa.Table
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    df = df.sort_values(list(df.columns), na_position="last",
                        ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    qs, oqs = e.queries(), e.oracle_sql()
    names = sys.argv[2:] or list(qs)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    timing = os.environ.get("GATE_TIMING") == "1"
    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN (not a queries() entry)")
            failures += 1  # a typo'd name must still fail the gate
            continue
        import time as _time
        t0 = _time.time()
        got = canon(to_pandas(qs[name](sf_dir)))
        t_ray = _time.time() - t0
        if name not in oqs:
            if timing:
                print(f"[t] {name}: ray={t_ray:.2f}s")
            print(f"{name}: rows={len(got)} (no oracle — rows-only)")
            continue
        t0 = _time.time()
        want = canon(con.execute(oqs[name]).fetch_df())
        if timing:
            print(f"[t] {name}: ray={t_ray:.2f}s sql={_time.time()-t0:.2f}s")
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                w = want.copy()
                for c in w.columns:
                    if w[c].dtype != got[c].dtype:
                        w[c] = w[c].astype(got[c].dtype)
                ok_vals = got.equals(w)
                if not ok_vals:
                    neq = (got != w) & ~(got.isna() & w.isna())
                    bad = neq.any(axis=1)
                    print(got[bad].head(3), "\nvs\n", w[bad].head(3))
            except Exception as ex:  # noqa: BLE001
                print(f"  compare error: {ex}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} rows={len(got)}/{len(want)} "
              f"cols={list(got.columns) if not ok_cols else 'match'}")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    ray.shutdown()
    sys.exit(code)
