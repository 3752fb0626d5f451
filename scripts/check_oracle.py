"""Local emulation of the driver's correctness gate: run each
__ray_entry__.queries() entry and its oracle_sql() twin on the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            continue
        want = canon(con.execute(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                eq = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
            if not eq:
                bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            for c in bad[:2]:
                d = got[c].to_numpy() != want[c].to_numpy()
                i = int(np.nonzero(d)[0][0])
                print(f"   first diff row {i}: got={got[c].iloc[i]!r} want={want[c].iloc[i]!r}")
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows match ({dt:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
