#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same sf dir, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(type(obj))


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count {len(ray_df)} vs {len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        import numpy as np
        import pandas as pd

        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # The driver's value-hash canonicalization distinguishes types
            # (round-1 lesson: DuckDB HUGEINT sums vs engine int64 hash-
            # mismatched despite equal values) — so flag dtype divergence.
            if av.dtype != bv.dtype:
                problems.append(f"col {c}: dtype {av.dtype} vs {bv.dtype}")
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float)
                bv = bv.astype(float)
                bad = ~(np.isclose(av, bv, rtol=0, atol=0) | (pd.isna(av) & pd.isna(bv)))
            else:
                bad = av != bv
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r}"
                )
    return problems


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(ray_df)} rows in {dt:.1f}s")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS {name}: {len(ray_df)} rows in {dt:.1f}s")
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
