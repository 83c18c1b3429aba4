"""Driver simulation: run __spark_entry__ queries vs their DuckDB oracles.

Usage:  python tools/simdriver.py [query ...]        (default: all)
        SIM_SF=/root/testdata/sf0.01 python tools/simdriver.py kg_eval_metrics

Replicates the external driver's compare: row count, column set, and an
order-insensitive value comparison (floats rounded to 6dp on both sides).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from kgspark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in sorted(df.columns):
        s = df[c]
        if s.dtype == object and len(s) and isinstance(
                s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):
            s = s.map(lambda v: None if v is None else tuple(v))
        if np.issubdtype(s.dtype, np.floating):
            s = s.round(6)
        if np.issubdtype(s.dtype, np.integer):
            s = s.astype("int64")
        out[c] = s
    r = pd.DataFrame(out)
    return r.sort_values(list(r.columns)).reset_index(drop=True)


def main() -> int:
    sf = os.environ.get("SIM_SF", "/root/testdata/sf0.01")
    spark = get_spark("simdriver", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, osql = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            a = canon(qs[name](spark, sf).toPandas())
        except Exception as ex:
            print(f"{name}: SPARK ERR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        if name not in osql:
            print(f"{name}: rows-only spark_rows={len(a)} "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            b = canon(con.execute(osql[name]).df())
        except Exception as ex:
            print(f"{name}: ORACLE ERR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              atol=1.5e-6, rtol=0)
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"{name}: OK rows={len(a)} ({time.time() - t0:.1f}s)")
        else:
            bad += 1
            print(f"{name}: MISMATCH rows={len(a)}/{len(b)} "
                  f"cols_ok={ok_cols} vals_ok={ok_vals}")
            if ok_rows and ok_cols and not ok_vals:
                print("   ", detail)
            elif not ok_cols:
                print(f"    spark={list(a.columns)} oracle={list(b.columns)}")
    print(f"{'FAIL' if bad else 'PASS'}: {len(names) - bad}/{len(names)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
