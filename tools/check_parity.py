"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on
DuckDB over the same parquet tables; compare row count, column
names/order-insensitive values exactly.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as E
from etl_spark.session import get_spark


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("boolean")
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in E.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            want = normalize(con.sql(sql).df())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {str(ex)[:300]}")
            continue
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        if len(got) != len(want):
            status.append(f"rows spark={len(got)} duck={len(want)}")
        if not status:
            if got.equals(want):
                pass
            else:
                try:
                    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
                except AssertionError as ex:
                    status.append("values: " + str(ex).split("\n")[0])
                    # show a few mismatching cells
                    neq = (got != want) & ~(got.isna() & want.isna())
                    bad = neq.any(axis=1)
                    ex_rows = got[bad].head(3), want[bad].head(3)
                    print("  spark:", ex_rows[0].to_dict("records"))
                    print("  duck :", ex_rows[1].to_dict("records"))
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)} ({time.time()-t0:.1f}s)")
        else:
            print(f"OK   {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
