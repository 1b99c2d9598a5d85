"""DuckDB oracle parity harness — local stand-in for the driver's t2 gate.

Runs each registered query on Spark at sf0.01 AND its DuckDB oracle SQL on
the same parquet; compares row count, column names, and values
order-insensitively (exact for ints/strings/bools, exact-first with a
reported max-abs-diff for floats so near-misses are visible).

Usage:
    python tests/oracle_check.py            # all queries
    python tests/oracle_check.py q1 q2 ...  # subset
"""

from __future__ import annotations

import sys
from typing import Optional

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from dataframe_expressions_spark.sources.tables import TABLE_NAMES  # noqa: E402

import os

SF_DIR = os.environ.get("ORACLE_CHECK_SF_DIR", "/root/testdata/sf0.01")


def duck_con(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    # mirrors the external driver's canonicalizer: sort columns + rows, round
    # floats, NO dtype coercion (same logic as tests/driver_sim.py)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def driver_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.sha256(
        _driver_canon(df).to_csv(index=False, float_format="%.6g").encode()
    ).hexdigest()[:16]


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> Optional[str]:
    """Return None on match, else a description of the first mismatch."""
    if len(spark_pdf) != len(duck_pdf):
        return f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a_cols, b_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if a_cols != b_cols:
        return f"columns: spark={a_cols} duck={b_cols}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                diff = (av - bv).abs().max()
                n_bad = int((~eq).sum())
                return f"col {c!r}: {n_bad} float mismatches, max|diff|={diff}"
        else:
            if av.isna().any() or bv.isna().any():
                eq = (av.astype(object) == bv.astype(object)) | (av.isna() & bv.isna())
            else:
                eq = av == bv
            if not eq.all():
                i = int(np.argmax(~eq.values))
                return f"col {c!r}: mismatch at sorted row {i}: {av.iloc[i]!r} != {bv.iloc[i]!r}"
    # Values match after coercion — now replicate the driver's coercion-free
    # CSV hash: an int64 Spark column vs a float64 oracle column (DuckDB
    # HUGEINT sums) hashes "1677" vs "1677.0" and fails the driver even when
    # values are identical (r3 lesson: tpch_q12/mixture_sample).
    if driver_hash(spark_pdf) != driver_hash(duck_pdf):
        dtypes = {
            c: (str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
            for c in a_cols
            if str(spark_pdf[c].dtype) != str(duck_pdf[c].dtype)
        }
        return f"driver CSV hash mismatch; dtype skews (spark, duck): {dtypes}"
    return None


def run_one(qid: str, spark, con, sf_dir: str = SF_DIR) -> Optional[str]:
    from dataframe_expressions_spark.operators.registry import QUERIES

    q = QUERIES[qid]
    sdf = q.fn(spark, sf_dir)
    # Driver contract guard: its canonicalizer sorts a pandas frame of the
    # result and crashes on unhashable cells — no Array/Map/Struct columns
    # may ever leave a registered query (round-1 lesson).
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        return f"complex-typed output columns {complex_cols} break the driver canonicalizer"
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        if len(spark_pdf) == 0 and qid not in ():
            return "rows-only check: 0 rows (suspicious)"
        return None
    duck_pdf = con.execute(q.oracle).fetchdf()
    return compare_frames(spark_pdf, duck_pdf)


def main() -> int:
    from dataframe_expressions_spark.operators.registry import load_all
    from dataframe_expressions_spark.session import get_spark

    queries = load_all()
    ids = sys.argv[1:] or list(queries)
    spark = get_spark("oracle-check")
    con = duck_con()
    failed = []
    for qid in ids:
        try:
            err = run_one(qid, spark, con)
        except Exception as e:  # noqa: BLE001
            err = f"EXCEPTION: {type(e).__name__}: {e}"
        status = "OK  " if err is None else "FAIL"
        print(f"{status} {qid}" + (f"  -- {err}" if err else ""), flush=True)
        if err:
            failed.append(qid)
    print(f"\n{len(ids) - len(failed)}/{len(ids)} queries match", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
