"""Local mimic of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL on the same parquet
dir, sorts columns by name and rows by all columns, and compares
values (exact for non-floats, approximate for floats). This is a
superset-strictness local gate: if this passes, the driver's
value-hash compare should too (both sides round float aggregates).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def compare(spark_df, oracle_pdf, float_tol=1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    import pandas as pd

    spdf = spark_df.toPandas()
    problems: list[str] = []
    scols, ocols = sorted(spdf.columns), sorted(oracle_pdf.columns)
    if scols != ocols:
        return [f"column mismatch: spark={scols} oracle={ocols}"]
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
        return problems
    if len(spdf) == 0:
        return problems

    def norm(df):
        df = df[scols].copy()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        return df.sort_values(by=scols, kind="mergesort").reset_index(drop=True)

    a, b = norm(spdf), norm(oracle_pdf)
    for c in scols:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av, bv)):
                xn, yn = (x is None or (isinstance(x, float) and math.isnan(x))), (
                    y is None or (isinstance(y, float) and math.isnan(y))
                )
                if xn and yn:
                    continue
                if xn != yn or abs(float(x) - float(y)) > float_tol * max(
                    1.0, abs(float(y))
                ):
                    problems.append(f"col {c} row {i}: spark={x} oracle={y}")
                    if len(problems) > 5:
                        return problems
        else:
            neq = ~(av.eq(bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}"
                )
    return problems
