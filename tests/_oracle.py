"""Local stand-in for the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL side-by-side on the
same parquet tables, then compares row count + column names + values
order-insensitively (columns sorted by name, rows sorted by all
columns). Floats compare with a tiny tolerance; everything else exact.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        # match Spark's microsecond timestamps: any TIMESTAMP_NS column
        # is already coerced by duckdb's parquet reader to TIMESTAMP.
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            # lists/arrays -> tuple for sortability; leave strings alone
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.sql(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            ok = np.isclose(ga, wa, rtol=1e-9, atol=1e-9, equal_nan=True)
            assert ok.all(), (
                f"float mismatch in {c!r}: "
                f"{[(i, ga[i], wa[i]) for i in np.where(~ok)[0][:5]]}"
            )
        else:
            eq = (g.fillna("\0NULL") == w.fillna("\0NULL")) if g.dtype == object else (
                g.isna() & w.isna()
            ) | (g == w)
            bad = ~eq.to_numpy()
            assert not bad.any(), (
                f"value mismatch in {c!r}: "
                f"{[(i, g.iloc[i], w.iloc[i]) for i in np.where(bad)[0][:5]]}"
            )
