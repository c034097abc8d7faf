"""Local mimic of the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, sorted column names, and values
(rows sorted by all columns, exact equality — our queries are engineered to
be bit-deterministic across engines, see queries.py docstring).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from egraphdb_spark.graph import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = (av == bv) | (av.isna() & bv.isna())
            bad = (~eq).sum()
            if bad:
                i = (~eq).idxmax()
                # report max relative error for diagnosis
                rel = ((av - bv).abs() / bv.abs().clip(lower=1e-300)).max()
                problems.append(
                    f"col {c}: {bad} mismatched floats, first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r} (max rel err {rel:.2e})"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            bad = (~eq).sum()
            if bad:
                i = (~eq).idxmax()
                problems.append(
                    f"col {c}: {bad} mismatches, first at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from egraphdb_spark.queries import REGISTRY

    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        return [] if len(spark_pdf) >= 0 else ["unreachable"]
    oracle_pdf = run_oracle(sql, sf_dir)
    return compare(spark_pdf, oracle_pdf)
