"""Local replica of the driver's correctness gate: run each registry query
through Spark AND its DuckDB oracle, compare row count, schema-width and an
order-insensitive value comparison. Used by tests and by `python -m
akf_cdparser_spark.plans.oracle_check` while iterating."""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            # unify duckdb Decimal / numpy types
            df[c] = col.map(lambda v: _norm_val(v))
        elif col.dtype.kind == "f":
            df[c] = col.round(6)
        elif col.dtype.kind == "b":
            df[c] = col.astype(bool)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return round(v, 6)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def compare(name: str, spark_df, oracle_sql: str | None, con) -> dict:
    sp = spark_df.toPandas()
    result = {"name": name, "spark_rows": len(sp)}
    if oracle_sql is None:
        result["status"] = "ROWS_ONLY"
        result["ok"] = len(sp) >= 0
        return result
    du = con.execute(oracle_sql).fetchdf()
    result["oracle_rows"] = len(du)
    if sorted(sp.columns) != sorted(du.columns):
        result["status"] = "SCHEMA_MISMATCH"
        result["detail"] = f"spark={sorted(sp.columns)} oracle={sorted(du.columns)}"
        result["ok"] = False
        return result
    a, b = _normalize(sp), _normalize(du)
    if len(a) != len(b):
        result["status"] = "ROWCOUNT_MISMATCH"
        result["ok"] = False
        return result
    mismatch = None
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                    continue
            if pd.isna(x) and pd.isna(y):
                continue
            if isinstance(x, float) and isinstance(y, int) and x == y:
                continue
            if isinstance(x, int) and isinstance(y, float) and x == y:
                continue
            if x != y:
                mismatch = (c, i, x, y)
                break
        if mismatch:
            break
    if mismatch:
        result["status"] = "VALUE_MISMATCH"
        result["detail"] = repr(mismatch)
        result["ok"] = False
    else:
        result["status"] = "MATCH"
        result["ok"] = True
    return result


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    from ..session import get_spark
    from .queries import REGISTRY

    spark = get_spark(master="local[8]")
    con = duck_connection(sf_dir)
    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            res = compare(name, fn(spark, sf_dir), sql, con)
        except Exception as exc:
            res = {"name": name, "status": "ERROR",
                   "detail": f"{type(exc).__name__}: {exc}", "ok": False}
        flag = "OK " if res.get("ok") else "FAIL"
        print(f"{flag} {name}: {res['status']} "
              f"{res.get('spark_rows', '')} {res.get('detail', '')[:300]}")
        if not res.get("ok"):
            failures += 1
    print(f"-- {failures} failures")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(only=sys.argv[1:] or None) else 0)
