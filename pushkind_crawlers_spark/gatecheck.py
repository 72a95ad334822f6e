"""Local mirror of the driver's correctness gate, runnable at any SF.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, comparing row count, sorted column
names, and the order-insensitive multiset of normalized values — the
same three checks the driver records in CORRECTNESS_r{N}.json.

Used by ``tests/test_queries_oracle.py`` (sf0.001, every query, every
run) and by ``scripts/oracle_mirror.py`` (ad-hoc sweeps at sf0.01 /
sf0.1, archived under bench_results/).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and represent with enough digits to catch real drift
        return f"{v + 0.0:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def duck_connect(sf_dir: str):
    """DuckDB connection with the testdata tables registered as views
    (mirrors the driver's setup)."""
    import duckdb

    from .queries import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_query(spark: SparkSession, duck, sf_dir: str, name: str) -> dict:
    """One gate row: {rows_match, schema_match, hash_match, spark_rows,
    oracle_rows, err} — the driver's record shape."""
    from .caching import release
    from .queries import QUERIES, full_oracle

    out = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sdf = QUERIES[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        release(sdf)
        scols = sdf.columns
        dres = duck.execute(full_oracle()[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        out["spark_rows"] = len(srows)
        out["oracle_rows"] = len(drows)
        out["rows_match"] = len(srows) == len(drows)
        out["schema_match"] = sorted(scols) == sorted(dcols)
        out["hash_match"] = (
            out["rows_match"] and out["schema_match"]
            and rows_to_multiset(srows, scols) == rows_to_multiset(drows, dcols)
        )
    except Exception as e:  # gate rows record errors, never raise
        out["err"] = f"{type(e).__name__}: {e}"
    return out


def run_gate(spark: SparkSession, sf_dir: str,
             names: list[str] | None = None) -> dict[str, dict]:
    """Run the gate for ``names`` (default: every oracle-paired query)."""
    from .queries import full_oracle

    oracle = full_oracle()
    names = names if names is not None else sorted(oracle)
    duck = duck_connect(sf_dir)
    try:
        return {n: check_query(spark, duck, sf_dir, n) for n in names}
    finally:
        duck.close()
