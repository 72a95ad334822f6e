"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.001, compare row count,
sorted column names, and the order-insensitive multiset of values."""

from __future__ import annotations

import pytest

from pushkind_crawlers_spark.gatecheck import duck_connect, rows_to_multiset
from pushkind_crawlers_spark.queries import QUERIES, full_oracle

ORACLE = full_oracle()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


_rows_to_multiset = rows_to_multiset


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    dres = duck.execute(ORACLE[name])
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts {len(srows)} vs {len(drows)}"
    assert len(srows) > 0, f"{name}: empty result"
    sm = _rows_to_multiset([tuple(r) for r in srows], scols)
    dm = _rows_to_multiset(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b][:3]
    assert sm == dm, f"{name}: first mismatches {[(sm[i], dm[i]) for i in mism]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_nonsql_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    import importlib.util
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert "doc_id" in df.columns
