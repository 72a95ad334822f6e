"""URL canonicalization edge cases (axis A key function).

The URL-seen key is xxhash64(canonical_url); any canonicalization
divergence between the Spark UDF, the JVM host extractor, and the
pure-Python oracle twin silently breaks seen-set parity — so the three
are locked together here on the awkward inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.functions.urlnorm import (
    absolutize,
    canonicalize_url,
    canonicalize_url_udf,
    host_of,
    host_of_py,
)

EDGE_URLS = [
    "HTTP://Example.COM/Path/To?q=1&b=2",      # scheme+host case, path case kept
    "http://example.com:80/x",                  # default port dropped
    "https://example.com:443/",                 # default port dropped (https)
    "http://example.com:8080/x",                # non-default port kept
    "http://example.com",                       # empty path -> '/'
    "http://example.com/p#frag",                # fragment dropped
    "http://example.com/p?a=2&a=1",             # query order preserved verbatim
    "http://example.com/a//b/../c",             # path NOT normalized (kept as-is)
    "  http://example.com/sp  ",                # surrounding whitespace stripped
]


@pytest.mark.parametrize("url,want", [
    ("HTTP://Example.COM/Path?q=1", "http://example.com/Path?q=1"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/", "https://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/p#frag", "http://example.com/p"),
    ("http://example.com/p?a=2&a=1", "http://example.com/p?a=2&a=1"),
])
def test_canonicalize_contract(url, want):
    assert canonicalize_url(url) == want


def test_canonicalize_keep_fragment_variant():
    assert canonicalize_url("http://e.com/p#sku9", keep_fragment=True) == "http://e.com/p#sku9"
    assert canonicalize_url("http://e.com/p#sku9") == "http://e.com/p"


def test_canonicalize_idempotent():
    for u in EDGE_URLS:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once, u


def test_spark_udf_equals_python_twin(spark):
    df = spark.createDataFrame([(u,) for u in EDGE_URLS], "raw string")
    got = {r["raw"]: r["canon"] for r in
           df.select("raw", canonicalize_url_udf(F.col("raw")).alias("canon")).collect()}
    for u in EDGE_URLS:
        assert got[u] == canonicalize_url(u), u


def test_host_of_jvm_equals_python(spark):
    canon = [canonicalize_url(u) for u in EDGE_URLS]
    df = spark.createDataFrame([(c,) for c in canon], "url string")
    got = {r["url"]: r["h"] for r in
           df.select("url", host_of(F.col("url")).alias("h")).collect()}
    for c in canon:
        assert got[c] == host_of_py(c), c


@pytest.mark.parametrize("base,href,want", [
    ("http://e.com/cat/p1", "/item/9", "http://e.com/item/9"),
    ("http://e.com/cat/", "item/9", "http://e.com/cat/item/9"),
    ("http://e.com/cat/p1", "item/9", "http://e.com/cat/item/9"),
    ("http://e.com/cat/p1", "http://other.com/x", "http://other.com/x"),
    ("http://e.com/cat/p1", "../up", "http://e.com/up"),
    ("http://e.com/cat/p1", "?page=2", "http://e.com/cat/p1?page=2"),
])
def test_absolutize_join_semantics(base, href, want):
    assert absolutize(base, href) == want
