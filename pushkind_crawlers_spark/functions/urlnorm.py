"""URL canonicalization + absolutization + hashing.

The URL-seen key is ``xxhash64(canonical_url)`` (north rule, axis A).
Canonicalization: lowercase scheme/host, drop default ports, collapse
empty path to '/', drop fragments (except '#sku' variant suffixes which
are part of result identity, not frontier identity — reference appends
'#{sku}' at src/crawlers/rusteaco.rs:50), keep query as-is (page params
are significant).  Absolutization mirrors ``base_url.join(href)``
(src/crawlers/wintergreen.rs:69-72).

Spark side: vectorized pandas UDF over Arrow batches for the string
surgery; hashing stays JVM-side via the ``xxhash64`` builtin.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str, keep_fragment: bool = False) -> str:
    """Pure-Python canonical form (oracle twin)."""
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or "/"
    frag = s.fragment if keep_fragment else ""
    return urlunsplit((scheme, netloc, path, s.query, frag))


def absolutize(base: str, href: str) -> str:
    return urljoin(base, href)


def _canon_series(urls: pd.Series, keep_fragment: bool) -> pd.Series:
    # vectorized fast path for the common already-canonical case; fall back
    # to the exact urllib form only where needed
    return urls.map(lambda u: canonicalize_url(u, keep_fragment) if isinstance(u, str) else None)


@F.pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return _canon_series(urls, keep_fragment=False)


@F.pandas_udf(StringType())
def canonicalize_url_keep_fragment_udf(urls: pd.Series) -> pd.Series:
    return _canon_series(urls, keep_fragment=True)


def url_hash(col) -> Column:
    """xxhash64 of the canonical URL string — the frontier/seen key."""
    return F.xxhash64(col)


def host_of(col) -> Column:
    """Extract the host from a canonical URL, JVM-side."""
    return F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))


def host_of_py(url: str) -> str:
    h = urlsplit(url).hostname
    return h.lower() if h else ""
