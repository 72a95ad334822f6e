"""Amount/units/price parsing + row validation — parity with the reference.

* ``parse_amount_units``: regex ``^\\s*(\\d+(?:[.,]\\d+)?)([a-zа-я%]*)\\s*$``
  (case-insensitive) after stripping leading '/' and whitespace; comma->dot;
  fallbacks: last-two-token split, one-token parse, default ``(1.0, "шт")``
  — reference ``src/crawlers/mod.rs:172-214`` (unit tests
  ``src/crawlers/rusteaco.rs:349-387``).
* price cleanup: comma->dot, strip spaces/NBSP/currency sign, parse-or-0.0
  — reference ``wintergreen.rs:229-242`` / ``teanadin.rs:262-268``.
* validation (``build_new_product``, ``src/crawlers/mod.rs:50-170``):
  empty sku/name/url -> reject; amount non-finite or <=0 -> NULL (kept);
  category/units/description empty -> NULL.

Everything is built-in column expressions (JVM-side, codegen'd) — no UDFs.
The pure-Python twins (`*_py`) drive the parity oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_AMOUNT = 1.0
DEFAULT_UNITS = "шт"

_AMOUNT_RE = r"(?i)^\s*(\d+(?:[.,]\d+)?)([a-zа-я%]*)\s*$"
_AMOUNT_RE_PY = re.compile(_AMOUNT_RE)


# ---------------------------------------------------------------- Spark side

def _try_double(col: Column) -> Column:
    # ANSI mode is on by default in Spark 4 — plain cast would throw
    return col.try_cast("double")


def _stripped(col: Column) -> Column:
    return F.ltrim(F.regexp_replace(col, r"^/+", ""))


def amount_col(raw: Column) -> Column:
    """Parsed amount (double) from a raw amount string column."""
    t = _stripped(raw)
    num = F.regexp_extract(t, _AMOUNT_RE, 1)
    toks = F.split(F.trim(t), r"\s+")
    n = F.size(toks)
    tok_last2 = F.element_at(toks, -2)
    tok_first = F.element_at(toks, 1)
    to_num = lambda c: _try_double(F.translate(c, ",", "."))  # noqa: E731
    return (
        F.when(raw.isNull(), F.lit(None).cast("double"))
        .when(num != "", F.coalesce(to_num(num), F.lit(DEFAULT_AMOUNT)))
        .when((n >= 2) & (F.trim(t) != ""), F.coalesce(to_num(tok_last2), F.lit(DEFAULT_AMOUNT)))
        .when((n == 1) & (F.trim(t) != ""), F.coalesce(to_num(tok_first), F.lit(DEFAULT_AMOUNT)))
        .otherwise(F.lit(DEFAULT_AMOUNT))
    )


def units_col(raw: Column) -> Column:
    """Parsed units (string) from a raw amount string column."""
    t = _stripped(raw)
    num = F.regexp_extract(t, _AMOUNT_RE, 1)
    unit = F.regexp_extract(t, _AMOUNT_RE, 2)
    toks = F.split(F.trim(t), r"\s+")
    n = F.size(toks)
    return (
        F.when(raw.isNull(), F.lit(None).cast("string"))
        .when(num != "", F.when(unit == "", F.lit(DEFAULT_UNITS)).otherwise(unit))
        .when((n >= 2) & (F.trim(t) != ""), F.element_at(toks, -1))
        .otherwise(F.lit(DEFAULT_UNITS))
    )


def price_col(raw: Column) -> Column:
    """Cleaned price (double): ','->'.', strip spaces/NBSP/currency, or 0.0."""
    cleaned = F.regexp_replace(F.translate(raw, ",", "."), "[\\s ₽]+", "")
    return F.when(raw.isNull(), F.lit(None).cast("double")).otherwise(
        F.coalesce(_try_double(cleaned), F.lit(0.0))
    )


def trim_to_null(col: Column) -> Column:
    """'' / whitespace-only -> NULL, else trimmed (mod.rs:38-47)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(None).cast("string")).otherwise(t)


def amount_filter(col: Column) -> Column:
    """Non-finite or <=0 amounts become NULL (mod.rs:118-128)."""
    return F.when(col.isNotNull() & ~F.isnan(col) & (col > 0.0) & (col != float("inf")), col)


def validate_products(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """build_new_product as a DataFrame split: (valid, rejects-with-reason).

    Expects columns sku, name, price (double), amount (double), url,
    category, units, description.  Invalid rows go to a rejects frame with
    a ``reject_reason`` column instead of log lines (mod.rs:50-170).
    """
    reason = (
        F.when(trim_to_null(F.col("sku")).isNull(), F.lit("invalid_sku"))
        .when(trim_to_null(F.col("name")).isNull(), F.lit("invalid_name"))
        .when(trim_to_null(F.col("url")).isNull(), F.lit("invalid_url"))
        .when(F.col("price").isNull() | F.isnan("price") | (F.col("price") < 0), F.lit("invalid_price"))
    )
    tagged = df.withColumn("reject_reason", reason)
    valid = (
        tagged.filter(F.col("reject_reason").isNull())
        .drop("reject_reason")
        .withColumn("sku", F.trim("sku"))
        .withColumn("name", F.trim("name"))
        .withColumn("category", trim_to_null(F.col("category")))
        .withColumn("units", trim_to_null(F.col("units")))
        .withColumn("description", trim_to_null(F.col("description")))
        .withColumn("amount", amount_filter(F.col("amount")))
    )
    rejects = tagged.filter(F.col("reject_reason").isNotNull())
    return valid, rejects


_ENTITIES = [  # decode order matters: &amp; must be LAST (it escapes the escaper)
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def unescape_entities_col(col: Column) -> Column:
    """S6: HTML entity decode before JSON parse (the reference unescapes
    embedded product JSON at src/crawlers/rusteaco.rs:275). Covers the
    named entities HTML-escaped JSON actually contains; pure JVM
    ``replace`` chain, SQL-twinnable via nested replace()."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def unescape_entities_sql(expr: str) -> str:
    """DuckDB twin of :func:`unescape_entities_col`."""
    out = expr
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return out


def unescape_entities_py(value: str | None) -> str | None:
    if value is None:
        return None
    out = value
    for ent, ch in _ENTITIES:
        out = out.replace(ent, ch)
    return out


# --------------------------------------------------------------- Python twin

def parse_amount_units_py(value: str | None) -> tuple[float, str]:
    if value is None:
        value = ""
    trimmed = value.lstrip("/").lstrip()
    m = _AMOUNT_RE_PY.match(trimmed)
    if m:
        try:
            amount = float(m.group(1).replace(",", "."))
        except ValueError:
            amount = DEFAULT_AMOUNT
        units = m.group(2) or DEFAULT_UNITS
        return amount, units
    tokens = trimmed.split()
    if len(tokens) >= 2:
        try:
            amount = float(tokens[-2].replace(",", "."))
        except ValueError:
            amount = DEFAULT_AMOUNT
        return amount, tokens[-1]
    if len(tokens) == 1:
        try:
            return float(tokens[0].replace(",", ".")), DEFAULT_UNITS
        except ValueError:
            return DEFAULT_AMOUNT, DEFAULT_UNITS
    return DEFAULT_AMOUNT, DEFAULT_UNITS


def clean_price_py(value: str | None) -> float | None:
    if value is None:
        return None
    cleaned = re.sub("[\\s ₽]+", "", value.replace(",", "."))
    try:
        return float(cleaned)
    except ValueError:
        return 0.0


def trim_to_none_py(value: str | None) -> str | None:
    if value is None:
        return None
    t = value.strip()
    return t or None


def amount_filter_py(value: float | None) -> float | None:
    import math

    if value is None or not math.isfinite(value) or value <= 0.0:
        return None
    return value
