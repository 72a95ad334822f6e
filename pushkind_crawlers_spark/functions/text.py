"""Text-analysis column functions for the training-data pipeline.

Everything here is a JVM-side column expression (whole-stage codegen, no
Python in the hot path) designed to be byte-for-byte reproducible in ANSI
SQL so each operator gets a DuckDB oracle (`__spark_entry__.oracle_sql`).

Operators (graft brief "text analysis" axis):
* tokenization + token counting (whitespace)
* stopword ratio + quality scoring (length / punct / stopword mix)
* n-gram-heuristic language ID
* document fingerprinting (md5-based 60-bit stable hash of the
  normalized text — a deterministic stand-in for a rolling hash that
  both Spark and DuckDB can compute identically)

The md5→int64 trick: ``conv(substr(md5(s),1,15),16,10)`` keeps 60 bits,
always fits in a signed long, and equals DuckDB's
``CAST('0x'||substring(md5(s),1,15) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword list shared with the SQL oracle.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def md5long(col: Column) -> Column:
    """Stable 60-bit hash of a string column (Spark side of the pair)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5long` over a SQL expression string."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties dropped (matches string_split + filter)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def stopword_count_col(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))


def stopword_ratio_col(text: Column) -> Column:
    n = token_count_col(text)
    return F.when(n > 0, stopword_count_col(text).cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio_col(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    lowered = F.lower(text)
    clean = F.regexp_replace(lowered, "[a-z0-9 ]", "")
    return F.when(
        F.length(text) > 0, F.length(clean).cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))


def avg_token_len_col(text: Column) -> Column:
    n = token_count_col(text)
    total = F.aggregate(
        tokens_col(text), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Heuristic [0,1] quality: length band + stopword presence - punct noise.

    score = 0.4*min(n_tokens/100,1) + 0.4*min(stopword_ratio/0.1,1)
          + 0.2*(1 - min(punct_ratio/0.2,1))
    Mirrors the reference's validate-and-keep philosophy
    (/root/reference/src/crawlers/mod.rs:50-170) as a soft score.
    """
    ntok = token_count_col(text).cast("double")
    sw = stopword_ratio_col(text)
    pr = punct_ratio_col(text)
    return F.round(
        0.4 * F.least(ntok / 100.0, F.lit(1.0))
        + 0.4 * F.least(sw / 0.1, F.lit(1.0))
        + 0.2 * (1.0 - F.least(pr / 0.2, F.lit(1.0))),
        4,
    )


def lang_id_col(text: Column) -> Column:
    """N-gram-heuristic language ID: English if stopword-gram density high,
    else 'xx' (unknown). Deterministic, SQL-twinable."""
    return F.when(stopword_ratio_col(text) >= 0.02, F.lit("en")).otherwise(F.lit("xx"))


def fingerprint_col(text: Column) -> Column:
    """60-bit fingerprint of normalized text (lower, strip non-alnum)."""
    norm = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")
    return md5long(norm)


# --------------------------------------------------------------- SQL twins

def token_count_sql(expr: str) -> str:
    return f"len(list_filter(string_split({expr}, ' '), x -> x != ''))"


def stopword_count_sql(expr: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"len(list_filter(string_split(lower({expr}), ' '), "
        f"x -> list_contains([{words}], x)))"
    )


def stopword_ratio_sql(expr: str) -> str:
    n = token_count_sql(expr)
    return f"CASE WHEN {n} > 0 THEN CAST({stopword_count_sql(expr)} AS DOUBLE) / {n} ELSE 0.0 END"


def punct_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(length(regexp_replace(lower({expr}), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / length({expr}) ELSE 0.0 END"
    )


def quality_score_sql(expr: str) -> str:
    ntok = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    sw = stopword_ratio_sql(expr)
    pr = punct_ratio_sql(expr)
    return (
        f"round(0.4 * least({ntok}/100.0, 1.0) + 0.4 * least(({sw})/0.1, 1.0)"
        f" + 0.2 * (1.0 - least(({pr})/0.2, 1.0)), 4)"
    )


def lang_id_sql(expr: str) -> str:
    return f"CASE WHEN {stopword_ratio_sql(expr)} >= 0.02 THEN 'en' ELSE 'xx' END"


def fingerprint_sql(expr: str) -> str:
    norm = f"regexp_replace(lower({expr}), '[^a-z0-9 ]', '', 'g')"
    return md5long_sql(norm)
