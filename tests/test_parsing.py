"""Amount/units/price parsing parity — ports the reference's unit tests
(/root/reference/src/crawlers/rusteaco.rs:349-387) and asserts the Spark
column expressions agree with the pure-Python twins on every case.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.functions.parsing import (
    amount_col,
    clean_price_py,
    parse_amount_units_py,
    price_col,
    units_col,
)

# (raw, expected_amount, expected_units) — rusteaco.rs:349-387 + extensions
AMOUNT_CASES = [
    ("0.5 кг", 0.5, "кг"),          # two-token split
    ("0,5 кг", 0.5, "кг"),          # comma decimal
    ("100г", 100.0, "г"),            # regex single-token with unit
    ("/100 г", 100.0, "г"),          # leading slash stripped
    ("1,5л", 1.5, "л"),
    ("", 1.0, "шт"),                 # empty -> default
    ("abc", 1.0, "шт"),              # invalid -> default
    ("250", 250.0, "шт"),            # bare quantity
    ("  2 шт  ", 2.0, "шт"),
    ("50%", 50.0, "%"),
]

PRICE_CASES = [
    ("10,5", 10.5),                  # rusteaco golden
    ("1234,50", 1234.5),
    ("1 234,50", 1234.5),            # NBSP thousands separator
    ("1099 ₽", 1099.0),              # currency sign stripped
    ("oops", 0.0),                   # parse-or-0.0 (wintergreen.rs:229-242)
]


@pytest.mark.parametrize("raw,amount,units", AMOUNT_CASES)
def test_amount_units_python(raw, amount, units):
    assert parse_amount_units_py(raw) == (amount, units)


@pytest.mark.parametrize("raw,price", PRICE_CASES)
def test_price_python(raw, price):
    assert clean_price_py(raw) == price


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"raw": [c[0] for c in AMOUNT_CASES],
                      "praw": [c[0] for c in PRICE_CASES] * 2}),
    )
    rows = df.select(
        "raw", "praw",
        amount_col(F.col("raw")).alias("amount"),
        units_col(F.col("raw")).alias("units"),
        price_col(F.col("praw")).alias("price"),
    ).collect()
    for r in rows:
        assert (r["amount"], r["units"]) == parse_amount_units_py(r["raw"]), r["raw"]
        assert r["price"] == clean_price_py(r["praw"]), r["praw"]
