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


def test_entity_decode_twins_agree(spark):
    """S6: JVM replace chain == python twin == html.unescape on the
    entity subset that HTML-escaped JSON contains."""
    import html as _html

    import pandas as pd
    from pyspark.sql import functions as F

    from pushkind_crawlers_spark.functions.parsing import (
        unescape_entities_col,
        unescape_entities_py,
    )

    samples = [
        '[{&quot;sku&quot;: &quot;A-1&quot;, &quot;title&quot;: &quot;0.5 кг&quot;}]',
        "a &amp; b &lt;c&gt; &#39;d&#39; &quot;e&quot;",
        "no entities at all",
        "",
    ]
    df = spark.createDataFrame(pd.DataFrame({"s": samples}))
    got = [r["d"] for r in df.select(unescape_entities_col(F.col("s")).alias("d")).collect()]
    for s, g in zip(samples, got):
        assert g == unescape_entities_py(s)
        assert g == _html.unescape(s)


def test_world_emits_escaped_variants():
    """The S6 path must actually be exercised: the synthetic world serves
    BOTH escaped and raw variant JSON on the variant host."""
    import json

    from pushkind_crawlers_spark.functions.parsing import unescape_entities_py
    from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig

    world = SyntheticWorld(WorldConfig(
        seed=7, n_hosts=2, variant_host_idx=1, variant_fraction=0.6,
        categories_range=(3, 4), links_per_page=(8, 12),
        images_per_product=(0, 0),
    ))
    host = world.cfg.hosts()[world.cfg.variant_host_idx]
    hc = world.host_config(host)
    small_world = world
    escaped = raw = 0
    for pid in range(hc.n_products):
        doc = small_world.fetch(small_world.product_url(host, pid))
        if doc is None or not doc.variants_json:
            continue
        if "&quot;" in doc.variants_json:
            escaped += 1
        else:
            raw += 1
        json.loads(unescape_entities_py(doc.variants_json))  # always parses
    assert escaped > 0 and raw > 0


def test_robots_parser_sectioning():
    """robots.txt parse: only User-agent:* rules apply; comments and the
    empty Disallow (allow-all) are ignored; other agents' sections too."""
    from pushkind_crawlers_spark.operators.budget import parse_robots_py

    txt = (
        "# hi\n"
        "User-agent: *\n"
        "Disallow: /p/000001  # inline comment\n"
        "Disallow:\n"
        "Crawl-delay: 0.5\n"
        "\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "User-Agent: *\n"
        "disallow: /admin\n"
    )
    assert parse_robots_py(txt) == ["/p/000001", "/admin"]
    assert parse_robots_py(None) == []
    assert parse_robots_py("User-agent: badbot\nDisallow: /\n") == []


def test_world_robots_txt_matches_config():
    from pushkind_crawlers_spark.operators.budget import parse_robots_py
    from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig

    world = SyntheticWorld(WorldConfig(seed=7, n_hosts=3, robots_fraction=0.2))
    for h in world.cfg.hosts():
        assert parse_robots_py(world.robots_txt(h)) == world.host_config(h).robots_disallow
    assert world.robots_txt("nowhere.test") is None
