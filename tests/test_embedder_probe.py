"""Production embedder probe (VERDICT r03 missing #4).

The reference inits fastembed's TextEmbedding once and reuses it for
every batch (/root/reference/src/processing/benchmark.rs:60-67); the
Spark shape is an iterator-form pandas UDF whose encoder factory runs
once per task/partition. Proven here with an injected counting fake (a
real model is not installed offline); the fallback path is pinned
bit-identical to the oracle hash embedder.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators import similarity as S


def test_probe_absent_offline():
    """Neither fastembed nor sentence-transformers is installed in this
    container — the probe must resolve to None (hash fallback), not
    raise."""
    S.reset_text_encoder()
    try:
        assert S.real_text_encoder() is None
    finally:
        S.reset_text_encoder()


def test_auto_udf_fallback_bit_identical_to_hash_udf(spark):
    """With no model, auto_embed_udf output equals hash_embed_udf output
    exactly — the embed_fill oracle gate is unchanged on this path."""
    df = spark.createDataFrame(
        [(i, f"Name: prod {i}\nSKU: s{i}") for i in range(64)] + [(64, None)],
        "id int, prompt string",
    )
    a = df.select("id", S.hash_embed_udf(dim=16)("prompt").alias("e"))
    b = df.select("id", S.auto_embed_udf(dim=16)("prompt").alias("e"))
    av = {r["id"]: r["e"] for r in a.collect()}
    bv = {r["id"]: r["e"] for r in b.collect()}
    assert set(av) == set(bv)
    for k in av:
        assert av[k] == bv[k], k


def test_encoder_factory_resolves_once_per_partition(spark, tmp_path):
    """The injected factory leaves one marker file per invocation; with
    3 partitions and many Arrow batches per partition, exactly 3 markers
    appear — the model loads once per task, never per batch."""
    marker_dir = str(tmp_path / "init-markers")
    os.makedirs(marker_dir, exist_ok=True)

    def counting_factory(_dir=marker_dir):
        with open(os.path.join(_dir, uuid.uuid4().hex), "w") as f:
            f.write("init")

        def fake_encoder(texts):
            # constant unit vector: recognizably NOT the hash embedder
            out = np.zeros((len(texts), 4), dtype=np.float32)
            out[:, 0] = 2.0  # auto_embed_udf must L2-normalize this
            return out

        return fake_encoder

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(3000)], "id int, prompt string"
    ).repartition(3)
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        out = df.select(
            "id",
            S.auto_embed_udf(dim=4, encoder_factory=counting_factory)(
                "prompt"
            ).alias("e"),
        ).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)

    assert len(out) == 3000
    # fake model's output, L2-normalized by the UDF
    assert all(r["e"] == [1.0, 0.0, 0.0, 0.0] for r in out)
    # ~10 batches per partition, but exactly one init per partition
    assert len(glob.glob(os.path.join(marker_dir, "*"))) == 3


def test_real_encoder_normalizes_and_handles_null(spark):
    """A factory returning un-normalized vectors (some encoders don't
    normalize) comes out L2-normalized, and NULL prompts encode as empty
    string instead of crashing the worker."""

    def factory():
        def enc(texts):
            v = np.arange(1, len(texts) * 2 + 1, dtype=np.float32).reshape(-1, 2)
            return v

        return enc

    df = spark.createDataFrame([(0, "a"), (1, None)], "id int, prompt string")
    rows = {
        r["id"]: r["e"]
        for r in df.repartition(1).select(
            "id", S.auto_embed_udf(dim=2, encoder_factory=factory)("prompt").alias("e")
        ).collect()
    }
    for v in rows.values():
        assert pytest.approx(float(np.linalg.norm(v)), abs=1e-5) == 1.0
