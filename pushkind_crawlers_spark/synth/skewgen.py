"""Deterministic hot-bucket corpus for skew evidence (VERDICT r04 #7).

Real crawl corpora are skewed: boilerplate/mirror pages form one huge
near-dup cluster, so ONE LSH bucket carries a large fraction of the
docs and its self-join partition dwarfs the median.  ``hot_cluster_docs``
builds that shape on demand: ``hot_frac`` of the docs share one base
text with only a tiny tail variation (previous shingles stay identical →
same minhash buckets), the rest are unique random-token docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_WORDS = [f"tok{i:03d}" for i in range(500)]


def hot_cluster_docs(n: int = 2000, hot_frac: float = 0.10,
                     seed: int = 23, base_len: int = 40) -> pd.DataFrame:
    """(doc_id long, text string): first ``hot_frac``·n docs are one
    near-dup cluster (shared base text, one varying tail token), the
    rest unique."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    base = " ".join(rng.choice(_WORDS, size=base_len))
    rows = []
    for i in range(n):
        if i < n_hot:
            text = f"{base} tail{i % 7}"
        else:
            text = " ".join(rng.choice(_WORDS, size=base_len))
        rows.append((i, text))
    return pd.DataFrame(rows, columns=["doc_id", "text"])
