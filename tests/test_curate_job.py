"""--job curate: the corpus-curation pipeline as a store-committed CLI
job (VERDICT r03 next #9). Ground truth is the oracle-paired
``corpus_curation`` query over the same parquet — the job must commit
exactly those representatives through the snapshot store."""

from __future__ import annotations

import json
import sys

import pytest

from pushkind_crawlers_spark.queries import corpus_curation
from pushkind_crawlers_spark.store.snapshots import SnapshotStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_path():
    return f"{SF}/documents.parquet"


def test_curate_job_commits_representatives(spark, tmp_path, docs_path, capsys):
    sys.path.insert(0, "/root/repo")
    import spark_submit_main as M

    store_root = str(tmp_path / "curate-store")
    M.main(["--store", store_root, "--job", "curate", "--input", docs_path],
           _stop_session=False)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # same parameters as the oracle-paired query -> identical output
    want = {
        (r["doc_id"], r["cluster_size"], r["n_tokens"], round(r["quality"], 9))
        for r in corpus_curation(spark, SF).collect()
    }
    store = SnapshotStore(store_root)
    got = {
        (r["doc_id"], r["cluster_size"], r["n_tokens"], round(r["quality"], 9))
        for r in store.table("corpus_reps").read(spark).collect()
    }
    assert got == want
    assert out["representatives"] == len(want)
    assert out["docs_in"] >= out["docs_after_filter"] >= out["representatives"]
    assert out["near_dup_removed"] == out["docs_after_filter"] - out["representatives"]
    assert out["snapshot_id"] == store.table("corpus_reps").current_snapshot_id()


def test_curate_rerun_supersedes_snapshot(spark, tmp_path, docs_path):
    """Re-curating overwrites atomically: a second run commits a new
    snapshot; rollback restores the first (curation runs are versioned
    like crawl rounds)."""
    from pushkind_crawlers_spark.plans.curate import run_corpus_curation

    store = SnapshotStore(str(tmp_path / "s"))
    docs = spark.read.parquet(docs_path)
    out1 = run_corpus_curation(spark, store, docs)
    out2 = run_corpus_curation(spark, store, docs, min_tokens=10**6)
    t = store.table("corpus_reps")
    assert out2["representatives"] == 0  # absurd filter keeps nothing
    assert t.read(spark).count() == 0
    t.rollback(out1["snapshot_id"])
    assert t.read(spark).count() == out1["representatives"]


def test_curate_requires_input(tmp_path):
    sys.path.insert(0, "/root/repo")
    import spark_submit_main as M

    with pytest.raises(SystemExit):
        M.main(["--store", str(tmp_path / "x"), "--job", "curate"],
               _stop_session=False)
