"""Checkpoint/resume: a re-run serves the pair stage from parquet, spends
zero new oracle labels (journal), and reproduces the identical accepted set."""

import json
import os

import pandas as pd
import ray.data as rd

import raylink
from raylink.schema import prepare_corpus
from raylink.synth import make_corpus, truth_label_dict


def _run(tmpdir, oracle):
    ca, cb, truth = make_corpus(n_entities=80, seed=42)
    cfg = raylink.LinkConfig(
        by="key", blocking=["lang"], seed=42, checkpoint_dir=str(tmpdir)
    )
    res = raylink.fuzzylink(
        prepare_corpus(rd.from_arrow(ca)),
        prepare_corpus(rd.from_arrow(cb)),
        oracle,
        cfg,
    )
    acc = (
        res.accepted.select_columns(["block", "key_a", "key_b"])
        .to_pandas()
        .sort_values(["block", "key_a", "key_b"])
        .reset_index(drop=True)
    )
    return res, acc


def test_resume_skips_and_is_identical(tmp_path):
    ca, cb, truth = make_corpus(n_entities=80, seed=42)
    labels = truth_label_dict(truth)

    o1 = raylink.DeterministicOracle(labels)
    res1, acc1 = _run(tmp_path, o1)
    assert o1.labels_spent > 0
    man = json.load(open(tmp_path / "pairs_featured" / "MANIFEST.json"))
    assert man["complete"] and man["rows"] == res1.metrics["n_candidate_pairs"]
    assert len(man["partitions"]) >= 1
    assert os.path.exists(tmp_path / "oracle_journal.json")

    # fresh oracle, same checkpoint dir: pair stage resumes, journal makes
    # every oracle call free
    o2 = raylink.DeterministicOracle(labels)
    res2, acc2 = _run(tmp_path, o2)
    assert o2.labels_spent == 0
    assert any(e["action"] == "resume" for e in res2.metrics["checkpoint"])
    pd.testing.assert_frame_equal(acc1, acc2)
    assert res1.cutoff == res2.cutoff


def test_streaming_resume_skips_and_is_identical(tmp_path):
    """Checkpoint + streaming loop mode: the parquet-backed pair stage and
    the oracle journal compose with the distributed loops/joins too."""
    ca, cb, truth = make_corpus(n_entities=80, seed=42)
    labels = truth_label_dict(truth)

    def _srun(oracle):
        cfg = raylink.LinkConfig(
            by="key", blocking=["lang"], seed=42,
            checkpoint_dir=str(tmp_path), loop_mode="streaming",
        )
        res = raylink.fuzzylink(
            prepare_corpus(rd.from_arrow(ca)),
            prepare_corpus(rd.from_arrow(cb)),
            oracle,
            cfg,
        )
        acc = (
            res.accepted.select_columns(["block", "key_a", "key_b"])
            .to_pandas()
            .sort_values(["block", "key_a", "key_b"])
            .reset_index(drop=True)
        )
        return res, acc

    o1 = raylink.DeterministicOracle(labels)
    res1, acc1 = _srun(o1)
    assert res1.metrics["loop_mode"] == "streaming"
    assert o1.labels_spent > 0

    o2 = raylink.DeterministicOracle(labels)
    res2, acc2 = _srun(o2)
    assert o2.labels_spent == 0
    assert any(e["action"] == "resume" for e in res2.metrics["checkpoint"])
    pd.testing.assert_frame_equal(acc1, acc2)
    assert res1.cutoff == res2.cutoff


def test_fingerprint_invalidation(tmp_path):
    labels = truth_label_dict(make_corpus(n_entities=80, seed=42)[2])
    o1 = raylink.DeterministicOracle(labels)
    _run(tmp_path, o1)

    # different corpus (different histograms) -> stage rebuilt, not reused
    ca, cb, truth = make_corpus(n_entities=90, seed=7)
    cfg = raylink.LinkConfig(
        by="key", blocking=["lang"], seed=7, checkpoint_dir=str(tmp_path)
    )
    res = raylink.fuzzylink(
        prepare_corpus(rd.from_arrow(ca)),
        prepare_corpus(rd.from_arrow(cb)),
        raylink.DeterministicOracle(truth_label_dict(truth)),
        cfg,
    )
    assert any(e["action"] == "build" for e in res.metrics["checkpoint"])
