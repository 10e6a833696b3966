"""End-to-end linkage pipeline tests: golden presidents example, synthetic
corpus F1, invariants (dfA-completeness, sha256 preservation, label budget,
cutoff range), clustering equivalence."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import raylink
from raylink.cluster import cluster_label_propagation, cluster_union_find
from raylink.evaluate import pairwise_f1
from raylink.schema import prepare_corpus
from raylink.synth import make_corpus, presidents_tables, truth_label_dict


@pytest.fixture(scope="module")
def corpus_result():
    ca, cb, truth = make_corpus(n_entities=150, seed=42)
    dsa = prepare_corpus(rd.from_arrow(ca))
    dsb = prepare_corpus(rd.from_arrow(cb))
    oracle = raylink.DeterministicOracle(truth_label_dict(truth))
    cfg = raylink.LinkConfig(by="key", blocking=["lang"], seed=42)
    res = raylink.fuzzylink(dsa, dsb, oracle, cfg)
    return ca, cb, truth, res, oracle, cfg


def test_corpus_f1(corpus_result):
    ca, cb, truth, res, oracle, cfg = corpus_result
    acc = res.accepted.select_columns(["block", "key_a", "key_b"]).to_pandas()
    scores = pairwise_f1(acc, truth)
    assert scores["f1"] >= 0.99, scores


def test_label_budget_respected(corpus_result):
    *_, res, oracle, cfg = corpus_result
    assert oracle.labels_spent <= cfg.max_labels
    assert res.metrics["labels_spent"] <= cfg.max_labels + res.metrics.get(
        "n_accepted_pairs", 0
    )


def test_cutoff_in_range(corpus_result):
    *_, res, _, _ = corpus_result
    assert 0.0 <= res.cutoff <= 1.0


def test_linked_is_dfa_complete(corpus_result):
    ca, cb, truth, res, *_ = corpus_result
    linked = res.linked.to_pandas()
    # every dfA row appears at least once (right_join semantics,
    # R/fuzzylink.R:475)
    a_keys = pd.Series(
        [p.rsplit("/", 1)[-1].rsplit(".", 1)[0] for p in ca.column("path").to_pylist()]
    )
    a_ids = set(zip(ca.column("repo").to_pylist(), ca.column("path").to_pylist()))
    linked_ids = set(zip(linked["repo"], linked["path"]))
    assert a_ids <= linked_ids
    assert len(linked) >= len(ca)


def test_content_sha256_preserved(corpus_result):
    """Per-row invariant (BASELINE.json input_hint): every surviving row's
    content hashes to its content_sha256 column."""
    *_, res, _, _ = corpus_result
    linked = res.linked.to_pandas()
    for col, sha_col in (("content", "content_sha256"), ("content_b", "content_sha256_b")):
        sub = linked[linked[col].notna()]
        for c, s in zip(sub[col], sub[sha_col]):
            assert hashlib.sha256(c.encode()).hexdigest() == s


def test_exact_pairs_probability_one(corpus_result):
    *_, res, _, _ = corpus_result
    sp = res.scored_pairs.select_columns(
        ["key_a", "key_b", "match", "match_probability"]
    ).to_pandas()
    ex = sp[sp["key_a"] == sp["key_b"]]
    if len(ex):
        assert (ex["match_probability"] == 1.0).all()
        assert (ex["match"] == "Yes").all()


def test_presidents_golden_blocked():
    dfa, dfb, labels = presidents_tables()
    oracle = raylink.DeterministicOracle(labels)
    cfg = raylink.LinkConfig(
        by="name", blocking=["state"], seed=7, n_initial=20, al_batch_size=5
    )
    res = raylink.fuzzylink(rd.from_arrow(dfa), rd.from_arrow(dfb), oracle, cfg)
    linked = res.linked.to_pandas()
    m = dict(zip(linked["name"], linked["key_b"]))
    assert m["Joe Biden"] == "Joseph Robinette Biden"
    assert m["Barack Obama"] == "Barack Hussein Obama"
    assert m["George W. Bush"] == "George Walker Bush"
    assert m["Bill Clinton"] == "William Jefferson Clinton"
    # Trump: state mismatch -> NA-padded row (README.md:263-299)
    assert pd.isna(m["Donald Trump"])
    assert len(linked) == 5


def test_unblocked_run_drops_block_semantics():
    dfa, dfb, labels = presidents_tables()
    oracle = raylink.DeterministicOracle(labels)
    # n_initial covers the whole 5×8 pair set: with 40 candidate pairs the
    # initial labeling budget decides coverage, not the model
    cfg = raylink.LinkConfig(by="name", blocking=None, seed=7, n_initial=40, al_batch_size=5)
    res = raylink.fuzzylink(
        rd.from_arrow(dfa.select(["name", "age"])),
        rd.from_arrow(dfb.select(["name", "hobby"])),
        oracle,
        cfg,
    )
    linked = res.linked.to_pandas()
    m = dict(zip(linked["name"], linked["key_b"]))
    # without blocking, Trump matches (README.md:150-183)
    assert m["Donald Trump"] == "Donald John Trump "
    assert len(linked) == 5


def test_return_all_pairs_mode():
    dfa, dfb, labels = presidents_tables()
    oracle = raylink.DeterministicOracle(labels)
    cfg = raylink.LinkConfig(
        by="name", blocking=["state"], seed=7, n_initial=20,
        al_batch_size=5, return_all_pairs=True,
    )
    res = raylink.fuzzylink(rd.from_arrow(dfa), rd.from_arrow(dfb), oracle, cfg)
    assert res.linked is None
    sp = res.scored_pairs.to_pandas()
    # every within-block pair present with scores
    assert {"sim", "jw", "match_probability"} <= set(sp.columns)
    assert len(sp) == res.metrics["n_candidate_pairs"]


def test_dropped_row_counts_and_warning():
    """M2 parity: NA rows in key/blocking columns are counted and warned
    about (R/fuzzylink.R:61-70), and land in LinkResult.metrics."""
    dfa, dfb, labels = presidents_tables()
    pa_df = dfa.to_pandas()
    pa_df.loc[len(pa_df)] = {c: None for c in pa_df.columns}
    pb_df = dfb.to_pandas()
    pb_df.loc[len(pb_df)] = {c: None for c in pb_df.columns}
    pb_df.loc[len(pb_df)] = {c: None for c in pb_df.columns}
    oracle = raylink.DeterministicOracle(labels)
    cfg = raylink.LinkConfig(
        by="name", blocking=["state"], seed=7, n_initial=20, al_batch_size=5
    )
    with pytest.warns(UserWarning, match="Dropping"):
        res = raylink.fuzzylink(
            rd.from_pandas(pa_df), rd.from_pandas(pb_df), oracle, cfg
        )
    assert res.metrics["n_dropped_a"] == 1
    assert res.metrics["n_dropped_b"] == 2


def test_verbose_banners(capsys):
    """cfg.verbose=True prints the reference's stage banners
    (R/fuzzylink.R:94-100,158-164,228-234,319-334,486)."""
    dfa, dfb, labels = presidents_tables()
    oracle = raylink.DeterministicOracle(labels)
    cfg = raylink.LinkConfig(
        by="name", blocking=["state"], seed=7, n_initial=20,
        al_batch_size=5, verbose=True,
    )
    raylink.fuzzylink(rd.from_arrow(dfa), rd.from_arrow(dfb), oracle, cfg)
    out = capsys.readouterr().out
    for banner in (
        "Retrieving embeddings",
        "Computing similarity matrix",
        "Labeling Initial Training Set",
        "Fitting model",
        "Done!",
    ):
        assert banner in out, banner


def test_oracle_journal_roundtrip_with_separator(tmp_path):
    """Journal entries serialize as JSON arrays, so keys containing the
    blocking separator round-trip losslessly (ADVICE r1)."""
    from raylink.pipeline import _load_oracle_journal, _save_oracle_journal

    class _O:
        journal = {("a\x1fweird", "b"): "Yes", ("plain", "key"): "No"}

    src = _O()
    _save_oracle_journal(src, str(tmp_path))

    class _O2:
        journal = {}

    dst = _O2()
    _load_oracle_journal(dst, str(tmp_path))
    assert dst.journal == src.journal


def test_cluster_union_find_vs_label_propagation():
    edges = pd.DataFrame(
        {
            "block": ["x", "x", "x", "y"],
            "key_a": ["a", "b", "p", "a"],
            "key_b": ["b", "c", "q", "b"],
        }
    )
    uf = cluster_union_find(edges)
    ds = rd.from_arrow(pa.table(edges))
    lp = (
        cluster_label_propagation(ds)
        .to_pandas()
        .sort_values(["block", "key"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(uf, lp)
    # a,b,c one entity in block x; p,q another; (y,a,b) separate namespace
    m = {(r["block"], r["key"]): r["entity_id"] for _, r in uf.iterrows()}
    assert m[("x", "a")] == m[("x", "b")] == m[("x", "c")]
    assert m[("x", "p")] == m[("x", "q")] != m[("x", "a")]
    assert m[("y", "a")] == m[("y", "b")]
    assert m[("y", "a")] != m[("x", "a")]
