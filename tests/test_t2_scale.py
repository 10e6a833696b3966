"""t2 correctness tier (FIXTURES.md): ~10k-row corpus, ~1.2M candidate
pairs, F1 ≥ 0.99 against ground truth at the fixed blocking key — the
BASELINE.json headline criterion at a scale where the feature space alone
cannot reach it (oracle-labeled glm ceiling ≈ 0.98; the labeling loops
close the rest)."""

import ray.data as rd

import raylink
from raylink.evaluate import pairwise_f1
from raylink.schema import prepare_corpus
from raylink.synth import make_corpus, truth_label_dict
from raylink.util import from_arrow_blocks


def test_t2_f1():
    ca, cb, truth = make_corpus(n_entities=2000, seed=43)
    oracle = raylink.DeterministicOracle(truth_label_dict(truth))
    cfg = raylink.LinkConfig(by="key", blocking=["lang"], seed=43)
    res = raylink.fuzzylink(
        prepare_corpus(from_arrow_blocks(ca)),
        prepare_corpus(from_arrow_blocks(cb)),
        oracle,
        cfg,
    )
    acc = res.accepted.select_columns(["block", "key_a", "key_b"]).to_pandas()
    scores = pairwise_f1(acc, truth)
    assert scores["f1"] >= 0.99, scores
    assert oracle.labels_spent <= cfg.max_labels
    assert res.metrics["n_candidate_pairs"] > 1_000_000
