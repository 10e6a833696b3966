"""Streaming loop mode reaches the same linkage quality as the driver mode
(the sampling draws differ; the decisions must not)."""

import ray.data as rd

import raylink
from raylink.evaluate import pairwise_f1
from raylink.schema import prepare_corpus
from raylink.synth import make_corpus, truth_label_dict


def test_streaming_mode_f1():
    ca, cb, truth = make_corpus(n_entities=120, seed=42)
    oracle = raylink.DeterministicOracle(truth_label_dict(truth))
    cfg = raylink.LinkConfig(
        by="key", blocking=["lang"], seed=42, loop_mode="streaming"
    )
    res = raylink.fuzzylink(
        prepare_corpus(rd.from_arrow(ca)),
        prepare_corpus(rd.from_arrow(cb)),
        oracle,
        cfg,
    )
    assert res.metrics["loop_mode"] == "streaming"

    # pass economy (r2 VERDICT #2): each loop iteration streams the
    # pair-scale data at most ONCE — the model refit is driver-side from
    # cached features, the gradient rides the next sampling pass, and the
    # recall cutoff/frontier are incremental driver updates over a
    # two-pass one-time base. The recall loop may spend one trailing pass
    # that samples nothing (and is not counted as an iteration).
    passes = res.metrics["pair_passes"]
    assert passes["al"] == res.metrics["al_iterations"] + 1
    assert res.metrics["recall_iterations"] <= passes["recall"] <= res.metrics["recall_iterations"] + 1
    assert passes["recall_base"] == 2
    acc = res.accepted.select_columns(["block", "key_a", "key_b"]).to_pandas()
    scores = pairwise_f1(acc, truth)
    assert scores["f1"] >= 0.99, scores
    assert oracle.labels_spent <= cfg.max_labels

    # streaming mode keeps the accepted path distributed end-to-end:
    # linked is built by shuffle joins (dfA-complete), clusters by
    # distributed label propagation (a Dataset, not a driver table)
    import ray.data as _rd

    linked = res.linked.to_pandas()
    a_ids = set(zip(ca.column("repo").to_pylist(), ca.column("path").to_pylist()))
    linked_ids = set(zip(linked["repo"], linked["path"]))
    assert a_ids <= linked_ids
    assert isinstance(res.clusters, _rd.Dataset)
    cl = res.clusters.to_pandas()
    assert {"block", "key", "entity_id"} <= set(cl.columns)
    # every accepted edge endpoint got an entity id
    nodes = set(zip(acc["block"], acc["key_a"])) | set(zip(acc["block"], acc["key_b"]))
    assert nodes <= set(zip(cl["block"], cl["key"]))
