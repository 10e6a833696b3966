"""Embedder determinism/normalization, oracle semantics, fixture generators."""

import numpy as np
import pyarrow as pa

from raylink.embed import (
    HashedNgramEmbedder,
    embeddings_to_numpy,
    get_embeddings,
    get_similarity_matrix,
    matrix_to_arrow,
)
from raylink.oracle import DeterministicOracle, check_match, normalize_label
from raylink.synth import make_corpus, presidents_tables, truth_label_dict, voters_tables


def test_embedder_deterministic_and_normalized():
    e1 = HashedNgramEmbedder(dim=64)
    e2 = HashedNgramEmbedder(dim=64)
    v1 = e1.encode_one("string_utils")
    v2 = e2.encode_one("string_utils")
    assert np.array_equal(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    # similar strings more similar than dissimilar
    sim_close = float(v1 @ e1.encode_one("str_utils"))
    sim_far = float(v1 @ e1.encode_one("qqqq_zzzz"))
    assert sim_close > sim_far


def test_embedding_arrow_roundtrip():
    emb = HashedNgramEmbedder(dim=32)
    mat = emb.encode_many(["a", "bb", "ccc"])
    arr = matrix_to_arrow(mat)
    back = embeddings_to_numpy(arr, 32)
    assert np.array_equal(mat, back)
    # and through a pyarrow table + take (as in pair-gen)
    t = pa.table({"embedding": arr})
    taken = t.column("embedding").take(pa.array([2, 0]))
    back2 = embeddings_to_numpy(taken, 32)
    assert np.array_equal(back2, mat[[2, 0]])


def test_embedder_as_map_batches_udf():
    emb = HashedNgramEmbedder(dim=16, text_col="key")
    out = emb(pa.table({"key": ["x", "y"]}))
    assert out.column_names == ["key", "embedding"]
    assert embeddings_to_numpy(out.column("embedding"), 16).shape == (2, 16)


def test_get_similarity_matrix_parity():
    embs = get_embeddings(["UPS", "USPS", "Postal Service"], dim=64)
    m = get_similarity_matrix(embs)
    assert m.shape == (3, 3)
    assert np.allclose(np.diag(m), 1.0, atol=1e-5)
    m2 = get_similarity_matrix(embs, ["UPS"], ["USPS", "Postal Service"])
    assert m2.shape == (1, 2)


def test_oracle_exact_short_circuit_and_journal():
    o = DeterministicOracle({("a", "b"): "Yes"})
    assert o.label([("same", "same")]) == ["Yes"]
    assert o.label([("a", "b")]) == ["Yes"]
    assert o.label([("b", "a")]) == ["Yes"]  # symmetric lookup
    assert o.label([("a", "zzz")]) == ["No"]
    spent = o.labels_spent
    o.label([("a", "b")])  # journaled: no extra spend
    assert o.labels_spent == spent


def test_check_match_vector_interface():
    o = DeterministicOracle({})
    assert check_match(["x"], ["x"], o) == ["Yes"]
    try:
        check_match(["x"], ["x", "y"], o)
        raise AssertionError("expected length error")
    except ValueError:
        pass


def test_normalize_label():
    assert normalize_label(" yes\n") == "Yes"
    assert normalize_label("No, they differ") == "No"
    assert normalize_label("YES.") == "Yes"


def test_make_corpus_deterministic_and_schema():
    a1, b1, t1 = make_corpus(n_entities=50, seed=42)
    a2, b2, t2 = make_corpus(n_entities=50, seed=42)
    assert a1.equals(a2) and b1.equals(b2) and t1.equals(t2)
    assert a1.schema.names == ["repo", "path", "commit", "lang", "content"]
    # entities never span lang in truth
    assert set(t1.column("label").to_pylist()) <= {"Yes", "No"}
    a3, _, _ = make_corpus(n_entities=50, seed=7)
    assert not a1.equals(a3)


def test_truth_label_dict_yes_wins():
    t = pa.table(
        {"key_a": ["x", "x"], "key_b": ["y", "y"], "lang": ["py", "c"],
         "label": ["No", "Yes"]}
    )
    assert truth_label_dict(t)[("x", "y")] == "Yes"


def test_presidents_fixture_shape():
    dfa, dfb, labels = presidents_tables()
    assert len(dfa) == 5 and len(dfb) == 8
    assert labels[("George W. Bush", "George Herbert Walker Bush")] == "No"


def test_voters_fixture():
    va, vb, labels, truth = voters_tables(n_a=80, n_b=60, seed=42)
    assert va.num_rows == 80 and vb.num_rows == 60
    assert "full_name" in va.schema.names and "city" in vb.schema.names
    assert len(labels) > 0
