"""Correctness tests for the training-data ops (dedup / ANN / text /
relational / multimodal plumbing)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.ops.ann import build_ivf_index, knn_brute_force, knn_ivf
from raylink.ops.dedup import (
    _shingles,
    dedup_exact,
    embedding_near_dups,
    minhash_lsh_candidates,
    ngram_jaccard_dedup,
    simhash_near_dups,
    verify_jaccard,
)
from raylink.ops.multimodal import decode_images, fake_media_table, sample_frames
from raylink.ops.relational import grouped_topk, preagg_sum_count, semi_join
from raylink.ops.text import TextStats, lang_id, fingerprints


def _docs():
    base = "the quick brown fox jumps over the lazy dog and keeps running all day"
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    base,
                    base,  # exact dup of 1
                    base.replace("dog", "cat"),  # near dup
                    "completely different content about databases and queries",
                    "another unrelated piece of text mentioning airplanes",
                ],
            }
        )
    )


def test_dedup_exact_min_id_survivor():
    out = dedup_exact(_docs()).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 3, 4, 5]  # doc 2 collapsed into 1


def test_minhash_lsh_finds_near_dups():
    docs = _docs()
    cands = minhash_lsh_candidates(docs, num_perm=64, bands=16)
    verified = verify_jaccard(cands, docs, threshold=0.6).to_pandas()
    got = set(zip(verified["id_a"], verified["id_b"]))
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p or 5 in p for p in got)
    # jaccard of the exact dup is 1
    exact = verified[(verified["id_a"] == 1) & (verified["id_b"] == 2)]
    assert exact["jaccard"].iloc[0] == 1.0


def test_simhash_near_dups():
    out = simhash_near_dups(_docs(), max_hamming=10).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in got
    ham12 = out[(out["id_a"] == 1) & (out["id_b"] == 2)]["hamming"].iloc[0]
    assert ham12 == 0


def test_embedding_near_dups():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 16))
    vecs[7] = vecs[3] + rng.normal(scale=0.01, size=16)  # near dup of 3
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": list(range(20)), "embedding": [list(map(float, v)) for v in vecs]}
        )
    )
    out = embedding_near_dups(ds, threshold=0.98, id_col="vec_id").to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert (3, 7) in got


def test_embedding_near_dups_recall_and_bucket_bound():
    """VERDICT r1 #5: multi-band LSH must reach recall ≥0.95 at threshold
    0.9 on a seeded fixture AND keep in-bucket group sizes bounded (no
    all-pairs in disguise)."""
    from ray.data.aggregate import Count

    from raylink.ops.dedup import lsh_band_signatures

    rng = np.random.default_rng(7)
    n_base, dim = 460, 32
    vecs = rng.normal(size=(n_base, dim))
    # plant 40 near-dups: cosine with their base ≥ 0.9 by construction
    truth = []
    planted = []
    for i in range(40):
        base = vecs[i]
        noisy = base + rng.normal(scale=0.18, size=dim)
        cos = float(
            base @ noisy / (np.linalg.norm(base) * np.linalg.norm(noisy))
        )
        planted.append(noisy)
        if cos >= 0.9:
            truth.append((i, n_base + i))
    allv = np.vstack([vecs, np.array(planted)])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": list(range(len(allv))),
                "embedding": [list(map(float, v)) for v in allv],
            }
        )
    )
    out = embedding_near_dups(
        ds, threshold=0.9, id_col="vec_id", target_bucket_rows=32
    ).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert len(truth) >= 20  # fixture actually exercises the threshold
    recall = len(got & set(truth)) / len(truth)
    assert recall >= 0.95, (recall, len(truth))
    # no false accepts: every emitted pair truly has cosine >= threshold
    norm = allv / np.linalg.norm(allv, axis=1, keepdims=True)
    for a, b in got:
        assert norm[a] @ norm[b] >= 0.9 - 1e-9
    # bucket occupancy stays far from the n/8-per-bucket r1 failure mode
    sig = lsh_band_signatures(ds, bands=16, bits_per_band=5, id_col="vec_id")
    occ = sig.groupby(["band", "bucket"]).aggregate(Count(alias_name="n")).to_pandas()
    assert occ["n"].max() <= len(allv) // 4


def test_knn_brute_force_matches_numpy():
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(50, 8))
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": list(range(50)), "embedding": [list(map(float, v)) for v in vecs]}
        )
    )
    q = vecs[0]
    res = knn_brute_force(ds, q, k=5, exclude_ids={0})
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ (q / np.linalg.norm(q))
    expect = sorted(
        [(s, i) for i, s in enumerate(sims) if i != 0], key=lambda t: (-t[0], t[1])
    )[:5]
    assert [i for _, i in res[0]] == [i for _, i in expect]
    for (sg, _), (se, _) in zip(res[0], expect):
        assert sg == pytest.approx(se)


def test_knn_ivf_high_recall_vs_bruteforce():
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(200, 8))
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": list(range(200)), "embedding": [list(map(float, v)) for v in vecs]}
        )
    )
    q = vecs[5]
    bf = {i for _, i in knn_brute_force(ds, q, k=5)[0]}
    cent, bucketed = build_ivf_index(ds, num_centroids=8, seed=3)
    iv = {i for _, i in knn_ivf(bucketed, cent, q, k=5, nprobe=4)[0]}
    assert len(bf & iv) >= 3  # approximate: most of top-5 recovered


def test_text_stats_hand_values():
    t = TextStats()
    out = t(pa.table({"text": ["ab c 12!", ""]}))
    assert out.column("n_chars").to_pylist() == [8, 0]
    assert out.column("n_words").to_pylist() == [3, 0]
    assert out.column("n_digits").to_pylist() == [2, 0]
    assert out.column("n_spaces").to_pylist() == [2, 0]


def test_repetition_stats_hand_values():
    from raylink.ops.text import RepetitionStats

    out = RepetitionStats()(
        pa.table({"text": ["a a b", "", "x", "go go go go"]})
    )
    assert out.column("n_tokens").to_pylist() == [3, 0, 1, 4]
    assert out.column("n_distinct").to_pylist() == [2, 0, 1, 1]
    assert out.column("top_word_cnt").to_pylist() == [2, 0, 1, 4]
    # bigrams: {"a a": 1, "a b": 1}; none; none; {"go go": 3}
    assert out.column("top_bigram_cnt").to_pylist() == [1, 0, 0, 3]
    assert out.column("top_word_frac").to_pylist() == [2 / 3, 0.0, 1.0, 1.0]
    assert out.column("top_bigram_frac").to_pylist() == [0.5, 0.0, 0.0, 1.0]
    assert out.column("distinct_frac").to_pylist() == [2 / 3, 0.0, 1.0, 0.25]


def test_decontaminate_flags_ngram_overlap():
    from raylink.ops.decontam import decontaminate, eval_ngram_set

    ev = rd.from_arrow(
        pa.table({"doc_id": [100], "text": ["the quick brown fox jumps"]})
    )
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "he saw the quick brown fox today",  # shares a 4-gram
                    "the quick red fox jumps",  # no shared 4-gram
                    "tiny",  # < n tokens
                ],
            }
        )
    )
    grams = eval_ngram_set(ev, n=4)
    assert "the quick brown fox" in grams and len(grams) == 2
    out = (
        decontaminate(corpus, grams, n=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [1, 0, 0]
    assert out["n_contaminated"].tolist() == [1, 0, 0]
    assert out["n_grams"].tolist() == [4, 2, 0]


def test_semantic_dedup_hand_values():
    from raylink.ops.semdedup import semantic_dedup

    # two well-separated clusters; ids 1/2 are near-identical in cluster A
    cent = np.array([[1.0, 0.0], [0.0, 1.0]])
    vecs = [
        [1.0, 0.01],   # id 1, cluster 0
        [1.0, 0.011],  # id 2, cluster 0 — near-dup of id 1 -> dropped
        [1.0, -0.9],   # id 3, cluster 0 but far from 1/2 -> kept
        [0.02, 1.0],   # id 4, cluster 1 -> kept
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        )
    )
    out = (
        semantic_dedup(ds, cent, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out["cluster"].tolist() == [0, 0, 0, 1]
    assert out["kept"].tolist() == [1, 0, 1, 1]


def test_semantic_dedup_gate_decision_margin():
    # The sf0.01 oracle gate decides kept/dropped by cosine >= 0.35; this
    # pins the corpus's nearest within-cluster pair-to-threshold distance
    # far above the ~1e-15 numpy/DuckDB float64 discrepancy, so the gate
    # cannot flip on arithmetic noise (same device as the flagship's
    # decision-margin test).
    from raylink.ops.ann import _normalize
    from raylink.ops.kmeans import assign_clusters, kmeans

    embs = rd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent = kmeans(embs, k=8, iters=5)
    df = assign_clusters(embs, cent).to_pandas()
    mat = _normalize(np.stack([np.asarray(v, float) for v in df["embedding"]]))
    cl = df["cluster"].to_numpy()
    margin = np.inf
    for c in np.unique(cl):
        sub = mat[cl == c]
        cos = sub @ sub.T
        iu = np.triu_indices(len(sub), 1)
        if len(iu[0]):
            margin = min(margin, float(np.abs(cos[iu] - 0.35).min()))
    assert margin > 1e-6, margin


def test_bigram_lm_hand_values():
    import math

    from raylink.ops.lm import fit_bigram_lm, lm_score

    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["a b", "a b", "a c"]})
    )
    lm = fit_bigram_lm(docs, vocab_size=10, k=0.5)
    assert lm.vocab == {"a", "b", "c"}
    assert lm.bigram == {("<s>", "a"): 3, ("a", "b"): 2, ("a", "c"): 1}
    assert lm.context == {"<s>": 3, "a": 3}
    out = lm_score(docs, lm).to_pandas().sort_values("doc_id")
    # V+1 = 4, k=0.5 -> denominators are ctx + 2.0
    nll_ab = -(math.log(3.5 / 5.0) + math.log(2.5 / 5.0))
    nll_ac = -(math.log(3.5 / 5.0) + math.log(1.5 / 5.0))
    assert np.allclose(out["nll"].to_numpy(), [nll_ab, nll_ab, nll_ac])
    assert out["n_scored"].tolist() == [2, 2, 2]
    assert np.allclose(out["ppl"].to_numpy(), np.exp(out["nll"] / 2))


def test_bigram_lm_unk_and_empty():
    from raylink.ops.lm import fit_bigram_lm, lm_score

    train = rd.from_arrow(
        pa.table({"doc_id": [1], "text": ["x x x x y"]})
    )
    lm = fit_bigram_lm(train, vocab_size=1, k=0.5)  # vocab = {x}, y -> <unk>
    assert lm.vocab == {"x"}
    assert lm.bigram[("x", "<unk>")] == 1
    out = lm_score(
        rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["z", ""]})), lm
    ).to_pandas().sort_values("doc_id")
    assert out["n_scored"].tolist() == [1, 0]
    assert out["nll"].iloc[1] == 0.0 and out["ppl"].iloc[1] == 0.0


def test_temperature_sample_rates_and_determinism():
    from raylink.ops.sample import id_hash, temperature_sample

    ids = np.arange(500, dtype=np.int64)
    grp = np.where(ids < 100, "small", "big")
    ds = rd.from_arrow(pa.table({"doc_id": ids, "src": grp}))
    out = temperature_sample(ds, "src", "doc_id", target_rows=200, alpha=0.5)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # exact expected keep set: thresholds 666667 (small: 200*10/30/100) and
    # 333333 (big: 200*20/30/400), hash rule replayed here directly
    hv = id_hash(ids) % np.uint64(1_000_000)
    thr = np.where(ids < 100, 666667, 333333).astype(np.uint64)
    expect = ids[hv < thr]
    assert df["doc_id"].tolist() == expect.tolist()
    # alpha<1 up-weights the small source
    frac_small = (df["src"] == "small").mean()
    kept_small = (df["src"] == "small").sum() / 100
    kept_big = (df["src"] == "big").sum() / 400
    assert kept_small > kept_big
    # re-run is identical (pure function, no RNG)
    df2 = temperature_sample(ds, "src", "doc_id", target_rows=200, alpha=0.5).to_pandas()
    assert sorted(df2["doc_id"]) == df["doc_id"].tolist()


def test_lang_id_english():
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": [1], "text": ["the cat is on the mat and it is happy"]}
        )
    )
    out = lang_id(ds).to_pandas()
    assert out["lang_pred"].iloc[0] == "en"


def test_fingerprint_deterministic():
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["abc", "abc"]}))
    out = fingerprints(ds).to_pandas()
    assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[1]


def test_grouped_topk_keeps_ties():
    ds = rd.from_arrow(
        pa.table(
            {"g": ["x"] * 4, "v": [5.0, 4.0, 4.0, 1.0], "id": [1, 2, 3, 4]}
        )
    )
    out = grouped_topk(ds, "g", "v", 2).to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]  # rank()<=2 keeps both 4.0s


def test_preagg_matches_pandas():
    df = pd.DataFrame(
        {"g": ["a", "b", "a", "b", "a"], "x": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    out = (
        preagg_sum_count(rd.from_pandas(df), ["g"], {"x": "sum_x"})
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    expect = df.groupby("g", as_index=False).agg(sum_x=("x", "sum"), n=("x", "size"))
    assert out["sum_x"].tolist() == expect["sum_x"].tolist()
    assert out["n"].tolist() == expect["n"].tolist()


def test_semi_join_broadcast():
    ds = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}))
    out = semi_join(ds, "k", {2, 4}).to_pandas()
    assert sorted(out["v"]) == ["b", "d"]


def test_multimodal_plumbing():
    media = rd.from_arrow(fake_media_table(9, seed=1))
    feats = decode_images(media, dim=8, fake=True).to_pandas()
    assert len(feats) == 9 and len(feats["feat"].iloc[0]) == 8
    frames = sample_frames(media, every_ms=500, fake=True).to_pandas()
    assert (frames["frame_ms"] % 500 == 0).all()
    with pytest.raises(Exception):
        decode_images(media, fake=False).take(1)


def test_dedup_ops_empty_hot_set():
    """Corpora with zero duplicate candidates exercise the no-hot-bucket
    fast path (empty typed result, no crash)."""
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "totally unique first",
                    "second thing entirely",
                    "third unrelated text",
                ],
            }
        )
    )
    assert minhash_lsh_candidates(docs, num_perm=32, bands=8).count() == 0
    assert simhash_near_dups(docs, max_hamming=1).count() == 0


def test_hash_dedup_equals_pandas_drop_duplicates():
    """_hash_dedup (hash-partitioned distributed drop-duplicates) must
    agree with pandas drop_duplicates for every key, regardless of which
    partition routing the mix64 fold picks."""
    from raylink.ops.dedup import _hash_dedup

    rng = np.random.default_rng(7)
    ida = rng.integers(0, 40, size=500)
    idb = rng.integers(0, 40, size=500)
    extra = rng.integers(0, 1000, size=500)
    df = pd.DataFrame({"id_a": ida, "id_b": idb, "v": extra})
    got = (
        _hash_dedup(rd.from_pandas(df), ["id_a", "id_b"], num_partitions=7)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = (
        df.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # same key set; the kept v must be one of that key's original values
    pd.testing.assert_frame_equal(got[["id_a", "id_b"]], want[["id_a", "id_b"]])
    merged = got.merge(df, on=["id_a", "id_b"], how="left", suffixes=("", "_orig"))
    assert (
        merged.groupby(["id_a", "id_b"])
        .apply(lambda g: (g["v"].iloc[0] == g["v_orig"]).any(), include_groups=False)
        .all()
    )


def test_hot_bucket_pairs_equal_bruteforce():
    """The single-shuffle hot-bucket pair generator must emit exactly the
    within-bucket pairs a naive pandas pass produces, for any partition
    count (including P=1 and P much larger than the bucket count)."""
    from raylink.ops.dedup import _pairs_in_hot_buckets

    rng = np.random.default_rng(11)
    n = 400
    band = rng.integers(0, 4, size=n)
    bucket = rng.integers(0, 30, size=n)
    ids = rng.permutation(10_000)[:n]
    tbl = pa.table(
        {
            "band": pa.array(band.astype(np.int32)),
            "bucket": pa.array(bucket.astype(np.int64)),
            "doc_id": pa.array(ids.astype(np.int64)),
        }
    )

    def _pair_fn(group) -> pa.Table:
        g = group["doc_id"].to_numpy() if isinstance(group, pd.DataFrame) else group
        v = np.sort(np.asarray(g))
        if len(v) < 2:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(len(v), k=1)
        return pa.table({"id_a": pa.array(v[ii]), "id_b": pa.array(v[jj])})

    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64())})

    want = set()
    dfp = tbl.to_pandas()
    for _, g in dfp.groupby(["band", "bucket"]):
        v = np.sort(g["doc_id"].to_numpy())
        for i in range(len(v)):
            for j in range(i + 1, len(v)):
                want.add((v[i], v[j]))

    for P in (1, 5, 64):
        got = _pairs_in_hot_buckets(
            rd.from_arrow(tbl), ["band", "bucket"], _pair_fn,
            empty_out=empty, num_partitions=P,
        ).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == want, f"P={P}"


def test_verify_jaccard_grid_equals_attach():
    """The G×G grid exchange and the attach-join exchange must verify the
    same pairs with identical jaccard/counts — they are two routings of
    the same computation."""
    from raylink.ops.dedup import minhash_lsh_candidates, verify_jaccard

    base = [
        "the quick brown fox jumps over the lazy dog every single day",
        "an entirely different sentence about databases and query engines",
        "yet another unrelated string mentioning airplanes and travel",
    ]
    rows = []
    for r in range(6):
        for i, t in enumerate(base):
            rows.append((r * 100 + i, f"v{r} {t}"))
    tbl = pa.table({"doc_id": pa.array([i for i, _ in rows], type=pa.int64()),
                    "text": [t for _, t in rows]})
    docs = rd.from_arrow(tbl)
    cands = minhash_lsh_candidates(docs, num_perm=32, bands=8).materialize()
    assert cands.count() > 0

    def _run(mode):
        return (
            verify_jaccard(cands, docs, threshold=0.5, emit_counts=True, mode=mode)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    a, g = _run("attach"), _run("grid")
    pd.testing.assert_frame_equal(a, g)
    assert len(a) > 0


def test_embedding_near_dups_grid_path_matches_bruteforce():
    """A duplicate-heavy vector corpus (candidates >> vectors) drives the
    cosine verify down the GxG grid exchange; results must equal the
    brute-force all-pairs cosine at the same threshold."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(3, 16))
    vecs, ids = [], []
    for gi in range(3):
        for j in range(30):
            v = base[gi] + rng.normal(scale=0.01, size=16)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            ids.append(gi * 100 + j)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    got = (
        embedding_near_dups(ds, threshold=0.99, bands=8, bits_per_band=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ids_arr = np.asarray(ids)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= 0.99:
                a, b = sorted((ids_arr[i], ids_arr[j]))
                want.add((a, b))
    # the within-group candidates (>=1305) far exceed 8x the 90 vectors,
    # so this exercised the grid route; recall at these tight clusters is
    # effectively 1 for bands=8, r=4
    assert set(zip(got["id_a"], got["id_b"])) == want
    np.testing.assert_allclose(
        got["cosine"].to_numpy(),
        [sims[list(ids_arr).index(a), list(ids_arr).index(b)]
         for a, b in zip(got["id_a"], got["id_b"])],
        rtol=1e-10,
    )


def test_shingles_jaccard_sanity():
    a = _shingles("hello world program")
    b = _shingles("hello world programs")
    j = len(a & b) / len(a | b)
    assert 0.7 < j < 1.0


def test_ngram_jaccard_dedup_equals_bruteforce():
    docs = _docs()
    out = ngram_jaccard_dedup(
        docs, threshold=0.5, max_df=5, emit_counts=True
    ).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # with max_df = corpus size the inverted index has total recall, so the
    # composition must equal all-pairs shingle Jaccard >= t exactly
    pdf = docs.to_pandas()
    sh = {r.doc_id: _shingles(r.text) for r in pdf.itertuples()}
    expect = set()
    for a in sh:
        for b in sh:
            if a < b and sh[a] | sh[b]:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= 0.5:
                    expect.add((a, b))
    assert got == expect and got
    for r in out.itertuples():
        assert r.n_common == len(sh[r.id_a] & sh[r.id_b])
        assert r.n_union == len(sh[r.id_a] | sh[r.id_b])


def test_ngram_jaccard_max_df_prunes_all_common_grams():
    # df cap below 2 means no posting list can pair anything
    out = ngram_jaccard_dedup(_docs(), threshold=0.1, max_df=1).to_pandas()
    assert len(out) == 0


def test_anti_join_matches_pandas():
    from raylink.ops.relational import anti_join

    left = pd.DataFrame(
        {"k": np.arange(20, dtype=np.int64), "v": np.arange(20, dtype=np.int64) * 10}
    )
    right = pd.DataFrame({"k": np.array([1, 3, 3, 7, 19, 50], dtype=np.int64)})
    got = (
        anti_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            ["k"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = left[~left["k"].isin(right["k"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_anti_join_empty_right_keeps_all():
    from raylink.ops.relational import anti_join

    left = pd.DataFrame({"k": np.array([5, 6], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([], dtype=np.int64)})
    got = anti_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        ["k"],
    ).to_pandas()
    assert sorted(got["k"]) == [5, 6]


# ---- sampling / selection (raylink/ops/sample.py) ----


def test_select_kth_matches_numpy_sort():
    from raylink.ops.sample import select_kth

    rng = np.random.default_rng(11)
    vals = rng.integers(-(10**9), 10**9, size=5003)
    ds = rd.from_arrow(pa.table({"v": vals}))
    srt = np.sort(vals)
    for k in (1, 2, 2501, 5003):
        assert select_kth(ds, "v", k) == int(srt[k - 1])
    # tiny bucket count forces multiple bisection passes over the int64 range
    assert select_kth(ds, "v", 2501, num_buckets=7) == int(srt[2500])


def test_quantile_filter_threshold_by_value_keeps_ties():
    from raylink.ops.sample import quantile_filter

    # 10 rows, value 5 repeated around the 0.8-quantile boundary
    vals = np.array([1, 2, 3, 4, 5, 5, 5, 5, 9, 10])
    ds = rd.from_arrow(pa.table({"v": vals}))
    thr, kept = quantile_filter(ds, "v", 0.8)
    assert thr == 5  # ceil(0.8*10)=8th smallest = 5
    got = sorted(kept.to_pandas()["v"])
    assert got == [5, 5, 5, 5, 9, 10]  # ALL ties at the threshold survive


def test_stratified_sample_is_deterministic_hash_topn():
    from raylink.ops.sample import id_hash, stratified_sample

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {"doc_id": np.arange(n), "g": rng.choice(["x", "y", "z"], n)}
    )
    out = stratified_sample(rd.from_pandas(df), "g", "doc_id", 25).to_pandas()
    assert sorted(out["g"].value_counts()) == [25, 25, 25]
    exp = (
        df.assign(_h=id_hash(df["doc_id"].to_numpy()).astype(np.int64))
        .sort_values(["_h", "doc_id"], kind="stable")
        .groupby("g", sort=False)
        .head(25)
    )
    assert sorted(out["doc_id"]) == sorted(exp["doc_id"])
    # repartitioning must not change the sample (pure function of the data)
    out2 = stratified_sample(
        rd.from_pandas(df).repartition(13), "g", "doc_id", 25
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_uniform_sample_k_exact_and_partitioning_independent():
    from raylink.ops.sample import id_hash, uniform_sample_k

    n = 3000
    df = pd.DataFrame(
        {"doc_id": np.arange(n), "g": (np.arange(n) % 5).astype("U2")}
    )
    hv = id_hash(df["doc_id"].to_numpy()).astype(np.int64)
    order = np.lexsort((df["doc_id"].to_numpy(), hv))
    for k in (1, 250, n):
        out = uniform_sample_k(rd.from_pandas(df), "doc_id", k).to_pandas()
        assert sorted(out["doc_id"]) == sorted(order[:k].tolist())
        assert list(out.columns) == ["doc_id", "g"]
    # repartitioning must not change the sample (pure function of the data)
    out13 = uniform_sample_k(
        rd.from_pandas(df).repartition(13), "doc_id", 250
    ).to_pandas()
    assert sorted(out13["doc_id"]) == sorted(order[:250].tolist())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        uniform_sample_k(rd.from_pandas(df), "doc_id", 0)


# ---- distributed spherical k-means (raylink/ops/kmeans.py) ----


def _kmeans_reference(ids, emb, k, iters, tol=1e-6):
    """Single-process replica of ops.kmeans.kmeans (same init, same
    update rule, same stop metric)."""
    from raylink.ops.sample import id_hash

    mat = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    order = np.lexsort((ids, id_hash(ids).astype(np.int64)))[:k]
    cent = mat[order].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        new = cent.copy()
        shift = 0.0
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                total = members.sum(axis=0)
                norm = np.linalg.norm(total)
                if norm > 0:
                    v = total / norm
                    shift = max(shift, float(np.abs(v - cent[c]).max()))
                    new[c] = v
        cent = new
        if shift < tol:
            break
    return cent, np.argmax(mat @ cent.T, axis=1)


def test_kmeans_matches_single_process_reference():
    from raylink.ops.kmeans import assign_clusters, kmeans

    rng = np.random.default_rng(5)
    n, d, k = 3000, 16, 6
    emb = rng.normal(size=(n, d))
    ids = np.arange(n)
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(list(emb))})
    ).repartition(7)
    cent = kmeans(ds, k=k, iters=8)
    ref_cent, ref_assign = _kmeans_reference(ids, emb, k, iters=8)
    assert np.allclose(cent, ref_cent, atol=1e-8)
    got = (
        assign_clusters(ds, cent)
        .select_columns(["vec_id", "cluster"])
        .to_pandas()
        .sort_values("vec_id")
    )
    assert (got["cluster"].to_numpy() == ref_assign).all()
    # every cluster non-trivial on gaussian data
    assert got["cluster"].nunique() == k


def test_ivf_accepts_precomputed_centroids():
    from raylink.ops.kmeans import kmeans

    rng = np.random.default_rng(9)
    emb = rng.normal(size=(500, 8))
    ds = rd.from_arrow(
        pa.table({"vec_id": np.arange(500), "embedding": pa.array(list(emb))})
    )
    cent = kmeans(ds, k=4, iters=4)
    out_cent, bucketed = build_ivf_index(ds, centroids=cent)
    assert np.allclose(out_cent, cent)
    df = bucketed.to_pandas().sort_values("vec_id")
    mat = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    assert (df["bucket"].to_numpy() == np.argmax(mat @ cent.T, axis=1)).all()


def test_vocab_topk_counts_and_tie_order():
    from raylink.ops.text import vocab_topk

    docs = rd.from_items(
        [
            {"text": "the cat sat on the MAT"},
            {"text": "the mat, the cat!"},
            {"text": "Dog dog dog bird"},
        ]
    ).repartition(3)
    out = vocab_topk(docs, k=4).to_pandas()
    # counts: the=4, cat=2, mat=2, dog=3, others 1 → top4 by (cnt desc, tok)
    assert list(out["token"]) == ["the", "dog", "cat", "mat"]
    assert list(out["cnt"]) == [4, 3, 2, 2]


def test_vocab_topk_k_larger_than_vocab():
    from raylink.ops.text import vocab_topk

    docs = rd.from_items([{"text": "a b a"}])
    out = vocab_topk(docs, k=10).to_pandas()
    assert list(out["token"]) == ["a", "b"]
    assert list(out["cnt"]) == [2, 1]


def test_split_by_hash_deterministic_and_partition_invariant():
    from raylink.ops.sample import id_hash, split_by_hash

    ids = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"doc_id": ids})
    for nparts in (1, 7):
        out = (
            split_by_hash(rd.from_arrow(tbl).repartition(nparts), "doc_id", 25)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        expect = np.where(id_hash(ids) % 100 < 25, "test", "train")
        assert (out["split"].to_numpy() == expect).all()
    frac = (expect == "test").mean()
    assert 0.15 < frac < 0.35  # roughly pct-sized split


def test_split_by_hash_rejects_bad_pct():
    from raylink.ops.sample import split_by_hash

    with pytest.raises(ValueError):
        split_by_hash(rd.from_items([{"doc_id": 1}]), "doc_id", 101)


def test_bm25_topk_matches_naive_reference():
    import math
    import re as _re

    from raylink.ops.text import bm25_topk

    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple apple apple durian"),
        (4, "cherry cherry banana banana"),
        (5, ""),
        (6, "unrelated words only"),
    ]
    query, k1, b = "apple banana", 1.5, 0.75
    toks = {i: [w.lower() for w in _re.findall(r"\w+", t, _re.ASCII)] for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    expect = {}
    for term in ["apple", "banana"]:
        df = sum(1 for v in toks.values() if term in v)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                expect[i] = expect.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(v) / avgdl)
                )
    want = sorted(
        ((int(round(s * 1e6)), i) for i, s in expect.items()),
        key=lambda x: (-x[0], x[1]),
    )[:3]
    for nparts in (1, 4):
        ds = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in docs]
        ).repartition(nparts)
        out = bm25_topk(ds, query, k=3).to_pandas()
        got = list(zip(out["bm25_e6"], out["doc_id"]))
        assert got == want, (got, want, nparts)


def test_bm25_topk_empty_query_raises():
    from raylink.ops.text import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(rd.from_items([{"doc_id": 1, "text": "x"}]), "!!!")


def test_minhash_incremental_matches_selfjoin_restriction():
    """Broadcast-probe incremental candidates == the (shard-role ×
    corpus) restriction of what the self-join LSH emits, plus identity
    hits. Built from a corpus with known near-dup pairs."""
    from raylink.ops.dedup import (
        minhash_incremental_candidates,
        minhash_lsh_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    rows = []
    for i in range(20):
        if i % 4 == 0:
            rows.append({"doc_id": i, "text": base + f"variant {i % 2}"})
        else:
            rows.append({"doc_id": i, "text": f"unique document {i} " + "z" * i})
    corpus = rd.from_items(rows).repartition(3)
    shard_ids = {i for i in range(20) if i % 5 == 0}

    def _shard(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(ids, list(shard_ids))))

    new = corpus.map_batches(_shard, batch_format="pyarrow")
    inc = minhash_incremental_candidates(new, corpus, num_perm=32, bands=8)
    got = {tuple(r) for r in inc.to_pandas()[["id_new", "id_corpus"]].to_numpy()}

    self_pairs = minhash_lsh_candidates(corpus, num_perm=32, bands=8).to_pandas()
    expect = {(i, i) for i in shard_ids}
    for a, b in self_pairs[["id_a", "id_b"]].to_numpy():
        if a in shard_ids:
            expect.add((a, b))
        if b in shard_ids:
            expect.add((b, a))
    assert got == expect
    # the identity hits prove every shard doc finds its corpus copy
    assert {(i, i) for i in shard_ids} <= got


def test_curate_documents_end_to_end():
    """Hand-built corpus: a German doc (lang filter), an exact duplicate
    (min-id survives), a near-duplicate pair (min-id survives), and clean
    docs. Split must replay the id_hash rule."""
    from raylink.ops.curate import curate_documents
    from raylink.ops.sample import id_hash

    base = (
        "the cat and the dog went to the market and it was a fine day for "
        "everyone that is walking with a basket of apples "
    )
    rows = [
        {"doc_id": 0, "text": base + "alpha"},
        {"doc_id": 1, "text": base + "alpha"},            # exact dup of 0
        {"doc_id": 2, "text": base + "alpha beta"},       # near-dup of 0/1
        {"doc_id": 3, "text": "der hund und die katze ist nicht ein mit für von auf den " * 3},
        {"doc_id": 4, "text": "it is that the for with was on as " + "fresh words here " * 6},
    ]
    ds = rd.from_items(rows).repartition(2)
    out = (
        curate_documents(ds, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 1 drops as exact dup, 2 as near-dup (component {0,1,2} -> min 0),
    # 3 drops by lang; 0 and 4 survive
    assert list(out["doc_id"]) == [0, 4]
    ids = out["doc_id"].to_numpy()
    expect_split = np.where(id_hash(ids) % 100 < 10, "test", "train")
    assert (out["split"].to_numpy() == expect_split).all()


def test_pii_scrub_patterns():
    from raylink.ops.text import pii_scrub

    rows = [
        {"doc_id": 0, "text": "mail a.b+c%d@sub.example.org now"},
        {"doc_id": 1, "text": "ip 192.168.001.255 and 1.2.3.4, not 1.2.3"},
        {"doc_id": 2, "text": "call +49 030-555-123 or +1 555 010 007"},
        {"doc_id": 3, "text": "clean text without identifiers"},
    ]
    out = (
        pii_scrub(rd.from_items(rows))
        .to_pandas()
        .sort_values("doc_id")["text_scrubbed"]
        .tolist()
    )
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "ip <IP> and <IP>, not 1.2.3"
    assert out[2] == "call <PHONE> or <PHONE>"
    assert out[3] == "clean text without identifiers"


def test_group_quantiles_matches_duckdb_disc():
    import duckdb

    from raylink.ops.sample import group_quantiles

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"u": rng.integers(0, 97, 30_000), "x": rng.normal(size=30_000)}
    )
    got = (
        group_quantiles(
            rd.from_pandas(df), "u", "x", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    got["u"] = got["u"].astype("int64")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT u, count(*)::BIGINT AS n,
                  quantile_disc(x, 0.5) AS p50,
                  quantile_disc(x, 0.9) AS p90,
                  quantile_disc(x, 0.99) AS p99
           FROM t GROUP BY u ORDER BY u"""
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_group_quantiles_singleton_and_tiny_groups():
    from raylink.ops.sample import group_quantiles

    df = pd.DataFrame({"u": [1, 2, 2, 3, 3, 3], "x": [5.0, 2.0, 1.0, 9.0, 7.0, 8.0]})
    got = (
        group_quantiles(rd.from_pandas(df), "u", "x", {"p50": 0.5, "p100": 1.0})
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    # n=1 -> the element; n=2 p50 -> lower element; n=3 p50 -> middle
    assert got["p50"].tolist() == [5.0, 1.0, 8.0]
    assert got["p100"].tolist() == [5.0, 2.0, 9.0]
    assert got["n"].tolist() == [1, 2, 3]


def test_rollup_agg_matches_duckdb_rollup():
    import duckdb

    from raylink.ops.relational import rollup_agg

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "a": rng.choice(list("xyz"), 5000),
            "b": rng.choice(list("pqrs"), 5000),
            "v": rng.integers(0, 1000, 5000),
        }
    )
    got = (
        rollup_agg(rd.from_pandas(df), ["a", "b"], {"v": "sum_v"})
        .to_pandas()
        .sort_values(["lvl", "a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT (2 - GROUPING(a) - GROUPING(b))::BIGINT AS lvl, a, b,
                  SUM(v)::BIGINT AS sum_v, COUNT(*)::BIGINT AS n
           FROM t GROUP BY ROLLUP(a, b) ORDER BY lvl, a, b"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # grand total is the full row count exactly once
    assert got[got.lvl == 0]["n"].tolist() == [5000]


def test_bcubed_evidence_matches_duckdb_counts():
    import duckdb

    from raylink.evaluate import bcubed_evidence

    rng = np.random.default_rng(8)
    n = 20_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "cluster_id": rng.integers(0, 900, n),
            "truth_id": rng.integers(0, 800, n),
        }
    )
    got = (
        bcubed_evidence(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("a", df)
    want = con.execute(
        """SELECT a.doc_id,
                  (SELECT count(*) FROM a x
                   WHERE x.cluster_id = a.cluster_id
                     AND x.truth_id = a.truth_id)::BIGINT AS n_both,
                  (SELECT count(*) FROM a x
                   WHERE x.cluster_id = a.cluster_id)::BIGINT AS n_cluster,
                  (SELECT count(*) FROM a x
                   WHERE x.truth_id = a.truth_id)::BIGINT AS n_truth
           FROM a ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # perfect assignment -> all three counts equal -> B3 P = R = 1
    perfect = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "cluster_id": np.array([0, 0, 1, 1, 2, 2], dtype=np.int64),
            "truth_id": np.array([0, 0, 1, 1, 2, 2], dtype=np.int64),
        }
    )
    ev = bcubed_evidence(rd.from_pandas(perfect)).to_pandas()
    assert (ev["n_both"] == ev["n_cluster"]).all()
    assert (ev["n_both"] == ev["n_truth"]).all()


def test_interval_lookup_matches_duckdb_between_join():
    import duckdb

    from raylink.ops.relational import interval_lookup

    rng = np.random.default_rng(12)
    pts = pd.DataFrame(
        {
            "event_id": np.arange(10_000, dtype=np.int64),
            "value": rng.normal(50, 60, 10_000),
        }
    )
    iv = pd.DataFrame(
        {
            "lo": [0.0, 1.0, 5.0, 20.0, 100.0],
            "hi": [1.0, 5.0, 20.0, 100.0, 1e9],
            "label": ["tiny", "small", "mid", "big", "huge"],
        }
    )
    got = (
        interval_lookup(rd.from_pandas(pts), iv, "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", pts)
    con.register("iv", iv)
    want = con.execute(
        """SELECT p.event_id, p.value, iv.label
           FROM p LEFT JOIN iv ON p.value >= iv.lo AND p.value < iv.hi
           ORDER BY p.event_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # half-open semantics: exact lo included, exact hi excluded
    edge = pd.DataFrame({"event_id": np.array([0, 1], dtype=np.int64),
                         "value": [1.0, 5.0]})
    out = interval_lookup(rd.from_pandas(edge), iv, "value").to_pandas()
    assert out.sort_values("event_id")["label"].tolist() == ["small", "mid"]


def test_interval_lookup_rejects_overlap():
    import pytest as _pytest

    from raylink.ops.relational import interval_lookup

    bad = pd.DataFrame({"lo": [0.0, 0.5], "hi": [1.0, 2.0], "label": ["a", "b"]})
    with _pytest.raises(ValueError):
        interval_lookup(
            rd.from_pandas(pd.DataFrame({"event_id": [1], "value": [0.7]})),
            bad,
            "value",
        )


def test_grouped_mode_deterministic_tie_rule():
    import duckdb

    from raylink.ops.relational import grouped_mode

    rng = np.random.default_rng(14)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 200, 30_000),
            "v": rng.choice(["click", "view", "buy", "share"], 30_000),
        }
    )
    got = (
        grouped_mode(rd.from_pandas(df), "u", "v")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    got["u"] = got["u"].astype("int64")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """WITH c AS (SELECT u, v, count(*)::BIGINT AS cnt
                      FROM t GROUP BY u, v),
           r AS (SELECT u, v, cnt, row_number() OVER (PARTITION BY u
                     ORDER BY cnt DESC, v) AS rn FROM c)
           SELECT u, v AS mode, cnt AS n_mode FROM r WHERE rn = 1
           ORDER BY u"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # explicit tie: equal counts -> smallest value wins
    tie = pd.DataFrame({"u": [1, 1, 1, 1], "v": ["b", "b", "a", "a"]})
    out = grouped_mode(rd.from_pandas(tie), "u", "v").to_pandas()
    assert out["mode"].tolist() == ["a"] and out["n_mode"].tolist() == [2]


def test_grouped_nunique_matches_count_distinct():
    import duckdb

    from raylink.ops.relational import grouped_nunique

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {"u": rng.integers(0, 150, 40_000), "v": rng.integers(0, 80, 40_000)}
    )
    got = (
        grouped_nunique(rd.from_pandas(df), "u", "v")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    got["u"] = got["u"].astype("int64")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT u, COUNT(DISTINCT v)::BIGINT AS n_distinct
           FROM t GROUP BY u ORDER BY u"""
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_melt_matches_pandas_and_widens_types():
    import pytest as _pytest

    from raylink.ops.relational import melt

    df = pd.DataFrame(
        {
            "id": np.arange(40),
            "g": (np.arange(40) % 3).astype("U2"),
            "x": np.arange(40).astype(np.float64) * 1.5,
            "y": np.arange(40).astype(np.float64) - 7.0,
        }
    )
    got = (
        melt(rd.from_pandas(df).repartition(5), ["id", "g"], ["x", "y"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    want = (
        df.melt(id_vars=["id", "g"], value_vars=["x", "y"])
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)
    # mixed int/float value columns widen to the FIRST column's type
    df2 = pd.DataFrame({"id": [1, 2], "a": [1.5, 2.5], "b": np.array([3, 4], dtype=np.int64)})
    got2 = melt(rd.from_pandas(df2), ["id"], ["a", "b"]).to_pandas()
    assert got2["value"].dtype == np.float64
    assert sorted(got2["value"]) == [1.5, 2.5, 3.0, 4.0]
    with _pytest.raises(ValueError):
        melt(rd.from_pandas(df2), ["id"], [])


def test_pivot_counts_matches_case_sums():
    import duckdb

    from raylink.ops.relational import pivot_counts

    rng = np.random.default_rng(33)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 120, 30_000),
            "t": rng.choice(["a", "b", "c", "d"], 30_000, p=[0.5, 0.3, 0.15, 0.05]),
        }
    )
    got = (
        pivot_counts(rd.from_pandas(df), "u", "t")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    got["u"] = got["u"].astype("int64")
    con = duckdb.connect()
    con.register("x", df)
    want = con.execute(
        """SELECT u,
               SUM(CASE WHEN t='a' THEN 1 ELSE 0 END)::BIGINT AS cnt_a,
               SUM(CASE WHEN t='b' THEN 1 ELSE 0 END)::BIGINT AS cnt_b,
               SUM(CASE WHEN t='c' THEN 1 ELSE 0 END)::BIGINT AS cnt_c,
               SUM(CASE WHEN t='d' THEN 1 ELSE 0 END)::BIGINT AS cnt_d
           FROM x GROUP BY u ORDER BY u"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # row sums reproduce the group sizes exactly
    assert (
        got[["cnt_a", "cnt_b", "cnt_c", "cnt_d"]].sum(axis=1).to_numpy()
        == df.groupby("u").size().sort_index().to_numpy()
    ).all()


def test_full_outer_join_matches_pandas_outer():
    from raylink.ops.relational import full_outer_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.choice(30, size=25, replace=False).astype(np.int64),
            "lv": np.arange(25, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(40, size=20, replace=False).astype(np.int64) + 10,
            "rv": np.arange(20, dtype=np.int64) * 100,
        }
    )
    got = (
        full_outer_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            ["k"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, how="outer", on="k")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].fillna(-1).tolist() == exp["lv"].fillna(-1).tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()
    # int64 survives null padding as Arrow typed nulls, not float64 drift
    assert str(got["lv"].dtype) in ("Int64", "int64", "float64")


def test_full_outer_join_many_to_many_and_collisions():
    from raylink.ops.relational import full_outer_join

    left = pd.DataFrame(
        {"k": np.array([1, 1, 2, 9], dtype=np.int64),
         "v": np.array([10, 11, 20, 90], dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.array([1, 1, 3], dtype=np.int64),
         "v": np.array([5, 6, 7], dtype=np.int64)}
    )
    got = full_outer_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        ["k"],
    ).to_pandas()
    # m:m re-expansion: key 1 -> 2x2 rows; unmatched 2, 9 (left) and 3 (right)
    assert len(got) == 4 + 1 + 1 + 1
    assert "v_r" in got.columns
    k1 = got[got["k"] == 1]
    assert sorted(zip(k1["v"], k1["v_r"])) == [(10, 5), (10, 6), (11, 5), (11, 6)]
    assert got[got["k"] == 3]["v"].isna().all()
    assert got[got["k"] == 9]["v_r"].isna().all()


def test_full_outer_join_drops_null_keys():
    from raylink.ops.relational import full_outer_join

    left = pa.table({"k": pa.array([1, None], type=pa.int64()),
                     "lv": pa.array([1, 2], type=pa.int64())})
    right = pa.table({"k": pa.array([None, 5], type=pa.int64()),
                      "rv": pa.array([3, 4], type=pa.int64())})
    got = full_outer_join(
        rd.from_arrow(left), rd.from_arrow(right), ["k"]
    ).to_pandas()
    # NULL keys never match NOR survive (M2 rule, documented deviation)
    assert sorted(got["k"].tolist()) == [1, 5]


def test_top_p_select_matches_pandas():
    from raylink.ops.sample import top_p_select

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 37, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "val": np.round(rng.uniform(-0.1, 5.0, n), 4),
        }
    )
    got = (
        top_p_select(rd.from_arrow(pa.Table.from_pandas(df)), "g", "val", "id", 9, 10)
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    q = df.copy()
    q["v6"] = np.round(q["val"] * 1e6).astype(np.int64)
    q = q[q.v6 > 0]
    rows = []
    for _, sub in q.groupby("g"):
        sub = sub.sort_values(["v6", "id"], ascending=[False, True])
        tgt = -(-sub.v6.sum() * 9 // 10)
        keep = (sub.v6.cumsum() - sub.v6) < tgt
        rows.append(sub[keep][["g", "id", "v6"]])
    exp = pd.concat(rows).sort_values(["g", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # every group keeps >= ceil(p * mass): prefix property
    kept_mass = got.groupby("g")["v6"].sum()
    tot_mass = q.groupby("g")["v6"].sum()
    assert (kept_mass >= (tot_mass * 9 + 9) // 10).all()


def test_top_p_select_p_one_keeps_all_positive():
    from raylink.ops.sample import top_p_select

    df = pd.DataFrame(
        {
            "g": np.zeros(4, dtype=np.int64),
            "id": np.arange(4, dtype=np.int64),
            "val": np.array([1.0, 2.0, 0.0, -1.0]),
        }
    )
    got = top_p_select(
        rd.from_arrow(pa.Table.from_pandas(df)), "g", "val", "id", 1, 1
    ).to_pandas()
    assert sorted(got["id"]) == [0, 1]  # non-positive mass rows dropped


def test_bpe_pair_counts_matches_counter():
    from collections import Counter

    from raylink.ops.text import bpe_pair_counts

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "THE CAT sat",  # case folds into the same pairs
        "",
    ]
    got = bpe_pair_counts(
        rd.from_arrow(pa.table({"text": texts})), k=4
    ).to_pandas()
    c = Counter()
    for t in texts:
        toks = t.lower().split()
        c.update(zip(toks, toks[1:]))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(zip(got["t1"], got["t2"]), got["n"])) == exp
    assert got["n"].iloc[0] == 3 and (got["t1"].iloc[0], got["t2"].iloc[0]) == ("the", "cat")


def test_grouped_moments_exact_and_orderfree():
    from raylink.ops.relational import grouped_moments

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 9, 2000).astype(np.int64),
            "val": np.round(rng.normal(0, 3, 2000), 5),
        }
    )
    got = (
        grouped_moments(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(7), "g", "val"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    v6 = np.round(df["val"].to_numpy() * 1e6).astype(np.int64)
    ref = pd.DataFrame({"g": df["g"], "v": v6, "v2": v6 * v6}).groupby(
        "g", as_index=False
    ).agg(n=("v", "size"), sum_e6=("v", "sum"), sumsq_e12=("v2", "sum"))
    assert got["n"].tolist() == ref["n"].tolist()
    assert got["sum_e6"].tolist() == ref["sum_e6"].tolist()
    assert got["sumsq_e12"].tolist() == ref["sumsq_e12"].tolist()
    # variance from the exact partials matches numpy to float precision
    m = got["sum_e6"] / got["n"] / 1e6
    var = got["sumsq_e12"] / got["n"] / 1e12 - m**2
    npvar = df.groupby("g")["val"].apply(
        lambda s: np.mean(np.round(s * 1e6) ** 2) / 1e12
        - (np.mean(np.round(s * 1e6)) / 1e6) ** 2
    )
    assert np.allclose(var.to_numpy(), npvar.to_numpy(), rtol=1e-9)


def test_grouped_vector_mean_matches_numpy():
    from raylink.ops.kmeans import grouped_vector_mean

    rng = np.random.default_rng(13)
    n, d = 300, 8
    mat = rng.normal(0, 1, (n, d)).astype(np.float32)
    lab = rng.integers(0, 5, n).astype(np.int32)
    tab = pa.table(
        {
            "label": pa.array(lab, type=pa.int32()),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
        }
    )
    got = (
        grouped_vector_mean(rd.from_arrow(tab).repartition(5))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    v6 = np.round(mat.astype(np.float64) * 1e6).astype(np.int64)
    for g in range(5):
        sub = got[got.label == g]
        assert (sub["n"] == (lab == g).sum()).all()
        assert sub["sum_e6"].tolist() == v6[lab == g].sum(axis=0).tolist()
    # centroid recovery: exact partials -> float centroid within quantization
    c0 = got[got.label == 0].sort_values("dim")["sum_e6"].to_numpy() / (
        (lab == 0).sum() * 1e6
    )
    assert np.allclose(c0, mat[lab == 0].astype(np.float64).mean(axis=0), atol=1e-6)


def test_winsorize_matches_numpy_percentile_clip():
    from raylink.ops.sample import winsorize

    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "val": np.round(rng.normal(0, 10, n), 4),
        }
    )
    lo6, hi6, out = winsorize(
        rd.from_arrow(pa.Table.from_pandas(df)), "val", 0.05, 0.95, "id"
    )
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    v6 = np.round(df["val"].to_numpy() * 1e6).astype(np.int64)
    sv = np.sort(v6)
    exp_lo = sv[int(np.ceil(0.05 * n)) - 1]
    exp_hi = sv[int(np.ceil(0.95 * n)) - 1]
    assert (lo6, hi6) == (exp_lo, exp_hi)
    assert got["v6_w"].tolist() == np.clip(v6, exp_lo, exp_hi).tolist()
    # boundary semantics: 5% of rows at or below lo, 5% at or above hi
    assert (got["v6_w"] == exp_lo).sum() >= 1
    assert got["v6_w"].min() == exp_lo and got["v6_w"].max() == exp_hi


def test_triangle_counts_matches_bruteforce():
    from raylink.ops.graph import triangle_counts

    rng = np.random.default_rng(2)
    n = 60
    E = sorted(
        {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.15}
    )
    edf = pd.DataFrame(E, columns=["a", "b"]).astype(np.int64)
    got = (
        triangle_counts(rd.from_arrow(pa.Table.from_pandas(edf)).repartition(5))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    es = set(E)
    cnt: dict = {}
    for a, b in E:
        for c in range(b + 1, n):
            if (a, c) in es and (b, c) in es:
                for x in (a, b, c):
                    cnt[x] = cnt.get(x, 0) + 1
    exp = pd.DataFrame(sorted(cnt.items()), columns=["node", "n_triangles"]).astype(
        np.int64
    )
    pd.testing.assert_frame_equal(got, exp)
    # each triangle credits exactly 3 corners
    assert got["n_triangles"].sum() % 3 == 0


def test_triangle_counts_rejects_unordered_edges():
    import pytest as _pytest

    from raylink.ops.graph import triangle_counts

    edf = pd.DataFrame({"a": [2], "b": [1]}).astype(np.int64)
    with _pytest.raises(Exception):
        triangle_counts(rd.from_arrow(pa.Table.from_pandas(edf))).to_pandas()


def test_pagerank_matches_python_fixpoint():
    """Integer fixed-point PageRank vs a dict-based reference: same
    floor-division arithmetic, including zero-inbound nodes (base rank
    only) and a hub node; symmetric and asymmetric edges."""
    from raylink.ops.graph import pagerank

    rng = np.random.default_rng(17)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    keep = src != dst
    edf = pd.DataFrame({"src": src[keep], "dst": dst[keep]}).drop_duplicates()
    # a sink-only node: id 60 receives but never sends
    edf = pd.concat(
        [edf, pd.DataFrame({"src": [0, 1], "dst": [60, 60]})], ignore_index=True
    )
    got = (
        pagerank(rd.from_pandas(edf).repartition(4), iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes = np.unique(np.concatenate([edf["src"], edf["dst"]]))
    deg = edf.groupby("src").size().to_dict()
    pr = {v: 10**9 for v in nodes}
    for _ in range(3):
        s = {v: 0 for v in nodes}
        for u, v in zip(edf["src"], edf["dst"]):
            s[v] += pr[u] // deg[u]
        pr = {v: (10**9 * 15) // 100 + (85 * s[v]) // 100 for v in nodes}
    assert (got["node"].to_numpy() == nodes).all()
    assert (got["pr"].to_numpy() == np.array([pr[v] for v in nodes])).all()
    # the sink node collected mass but contributes none (dropped, documented)
    assert pr[60] > (10**9 * 15) // 100


def test_k_core_matches_python_peel():
    """Fixpoint k-core vs a set-based peel oracle on a random graph (runs
    to convergence, multiple cascade rounds), plus the round-limited mode
    the SQL gate uses."""
    from collections import Counter

    from raylink.ops.graph import k_core

    rng = np.random.default_rng(23)
    a = rng.integers(0, 80, 500)
    b = rng.integers(0, 80, 500)
    keep = a < b
    edf = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()

    def peel(k, rounds=10**9):
        E = set(map(tuple, edf.to_numpy()))
        for _ in range(rounds):
            d = Counter()
            for x, y in E:
                d[x] += 1
                d[y] += 1
            bad = {v for v, c in d.items() if c < k}
            if not bad:
                break
            E = {(x, y) for x, y in E if x not in bad and y not in bad}
        d = Counter()
        for x, y in E:
            d[x] += 1
            d[y] += 1
        return sorted(d)

    for k in (3, 5):
        out = k_core(rd.from_pandas(edf).repartition(4), k)
        df = out.to_pandas()
        # Ray's to_pandas drops columns on ANY empty dataset; the Arrow
        # schema itself stays typed (checked below for the empty case)
        got = sorted(df["node"]) if len(df) else []
        if not len(df):
            assert [f.name for f in out.schema().base_schema] == ["node"]
        assert got == peel(k), k
    got2 = sorted(
        k_core(rd.from_pandas(edf).repartition(4), 5, max_rounds=2)
        .to_pandas()["node"]
    )
    assert got2 == peel(5, rounds=2)


def test_block_profile_matches_pandas():
    """Skew profile vs a pandas reference: top-N total order, quadratic
    pair counts, and the log2 histogram (incl. singleton bucket 0)."""
    from raylink.ops.profile import block_profile

    rng = np.random.default_rng(31)
    # zipf-ish skew: a few hot keys, many singletons
    keys = np.concatenate(
        [np.repeat(0, 500), np.repeat(1, 100), rng.integers(2, 2000, 2000)]
    ).astype(np.int64)
    df = pd.DataFrame({"k": rng.permutation(keys)})
    top, hist = block_profile(rd.from_pandas(df).repartition(6), "k", top_n=10)
    vc = df["k"].value_counts()
    exp = (
        pd.DataFrame({"k": vc.index.to_numpy(np.int64), "n_rows": vc.to_numpy(np.int64)})
        .sort_values(["n_rows", "k"], ascending=[False, True], kind="stable")
        .head(10)
        .reset_index(drop=True)
    )
    exp["n_pairs"] = exp["n_rows"] * (exp["n_rows"] - 1) // 2
    pd.testing.assert_frame_equal(top, exp)
    b = np.floor(np.log2(vc.to_numpy())).astype(np.int64)
    eh = (
        pd.DataFrame({"bucket": b, "n_blocks": 1, "n_rows": vc.to_numpy(np.int64)})
        .groupby("bucket", as_index=False)
        .agg(n_blocks=("n_blocks", "sum"), n_rows=("n_rows", "sum"))
        .astype(np.int64)
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(hist, eh)
    assert top.loc[0, "k"] == 0 and top.loc[0, "n_rows"] == 500


def test_negative_pairs_deterministic_and_disjoint():
    """Negative sampling: bit-identical across runs, never emits a true
    positive, caps at n_neg per key, and keys short of trials yield
    fewer negatives deterministically."""
    from raylink.ops.sample import negative_pairs

    left = pd.DataFrame({"a": np.arange(50, dtype=np.int64)})
    right = np.arange(100, 108, dtype=np.int64)  # small universe: collisions
    # positives: every even left key matches right keys 100..103
    pos = pd.DataFrame(
        {
            "a": np.repeat(np.arange(0, 50, 2, dtype=np.int64), 4),
            "b": np.tile(np.arange(100, 104, dtype=np.int64), 25),
        }
    )
    runs = []
    for _ in range(2):
        out = (
            negative_pairs(
                rd.from_pandas(left).repartition(3), right,
                rd.from_pandas(pos).repartition(2), "a", "b",
                n_neg=3, n_trials=6,
            )
            .to_pandas()
            .sort_values(["a", "trial"])
            .reset_index(drop=True)
        )
        runs.append(out)
    pd.testing.assert_frame_equal(runs[0], runs[1])
    out = runs[0]
    merged = out.merge(pos, on=["a", "b"], how="inner")
    assert len(merged) == 0  # no positive leaks
    assert (out.groupby("a").size() <= 3).all()
    # hash replay: recompute proposals for one key and check subset
    a = 7
    hv = (np.uint64(a) * np.uint64(2654435761)
          + np.arange(6, dtype=np.uint64) * np.uint64(2246822519)) % np.uint64(1 << 32)
    props = set(np.sort(right)[(hv % np.uint64(len(right))).astype(int)])
    assert set(out.loc[out["a"] == a, "b"]) <= props


def test_set_op_distinct_matches_duckdb_multicol():
    """INTERSECT / EXCEPT over two-column tuples vs DuckDB, including
    duplicate input rows (set semantics) and tuples unique to each side."""
    import duckdb

    from raylink.ops.relational import set_op_distinct

    rng = np.random.default_rng(41)
    A = pd.DataFrame(
        {"x": rng.integers(0, 15, 400), "y": rng.integers(0, 6, 400)}
    ).astype(np.int64)
    B = pd.DataFrame(
        {"x": rng.integers(5, 20, 300), "y": rng.integers(0, 6, 300)}
    ).astype(np.int64)
    for op, sql in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = (
            set_op_distinct(
                rd.from_pandas(A).repartition(3),
                rd.from_pandas(B).repartition(2),
                ["x", "y"],
                op,
            )
            .to_pandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        exp = (
            duckdb.sql(f"SELECT x, y FROM A {sql} SELECT x, y FROM B ORDER BY x, y")
            .df()
            .astype(np.int64)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_mutual_best_matches_duckdb():
    """Symmetric argmax vs DuckDB double-QUALIFY, with score ties broken
    by partner id and keys that are nobody's reciprocal best."""
    import duckdb

    from raylink.ops.relational import mutual_best

    rng = np.random.default_rng(47)
    n = 3000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 40, n).astype(np.int64),
            "b": rng.integers(100, 160, n).astype(np.int64),
            "s": rng.integers(0, 50, n).astype(np.int64),  # narrow → ties
        }
    ).drop_duplicates(["a", "b"])
    got = (
        mutual_best(rd.from_pandas(df).repartition(4), "a", "b", "s")
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        WITH ra AS (
            SELECT *, row_number() OVER (PARTITION BY a ORDER BY s DESC, b) rn_a
            FROM df
        ),
        rb AS (
            SELECT *, row_number() OVER (PARTITION BY b ORDER BY s DESC, a) rn_b
            FROM ra
        )
        SELECT a, b, s FROM rb WHERE rn_a = 1 AND rn_b = 1 ORDER BY a
        """
    ).df().astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    # reciprocity: each a and each b appears at most once
    assert got["a"].is_unique and got["b"].is_unique


def test_mad_outliers_matches_numpy_reference():
    """Median/MAD flags vs a numpy sort-based reference: lower-median
    contract, planted outliers flagged, inliers clean, all-integer."""
    from raylink.ops.sample import mad_outliers

    rng = np.random.default_rng(53)
    vals = np.concatenate(
        [rng.normal(50, 2, 900), np.array([500.0, -400.0, 510.0])]
    )
    df = pd.DataFrame(
        {"id": np.arange(len(vals), dtype=np.int64), "v": vals}
    )
    med6, mad6, out = mad_outliers(
        rd.from_pandas(df).repartition(4), "v", "id", c=3
    )
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    v6 = np.round(vals * 1e6).astype(np.int64)
    k = (len(v6) + 1) // 2
    exp_med = np.sort(v6)[k - 1]
    dev = np.abs(v6 - exp_med)
    exp_mad = np.sort(dev)[k - 1]
    assert (med6, mad6) == (exp_med, exp_mad)
    exp_flag = (dev > 3 * exp_mad).astype(np.int64)
    assert (got["is_outlier"].to_numpy() == exp_flag).all()
    # the planted gross outliers are all flagged (3*MAD ~ 2 sigma here, so
    # some genuine tail rows are flagged too — as the reference agrees)
    assert got.loc[got["id"] >= 900, "is_outlier"].tolist() == [1, 1, 1]


def test_grouped_argmax_packing_and_ties():
    """Bit-packed Max argmax vs pandas idxmax with the (value, arg)
    lexicographic tie rule; negative values; contract violations raise."""
    from raylink.ops.relational import grouped_argmax

    rng = np.random.default_rng(59)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 12, 600).astype(np.int64),
            "v": rng.integers(-500, 500, 600).astype(np.int64),
            "a": rng.integers(0, 10**6, 600).astype(np.int64),
        }
    )
    got = (
        grouped_argmax(rd.from_pandas(df).repartition(5), "g", "v", "a")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "v", "a"])
        .groupby("g", as_index=False)
        .tail(1)
        .sort_values("g")
        .reset_index(drop=True)[["g", "v", "a"]]
    )
    pd.testing.assert_frame_equal(got, exp)
    with pytest.raises(Exception):
        bad = pd.DataFrame({"g": [0], "v": [1 << 31], "a": [0]})
        grouped_argmax(rd.from_pandas(bad), "g", "v", "a").to_pandas()


def test_grouped_vocab_topk_matches_duckdb():
    import duckdb

    from raylink.ops.text import grouped_vocab_topk

    docs = pd.DataFrame(
        {
            "grp": ["a", "a", "b", "b", "b"],
            "text": [
                "the cat sat on the mat",
                "the dog ate the cat food",
                "alpha beta beta gamma",
                "beta gamma gamma delta",
                "Gamma GAMMA tie tie tie",
            ],
        }
    )
    got = (
        grouped_vocab_topk(rd.from_pandas(docs), "grp", k=2)
        .to_pandas()
        .sort_values(["grp", "rn"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        WITH tok AS (
            SELECT grp, lower(unnest(regexp_extract_all(text, '[0-9A-Za-z_]+'))) AS token
            FROM docs
        ),
        c AS (SELECT grp, token, COUNT(*)::BIGINT cnt FROM tok GROUP BY grp, token)
        SELECT grp, token, cnt,
               CAST(row_number() OVER (PARTITION BY grp ORDER BY cnt DESC, token) AS BIGINT) rn
        FROM c QUALIFY rn <= 2 ORDER BY grp, rn
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)


def test_exact_percentiles_matches_numpy():
    from raylink.ops.sample import exact_percentiles

    rng = np.random.default_rng(61)
    vals = rng.normal(0, 100, 4321)
    df = pd.DataFrame({"v": vals})
    got = exact_percentiles(rd.from_pandas(df).repartition(4), "v")
    v6 = np.sort(np.round(vals * 1e6).astype(np.int64))
    import math as _math

    for _, row in got.iterrows():
        p = row["p_e6"] / 1e6
        k = max(1, int(_math.ceil(p * len(v6) - 1e-9)))
        assert row["k"] == k
        assert row["v6"] == v6[k - 1]


def test_mutual_best_float_scores_rank_by_value():
    """Float similarities in (0,1) must rank by VALUE (e6-quantized), not
    collapse to zero keys decided by partner id (r4 ADVICE repro)."""
    from raylink.ops.relational import mutual_best

    df = pd.DataFrame(
        {
            "a": np.array([1, 1, 2, 2], dtype=np.int64),
            "b": np.array([10, 11, 10, 11], dtype=np.int64),
            # best for a=1 is b=11 (0.9); an int64 cast would truncate all
            # four to 0 and pick b=10 by the id tie-break
            "s": np.array([0.2, 0.9, 0.8, 0.3], dtype=np.float64),
        }
    )
    got = (
        mutual_best(rd.from_pandas(df), "a", "b", "s")
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == [1, 2]
    assert got["b"].tolist() == [11, 10]


def test_mutual_best_rejects_non_numeric_scores():
    from raylink.ops.relational import mutual_best

    df = pd.DataFrame({"a": [1], "b": [2], "s": ["high"]})
    with pytest.raises((TypeError, Exception)):
        mutual_best(rd.from_pandas(df), "a", "b", "s").materialize()


def test_vocab_topk_paths_emit_no_refbundle_schema_warnings():
    """r4 VERDICT #4: the vocab/bpe local-topk stage used to pass the
    Aggregate's empty range partitions through un-wrapped, firing Ray
    2.49 'RefBundle with a different schema' executor warnings on
    small-cardinality corpora. Spy on the executor logger and assert the
    tiny-vocab path is warning-free."""
    import logging

    from raylink.ops.text import bpe_pair_counts, vocab_topk

    records: list[str] = []

    class _Spy(logging.Handler):
        def emit(self, rec):
            msg = rec.getMessage()
            if "different schema" in msg:
                records.append(msg)

    log = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    spy, old_level = _Spy(), log.level
    log.addHandler(spy)
    log.setLevel(logging.WARNING)
    try:
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(12, dtype=np.int64)),
                    # 4 distinct tokens << default partitions -> the
                    # aggregate emits empty range partitions
                    "text": ["aa bb", "bb cc", "cc dd", "aa aa"] * 3,
                }
            )
        ).repartition(8)
        top = vocab_topk(docs, k=3, final_partitions=2).to_pandas()
        assert top["token"].tolist() == ["aa", "bb", "cc"]
        pairs = bpe_pair_counts(docs, k=3, final_partitions=2).to_pandas()
        assert len(pairs) == 3 and pairs["n"].tolist() == sorted(
            pairs["n"].tolist(), reverse=True
        )
    finally:
        log.removeHandler(spy)
        log.setLevel(old_level)
    assert records == []


def test_cube_agg_matches_duckdb_cube():
    import duckdb

    from raylink.ops.relational import cube_agg

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(list("xyz"), 4000),
            "b": rng.choice(list("pq"), 4000),
            "v": rng.integers(0, 1000, 4000),
        }
    )
    got = (
        cube_agg(rd.from_pandas(df), ["a", "b"], {"v": "sum_v"})
        .to_pandas()
        .sort_values(["g_mask", "a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT (GROUPING(a)*2 + GROUPING(b))::BIGINT AS g_mask, a, b,
                  SUM(v)::BIGINT AS sum_v, COUNT(*)::BIGINT AS n
           FROM t GROUP BY CUBE(a, b) ORDER BY g_mask, a, b"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # every grouping set present: 3*2 + 3 + 2 + 1 rows
    assert got.groupby("g_mask").size().tolist() == [6, 3, 2, 1]


def test_pareto_front_matches_bruteforce():
    from raylink.ops.sample import _skyline_2d, pareto_front

    rng = np.random.default_rng(11)
    # kernel: randomized brute-force dominance parity incl. ties/dups
    for _ in range(60):
        n = int(rng.integers(1, 60))
        x = rng.integers(-4, 8, n).astype(np.int64)
        y = rng.integers(-4, 8, n).astype(np.int64)
        keep = _skyline_2d(x, y)
        for i in range(n):
            dom = (
                (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
            ).any()
            assert keep[i] == (not dom)

    # distributed: local-then-merge equals the global front regardless of
    # partitioning; exact duplicates of a front point all survive
    df = pd.DataFrame(
        {
            "id": np.arange(1000, dtype=np.int64),
            "x": rng.integers(0, 50, 1000),
            "y": rng.integers(0, 50, 1000),
        }
    )
    df.loc[0, ["x", "y"]] = [49, 49]
    df.loc[1, ["x", "y"]] = [49, 49]
    got = (
        pareto_front(rd.from_pandas(df).repartition(7), "x", "y")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    x, y = df["x"].to_numpy(np.int64), df["y"].to_numpy(np.int64)
    want = df[_skyline_2d(x, y)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert {0, 1} <= set(got["id"])  # both duplicates of the front point

    # minimize mode is the mirrored front
    got_min = pareto_front(rd.from_pandas(df), "x", "y", maximize=False)
    want_min = df[_skyline_2d(-x, -y)].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_min.to_pandas().sort_values("id").reset_index(drop=True), want_min
    )


def test_pr_curve_hand_values():
    from raylink.evaluate import pr_curve

    # scores: 10,20,30,40 with labels F,T,F,T
    ds = rd.from_pandas(
        pd.DataFrame(
            {"s": [10, 20, 30, 40], "y": [False, True, False, True]}
        )
    ).repartition(3)
    out = pr_curve(ds, "s", "y", [15, 25, 35, 45])
    assert out["thr"].tolist() == [15, 25, 35, 45]
    assert out["n_pred"].tolist() == [3, 2, 1, 0]
    assert out["tp"].tolist() == [2, 1, 1, 0]
    assert out["fp"].tolist() == [1, 1, 0, 0]
    assert out["fn"].tolist() == [0, 1, 1, 2]
    # floor-division micro-units: 2e6//3, 1e6//2, 1e6//1, 0
    assert out["precision_e6"].tolist() == [666666, 500000, 1000000, 0]
    assert out["recall_e6"].tolist() == [1000000, 500000, 500000, 0]
    # f1 = 2*tp*1e6 // (n_pred + n_pos)
    assert out["f1_e6"].tolist() == [
        (2 * 2 * 10**6) // 5, (2 * 10**6) // 4, (2 * 10**6) // 3, 0
    ]
    # threshold at/below every score predicts everything
    all_in = pr_curve(ds, "s", "y", [10])
    assert all_in["n_pred"].tolist() == [4] and all_in["tp"].tolist() == [2]


def test_explode_list_positions_and_values():
    from raylink.ops.relational import explode_list

    t = pa.table({"id": [1, 2, 3], "v": [[1.5, 2.5], [], [7.0]]})
    out = explode_list(rd.from_arrow(t), "id", "v").to_pandas()
    out = out.sort_values(["id", "pos"]).reset_index(drop=True)
    assert out["id"].tolist() == [1, 1, 3]
    assert out["pos"].tolist() == [0, 1, 0]  # 0-based, empty list drops out
    assert out["val"].tolist() == [1.5, 2.5, 7.0]


def test_grouping_sets_matches_duckdb():
    import duckdb

    from raylink.ops.relational import grouping_sets_agg

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 200),
            "b": rng.choice(["p", "q"], 200),
            "m": rng.integers(0, 1000, 200),
        }
    )
    out = grouping_sets_agg(
        rd.from_pandas(df).repartition(3),
        ["a", "b"],
        [["a", "b"], ["b"], []],
        {"m": "sm"},
        final_partitions=1,
    ).to_pandas()
    out = out.sort_values(["g_mask", "a", "b"]).reset_index(drop=True)
    ref = duckdb.sql(
        """
        SELECT (GROUPING(a)*2 + GROUPING(b))::BIGINT AS g_mask, a, b,
               SUM(m)::BIGINT AS sm, COUNT(*)::BIGINT AS n
        FROM df GROUP BY GROUPING SETS ((a, b), (b), ())
        ORDER BY g_mask, a, b
        """
    ).df()
    pd.testing.assert_frame_equal(
        out[["g_mask", "a", "b", "sm", "n"]], ref, check_dtype=False
    )
    with pytest.raises(ValueError):
        grouping_sets_agg(
            rd.from_pandas(df), ["a"], [["a"], ["a"]], {"m": "sm"}
        )
    with pytest.raises(ValueError):
        grouping_sets_agg(
            rd.from_pandas(df), ["a"], [["b"]], {"m": "sm"}
        )


def test_pmi_topk_matches_duckdb():
    import duckdb

    from raylink.ops.text import pmi_topk

    docs = pd.DataFrame(
        {
            "text": [
                "the quick brown fox the quick fox",
                "brown fox jumps, the quick brown fox!",
                "a b a b a b a b c",
                "New York New York new york times",
            ]
        }
    )
    out = pmi_topk(
        rd.from_pandas(docs).repartition(2), k=5, min_count=2,
        final_partitions=2,
    ).to_pandas()
    ref = duckdb.sql(
        """
        WITH toks AS (
          SELECT list_transform(regexp_extract_all(text, '[0-9A-Za-z_]+'),
                                t -> lower(t)) AS ts FROM docs
        ), big AS (
          SELECT ts[g] AS w1, ts[g+1] AS w2
          FROM toks, UNNEST(range(1, len(ts))) u(g)
        ), bc AS (
          SELECT w1, w2, COUNT(*)::BIGINT AS c_xy FROM big
          GROUP BY w1, w2 HAVING COUNT(*) >= 2
        ), uc AS (
          SELECT w, COUNT(*)::BIGINT AS c
          FROM (SELECT UNNEST(ts) AS w FROM toks) GROUP BY w
        )
        SELECT bc.w1, bc.w2, bc.c_xy, ux.c AS c_x, uy.c AS c_y
        FROM bc JOIN uc ux ON ux.w = bc.w1 JOIN uc uy ON uy.w = bc.w2
        ORDER BY bc.c_xy::DOUBLE / (ux.c::DOUBLE * uy.c::DOUBLE) DESC,
                 bc.w1, bc.w2
        LIMIT 5
        """
    ).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ref, check_dtype=False
    )


def test_bfs_distances_hand_graph():
    from raylink.ops.graph import bfs_distances

    # 0->1->2->3->4 with shortcut 0->2; detached 10->11
    e = pa.table(
        {"src": [0, 1, 2, 3, 0, 10], "dst": [1, 2, 3, 4, 2, 11]}
    )
    out = (
        bfs_distances(rd.from_arrow(e), source=0, max_hops=8, num_partitions=4)
        .to_pandas()
        .sort_values("node")
    )
    assert out.values.tolist() == [[0, 0], [1, 1], [2, 1], [3, 2], [4, 3]]
    # max_hops caps the expansion
    capped = (
        bfs_distances(rd.from_arrow(e), source=0, max_hops=1, num_partitions=4)
        .to_pandas()
        .sort_values("node")
    )
    assert capped.values.tolist() == [[0, 0], [1, 1], [2, 1]]


def test_pairwise_cluster_metrics_hand_values():
    from raylink.evaluate import pairwise_cluster_metrics

    # clusters {a,b,c}{d,e} vs truth {a,b}{c,d,e}:
    # tp = C(2,2 cell ab)=1 + C(1)=0 [c] + C(2 cell de)=1 -> 2
    # pred = C(3,2)+C(2,2) = 3+1 = 4 ; truth = C(2,2)+C(3,2) = 1+3 = 4
    df = pd.DataFrame(
        {
            "cluster_id": [1, 1, 1, 2, 2],
            "truth_id": [10, 10, 20, 20, 20],
        }
    )
    out = pairwise_cluster_metrics(
        rd.from_pandas(df).repartition(3), final_partitions=1
    )
    assert out.iloc[0].tolist() == [
        2, 4, 4, 500000, 500000, (2 * 2 * 10**6) // 8
    ]


def test_incremental_components_hand_graph():
    from raylink.cluster import incremental_components

    assign = pa.table({"node": [1, 2, 3, 5, 9, 7], "comp": [1, 1, 1, 5, 5, 7]})
    # 3-5 merges comps 1 & 5; 20-21 is a brand-new pair; 9-7 chains 5 & 7
    edges = pa.table({"a": [3, 20, 9], "b": [5, 21, 7]})
    out = (
        incremental_components(
            rd.from_arrow(assign), rd.from_arrow(edges), num_partitions=2
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [
        [1, 1], [2, 1], [3, 1], [5, 1], [7, 1], [9, 1], [20, 20], [21, 20]
    ]
    # intra-cluster edge: nothing merges, assignment passes through
    out2 = (
        incremental_components(
            rd.from_arrow(assign),
            rd.from_arrow(pa.table({"a": [1], "b": [2]})),
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out2.values.tolist() == [
        [1, 1], [2, 1], [3, 1], [5, 5], [7, 7], [9, 5]
    ]
    # the driver-edge cap guards the incremental contract loudly
    with pytest.raises(ValueError):
        incremental_components(
            rd.from_arrow(assign), rd.from_arrow(edges),
            num_partitions=2, driver_edge_cap=1,
        )


def test_link_prediction_matches_bruteforce():
    from raylink.ops.graph import link_prediction

    rng = np.random.default_rng(7)
    n = 50
    E = sorted(
        {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.12}
    )
    edf = pd.DataFrame(E, columns=["a", "b"]).astype(np.int64)
    got = (
        link_prediction(rd.from_arrow(pa.Table.from_pandas(edf)).repartition(4))
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    es = set(E)
    nbr: dict = {}
    for a, b in E:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    rows = []
    for u in sorted(nbr):
        for v in sorted(nbr):
            if u < v and (u, v) not in es:
                cn = len(nbr[u] & nbr[v])
                if cn:
                    rows.append((u, v, cn, len(nbr[u]) * len(nbr[v])))
    exp = pd.DataFrame(rows, columns=["u", "v", "cn", "pa_score"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_link_prediction_max_degree_prunes_hub_centers():
    from raylink.ops.graph import link_prediction

    # star around node 0 plus one chord: only node 0 is a useful center
    E = [(0, i) for i in range(1, 8)] + [(1, 2)]
    edf = pd.DataFrame(sorted(E), columns=["a", "b"]).astype(np.int64)
    ds = rd.from_arrow(pa.Table.from_pandas(edf))
    full = link_prediction(ds).to_pandas()
    # all leaf pairs except the (1,2) edge share center 0
    assert len(full) == 7 * 6 // 2 - 1
    pruned = link_prediction(ds, max_degree=3).to_pandas()
    # center 0 (deg 7) contributes nothing; centers 1 and 2 (deg 2) emit
    # only wedges that close onto EXISTING edges, so the anti-join leaves
    # nothing — hub pruning trades exactly these candidates away
    assert len(pruned) == 0


def test_adjusted_rand_matches_formula_and_is_one_on_identity():
    from raylink.evaluate import adjusted_rand

    rng = np.random.default_rng(11)
    c = rng.integers(0, 6, 400)
    t = rng.integers(0, 5, 400)
    df = pd.DataFrame({"cluster_id": c, "truth_id": t})
    got = adjusted_rand(rd.from_pandas(df).repartition(4)).iloc[0]
    # float reference via the standard contingency formula
    import itertools

    cells: dict = {}
    for ci, ti in zip(c, t):
        cells[(ci, ti)] = cells.get((ci, ti), 0) + 1
    comb2 = lambda x: x * (x - 1) // 2
    sij = sum(comb2(v) for v in cells.values())
    sa = sum(comb2(v) for v in pd.Series(c).value_counts())
    sb = sum(comb2(v) for v in pd.Series(t).value_counts())
    T = comb2(400)
    exp = (sij - sa * sb / T) / ((sa + sb) / 2 - sa * sb / T)
    assert got["sum_pairs_cells"] == sij
    assert got["pred_pairs"] == sa and got["truth_pairs"] == sb
    assert abs(got["ari_num"] / got["ari_den"] - exp) < 1e-12
    # truncation-toward-zero e6 convention (DuckDB //)
    q = 1_000_000 * int(got["ari_num"])
    d = int(got["ari_den"])
    trunc = abs(q) // abs(d) * (1 if (q >= 0) == (d >= 0) else -1)
    assert got["ari_e6"] == trunc

    ident = adjusted_rand(
        rd.from_pandas(pd.DataFrame({"cluster_id": t, "truth_id": t}))
    ).iloc[0]
    assert ident["ari_e6"] == 1_000_000
    assert ident["ari_num"] == ident["ari_den"]


def test_adjusted_rand_negative_on_anticorrelated():
    from raylink.evaluate import adjusted_rand

    # two clusters perfectly split across two truth classes -> ARI < 0
    df = pd.DataFrame(
        {"cluster_id": [0, 0, 1, 1], "truth_id": [0, 1, 0, 1]}
    )
    got = adjusted_rand(rd.from_pandas(df)).iloc[0]
    assert got["ari_num"] < 0 and got["ari_den"] > 0
    assert got["ari_e6"] < 0


def test_token_blocking_wep_matches_bruteforce():
    from raylink.ops.metablocking import token_blocking_wep

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 5), replace=True))
        for _ in range(40)
    ]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    got = (
        token_blocking_wep(
            rd.from_pandas(df).repartition(3), max_block_size=15
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # brute force
    toks = [set(t.lower().split()) for t in texts]
    sizes: dict = {}
    for ts in toks:
        for tk in ts:
            sizes[tk] = sizes.get(tk, 0) + 1
    kept = {tk for tk, s in sizes.items() if s <= 15}
    w: dict = {}
    for i in range(40):
        for j in range(i + 1, 40):
            c = len(toks[i] & toks[j] & kept)
            if c:
                w[(i, j)] = c
    n_e, s_w = len(w), sum(w.values())
    rows = sorted((a, b, c) for (a, b), c in w.items() if c * n_e >= s_w)
    exp = pd.DataFrame(rows, columns=["a", "b", "w"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_token_blocking_wep_purges_stopword_blocks():
    from raylink.ops.metablocking import token_blocking_wep

    # 'the' is in every doc; with the cap below corpus size it must not
    # contribute weight, so docs sharing ONLY 'the' get no edge
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["the cat", "the dog", "the cat", "the dog",
                     "the bird", "the fish"],
        }
    )
    out = token_blocking_wep(rd.from_pandas(df), max_block_size=4).to_pandas()
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert got == {(0, 2), (1, 3)}
