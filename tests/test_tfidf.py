"""TF-IDF cosine evidence: integer-exact replay against a DuckDB oracle
(idf quantized per token, dot/norms as exact int64 sums)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from raylink.ops.tfidf import tfidf_cosine_evidence, tfidf_vocab

_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, lower(unnest(regexp_extract_all(text, '[0-9A-Za-z_]+'))) AS token
  FROM documents
),
dfs AS (SELECT token, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY token),
idf AS (SELECT token,
               CAST(ROUND(1000 * ln((SELECT count(*)::DOUBLE FROM documents) / df))
                   AS BIGINT) AS idf_e3
        FROM dfs),
w AS (SELECT doc_id, token, count(*)::BIGINT * idf.idf_e3 AS w
      FROM tok JOIN idf USING (token) GROUP BY doc_id, token, idf.idf_e3),
norms AS (SELECT doc_id, SUM(w*w)::BIGINT AS n2 FROM w GROUP BY doc_id),
dots AS (
  SELECT p.id_a, p.id_b, COALESCE(SUM(wa.w * wb.w), 0)::BIGINT AS dot
  FROM prs p
  LEFT JOIN w wa ON wa.doc_id = p.id_a
  LEFT JOIN w wb ON wb.doc_id = p.id_b AND wb.token = wa.token
  GROUP BY p.id_a, p.id_b
)
SELECT d.id_a, d.id_b, d.dot,
       COALESCE(na.n2, 0)::BIGINT AS na2, COALESCE(nb.n2, 0)::BIGINT AS nb2
FROM dots d
LEFT JOIN norms na ON na.doc_id = d.id_a
LEFT JOIN norms nb ON nb.doc_id = d.id_b
ORDER BY d.id_a, d.id_b
"""


def test_tfidf_cosine_evidence_matches_duckdb():
    rng = np.random.default_rng(4)
    words = [
        "alpha", "beta", "gamma", "delta", "eps",
        "zeta", "eta", "theta", "Iota", "KAPPA",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, rng.integers(0, 30)))
                for _ in range(300)
            ],
        }
    )
    pairs = pd.DataFrame(
        {
            "id_a": np.arange(0, 299, dtype=np.int64),
            "id_b": np.arange(1, 300, dtype=np.int64),
        }
    )
    got = (
        tfidf_cosine_evidence(rd.from_pandas(pairs), rd.from_pandas(docs))
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    con.register("prs", pairs)
    want = con.execute(_ORACLE).df()
    pd.testing.assert_frame_equal(got, want)
    # Cauchy-Schwarz in exact integers: dot^2 <= na2*nb2 for every pair
    pos = got[got["dot"] > 0]
    assert (pos["dot"].astype(object) ** 2 <= pos["na2"].astype(object) * pos["nb2"].astype(object)).all()


def test_tfidf_vocab_df_counts():
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["a b a", "a c", "d"],
        }
    )
    vocab, n = tfidf_vocab(rd.from_pandas(docs))
    assert n == 3
    m = dict(zip(vocab.token, vocab.df))
    assert m == {"a": 2, "b": 1, "c": 1, "d": 1}
    # idf_e3 = round(1000*ln(N/df))
    idf = dict(zip(vocab.token, vocab.idf_e3))
    assert idf["a"] == round(1000 * np.log(3 / 2))
    assert idf["d"] == round(1000 * np.log(3 / 1))


def test_tfidf_link_clusters_near_duplicates():
    from raylink.ops.tfidf import tfidf_link

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",   # near-dup of 0
                "completely different subject matter entirely here",
                "completely different subject matter entirely now",  # near-dup of 2
                "unrelated solitary document about graph theory",
                "quantum flux capacitors and time travel notes",
                "the quick brown fox jumps over the lazy dog",   # exact dup of 0
                "zzz yyy xxx www vvv",
            ],
        }
    )
    edges, clusters = tfidf_link(
        rd.from_pandas(docs), window=4, tau=(3, 5)
    )
    c = clusters.to_pandas().set_index("id")["cluster"].to_dict()
    # near/exact duplicates cluster together under the min id
    assert c[0] == c[1] == c[6] == 0
    assert c[2] == c[3] == 2
    # singletons with no accepted edge are absent from the cluster table
    assert 7 not in c and 5 not in c
    # edges carry exact integer evidence and satisfy the keep rule
    e = edges.to_pandas()
    assert len(e) >= 3
    for _, row in e.iterrows():
        assert 25 * int(row["dot"]) ** 2 >= 9 * int(row["na2"]) * int(row["nb2"])


def test_tfidf_cosine_evidence_missing_id_b_is_empty_vector():
    """A candidate pair whose id_b is absent from docs must score as the
    empty vector (dot=0, nb2=0), mirroring the id_a side's guard — the
    left join used to leave NaN text and crash in _tokens (r4 ADVICE)."""
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["alpha beta", "beta gamma"],
        }
    )
    pairs = pd.DataFrame(
        {
            "id_a": np.array([1, 1], dtype=np.int64),
            "id_b": np.array([2, 999], dtype=np.int64),  # 999 not in docs
        }
    )
    got = (
        tfidf_cosine_evidence(rd.from_pandas(pairs), rd.from_pandas(docs))
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    miss = got[got["id_b"] == 999].iloc[0]
    assert miss["dot"] == 0 and miss["nb2"] == 0 and miss["na2"] > 0
