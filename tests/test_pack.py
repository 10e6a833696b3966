"""Sequence packing: the distributed ordered prefix sum must replay the
SQL window scan exactly, including sparse shuffled ids and empty docs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylink.ops.pack import ordered_prefix_sum, pack_sequences

_ORACLE = r"""
WITH t AS (SELECT doc_id,
                  len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS start_tok
      FROM t)
SELECT doc_id, n_tokens, start_tok,
       (CASE WHEN n_tokens > 0 THEN start_tok // {b}
             ELSE -1 END)::BIGINT AS chunk_first,
       (CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // {b}
             ELSE -1 END)::BIGINT AS chunk_last
FROM c ORDER BY doc_id
"""


def test_pack_sequences_matches_sql_window_scan():
    rng = np.random.default_rng(6)
    n = 5000
    ids = rng.permutation(200_000)[:n].astype(np.int64)
    docs = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [
                "" if i % 37 == 0
                else " ".join(["tok"] * int(rng.integers(1, 40)))
                for i in range(n)
            ],
        }
    )
    got = (
        pack_sequences(rd.from_pandas(docs), budget=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(_ORACLE.format(b=512)).df()
    pd.testing.assert_frame_equal(got, want)
    # the packing plan is gapless: starts are the exclusive cumsum
    srt = got.sort_values("doc_id")
    assert (
        srt["start_tok"].to_numpy()
        == np.cumsum(srt["n_tokens"].to_numpy()) - srt["n_tokens"].to_numpy()
    ).all()


def test_ordered_prefix_sum_dense_ids():
    df = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64)[::-1],
         "w": np.arange(100, dtype=np.int64)}
    )
    got = (
        ordered_prefix_sum(rd.from_pandas(df), "doc_id", "w")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    w_by_id = df.sort_values("doc_id")["w"].to_numpy()
    assert (got["start"].to_numpy() == np.cumsum(w_by_id) - w_by_id).all()


def test_deterministic_shuffle_matches_row_number():
    from raylink.ops.pack import deterministic_shuffle

    rng = np.random.default_rng(3)
    ids = rng.permutation(500_000)[:40_000].astype(np.int64)
    got = (
        deterministic_shuffle(rd.from_pandas(pd.DataFrame({"doc_id": ids})))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids}))
    want = con.execute(
        """WITH h AS (SELECT doc_id,
               xor((doc_id::HUGEINT * 2654435761) % 4294967296,
                   ((doc_id::HUGEINT * 2654435761) % 4294967296) >> 16) AS hv
               FROM t)
           SELECT doc_id,
                  (row_number() OVER (ORDER BY hv, doc_id) - 1)::BIGINT
                      AS shuffle_rank
           FROM h ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # a permutation: every rank exactly once
    assert sorted(got["shuffle_rank"].tolist()) == list(range(len(ids)))


def test_value_rank_ties_and_negative_zero():
    from raylink.ops.pack import value_rank

    rng = np.random.default_rng(21)
    v = np.round(rng.normal(0, 100, 30_000), 1)  # heavy ties
    v[rng.integers(0, 30_000, 500)] = -0.0
    df = pd.DataFrame(
        {"doc_id": np.arange(30_000, dtype=np.int64), "value": v}
    )
    got = (
        value_rank(rd.from_pandas(df), "value")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT doc_id, value, RANK() OVER (ORDER BY value)::BIGINT AS rank
           FROM t ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(
        got.drop(columns=["value"]), want.drop(columns=["value"])
    )
    # -0.0 and 0.0 compare equal and must share one rank
    zeros = got[got["value"] == 0.0]["rank"].unique()
    assert len(zeros) == 1


def test_value_rank_rejects_nan():
    import pytest as _pytest

    from raylink.ops.pack import value_rank

    df = pd.DataFrame(
        {"doc_id": np.array([1, 2], dtype=np.int64),
         "value": [1.0, float("nan")]}
    )
    with _pytest.raises(Exception):
        value_rank(rd.from_pandas(df), "value").to_pandas()


def test_chunk_documents_layout_and_coverage():
    import re

    from raylink.ops.pack import chunk_documents

    texts = [
        "",  # empty: no chunks
        "one two three",  # < window: one short chunk
        " ".join(f"tok{i}" for i in range(10)),  # exact multi-chunk layout
        " ".join(f"w{i}" for i in range(7)),  # window-exact boundary
    ]
    tab = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
         "text": pa.array(texts)}
    )
    out = (
        chunk_documents(rd.from_arrow(tab), window=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert 0 not in set(out["doc_id"])  # empty doc emits nothing
    assert out[out.doc_id == 1]["chunk_text"].tolist() == ["one two three"]
    d2 = out[out.doc_id == 2]
    # 10 tokens, w=4, s=3 -> chunks at 0,3,6 and the tail chunk at 9
    assert d2["chunk_id"].tolist() == [0, 1, 2]
    assert d2["n_tokens"].tolist() == [4, 4, 4]
    assert d2["chunk_text"].iloc[1] == "tok3 tok4 tok5 tok6"
    # every token index appears in at least one chunk (coverage)
    seen = set()
    for cid, txt in zip(d2["chunk_id"], d2["chunk_text"]):
        for t in txt.split():
            seen.add(int(re.match(r"tok(\d+)", t).group(1)))
    assert seen == set(range(10))
    # 7 tokens, w=4, s=3 -> 2 chunks, last is exactly [3:7)
    d3 = out[out.doc_id == 3]
    assert d3["n_tokens"].tolist() == [4, 4]
    assert d3["chunk_text"].iloc[1] == "w3 w4 w5 w6"
