r"""Exact set-similarity self-join with the prefix filter (PPJoin family;
the distributed-streaming formulation is the ICDE 2020 "Distributed
Streaming Set Similarity Join" shape — see PAPERS.md).

Output semantics are EXACT, not sketch-gated: all document pairs whose
word-set Jaccard meets the threshold, with integer ``(n_common,
n_union)`` evidence columns. The prefix filter is purely an
optimization: order every document's distinct tokens by ascending global
frequency (rarest first) and index only each document's first
``p = n - ceil(t·n) + 1`` tokens — any pair with ``J ≥ t`` must collide
on at least one token that lies in BOTH prefixes under the same global
order (Chaudhuri/Xiao et al.), so candidate recall is 1 by construction
and the exact verify stage makes the composition exact. Compare
``ngram_jaccard_dedup``, whose df-cap is part of its declared semantics;
here rare-first ordering makes common tokens fall OUT of prefixes
naturally, no cap needed.

Distributed shape:
1. token-frequency pass — per-batch distinct (id, token) explode → one
   groupby over vocab-cardinality groups (plenty of groups: no
   empty-partition hazard) → the vocab's (token, df) to the driver,
   ranked by (df, token). Contract: the RANK TABLE must fit the object
   store (one ``ray.put``, read per task) — at 10¹²-doc scale swap in a
   64-bit hash-rank approximation (loses the guarantee that exactly the
   rarest tokens head the prefix, not correctness, since verify is
   exact).
2. prefix explode — stateless map: tokens → rank codes, sort, slice the
   prefix, emit slim ``(code, id)`` rows: ≈ Σ ceil((1−t)·n_i + 1) rows,
   a (1−t) fraction of the full posting table.
3. candidates — ONE hot-bucket all-to-all (``_pairs_in_hot_buckets``)
   + hash-partitioned pair dedup.
4. verify — texts attach to pairs via two hash-partitioned shuffle
   joins (the ``verify_jaccard`` attach shape: text moves pair-scale;
   for extreme candidate:corpus ratios the grid exchange in
   ``ops/dedup.py`` is the alternative), then per-partition kernels
   intersect per-doc token SETS (built once per doc per partition) and
   keep pairs with ``den·n_common ≥ num·n_union`` for the threshold's
   exact rational num/den — pure integer arithmetic, replayed verbatim
   by the SQL gate (which uses 0.95 = 19/20).

Tokenization is the repo's SQL-replayable convention: ASCII ``\S+`` over
``text.lower()`` (DuckDB ``regexp_extract_all(lower(text), '\S+')``).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from raylink.ops.dedup import (
    _NONWS_ASCII,
    _default_partitions,
    _hash_dedup,
    _pairs_in_hot_buckets,
)
from raylink.util import shuffle_merge

__all__ = ["token_ranks", "prefix_length", "set_similarity_join"]


def prefix_length(n: int, num: int, den: int) -> int:
    """PPJoin prefix length for a set of ``n`` distinct tokens under the
    rational threshold ``num/den``: ``n - ceil(t·n) + 1`` (0 when n == 0),
    with the ceiling in exact integer arithmetic — a float ``ceil(0.95·20)``
    returns 20, not 19, shortening the prefix and silently breaking
    candidate completeness."""
    if n <= 0:
        return 0
    return n - (-(-num * n // den)) + 1


def token_ranks(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Global token table ``(tok, df, rank)`` ranked by ascending
    ``(df, tok)`` — ties broken lexically so the order is a pure function
    of the corpus. One distinct-explode pass + one groupby over
    vocab-cardinality groups; the result is driver-held (see the module
    contract)."""

    def _explode(batch: pa.Table) -> pa.Table:
        ids_out, toks_out = [], []
        for did, txt in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            ws = set(_NONWS_ASCII.findall((txt or "").lower()))
            ids_out.extend([did] * len(ws))
            toks_out.extend(ws)
        return pa.table(
            {
                id_col: pa.array(ids_out, type=pa.int64()),
                "tok": pa.array(toks_out, type=pa.string()),
            }
        )

    from ray.data.aggregate import Count

    df = (
        ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Count(alias_name="df"))
        .to_pandas()
    )
    df = df.sort_values(["df", "tok"], kind="stable").reset_index(drop=True)
    df["rank"] = np.arange(len(df), dtype=np.int64)
    return df


def set_similarity_join(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """All pairs with word-set Jaccard ≥ ``threshold``:
    ``(id_a, id_b, n_common, n_union)`` rows, exact.

    The threshold is applied as an exact RATIONAL (``Fraction(threshold)
    .limit_denominator(10**6)``) so both the prefix-length ceiling and the
    ``den·n_common ≥ num·n_union`` keep-rule are pure integer arithmetic —
    no float boundary can disagree between this engine and a SQL replay
    (DuckDB parses ``0.95`` as DECIMAL while numpy uses binary doubles;
    integers sidestep the mismatch entirely)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    nparts = num_partitions or _default_partitions()

    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator

    ranks = token_ranks(ds, text_col=text_col, id_col=id_col)
    rank_of = dict(zip(ranks["tok"], ranks["rank"].astype(int)))
    ranks_ref = ray.put(rank_of)

    def _prefix(batch: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        ids_out, codes_out = [], []
        for did, txt in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            ws = set(_NONWS_ASCII.findall((txt or "").lower()))
            if not ws:
                continue
            codes = sorted(rk[w] for w in ws)
            p = prefix_length(len(codes), num, den)
            ids_out.extend([did] * p)
            codes_out.extend(codes[:p])
        return pa.table(
            {
                "code": pa.array(codes_out, type=pa.int64()),
                id_col: pa.array(ids_out, type=pa.int64()),
            }
        )

    empty_pairs = pa.table(
        {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
    )

    def _bucket_pairs(group: pd.DataFrame) -> pa.Table:
        m = len(group)
        if m < 2:
            return empty_pairs
        ids = np.sort(group[id_col].to_numpy())
        ii, jj = np.triu_indices(m, k=1)
        return pa.table({"id_a": pa.array(ids[ii]), "id_b": pa.array(ids[jj])})

    prefixes = ds.map_batches(_prefix, batch_format="pyarrow")
    cand = _pairs_in_hot_buckets(
        prefixes, ["code"], _bucket_pairs, empty_out=empty_pairs,
        num_partitions=nparts,
    )
    cand = _hash_dedup(
        cand, ["id_a", "id_b"], num_partitions=nparts,
        out_schema=empty_pairs.schema,
    )

    # ---- exact verify: attach texts, intersect token sets ---------------
    docs = ds.select_columns([id_col, text_col])
    doc_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string())])
    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    s1 = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("text_a", pa.string())]
    )
    out_schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("n_common", pa.int64()),
            ("n_union", pa.int64()),
        ]
    )

    def _attach_a(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        m = ldf.merge(
            rdf.rename(columns={id_col: "id_a", text_col: "text_a"}),
            on="id_a", how="inner",
        )
        return m[["id_a", "id_b", "text_a"]]

    def _verify(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        m = ldf.merge(
            rdf.rename(columns={id_col: "id_b", text_col: "text_b"}),
            on="id_b", how="inner",
        )
        if not len(m):
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "n_common": [], "n_union": []}
            )
        # token sets built once per distinct text in the partition
        cache: dict[int, set] = {}

        def _set(did, txt):
            s = cache.get(did)
            if s is None:
                s = set(_NONWS_ASCII.findall((txt or "").lower()))
                cache[did] = s
            return s

        c = np.empty(len(m), dtype=np.int64)
        u = np.empty(len(m), dtype=np.int64)
        for i, (ia, ib, ta, tb) in enumerate(
            zip(m["id_a"], m["id_b"], m["text_a"], m["text_b"])
        ):
            sa, sb = _set(ia, ta), _set(ib, tb)
            inter = len(sa & sb)
            c[i] = inter
            u[i] = len(sa) + len(sb) - inter
        out = pd.DataFrame(
            {"id_a": m["id_a"], "id_b": m["id_b"], "n_common": c, "n_union": u}
        )
        return out[den * out["n_common"] >= num * out["n_union"]]

    j1 = shuffle_merge(
        cand, docs, ["id_a"], [id_col], _attach_a, s1,
        num_partitions=nparts, left_schema=pair_schema, right_schema=doc_schema,
    )
    return shuffle_merge(
        j1, docs, ["id_b"], [id_col], _verify, out_schema,
        num_partitions=nparts, left_schema=s1, right_schema=doc_schema,
    )
