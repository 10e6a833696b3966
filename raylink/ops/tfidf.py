r"""TF-IDF cosine evidence for candidate pairs — the classic record-linkage
string-similarity (Cohen's TF-IDF / soft-TF-IDF family) expressed with
integer-exact evidence columns so the bit-exact SQL gate can replay it.

Weights are quantized ONCE per token: ``idf_e3 = round(1000 · ln(N/df))``
(int64; ln agrees bit-for-bit between numpy and DuckDB on this data — the
same device the gated BM25 operator uses), and a document's weight for a
token is ``tf · idf_e3``. Dot products and squared norms are then exact
int64 sums — no float summation order anywhere, so the emitted
``(dot, na2, nb2)`` triple is deterministic and the cosine decision
``dot² ≷ τ²·na2·nb2`` is pure integer arithmetic for any rational τ.
Overflow contract: ``Σ (tf · idf_e3)²`` per doc must fit int64 — holds to
~10⁴ distinct tokens/doc at tf ≤ 10³ on a 10¹²-doc corpus (idf_e3 ≤
~28,000); shard longer docs upstream.

Tokenization is the BM25 gate's convention: ``[0-9A-Za-z_]+`` runs,
lowercased (the class is closed under case, so lowering before or after
extraction is identical).

Distributed shape (mirrors ``ops/dedup.verify_jaccard``'s attach mode):
1. df pass — per-batch distinct (doc, token) explode, one
   vocab-cardinality groupby, the (token, df) table to the driver and
   broadcast once (the ssjoin rank-table contract: vocab must fit the
   object store; at 10¹²-doc scale swap in a hashed-vocab approximation).
2. two hash-partitioned exchanges: b-side TEXT attaches to each pair
   row, then the second exchange's merge kernel resolves a-side texts
   from its partition (id_a is the join key, so the per-partition text
   map is bounded by the partition's doc count) and computes the integer
   evidence with sorted-code ``np.intersect1d`` intersections; per-doc
   code/weight/norm arrays are cached per partition, so a hot doc
   tokenizes once, not once per pair.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_TOKEN_RE = re.compile(r"[0-9a-z_]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


def tfidf_vocab(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[pd.DataFrame, int]:
    """(token, df, idf_e3) vocabulary plus the corpus size N.

    One distinct-(doc, token) explode and one groupby; the result is
    vocab-sized (driver/object-store contract stated in the module
    docstring)."""
    n_docs = int(docs.count())

    def _explode(batch: pa.Table) -> pa.Table:
        toks: set[tuple[str, int]] = set()
        ids = batch.column(id_col).to_pylist()
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            for tok in set(_tokens(t)):
                toks.add((tok, ids[i]))
        arr = sorted(toks)
        return pa.table(
            {
                "token": pa.array([t for t, _ in arr], type=pa.string()),
                id_col: pa.array([d for _, d in arr], type=pa.int64()),
            }
        )

    # df counts via per-batch partials + a driver fold (the
    # temperature_sample device), NOT a groupby(token) exchange: the
    # vocabulary is driver-held by contract anyway (it broadcasts), a
    # sort-based Aggregate walks one Python group per distinct token, and
    # on a tiny/synthetic corpus the token cardinality can drop below the
    # partition count, making schema-less empty sort partitions (the
    # executor-warning class). Partial rows reaching the driver are
    # blocks × per-block vocab — the same driver-size contract as the
    # broadcast itself.
    def _dfcount(part: pa.Table) -> pa.Table:
        # (token, doc) rows are globally distinct (each doc lives in one
        # explode batch), so df = row count per token
        vc = part.to_pandas()["token"].value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), type=pa.string()),
                "df": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    partials = (
        docs.select_columns([id_col, text_col])
        .map_batches(_explode, batch_format="pyarrow")
        .map_batches(_dfcount, batch_format="pyarrow")
        .to_pandas()
    )
    df_tbl = (
        partials.groupby("token", as_index=False)["df"]
        .sum()
        .sort_values("token")
        .reset_index(drop=True)
    )
    idf = np.round(
        1000.0 * np.log(float(n_docs) / df_tbl["df"].to_numpy())
    ).astype(np.int64)
    df_tbl["idf_e3"] = idf
    return df_tbl, n_docs


def tfidf_cosine_evidence(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Integer TF-IDF cosine evidence ``(id_a, id_b, dot, na2, nb2)`` for
    a candidate-pair table. ``cos = dot / sqrt(na2·nb2)`` — left to the
    caller (or the SQL gate) so the emitted columns stay exact."""
    from raylink.util import shuffle_merge

    vocab, _n = tfidf_vocab(docs, text_col, id_col)
    # token -> (code, idf_e3); codes are dense ints so per-doc vectors are
    # sortable uint64 arrays, not string sets
    vref = ray.put(
        {
            t: (i, w)
            for i, (t, w) in enumerate(
                zip(vocab["token"].tolist(), vocab["idf_e3"].tolist())
            )
        }
    )
    texts = docs.select_columns([id_col, text_col])

    s1 = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("_text_b", pa.string())]
    )
    out_schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("dot", pa.int64()),
            ("na2", pa.int64()),
            ("nb2", pa.int64()),
        ]
    )

    def _attach_b(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        rdf = rdf.drop_duplicates(subset=[id_col]).rename(
            columns={id_col: "id_b", text_col: "_text_b"}
        )
        return ldf.merge(rdf, how="left", on="id_b")

    def _vector(text: str, vmap) -> tuple[np.ndarray, np.ndarray, int]:
        cnt: dict[int, int] = {}
        ws: dict[int, int] = {}
        for tok in _tokens(text):
            ent = vmap.get(tok)
            if ent is None:
                continue
            code, w = ent
            cnt[code] = cnt.get(code, 0) + 1
            ws[code] = w
        codes = np.fromiter(cnt.keys(), dtype=np.int64, count=len(cnt))
        order = np.argsort(codes)
        codes = codes[order]
        weights = (
            np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
            * np.fromiter(ws.values(), dtype=np.int64, count=len(ws))
        )[order]
        return codes, weights, int((weights * weights).sum())

    def _score(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        vmap = ray.get(vref)
        tmap = dict(zip(rdf[id_col].to_numpy(), rdf[text_col]))
        a_cache: dict[int, tuple] = {}
        ida = ldf["id_a"].to_numpy()
        idb = ldf["id_b"].to_numpy()
        tb = ldf["_text_b"].to_numpy()
        n = len(ldf)
        dot = np.zeros(n, dtype=np.int64)
        na2 = np.zeros(n, dtype=np.int64)
        nb2 = np.zeros(n, dtype=np.int64)
        last_b = None
        vb: tuple = (np.empty(0, dtype=np.int64), np.empty(0, np.int64), 0)
        for j in np.argsort(idb, kind="stable"):
            bid = idb[j]
            if bid != last_b:
                # _attach_b's left join leaves NaN for an id_b absent
                # from docs — treat it as the empty vector, same as the
                # a side's `tmap.get(aid) or ""` guard
                vb = _vector(tb[j] if isinstance(tb[j], str) else "", vmap)
                last_b = bid
            aid = ida[j]
            va = a_cache.get(aid)
            if va is None:
                va = a_cache[aid] = _vector(tmap.get(aid) or "", vmap)
            _, ia, ib = np.intersect1d(
                va[0], vb[0], assume_unique=True, return_indices=True
            )
            dot[j] = int((va[1][ia] * vb[1][ib]).sum())
            na2[j], nb2[j] = va[2], vb[2]
        return pd.DataFrame(
            {"id_a": ida, "id_b": idb, "dot": dot, "na2": na2, "nb2": nb2}
        )

    with_b = shuffle_merge(
        pairs.select_columns(["id_a", "id_b"]),
        texts,
        ["id_b"],
        [id_col],
        _attach_b,
        s1,
        num_partitions=num_partitions,
        left_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        right_schema=pa.schema(
            [(id_col, pa.int64()), (text_col, pa.string())]
        ),
    )
    return shuffle_merge(
        with_b,
        texts,
        ["id_a"],
        [id_col],
        _score,
        out_schema,
        num_partitions=num_partitions,
        left_schema=s1,
        right_schema=pa.schema(
            [(id_col, pa.int64()), (text_col, pa.string())]
        ),
    )


def tfidf_link(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    tau: tuple[int, int] = (4, 5),
    num_partitions: int | None = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Third COMPLETE linkage pipeline — unsupervised, label-free,
    embedding-free, and fully SQL-expressible with no frozen state:
    sorted-neighborhood blocking over the text order → integer-exact
    TF-IDF cosine acceptance → distributed min-label connected
    components. Returns ``(edges, clusters)``: edges =
    ``(id_a, id_b, dot, na2, nb2)`` accepted pairs, clusters =
    ``(id, cluster)`` for every record on an accepted edge.

    Acceptance is pure integer arithmetic under the rational threshold
    ``tau = t_num/t_den``: keep iff ``dot > 0`` and
    ``t_den²·dot² ≥ t_num²·na2·nb2`` — evaluated in arbitrary-precision
    Python ints (dot² overflows int64; DuckDB replays the same rule in
    HUGEINT), so engine and oracle share an exact keep rule and
    acceptance can never flip on a rounding boundary.

    Scale shape: the SNM exchanges, the TF-IDF attach exchanges, and the
    O(log diameter) label-propagation rounds — nothing new; this is the
    composition that demonstrates the pieces ARE a pipeline.
    """
    from raylink.cluster import cluster_label_propagation
    from raylink.ops.snm import sorted_neighborhood_pairs

    t_num, t_den = tau
    if t_num <= 0 or t_den <= 0:
        raise ValueError("tau must be a positive rational (num, den)")
    pairs = sorted_neighborhood_pairs(
        docs, text_col, id_col, window, num_partitions=num_partitions
    ).select_columns(["id_a", "id_b"])
    ev = tfidf_cosine_evidence(
        pairs, docs, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions,
    )
    n2, d2 = t_num * t_num, t_den * t_den

    def _accept(batch: pa.Table) -> pa.Table:
        dot = batch.column("dot").to_numpy(zero_copy_only=False)
        na2 = batch.column("na2").to_numpy(zero_copy_only=False)
        nb2 = batch.column("nb2").to_numpy(zero_copy_only=False)
        # exact: dot^2 needs 128 bits — Python-int arithmetic per row on
        # the (window-bounded) candidate stream, same rule as the oracle's
        # HUGEINT replay
        keep = np.fromiter(
            (
                d > 0 and d2 * int(d) * int(d) >= n2 * int(a) * int(b)
                for d, a, b in zip(dot, na2, nb2)
            ),
            dtype=bool,
            count=len(dot),
        )
        return batch.filter(pa.array(keep))

    edges = ev.map_batches(_accept, batch_format="pyarrow")

    def _to_str_edges(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        if len(ia) and (min(ia.min(), ib.min()) < 0):
            raise ValueError(
                "tfidf_link requires non-negative ids (zero-padded string "
                "min-labels must order like the ints)"
            )
        return pa.table(
            {
                "block": pa.array(["x"] * len(ia), type=pa.string()),
                "key_a": pa.array([f"{v:020d}" for v in ia], type=pa.string()),
                "key_b": pa.array([f"{v:020d}" for v in ib], type=pa.string()),
            }
        )

    labels = cluster_label_propagation(
        edges.map_batches(_to_str_edges, batch_format="pyarrow"),
        num_partitions=num_partitions,
    )

    def _back(batch: pa.Table) -> pa.Table:
        ids = np.array(
            [int(s) for s in batch.column("key").to_pylist()], dtype=np.int64
        )
        lab = np.array(
            [
                int(s.split("|", 1)[1])
                for s in batch.column("entity_id").to_pylist()
            ],
            dtype=np.int64,
        )
        return pa.table({"id": pa.array(ids), "cluster": pa.array(lab)})

    return edges, labels.map_batches(_back, batch_format="pyarrow")
