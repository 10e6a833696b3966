r"""Sequence packing for LLM training: concat-and-chunk documents into
fixed-size context windows, distributed.

The standard pretraining data layout concatenates documents in a
deterministic order and slices the token stream into ``budget``-sized
chunks (documents may span a chunk boundary). The coordination problem is
the GLOBAL ORDERED PREFIX SUM of per-document token counts — a scan, which
Ray Data has no primitive for. :func:`ordered_prefix_sum` supplies it with
two passes and no global sort:

1. *bucket pass* — ids bucket by their high bits (the ``ops/snm.py``
   prefix-bucket device); per-batch partial (bucket, weight-sum) rows
   reduce through one tiny groupby, and the driver turns the ≤2^prefix_bits
   bucket totals into exclusive bucket offsets (broadcast once).
2. *scan pass* — ONE exchange routes rows by bucket; each partition sorts
   its buckets by id and computes ``offset[bucket] + exclusive-cumsum``
   vectorized. No partition ever sees more than its buckets' rows; the
   driver holds 2^prefix_bits int64s.

Contract: ``order_col`` values are unique non-negative int64 (document
ids); ties would make "the documents before me" ill-defined.

:func:`pack_sequences` then emits, per document, its token count, its
start offset in the concatenated stream, and the first/last chunk ids it
touches (``-1`` for empty documents) — enough for a reader to
materialize any chunk by fetching exactly the documents that overlap it.
Token counts use the repo's whitespace convention (``\S+``), replayed by
the SQL gate with ``SUM(...) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def ordered_prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    weight_col: str,
    num_partitions: int | None = None,
    prefix_bits: int = 12,
) -> ray.data.Dataset:
    """Exclusive prefix sum of ``weight_col`` in ``order_col`` order:
    emits ``(order_col, weight_col, start)`` where ``start`` = sum of all
    weights with a strictly smaller ``order_col``. See module docstring
    for the two-pass shape."""
    from raylink.ops.dedup import _default_partitions
    from raylink.util import sorted_partition_apply

    nparts = num_partitions or _default_partitions()
    # bucket = id >> shift, sized so bucket count <= 2^prefix_bits
    max_id = int(ds.max(order_col))
    min_id = int(ds.min(order_col))
    if min_id < 0:
        raise ValueError("ordered_prefix_sum requires non-negative ids")
    shift = max(0, int(max_id).bit_length() - prefix_bits)

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(order_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        b = (ids >> shift).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        # int64 accumulation (np.bincount's weights= path goes through
        # float64, which silently loses exactness past 2^53)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, w.astype(np.int64))
        return pa.table(
            {"bucket": pa.array(uniq), "wsum": pa.array(sums)}
        )

    from ray.data.aggregate import Sum

    btab = (
        ds.select_columns([order_col, weight_col])
        .map_batches(_partial, batch_format="pyarrow")
        .repartition(2)
        .groupby("bucket")
        .aggregate(Sum("wsum", alias_name="wsum"))
        .to_pandas()
        .sort_values("bucket")
    )
    nb = (max_id >> shift) + 1
    totals = np.zeros(nb, dtype=np.int64)
    totals[btab["bucket"].to_numpy()] = btab["wsum"].to_numpy()
    offsets = np.cumsum(totals) - totals  # exclusive
    oref = ray.put(offsets)

    # route whole buckets by bucket % nparts with EXPLICIT sort
    # boundaries: a raw bucket-valued pid has data-dependent cardinality
    # (can drop below the partition count on tiny/sparse ids), and
    # sampled boundaries over few distinct values collide into
    # schema-less empty sort partitions (the executor-warning class).
    # Bucket ids are monotone in id, so within a partition's id-sorted
    # rows each bucket is one contiguous run — the scan kernel's
    # first-occurrence logic is routing-agnostic.
    def _tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(order_col).to_numpy(zero_copy_only=False)
        pid = ((ids >> shift) % nparts).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                order_col: batch.column(order_col),
                weight_col: batch.column(weight_col),
            }
        )

    def _scan(part: pa.Table) -> pa.Table:
        off = ray.get(oref)
        ids = part.column(order_col).to_numpy(zero_copy_only=False)
        w = part.column(weight_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")  # ids unique: total order
        ids, w = ids[order], w[order]
        b = (ids >> shift).astype(np.int64)
        cs = np.cumsum(w) - w  # exclusive within the partition
        # subtract each bucket's first exclusive-cumsum to localize, then
        # add its global offset
        first = np.flatnonzero(np.diff(b, prepend=-1))
        base = np.repeat(cs[first], np.diff(np.append(first, len(b))))
        start = off[b] + (cs - base)
        return pa.table(
            {
                order_col: pa.array(ids),
                weight_col: pa.array(w),
                "start": pa.array(start.astype(np.int64)),
            }
        )

    from raylink.util import pa_type

    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))
    out_schema = pa.schema(
        [
            (order_col, types[order_col]),
            (weight_col, types[weight_col]),
            ("start", pa.int64()),
        ]
    )
    tagged = ds.select_columns([order_col, weight_col]).map_batches(
        _tag, batch_format="pyarrow"
    )
    return sorted_partition_apply(
        tagged, "_pid", _scan, out_schema,
        boundaries=list(range(1, nparts)),
    )


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    token_counts_col: str | None = None,
) -> ray.data.Dataset:
    """Concat-and-chunk packing plan: per document, ``(doc_id, n_tokens,
    start_tok, chunk_first, chunk_last)`` under ``budget``-token context
    windows over the id-ordered concatenated token stream. Empty
    documents get chunk ids ``-1``.

    ``token_counts_col``: name of a REAL per-document token-count column
    already on ``docs`` (e.g. ``apply_bpe``'s ``n_tokens``) — when given,
    packing runs on those counts instead of the ``\\S+`` whitespace
    proxy."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    if token_counts_col is not None:

        def _count(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_tokens": pc.cast(batch.column(token_counts_col), pa.int64()),
                }
            )

        counted = docs.select_columns([id_col, token_counts_col]).map_batches(
            _count, batch_format="pyarrow"
        )
    else:

        def _count(batch: pa.Table) -> pa.Table:
            # ASCII \S+ runs — the convention the gated token_counts op and
            # DuckDB's RE2 regexp_extract_all share (ops/dedup._NONWS_ASCII)
            from raylink.ops.dedup import _NONWS_ASCII

            texts = batch.column(text_col).to_pylist()
            counts = np.fromiter(
                (len(_NONWS_ASCII.findall(t)) if t else 0 for t in texts),
                dtype=np.int64,
                count=len(texts),
            )
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_tokens": pa.array(counts),
                }
            )

        counted = docs.select_columns([id_col, text_col]).map_batches(
            _count, batch_format="pyarrow"
        )
    scanned = ordered_prefix_sum(
        counted, id_col, "n_tokens", num_partitions=num_partitions
    )

    def _chunks(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        s = batch.column("start").to_numpy(zero_copy_only=False)
        first = np.where(n > 0, s // budget, -1)
        last = np.where(n > 0, (s + n - 1) // budget, -1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": batch.column("n_tokens"),
                "start_tok": batch.column("start"),
                "chunk_first": pa.array(first.astype(np.int64)),
                "chunk_last": pa.array(last.astype(np.int64)),
            }
        )

    return scanned.map_batches(_chunks, batch_format="pyarrow")


def deterministic_shuffle(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    prefix_bits: int = 12,
) -> ray.data.Dataset:
    """Epoch-shuffle ranks: every row's 0-based GLOBAL position under the
    pseudo-random total order ``(knuth-hash(id), id)`` — the
    deterministic, resume-safe way to shuffle a training corpus (same
    data → same order, no RNG state to checkpoint, any shard of the
    permutation is recomputable independently). Emits
    ``(id_col, shuffle_rank)``.

    Same two-pass scan shape as :func:`ordered_prefix_sum`, but bucketed
    on the HASH's high bits (uniform by construction, so bucket counts
    are balanced regardless of id skew): a per-batch bucket histogram
    folds into ≤2^prefix_bits driver-held exclusive offsets, then ONE
    explicit-boundary exchange sorts each partition by (hash, id) and
    ranks vectorized. The hash is the ``split_by_hash``/
    ``stratified_sample`` Knuth fold, so DuckDB replays the order with
    HUGEINT arithmetic + ROW_NUMBER."""
    from raylink.ops.dedup import _default_partitions
    from raylink.ops.sample import id_hash
    from raylink.util import pa_type, sorted_partition_apply

    nparts = num_partitions or _default_partitions()
    shift = 32 - prefix_bits  # hash values live in [0, 2^32)

    def _hist(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = (id_hash(ids) >> np.uint64(shift)).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        ds.select_columns([id_col])
        .map_batches(_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", as_index=False)["n"]
        .sum()
    )
    nb = 1 << prefix_bits
    totals = np.zeros(nb, dtype=np.int64)
    totals[hist["bucket"].to_numpy()] = hist["n"].to_numpy()
    offsets = np.cumsum(totals) - totals
    oref = ray.put(offsets)

    def _tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = id_hash(ids)
        pid = ((h >> np.uint64(shift)) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                id_col: batch.column(id_col),
                "_h": pa.array(h.astype(np.int64)),
            }
        )

    def _rank(part: pa.Table) -> pa.Table:
        off = ray.get(oref)
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        h = part.column("_h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        ids, h = ids[order], h[order]
        b = (h >> shift).astype(np.int64)  # monotone in h: contiguous runs
        pos = np.arange(len(b), dtype=np.int64)
        first = np.flatnonzero(np.diff(b, prepend=-1))
        base = np.repeat(pos[first], np.diff(np.append(first, len(b))))
        rank = off[b] + (pos - base)
        return pa.table(
            {
                id_col: pa.array(ids),
                "shuffle_rank": pa.array(rank),
            }
        )

    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))
    out_schema = pa.schema(
        [(id_col, types[id_col]), ("shuffle_rank", pa.int64())]
    )
    tagged = ds.select_columns([id_col]).map_batches(
        _tag, batch_format="pyarrow"
    )
    return sorted_partition_apply(
        tagged, "_pid", _rank, out_schema,
        boundaries=list(range(1, nparts)),
    )


def _order_bits(v: np.ndarray) -> np.ndarray:
    """Monotone uint64 image of float64 values (IEEE total-order trick:
    flip all bits of negatives, the sign bit of non-negatives), so value
    buckets can come from high bits. -0.0 canonicalizes to +0.0 first —
    they compare equal and must share a rank, but their bit patterns
    differ. NaNs are rejected upstream."""
    v = np.where(v == 0.0, 0.0, v)
    bits = v.view(np.uint64)
    neg = bits >> np.uint64(63) == 1
    out = bits.copy()
    out[neg] = ~bits[neg]
    out[~neg] = bits[~neg] | np.uint64(1 << 63)
    return out


def value_rank(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    prefix_bits: int = 12,
) -> ray.data.Dataset:
    """Global RANK of a float64 value column — for each row, ``1 + the
    number of rows with a strictly smaller value`` (ties share a rank:
    SQL ``RANK() OVER (ORDER BY value)``). The building block for
    corpus-wide percentile features ("this document's quality sits at
    p93") without a global sort.

    Same prefix-bucket scan shape as :func:`deterministic_shuffle`, but
    bucketing the VALUE's monotone bit image (equal values share a
    bucket by construction, so ties never straddle partitions): one
    histogram pass → ≤2^prefix_bits driver-held exclusive offsets → one
    explicit-boundary exchange, then each partition ranks its buckets
    vectorized (sort + first-occurrence-of-value backfill). NaNs are
    rejected loudly — their order is undefined."""
    from raylink.ops.dedup import _default_partitions
    from raylink.util import pa_type, sorted_partition_apply

    nparts = num_partitions or _default_partitions()
    shift = 64 - prefix_bits

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        if np.isnan(v).any():
            raise ValueError("value_rank: NaN values have no defined rank")
        b = (_order_bits(v) >> np.uint64(shift)).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        ds.select_columns([value_col])
        .map_batches(_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", as_index=False)["n"]
        .sum()
    )
    nb = 1 << prefix_bits
    totals = np.zeros(nb, dtype=np.int64)
    totals[hist["bucket"].to_numpy()] = hist["n"].to_numpy()
    offsets = np.cumsum(totals) - totals
    oref = ray.put(offsets)

    def _tag(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        b = (_order_bits(v) >> np.uint64(shift)).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array((b % nparts).astype(np.int64)),
                id_col: batch.column(id_col),
                value_col: batch.column(value_col),
            }
        )

    def _rank(part: pa.Table) -> pa.Table:
        off = ray.get(oref)
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        v = part.column(value_col).to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        ids, v = ids[order], v[order]
        ob = _order_bits(v)  # canonicalized: equal values share an image
        b = (ob >> np.uint64(shift)).astype(np.int64)
        pos = np.arange(len(v), dtype=np.int64)
        bfirst = np.flatnonzero(np.diff(b, prepend=-1))
        bbase = np.repeat(pos[bfirst], np.diff(np.append(bfirst, len(b))))
        # RANK semantics: every row of a tie group takes the group's
        # first position
        vfirst = np.flatnonzero(
            np.diff(ob, prepend=~ob[0] if len(ob) else np.uint64(0))
            != np.uint64(0)
        )
        vbase = np.repeat(pos[vfirst], np.diff(np.append(vfirst, len(v))))
        rank = off[b] + (vbase - bbase) + 1
        return pa.table(
            {
                id_col: pa.array(ids),
                value_col: pa.array(v),
                "rank": pa.array(rank),
            }
        )

    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))
    out_schema = pa.schema(
        [
            (id_col, types[id_col]),
            (value_col, types[value_col]),
            ("rank", pa.int64()),
        ]
    )
    tagged = ds.select_columns([id_col, value_col]).map_batches(
        _tag, batch_format="pyarrow"
    )
    return sorted_partition_apply(
        tagged, "_pid", _rank, out_schema,
        boundaries=list(range(1, nparts)),
    )


_CHUNK_TOKEN_RE = None  # compiled lazily per worker process


def chunk_documents(
    ds: ray.data.Dataset,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Overlapping context-window chunking: per document, lowercase +
    tokenize (``[0-9a-z_]+``, the engine's TF-IDF convention) and emit one
    row per chunk of ``window`` tokens starting every ``stride`` tokens —
    the training-data shape :func:`pack_sequences` does NOT cover
    (pack = concat-and-chunk across documents; this = within-document
    sliding windows, documents never mix).

    Chunk layout: chunk ``i`` covers tokens ``[i*stride, i*stride+window)``;
    the last chunk may be short but always starts before the document ends,
    so ``n_chunks = 1 + ceil((n_tok - window)/stride)`` for ``n_tok >
    window``, 1 for ``0 < n_tok <= window``, 0 for empty documents. Emits
    ``(id_col, chunk_id, n_tokens, chunk_text)`` with ``chunk_text`` the
    space-joined tokens (canonical detokenization, SQL-replayable via
    ``list_slice`` + ``array_to_string``).

    Scale shape: a stateless flat ``map_batches`` — no shuffle, no state,
    output streams. The per-document Python loop wraps C-level regex
    tokenization and list slicing (the BM25 defensibility rule); chunking
    inflates rows by ~n_tok/stride, which Ray's streaming executor absorbs
    as more output blocks, never a driver copy.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}, {stride}")
    import re as _re

    from raylink.util import pa_type

    _sch = ds.schema()
    id_type = pa_type(dict(zip(_sch.names, _sch.types))[id_col])

    def _chunk(batch: pa.Table) -> pa.Table:
        global _CHUNK_TOKEN_RE
        if _CHUNK_TOKEN_RE is None:
            _CHUNK_TOKEN_RE = _re.compile(r"[0-9a-z_]+")
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id: list = []
        o_chunk: list[int] = []
        o_n: list[int] = []
        o_text: list[str] = []
        for d, t in zip(ids, texts):
            toks = _CHUNK_TOKEN_RE.findall(t.lower()) if t else []
            n_tok = len(toks)
            if n_tok == 0:
                continue
            if n_tok <= window:
                n_chunks = 1
            else:
                n_chunks = 1 + -(-(n_tok - window) // stride)
            for i in range(n_chunks):
                seg = toks[i * stride : i * stride + window]
                o_id.append(d)
                o_chunk.append(i)
                o_n.append(len(seg))
                o_text.append(" ".join(seg))
        return pa.table(
            {
                id_col: pa.array(o_id, type=id_type),
                "chunk_id": pa.array(o_chunk, type=pa.int64()),
                "n_tokens": pa.array(o_n, type=pa.int64()),
                "chunk_text": pa.array(o_text, type=pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _chunk, batch_format="pyarrow"
    )
