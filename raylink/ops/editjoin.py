"""Scalable edit-distance self-join (Pass-Join family, Li et al. 2011).

``edit_distance_self_join`` returns EVERY unordered pair of rows whose
key strings are within Levenshtein distance ``d`` — the exact-threshold
string join an ER pipeline uses for typo-class duplicates — without the
quadratic cross product the predicate naively implies.

Completeness is the pigeonhole argument: split a string into ``d + 1``
contiguous segments; any ``≤ d`` edits can touch at most ``d`` of them,
so for every matching pair at least one segment of ``a`` survives
untouched and appears VERBATIM as a substring of ``b``. Candidates are
therefore (segment of one row) = (same-length window of another row),
and a vectorized exact Levenshtein verify (``features.lev_cross``, the
kernel already gated bit-exact against DuckDB ``levenshtein()``) removes
the false ones. Rows shorter than ``d + 1`` have an empty segment (a
substring of everything); they pair only with strings of length
``≤ 2d``, so all length-``≤ 2d`` rows share one explicit short bucket.

Scale shape: the explode emits ``d + 1`` segment rows plus
``O(len · d)`` window rows per input row, all as compact
``(w, h)`` int64 polynomial hashes — never the substrings themselves —
and candidates form inside :func:`raylink.ops.dedup._pairs_in_hot_buckets`'
ONE ``_pid`` all-to-all (hash collisions only add candidates; the verify
is exact, so they can never add wrong output). Candidate dedup is the
standard ``_hash_dedup`` exchange. Skew bound: a popular substring (a
shared token across a corpus of near-identical names) makes one hot
bucket whose pair count is quadratic in its size — the same stated bound
as every LSH/blocking family here; segment length grows with string
length, so buckets shrink as keys get more specific.

The verify attaches texts from a broadcast ``id → text`` map (16 + len
bytes per DISTINCT id, one ``ray.put``); past driver memory, swap the
attach for the two-sided ``util.shuffle_merge`` used by
``tfidf_cosine_evidence`` — candidates keyed by each endpoint in turn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_B = np.uint64(1099511628211)  # FNV-prime polynomial base, mod 2^64


def _row_poly_hash(s: str) -> int:
    # Python-int recurrence masked to 64 bits (numpy SCALAR uint64 ops
    # warn on wrap; array ops — the hot path — wrap silently by design),
    # returned as the int64 two's-complement image of the uint64 value
    h, mask = 0, (1 << 64) - 1
    for ch in s:
        h = (h * int(_B) + ord(ch) + 1) & mask
    return h - (1 << 64) if h >= (1 << 63) else h


def _segment_rows(
    codes: np.ndarray, lens: np.ndarray, ok: np.ndarray, texts: list[str],
    ids: np.ndarray, d: int,
) -> pd.DataFrame:
    """(w, h, id, len) for every of the d+1 even segments per row."""
    k = d + 1
    n = len(lens)
    base, rem = lens // k, lens % k
    out = []
    for i in range(k):
        seg_len = base + (i < rem)
        start = i * base + np.minimum(i, rem)
        H = np.zeros(n, dtype=np.uint64)
        max_t = int(seg_len.max()) if n else 0
        Lmax = codes.shape[1]
        for t in range(max_t):
            active = (t < seg_len) & ok
            idx = np.clip(start + t, 0, Lmax - 1)
            c = codes[np.arange(n), idx].astype(np.uint64) + np.uint64(1)
            H = np.where(active, H * _B + c, H)
        # scalar fallback for rows the uint16 matrix couldn't hold
        for j in np.nonzero(~ok)[0]:
            s, ln = texts[j], int(lens[j])
            b, r = ln // k, ln % k
            st = i * b + min(i, r)
            H[j] = np.uint64(
                _row_poly_hash(s[st : st + b + (1 if i < r else 0)])
                & ((1 << 64) - 1)
            )
        out.append(
            pd.DataFrame(
                {
                    "w": seg_len.astype(np.int64),
                    "h": H.view(np.int64),
                    "id": ids,
                    "len": lens,
                    "role": np.int64(0),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def _window_rows(
    codes: np.ndarray, lens: np.ndarray, ok: np.ndarray, texts: list[str],
    ids: np.ndarray, d: int,
) -> pd.DataFrame:
    """(w, h, id, len) for every window whose length equals a possible
    segment length of a partner within ±d of this row's length."""
    k = d + 1
    n = len(lens)
    # distinct (row, w) needs, vectorized: for partner length L in
    # [len-d, len+d] with L >= k, segment lengths are L//k and
    # (L//k)+1 when L % k > 0
    ws_parts, row_parts = [], []
    rows_all = np.arange(n, dtype=np.int64)
    for off in range(-d, d + 1):
        L = lens + off
        m1 = L >= k
        ws_parts.append((L // k)[m1])
        row_parts.append(rows_all[m1])
        m2 = m1 & (L % k > 0)
        ws_parts.append((L // k)[m2] + 1)
        row_parts.append(rows_all[m2])
    ws_all = np.concatenate(ws_parts) if ws_parts else np.empty(0, np.int64)
    rowids = np.concatenate(row_parts) if row_parts else np.empty(0, np.int64)
    frames = []
    Lmax = codes.shape[1]
    for w in np.unique(ws_all):
        w = int(w)
        if w < 1:
            continue
        rows = np.unique(rowids[ws_all == w])
        rows = rows[lens[rows] >= w]
        if not len(rows):
            continue
        m = Lmax - w + 1
        if m >= 1:
            sub = codes[rows]
            H = np.zeros((len(rows), m), dtype=np.uint64)
            for t in range(w):
                H = H * _B + (sub[:, t : t + m].astype(np.uint64) + np.uint64(1))
            # flatten the valid (row, position) windows in one pass
            cnt = np.where(ok[rows], lens[rows] - w + 1, 0).astype(np.int64)
            tot = int(cnt.sum())
            if tot:
                ri = np.repeat(np.arange(len(rows)), cnt)
                pos = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                frames.append(
                    pd.DataFrame(
                        {
                            "w": np.int64(w),
                            "h": H[ri, pos].view(np.int64),
                            "id": ids[rows][ri],
                            "len": lens[rows][ri],
                            "role": np.int64(1),
                        }
                    )
                )
        for r in rows[~ok[rows]]:
            s = texts[r]
            hs = [_row_poly_hash(s[p : p + w]) for p in range(len(s) - w + 1)]
            if hs:
                frames.append(
                    pd.DataFrame(
                        {
                            "w": np.int64(w),
                            "h": np.asarray(hs, dtype=np.int64),
                            "id": np.int64(ids[r]),
                            "len": np.int64(lens[r]),
                            "role": np.int64(1),
                        }
                    )
                )
    if not frames:
        return pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ("w", "h", "id", "len", "role")}
        )
    return pd.concat(frames, ignore_index=True)


def edit_distance_self_join(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    d: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """All unordered pairs ``(id_a < id_b, lev)`` with
    ``levenshtein(lower(a), lower(b)) <= d``. Exact and complete (module
    docstring); requires unique non-negative int ids."""
    if d < 1:
        raise ValueError("d must be >= 1")
    from raylink.features import _JW_CAP, _encode_strings, lev_cross
    from raylink.ops.dedup import _hash_dedup, _pairs_in_hot_buckets

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [
            (s.lower() if isinstance(s, str) else "")
            for s in batch.column(text_col).to_pylist()
        ]
        codes, lens, ok = _encode_strings(texts, _JW_CAP)
        segs = _segment_rows(codes, lens, ok, texts, ids, d)
        wins = _window_rows(codes, lens, ok, texts, ids, d)
        short = lens <= 2 * d
        parts = [segs, wins]
        if short.any():
            # one explicit bucket for the tiny-string regime (w = -1):
            # every short row appears in both roles, so the bucket's
            # cross product covers all short-short pairs
            for role in (0, 1):
                parts.append(
                    pd.DataFrame(
                        {
                            "w": np.int64(-1),
                            "h": np.int64(0),
                            "id": ids[short],
                            "len": lens[short],
                            "role": np.int64(role),
                        }
                    )
                )
        df = pd.concat(parts, ignore_index=True)
        # explicit arrays, not from_pandas: pandas metadata in the schema
        # breaks the executor's schema dedup (unhashable dict)
        return pa.table(
            {
                c: pa.array(df[c].to_numpy().astype(np.int64), type=pa.int64())
                for c in ("w", "h", "id", "len", "role")
            }
        )

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow"
    )

    pair_empty = pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64())}
    )

    def _pair_fn(g: pd.DataFrame) -> pa.Table:
        role = g["role"].to_numpy()
        sid = g["id"].to_numpy()[role == 0]
        slen = g["len"].to_numpy()[role == 0]
        wid = g["id"].to_numpy()[role == 1]
        wlen = g["len"].to_numpy()[role == 1]
        if not len(sid) or not len(wid):
            return pair_empty
        ia = np.repeat(np.arange(len(sid)), len(wid))
        ib = np.tile(np.arange(len(wid)), len(sid))
        a, b = sid[ia], wid[ib]
        keep = (a != b) & (np.abs(slen[ia] - wlen[ib]) <= d)
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi)})

    cands = _pairs_in_hot_buckets(
        exploded, ["w", "h"], _pair_fn, empty_out=pair_empty,
        num_partitions=num_partitions,
    )
    cands = _hash_dedup(
        cands, ["id_a", "id_b"], num_partitions=num_partitions,
        out_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
    )

    # broadcast verify table (module docstring states the shuffle_merge
    # swap past driver memory)
    tdf = ds.select_columns([id_col, text_col]).to_pandas()
    texts_map = {
        int(i): (s.lower() if isinstance(s, str) else "")
        for i, s in zip(tdf[id_col], tdf[text_col])
    }
    map_ref = ray.put(texts_map)

    def _verify(batch: pa.Table) -> pa.Table:
        tm = ray.get(map_ref)
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        ta = [tm[int(x)] for x in a]
        tb = [tm[int(x)] for x in b]
        idx = np.arange(len(a))
        lev = lev_cross(ta, tb, idx, idx)
        keep = lev <= d
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
                "lev": pa.array(lev[keep].astype(np.int64)),
            }
        )

    from raylink.util import skip_empty

    verified = cands.map_batches(skip_empty(_verify), batch_format="pyarrow")
    # seed-FIRST typed anchor: skip_empty tasks that swallow their whole
    # block emit schema-less empty bundles (Ray 2.49); the anchor pins the
    # output schema and keeps the executor warning-free
    anchor = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "lev": pa.array([], type=pa.int64()),
        }
    )
    return ray.data.from_arrow(anchor).union(verified)
