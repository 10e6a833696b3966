"""Lexical string-similarity kernels (SURVEY.md §2.8, F1-F8).

Pure-Python/numpy reimplementations of the `stringdist` kernels the reference
uses as model features (``R/fuzzylink.R:174-186``):

* ``jw``      — Jaro-Winkler *similarity*, p=0.1 (stringsim, :174-175)
* ``osa``     — restricted Damerau-Levenshtein distance (:180)
* ``cosine``  — q-gram profile cosine distance, q=1 (:181)
* ``jaccard`` — q-gram set Jaccard distance, q=1 (:182)
* ``lcs``     — longest-common-subsequence edit distance (:183)
* ``qgram``   — q-gram count (L1) distance, q=1 (:184)
* ``soundex`` — soundex-code inequality 0/1 (:185)
* ``dot``     — vector dot product (``R/dot.R:11-13``)

stringdist applies the Winkler prefix boost unconditionally (boost threshold
0); DuckDB's ``jaro_winkler_similarity`` boosts only when jaro > 0.7 — the
``boost_threshold`` parameter covers both so kernels can be oracle-checked
against DuckDB.

All kernels operate on already-lowercased inputs in the pipeline (the
reference lowercases at the call sites, ``R/fuzzylink.R:174,180-185``).
Hot-path usage goes through :func:`pair_features_batch`, which memoizes per
distinct (a, b) pair within a batch.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# --------------------------------------------------------------------------
# Jaro-Winkler


def _jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = True
                match_b[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    # transpositions: compare matched chars in order
    bs = [b[j] for j in range(lb) if match_b[j]]
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            if a[i] != bs[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler_sim(
    a: str, b: str, p: float = 0.1, boost_threshold: float = 0.0
) -> float:
    """Jaro-Winkler similarity with prefix weight ``p``.

    ``boost_threshold=0.0`` reproduces stringdist semantics (boost always
    applied); ``0.7`` reproduces DuckDB/classic Winkler.
    """
    sim_j = _jaro(a, b)
    if sim_j <= boost_threshold:
        return sim_j
    l = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        l += 1
    return sim_j + l * p * (1.0 - sim_j)


# --------------------------------------------------------------------------
# OSA (restricted Damerau-Levenshtein)


def osa_distance(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            best = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                prev2 is not None
                and i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                best = min(best, prev2[j - 2] + cost)
            cur[j] = best
        prev2, prev = prev, cur
    return prev[lb]


def levenshtein_distance(a: str, b: str) -> int:
    """Plain Levenshtein (insert/delete/substitute, NO transposition —
    distinct from :func:`osa_distance`). Scalar reference kernel; the
    vectorized cross-product form is :func:`lev_cross`."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def lev_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
) -> np.ndarray:
    """Plain Levenshtein for an index-expanded cross product, vectorized
    over the PAIR axis: the (max_len_a × max_len_b) DP grid runs as scalar
    loop steps whose bodies are O(n_pairs) contiguous numpy ops, so total
    cost is grid_cells × n_pairs vector work instead of a per-pair Python
    DP (~100× faster at typical name lengths). Each side is encoded once
    (na + nb encodes, not na·nb); overlong/astral rows fall back to the
    scalar kernel. Bit-equal to DuckDB's ``levenshtein()`` — gated over a
    150k-pair cross product in the ``lev_kernel`` oracle query."""
    n = len(ai)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    EA, la_s, ok_a = _encode_strings(keys_a, _JW_CAP)
    EB, lb_s, ok_b = _encode_strings(keys_b, _JW_CAP)
    A = EA[ai]
    B = EB[bi]
    la, lb = la_s[ai], lb_s[bi]
    ok = ok_a[ai] & ok_b[bi]
    out = np.zeros(n, dtype=np.int64)
    if not ok.all():
        for idx in np.nonzero(~ok)[0]:
            out[idx] = levenshtein_distance(keys_a[ai[idx]], keys_b[bi[idx]])
    if not ok.any():
        return out
    la_max = int(la[ok].max())
    lb_max = int(lb[ok].max())
    # rows with la == 0: distance is lb
    out[ok & (la == 0)] = lb[ok & (la == 0)]
    if la_max == 0 or lb_max == 0:
        out[ok & (lb == 0)] = la[ok & (lb == 0)]
        return out
    # D[j, p] = edit distance between a[:i] and b[:j] for every pair p at
    # the current DP row i; the j scan is sequential (cur[j-1] dependency)
    # but each step is one vectorized min over all pairs. PAIR-LAST layout:
    # every operand the inner loop touches (D[j], cur[j-1], BT[j-1]) is a
    # CONTIGUOUS n-vector — the (n, lb+1) layout strided them by lb+1,
    # which measured ~2x slower at 90k-pair batches (cache-line per lane)
    D = np.repeat(
        np.arange(lb_max + 1, dtype=np.int32)[:, None], n, axis=1
    )  # (lb_max+1, n)
    AT = np.ascontiguousarray(A[:, :la_max].T)  # (la_max, n)
    BT = np.ascontiguousarray(B[:, :lb_max].T)
    idx = np.arange(n)
    for i in range(1, la_max + 1):
        cur = np.empty_like(D)
        cur[0] = i
        ca = AT[i - 1]
        for j in range(1, lb_max + 1):
            cost = (ca != BT[j - 1]).astype(np.int32)
            np.minimum(D[j] + 1, D[j - 1] + cost, out=cost)
            np.minimum(cost, cur[j - 1] + 1, out=cost)
            cur[j] = cost
        D = cur
        # capture finished rows; lb == 0 rows read D[0, p] = i = la, which
        # is already the right distance, so no special case
        done = ok & (la == i)
        if done.any():
            out[done] = D[lb[done], idx[done]]
    return out


def damerau_distance(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein (Lowrance-Wagner): transposed
    characters may drift apart (``ca``→``abc`` is 2, where the restricted
    :func:`osa_distance` says 3). Scalar reference kernel; the vectorized
    cross form is :func:`damerau_cross`."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    # offset-border DP: real cells live at [i+1][j+1]
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(la + 1):
        d[i + 1][1] = i
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def damerau_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
    chunk: int = 25_000,
) -> np.ndarray:
    """Unrestricted Damerau-Levenshtein over an index-expanded cross
    product, vectorized over the PAIR axis. Unlike :func:`lev_cross`'s
    two-row DP, Lowrance-Wagner's transposition term reaches back to an
    ARBITRARY earlier cell ``d[k][l]`` (the last-occurrence bookkeeping),
    so each pair keeps its full (la+2)×(lb+2) grid plus a per-character
    last-row table — the pair axis is processed in ``chunk``-sized slabs
    to bound that memory (~3 KB/pair at name lengths). Every (i, j) step
    is a handful of O(chunk) vector ops and two fancy-index gathers.
    Bit-equal to DuckDB's ``damerau_levenshtein()`` — gated over the
    150k-pair cross in the ``damerau_kernel`` oracle query."""
    n = len(ai)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    EA, la_s, ok_a = _encode_strings(keys_a, _JW_CAP)
    EB, lb_s, ok_b = _encode_strings(keys_b, _JW_CAP)
    # compact alphabet: codes 1..K over the union of both sides' chars
    # (0 = padding, never queried inside a string's live length)
    alphabet = np.unique(np.concatenate([EA[EA > 0], EB[EB > 0]]))
    code = np.zeros(65536, dtype=np.int32)
    code[alphabet] = np.arange(1, len(alphabet) + 1, dtype=np.int32)
    K = len(alphabet) + 1
    out = np.zeros(n, dtype=np.int64)
    ok_pair = ok_a[ai] & ok_b[bi]
    if not ok_pair.all():
        for idx in np.nonzero(~ok_pair)[0]:
            out[idx] = damerau_distance(keys_a[ai[idx]], keys_b[bi[idx]])
    for s in range(0, n, chunk):
        sel = np.arange(s, min(s + chunk, n))
        sel = sel[ok_pair[sel]]
        if len(sel) == 0:
            continue
        out[sel] = _damerau_slab(
            code[EA[ai[sel]]], code[EB[bi[sel]]], la_s[ai[sel]], lb_s[bi[sel]], K
        )
    return out


def _damerau_slab(
    A: np.ndarray, B: np.ndarray, la: np.ndarray, lb: np.ndarray, K: int
) -> np.ndarray:
    """Lowrance-Wagner DP over one slab of pairs; A/B are compact-coded
    (p, L) int32 matrices."""
    P = len(la)
    la_max = int(la.max(initial=0))
    lb_max = int(lb.max(initial=0))
    if la_max == 0 or lb_max == 0:
        return (la + lb).astype(np.int64)
    maxd = (la + lb).astype(np.int32)
    # PAIR-LAST layout: D[i, j] is a CONTIGUOUS P-vector, so the four
    # min/add ops per (i, j) step stream cache lines instead of gathering
    # one element per pair across (la+2)·(lb+2)-strided rows (measured
    # ~2-3x at 25k-pair slabs); only the transposition term stays a gather
    D = np.empty((la_max + 2, lb_max + 2, P), dtype=np.int32)
    D[:] = maxd[None, None, :]
    D[1, 1:, :] = np.arange(lb_max + 1, dtype=np.int32)[:, None]
    D[1:, 1, :] = np.arange(la_max + 1, dtype=np.int32)[:, None]
    # flat (cell, pair) view for the arbitrary-cell transposition gather
    Dflat = D.reshape(-1, P)
    W = lb_max + 2
    da = np.zeros((K, P), dtype=np.int32)  # last row i where a[i-1] == char
    rows = np.arange(P)
    for i in range(1, la_max + 1):
        db = np.zeros(P, dtype=np.int32)
        ca = A[:, i - 1]
        for j in range(1, lb_max + 1):
            cb = B[:, j - 1]
            k = da[cb, rows]
            l = db
            eq = ca == cb
            cost = (~eq).astype(np.int32)
            db = np.where(eq, j, db)
            trans = Dflat[k * W + l, rows] + (i - k - 1) + 1 + (j - l - 1)
            best = np.minimum(D[i, j] + cost, D[i + 1, j] + 1)
            np.minimum(best, D[i, j + 1] + 1, out=best)
            np.minimum(best, trans, out=best)
            D[i + 1, j + 1] = best
        da[ca, rows] = i
    return Dflat[(la + 1) * W + (lb + 1), rows].astype(np.int64)


def charset_jaccard_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
) -> np.ndarray:
    """Character-SET Jaccard similarity (q=1 grams as sets, the semantics
    of DuckDB's ``jaccard()``) for an index-expanded cross product. Each
    side becomes an (n, |alphabet|) membership matrix built once; pair
    scores are two boolean reductions. Gated bit-exact (e6 micro-units)
    against DuckDB in the ``jaccard_kernel`` oracle query."""
    n = len(ai)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    alphabet = sorted({ch for s in keys_a for ch in s} | {ch for s in keys_b for ch in s})
    pos = {ch: k for k, ch in enumerate(alphabet)}
    K = max(len(alphabet), 1)

    def _membership(keys: list[str]) -> np.ndarray:
        M = np.zeros((len(keys), K), dtype=bool)
        for r, s in enumerate(keys):
            for ch in s:
                M[r, pos[ch]] = True
        return M

    SA = _membership(keys_a)[ai]
    SB = _membership(keys_b)[bi]
    inter = (SA & SB).sum(axis=1)
    union = (SA | SB).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = inter / union
    return np.where(union == 0, 1.0, sim)


# --------------------------------------------------------------------------
# q-gram kernels (q=1, the stringdist default used by the reference)


def _qgram_profile(s: str, q: int = 1) -> dict[str, int]:
    if q == 1:
        prof: dict[str, int] = {}
        for ch in s:
            prof[ch] = prof.get(ch, 0) + 1
        return prof
    prof = {}
    for i in range(len(s) - q + 1):
        g = s[i : i + q]
        prof[g] = prof.get(g, 0) + 1
    return prof


def qgram_cosine_distance(a: str, b: str, q: int = 1) -> float:
    pa, pb = _qgram_profile(a, q), _qgram_profile(b, q)
    if not pa or not pb:
        # stringdist returns 0 when both empty, 1 when exactly one empty
        return 0.0 if not pa and not pb else 1.0
    dotp = sum(v * pb.get(k, 0) for k, v in pa.items())
    na = np.sqrt(sum(v * v for v in pa.values()))
    nb = np.sqrt(sum(v * v for v in pb.values()))
    return float(1.0 - dotp / (na * nb))


def qgram_jaccard_distance(a: str, b: str, q: int = 1) -> float:
    sa, sb = set(_qgram_profile(a, q)), set(_qgram_profile(b, q))
    if not sa and not sb:
        return 0.0
    union = len(sa | sb)
    return 1.0 - len(sa & sb) / union


def qgram_count_distance(a: str, b: str, q: int = 1) -> int:
    pa, pb = _qgram_profile(a, q), _qgram_profile(b, q)
    keys = set(pa) | set(pb)
    return sum(abs(pa.get(k, 0) - pb.get(k, 0)) for k in keys)


# --------------------------------------------------------------------------
# LCS distance


def lcs_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance: |a| + |b| - 2*LCS(a, b)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la + lb
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return la + lb - 2 * prev[lb]


# --------------------------------------------------------------------------
# Soundex

_SOUNDEX_CODES = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(s: str) -> str:
    """US-census soundex of the first word-like token (lowercase input)."""
    letters = [c for c in s.lower() if "a" <= c <= "z"]
    if not letters:
        return "0000"
    first = letters[0]
    code = first.upper()
    prev = _SOUNDEX_CODES.get(first, "")
    for c in letters[1:]:
        d = _SOUNDEX_CODES.get(c, "")
        if d and d != prev:
            code += d
            if len(code) == 4:
                break
        if c not in "hw":
            prev = d
    return (code + "000")[:4]


def soundex_distance(a: str, b: str) -> int:
    return 0 if soundex(a) == soundex(b) else 1


# --------------------------------------------------------------------------
# dot product (R/dot.R:11-13)


def dot(x, y) -> float:
    return float(np.dot(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)))


# --------------------------------------------------------------------------
# Vectorized Jaro-Winkler (the hot-path kernel)

_JW_CAP = 64  # strings longer than this (or with NUL/surrogates) take the scalar path


def _encode_strings(strings: list[str], L: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Strings → ((n, L) uint16 code-unit matrix, lengths, ok-mask).
    Rows that exceed L, contain NUL, or use surrogate pairs get ok=False
    (callers route those through the scalar kernel)."""
    n = len(strings)
    enc = [s.encode("utf-16-le") for s in strings]
    ln = np.fromiter((len(e) >> 1 for e in enc), dtype=np.int64, count=n)
    ok = ln <= L
    M = np.zeros((n, L), dtype=np.uint16)
    for i in range(n):
        if ok[i] and ln[i]:
            M[i, : ln[i]] = np.frombuffer(enc[i], dtype=np.uint16)
    bad = ((M >= 0xD800) & (M < 0xE000)).any(axis=1)
    ok &= ~bad
    return M, ln, ok


def jw_batch(
    list_a: list[str],
    list_b: list[str],
    p: float = 0.1,
    boost_threshold: float = 0.0,
) -> np.ndarray:
    """Numpy-vectorized Jaro-Winkler similarity over aligned string lists.

    Chars are compared as UTF-16 code units ((n, L) uint16 matrices); the
    greedy match scan runs as ~L×(2w+1) vectorized steps over all pairs at
    once instead of a per-pair python loop (~10× the scalar kernel).
    Exactly matches :func:`jaro_winkler_sim` (validated in tests); rare rows
    (len > 64, NUL, astral plane) fall back to the scalar kernel.
    """
    n = len(list_a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    A, la, ok_a = _encode_strings(list_a, _JW_CAP)
    B, lb, ok_b = _encode_strings(list_b, _JW_CAP)
    L = max(int(max(la.max(initial=0), lb.max(initial=0))), 1)
    L = min(L, _JW_CAP)
    A, B = A[:, :L], B[:, :L]
    ok = ok_a & ok_b
    out = np.zeros(n, dtype=np.float64)
    for i, (sa, sb) in enumerate(zip(list_a, list_b)):
        if not ok[i]:
            out[i] = jaro_winkler_sim(sa, sb, p, boost_threshold)
    if not ok.any():
        return out

    out[ok] = _jw_core(A, B, la, lb, ok, p, boost_threshold)[ok]
    return out


def _jw_core(
    A: np.ndarray,
    B: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
    ok: np.ndarray,
    p: float,
    boost_threshold: float,
) -> np.ndarray:
    """Vectorized JW over pre-encoded (n, L) uint16 matrices; values are
    only meaningful where ``ok``."""
    n, L = A.shape
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    wmax = int(w[ok].max())
    Lmax = int(la[ok].max())

    # column-major layout + precomputed masks keep the (i, d) scan to a few
    # contiguous vector ops per step
    AT = np.ascontiguousarray(A.T)  # (L, n)
    BT = np.ascontiguousarray(B.T)
    ma_T = np.zeros((L, n), dtype=bool)
    mb_T = np.zeros((L, n), dtype=bool)
    j_in_b = np.arange(L)[:, None] < lb[None, :]  # (L, n)
    dmask = [dd <= w for dd in range(wmax + 1)]
    for i in range(Lmax):
        active = ok & (i < la)
        if not active.any():
            break
        ai = AT[i]
        found = ~active
        for d in range(-wmax, wmax + 1):
            j = i + d
            if j < 0 or j >= L:
                continue
            hit = (BT[j] == ai) & ~found & dmask[abs(d)] & j_in_b[j] & ~mb_T[j]
            if hit.any():
                ma_T[i] |= hit
                mb_T[j] |= hit
                found |= hit
    matched_a = ma_T.T
    matched_b = mb_T.T

    m = matched_a.sum(axis=1)

    # transpositions: matched chars of A in i-order vs matched chars of B in
    # j-order, scattered into aligned (n, L) sequence buffers
    seq_a = np.zeros((n, L), dtype=np.uint16)
    seq_b = np.zeros((n, L), dtype=np.uint16)
    rows, cols = np.nonzero(matched_a)
    pos = (np.cumsum(matched_a, axis=1) - 1)[rows, cols]
    seq_a[rows, pos] = A[rows, cols]
    rows, cols = np.nonzero(matched_b)
    pos = (np.cumsum(matched_b, axis=1) - 1)[rows, cols]
    seq_b[rows, pos] = B[rows, cols]
    valid = np.arange(L)[None, :] < m[:, None]
    t = (((seq_a != seq_b) & valid).sum(axis=1) // 2).astype(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        mf = m.astype(np.float64)
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where((la == 0) & (lb == 0), 1.0, jaro)
    jaro = np.where(((la == 0) ^ (lb == 0)), 0.0, jaro)

    # winkler prefix boost (up to 4 chars)
    k4 = min(4, L)
    pref_eq = (A[:, :k4] == B[:, :k4]) & (
        np.arange(k4)[None, :] < np.minimum(la, lb)[:, None]
    )
    l = np.cumprod(pref_eq, axis=1).sum(axis=1)
    boosted = jaro + l * p * (1.0 - jaro)
    return np.where(jaro > boost_threshold, boosted, jaro)


def jw_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
    p: float = 0.1,
    boost_threshold: float = 0.0,
) -> np.ndarray:
    """JW for an index-expanded cross product: each side is encoded ONCE
    (na + nb encodes instead of na·nb), then the (n_pairs, L) matrices are
    gathered by ``ai``/``bi`` — the kernel the fused tile stage uses."""
    if len(ai) == 0:
        return np.zeros(0, dtype=np.float64)
    EA, la_s, ok_a = _encode_strings(keys_a, _JW_CAP)
    EB, lb_s, ok_b = _encode_strings(keys_b, _JW_CAP)
    L = max(int(max(la_s.max(initial=0), lb_s.max(initial=0))), 1)
    L = min(L, _JW_CAP)
    A = EA[ai][:, :L]
    B = EB[bi][:, :L]
    la, lb = la_s[ai], lb_s[bi]
    ok = ok_a[ai] & ok_b[bi]
    out = np.zeros(len(ai), dtype=np.float64)
    if not ok.all():
        for idx in np.nonzero(~ok)[0]:
            out[idx] = jaro_winkler_sim(
                keys_a[ai[idx]], keys_b[bi[idx]], p, boost_threshold
            )
    if ok.any():
        out[ok] = _jw_core(A, B, la, lb, ok, p, boost_threshold)[ok]
    return out


# --------------------------------------------------------------------------
# Batch interface for map_batches hot path

_RANGER_FEATS = ("osa", "cosine", "jaccard", "lcs", "qgram", "soundex")


@lru_cache(maxsize=262_144)
def _pair_feats_cached(a: str, b: str, full: bool) -> tuple:
    """Per distinct lowercased pair; lru-cached inside the worker process."""
    jw = jaro_winkler_sim(a, b)
    if not full:
        return (jw,)
    return (
        jw,
        float(osa_distance(a, b)),
        qgram_cosine_distance(a, b),
        qgram_jaccard_distance(a, b),
        float(lcs_distance(a, b)),
        float(qgram_count_distance(a, b)),
        float(soundex_distance(a, b)),
    )


def pair_features_batch(
    keys_a: np.ndarray, keys_b: np.ndarray, full: bool = False
) -> dict[str, np.ndarray]:
    """Vector of lexical features for aligned key arrays (lowercasing applied
    here, mirroring ``tolower`` at R/fuzzylink.R:174,180-185).

    ``jw`` goes through the vectorized :func:`jw_batch`; the six extra
    forest features (non-default learner) use the scalar kernels with a
    per-worker pair cache."""
    n = len(keys_a)
    low_a = [str(s).lower() for s in keys_a]
    low_b = [str(s).lower() for s in keys_b]
    out = {"jw": jw_batch(low_a, low_b)}
    if full:
        extras = {name: np.empty(n, dtype=np.float64) for name in _RANGER_FEATS}
        for i in range(n):
            feats = _pair_feats_cached(low_a[i], low_b[i], True)
            for j, name in enumerate(_RANGER_FEATS):
                extras[name][i] = feats[j + 1]
        out.update(extras)
    return out


def monge_elkan_sum_e6(
    names_a: list[str],
    names_b: list[str],
    p: float = 0.1,
    boost_threshold: float = 0.7,
) -> "tuple[np.ndarray, np.ndarray]":
    """Monge–Elkan token-set evidence for name pairs: for pair i, the sum
    over tokens of ``names_a[i]`` of ``round(1e6 · max_j jw(tok_a,
    tok_b_j))``, plus the token count — integer micro-units per a-token
    so summation order can't perturb the result and the SQL gate replays
    it exactly (classic ME score = sum / n_tok). Tokenization is the
    repo's SQL convention: ``\\S+`` over ``lower(text)``.

    Vectorization: all (pair, a-token, b-token) combos flatten into ONE
    :func:`jw_cross` call over the batch's UNIQUE tokens (each token
    encodes once), then per-(pair, a-token) maxima fall out of a single
    ``np.maximum.reduceat`` over the lexsorted combo array.
    """
    n = len(names_a)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    toks_a = [s.lower().split() for s in names_a]
    toks_b = [s.lower().split() for s in names_b]
    vocab: dict[str, int] = {}

    def _codes(tok_lists):
        out = []
        for toks in tok_lists:
            out.append(
                np.array(
                    [vocab.setdefault(t, len(vocab)) for t in toks],
                    dtype=np.int64,
                )
            )
        return out

    ca, cb = _codes(toks_a), _codes(toks_b)
    na = np.array([len(c) for c in ca], dtype=np.int64)
    nb = np.array([len(c) for c in cb], dtype=np.int64)
    combos = na * nb
    pair_id = np.repeat(np.arange(n), combos)
    ai = np.concatenate(
        [np.repeat(c, len(cb[i])) for i, c in enumerate(ca) if len(c) * len(cb[i])]
        or [np.zeros(0, dtype=np.int64)]
    )
    bi = np.concatenate(
        [np.tile(cb[i], len(c)) for i, c in enumerate(ca) if len(c) * len(cb[i])]
        or [np.zeros(0, dtype=np.int64)]
    )
    # a-token ordinal within its pair (0..na-1), repeated nb times each
    tok_ord = np.concatenate(
        [
            np.repeat(np.arange(len(c)), len(cb[i]))
            for i, c in enumerate(ca)
            if len(c) * len(cb[i])
        ]
        or [np.zeros(0, dtype=np.int64)]
    )
    words = list(vocab)
    jw = jw_cross(words, words, ai, bi, p=p, boost_threshold=boost_threshold)

    sums = np.zeros(n, dtype=np.int64)
    if len(jw):
        # segment maxima over (pair, a-token): combos are already emitted
        # grouped by pair then a-token, so segment starts are where either
        # changes
        seg = np.flatnonzero(
            np.diff(pair_id * (na.max() + 1) + tok_ord, prepend=-1)
        )
        mx = np.maximum.reduceat(jw, seg)
        mx_e6 = np.round(mx * 1_000_000).astype(np.int64)
        seg_pair = pair_id[seg]
        np.add.at(sums, seg_pair, mx_e6)
    return sums, na


def token_sort_ratio_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
) -> np.ndarray:
    """Token-sort similarity (the fuzzywuzzy ``token_sort_ratio`` device,
    normalized-Levenshtein variant) for an index-expanded cross product,
    in e6 integer micro-units:

    each side is canonicalized ONCE per distinct string — split on single
    spaces, sort tokens (Python ``sorted``; '' sorts first, matching SQL
    ``list_sort``), rejoin with single spaces — then scored with the
    pair-axis-vectorized :func:`lev_cross` DP and normalized
    ``sim_e6 = (max_len - lev) * 10^6 // max_len`` (1e6 when both sides
    are empty). Word order is thereby ignored: 'doe john' ~ 'john doe'.

    SQL replay: ``array_to_string(list_sort(string_split(lower(x), ' ')),
    ' ')`` + ``levenshtein`` — the ``token_sort_kernel`` gate.
    """
    def _canon(keys: list[str]) -> list[str]:
        return [" ".join(sorted(s.split(" "))) for s in keys]

    ca, cb = _canon(keys_a), _canon(keys_b)
    lev = lev_cross(ca, cb, ai, bi).astype(np.int64)
    la = np.array([len(s) for s in ca], dtype=np.int64)[ai]
    lb = np.array([len(s) for s in cb], dtype=np.int64)[bi]
    m = np.maximum(la, lb)
    return np.where(m > 0, (m - lev) * 1_000_000 // np.maximum(m, 1), 1_000_000)


def trigram_similarity_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
) -> np.ndarray:
    """pg_trgm-style trigram-SET Jaccard similarity in e6 integer
    micro-units for an index-expanded cross product: each string is
    padded ``'  ' + s + ' '`` (two leading blanks, one trailing — the
    public pg_trgm convention), its distinct 3-grams become rows of a
    boolean membership matrix over the union vocabulary (built once per
    side, like :func:`charset_jaccard_cross`), and pair scores are two
    boolean reductions + one integer division:
    ``sim_e6 = |T1 ∩ T2| * 10^6 // |T1 ∪ T2|`` (0 when the union is
    empty, which only happens for empty inputs).
    """
    n = len(ai)
    if n == 0:
        return np.zeros(0, dtype=np.int64)

    def _grams(s: str) -> set:
        p = "  " + s + " "
        return {p[i : i + 3] for i in range(len(p) - 2)}

    ga = [_grams(s) for s in keys_a]
    gb = [_grams(s) for s in keys_b]
    vocab = sorted(set().union(*ga, *gb)) if (ga or gb) else []
    pos = {g: k for k, g in enumerate(vocab)}
    K = max(len(vocab), 1)

    def _membership(gs: list) -> np.ndarray:
        M = np.zeros((len(gs), K), dtype=bool)
        for r, s in enumerate(gs):
            for g in s:
                M[r, pos[g]] = True
        return M

    SA = _membership(ga)[ai]
    SB = _membership(gb)[bi]
    inter = (SA & SB).sum(axis=1).astype(np.int64)
    union = (SA | SB).sum(axis=1).astype(np.int64)
    return np.where(union > 0, inter * 1_000_000 // np.maximum(union, 1), 0)


def nw_score(a: str, b: str, match: int = 1, mismatch: int = -1, gap: int = -1) -> int:
    """Needleman-Wunsch GLOBAL alignment score (scalar reference kernel;
    the vectorized cross form is :func:`nw_cross`). Linear gap penalty;
    all-integer, so the recursive-CTE SQL oracle replays it exactly."""
    la, lb = len(a), len(b)
    prev = [j * gap for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [i * gap] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            sub = match if ca == b[j - 1] else mismatch
            cur[j] = max(prev[j - 1] + sub, prev[j] + gap, cur[j - 1] + gap)
        prev = cur
    return prev[lb]


def nw_cross(
    keys_a: list[str],
    keys_b: list[str],
    ai: np.ndarray,
    bi: np.ndarray,
    match: int = 1,
    mismatch: int = -1,
    gap: int = -1,
) -> np.ndarray:
    """Needleman-Wunsch global alignment score for an index-expanded
    cross product, vectorized over the PAIR axis with the same pair-last
    DP layout as :func:`lev_cross` (every inner-loop operand a contiguous
    n-vector). Maximization DP with linear gap penalty:

    ``S[i][j] = max(S[i-1][j-1] + s(a_i, b_j), S[i-1][j] + gap,
    S[i][j-1] + gap)``, ``S[i][0] = i*gap``, ``S[0][j] = j*gap``.

    Integers throughout — gated bit-exact against a cell-stepping
    recursive-CTE DuckDB oracle (``nw_align``).
    """
    n = len(ai)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    EA, la_s, ok_a = _encode_strings(keys_a, _JW_CAP)
    EB, lb_s, ok_b = _encode_strings(keys_b, _JW_CAP)
    A = EA[ai]
    B = EB[bi]
    la, lb = la_s[ai], lb_s[bi]
    ok = ok_a[ai] & ok_b[bi]
    out = np.zeros(n, dtype=np.int64)
    if not ok.all():
        for idx in np.nonzero(~ok)[0]:
            out[idx] = nw_score(
                keys_a[ai[idx]], keys_b[bi[idx]], match, mismatch, gap
            )
    if not ok.any():
        return out
    la_max = int(la[ok].max())
    lb_max = int(lb[ok].max())
    out[ok & (la == 0)] = lb[ok & (la == 0)] * gap
    if la_max == 0 or lb_max == 0:
        out[ok & (lb == 0)] = la[ok & (lb == 0)] * gap
        return out
    D = np.repeat(
        (np.arange(lb_max + 1, dtype=np.int32) * gap)[:, None], n, axis=1
    )  # (lb_max+1, n): row 0 of the DP grid
    AT = np.ascontiguousarray(A[:, :la_max].T)
    BT = np.ascontiguousarray(B[:, :lb_max].T)
    idx = np.arange(n)
    for i in range(1, la_max + 1):
        cur = np.empty_like(D)
        cur[0] = i * gap
        ca = AT[i - 1]
        for j in range(1, lb_max + 1):
            sub = np.where(ca == BT[j - 1], np.int32(match), np.int32(mismatch))
            v = D[j - 1] + sub
            np.maximum(v, D[j] + gap, out=v)
            np.maximum(v, cur[j - 1] + gap, out=v)
            cur[j] = v
        D = cur
        done = ok & (la == i)
        if done.any():
            out[done] = D[lb[done], idx[done]]
    return out
