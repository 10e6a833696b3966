"""Embedding stage (SURVEY.md §2.3 T1; reference ``R/get_embeddings.R:21-197``).

The reference calls a remote embedding API (OpenAI/Mistral/OpenRouter) over
HTTP with char-budget chunking, retries and 20-way request parallelism, and
returns a dense row-per-string matrix with ``rownames = text``
(``R/get_embeddings.R:131-196``).

Here the canonical stateful Ray Data stage replaces it: a callable actor
class passed to ``map_batches(cls, concurrency=N, batch_size=B,
batch_format="pyarrow")`` — encoder state built once per actor in
``__init__``, vectorized encoding per batch in ``__call__``. The sandbox
default encoder is a deterministic hashed character-n-gram embedder
(feature hashing with signed buckets, L2-normalized so dot = cosine — the
provider contract the reference silently relies on at
``R/get_similarity_matrix.R:38``). The interface admits any local model; the
HTTP concerns (chunking/retry/parallelism) map to Ray's batch_size, task
retries and actor-pool sizing.

Embeddings travel as an Arrow ``FixedSizeList<float32>[dim]`` column — never
a global string-keyed matrix (SURVEY.md §1.3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


import re as _re

_TOKEN_RE = _re.compile(r"[a-z0-9]+")
_CAMEL_RE = _re.compile(r"(?<=[a-z0-9])(?=[A-Z])")

# Small developer-vocabulary lexicon: groups of tokens that pretrained text
# embeddings place close together (synonyms and conventional abbreviations).
# The deterministic hashed encoder has no semantics of its own, so this
# stands in for that property of the provider models the reference calls
# (text-embedding-3-large etc.); swap or extend freely.
_SYNONYM_GROUPS = [
    ("utils", "util", "helpers", "helper", "tools"),
    ("manager", "mgr"),
    ("handler", "hdlr"),
    ("service", "svc"),
    ("config", "cfg", "conf"),
    ("builder", "bldr"),
    ("counter", "cntr"),
    ("buffer", "buf"),
    ("logger", "logr", "log"),
    ("context", "ctx"),
    ("directory", "dir"),
    ("database", "db"),
    ("message", "msg"),
    ("request", "req"),
    ("response", "resp"),
    ("function", "func", "fn"),
    ("document", "doc"),
    ("library", "lib"),
    ("source", "src"),
    ("temporary", "temp", "tmp"),
]
# token → canonical group representative: lexicon members encode
# IDENTICALLY (the deterministic analogue of semantic closeness)
_SYNONYM_CANON = {
    tok: group[0] for group in _SYNONYM_GROUPS for tok in group
}


def _tokenize(s: str) -> list[str]:
    """word-ish units: split camelCase, then non-alphanumeric separators
    (already-lowercased input: camel split happens on the raw string by the
    caller if needed; here s is lowercase, so separators only)."""
    return _TOKEN_RE.findall(s)


def _stable_bucket_seed(gram: str) -> int:
    """Deterministic 64-bit hash of an n-gram (PYTHONHASHSEED-independent)."""
    return int.from_bytes(hashlib.blake2b(gram.encode(), digest_size=8).digest(), "little")


# process-global gram → blake2b-seed cache. The 2/3-gram space of natural
# keys is tiny (tens of thousands) while the encode path was paying one
# Python-level hashlib call PER GRAM PER STRING — profiled at ~430 core-s
# of the 32-CPU headline run, ~40× the actual matmul+JW kernel work. Seeds
# are dim-independent, so one cache serves every embedder instance.
_GRAM_SEEDS: dict[str, int] = {}
_GRAM_SEEDS_MAX = 4_000_000


def _seed_slow(g: str) -> int:
    h = _stable_bucket_seed(g)
    if len(_GRAM_SEEDS) < _GRAM_SEEDS_MAX:
        _GRAM_SEEDS[g] = h
    return h


def _gram_seeds(grams: list[str]) -> np.ndarray:
    """Vectorizable seeds for a list of grams (cached blake2b).
    ``np.fromiter`` keeps the per-gram cost at one dict probe — a numpy
    scalar store per item is ~6× slower."""
    seeds = _GRAM_SEEDS
    return np.fromiter(
        (seeds[g] if g in seeds else _seed_slow(g) for g in grams),
        dtype=np.uint64,
        count=len(grams),
    )


class HashedNgramEmbedder:
    """Deterministic feature-hashing text encoder.

    Character n-grams (default 2- and 3-grams of ``^text$``-padded lowercase
    input, plus word unigrams) are hashed into ``dim`` signed buckets; the
    result is L2-normalized float32. Deterministic across processes and runs.

    Usable directly as a ``map_batches`` UDF class: consumes an Arrow batch
    with a ``text_col`` column, appends an ``embedding``
    FixedSizeList<float32>[dim] column.
    """

    def __init__(
        self,
        dim: int = 256,
        ngrams: tuple[int, ...] = (2, 3),
        text_col: str = "key",
        token_blend: float = 0.65,
    ):
        self.dim = dim
        self.ngrams = ngrams
        self.text_col = text_col
        # final vector = token_blend · (mean of unit token subvectors)
        #              + (1 − token_blend) · (unit whole-string gram vector);
        # per-token normalization stops long tokens from dominating, the
        # whole-string part keeps token order / cross-boundary signal
        self.token_blend = token_blend
        self._cache: dict[str, np.ndarray] = {}
        self._tok_cache: dict[str, np.ndarray] = {}

    # -- encoding ----------------------------------------------------------
    def _hash_into(self, v: np.ndarray, feat: str, w: float = 1.0) -> None:
        h = _stable_bucket_seed(feat)
        v[h % self.dim] += w if (h >> 32) & 1 else -w

    def _char_vec(self, s: str) -> np.ndarray:
        """Bit-identical to the per-gram ``_hash_into`` loop: each bucket
        accumulates an integer count of ±1s, which float64 addition
        represents exactly in any order."""
        grams = self._grams_of(s)
        if not grams:
            return np.zeros(self.dim, dtype=np.float64)
        h = _gram_seeds(grams)
        idx = (h % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1) != 0, 1.0, -1.0)
        return np.bincount(idx, weights=sign, minlength=self.dim)

    def _token_vec(self, w: str) -> np.ndarray:
        cached = self._tok_cache.get(w)
        if cached is not None:
            return cached
        # lexicon members collapse to their canonical representative — the
        # deterministic analogue of pretrained-embedding semantics
        canon = _SYNONYM_CANON.get(w, w)
        v = self._char_vec(canon)
        self._hash_into(v, "W:" + canon, 12.0)
        sk = canon[0] + "".join(c for c in canon[1:] if c not in "aeiou")
        if sk != canon:
            # consonant skeleton maps abbreviations near their canonical
            self._hash_into(v, "W:" + sk, 12.0)
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        if len(self._tok_cache) < 500_000:
            self._tok_cache[w] = v
        return v

    def encode_one(self, s: str) -> np.ndarray:
        cached = self._cache.get(s)
        if cached is not None:
            return cached
        low = s.lower()
        char_part = self._char_vec(low)
        n = np.linalg.norm(char_part)
        if n > 0:
            char_part = char_part / n
        toks = _tokenize(_CAMEL_RE.sub(" ", s).lower())
        if toks:
            tok_part = np.zeros(self.dim, dtype=np.float64)
            for w in toks:
                tok_part += self._token_vec(w)
            n = np.linalg.norm(tok_part)
            if n > 0:
                tok_part = tok_part / n
            v = self.token_blend * tok_part + (1.0 - self.token_blend) * char_part
        else:
            v = char_part
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        out = v.astype(np.float32)
        if len(self._cache) < 500_000:
            self._cache[s] = out
        return out

    def _grams_of(self, s: str) -> list[str]:
        padded = "\x02" + s + "\x03"
        return [
            padded[i : i + n]
            for n in self.ngrams
            for i in range(len(padded) - n + 1)
        ]

    def _char_vec_batch(self, strings: list[str]) -> np.ndarray:
        """(m, dim) float64 of unnormalized char vectors — ONE flat seed
        lookup and ONE ``np.add.at`` for the whole batch instead of
        per-string numpy setup. Bit-identical to ``_char_vec`` per row:
        every bucket holds an exact small-integer count in float64, so
        accumulation order cannot change the value."""
        m = len(strings)
        v = np.zeros(m * self.dim, dtype=np.float64)
        grams: list[str] = []
        counts = np.empty(m, dtype=np.int64)
        for j, s in enumerate(strings):
            g = self._grams_of(s)
            counts[j] = len(g)
            grams.extend(g)
        if grams:
            h = _gram_seeds(grams)
            idx = (h % np.uint64(self.dim)).astype(np.int64)
            idx += np.repeat(np.arange(m, dtype=np.int64) * self.dim, counts)
            sign = np.where((h >> np.uint64(32)) & np.uint64(1) != 0, 1.0, -1.0)
            # bincount, not add.at: buffered C summation; values stay exact
            # (small-integer counts in float64)
            v = np.bincount(idx, weights=sign, minlength=m * self.dim)
        return v.reshape(m, self.dim)

    def encode_many(self, strings) -> np.ndarray:
        """Batch encode: cached rows are copied, new rows share one
        vectorized char-gram pass (whole strings AND their uncached
        canonical tokens), then the per-string blend/normalize chain runs
        exactly as in ``encode_one`` — outputs are bit-identical to the
        scalar path and feed the same per-instance caches."""
        n = len(strings)
        out = np.empty((n, self.dim), dtype=np.float32)
        todo: list[tuple[int, str]] = []
        for i, s in enumerate(strings):
            s = str(s)
            cached = self._cache.get(s)
            if cached is not None:
                out[i] = cached
            else:
                todo.append((i, s))
        if not todo:
            return out
        lows = [s.lower() for _, s in todo]
        toks_per = [_tokenize(_CAMEL_RE.sub(" ", s).lower()) for _, s in todo]
        # batch the char pass for the whole strings and for every uncached
        # canonical token (deduped, first-seen order)
        new_canons: list[str] = []
        seen: set[str] = set()
        for toks in toks_per:
            for w in toks:
                if w not in self._tok_cache:
                    canon = _SYNONYM_CANON.get(w, w)
                    if canon not in seen:
                        seen.add(canon)
                        new_canons.append(canon)
        char_mat = self._char_vec_batch(lows + new_canons)
        # finish the token vectors (W:-feature, skeleton, normalize) and
        # populate the token cache keyed by the ORIGINAL token
        canon_vec: dict[str, np.ndarray] = {}
        for j, canon in enumerate(new_canons):
            v = char_mat[len(lows) + j]
            self._hash_into(v, "W:" + canon, 12.0)
            sk = canon[0] + "".join(c for c in canon[1:] if c not in "aeiou")
            if sk != canon:
                self._hash_into(v, "W:" + sk, 12.0)
            nv = np.linalg.norm(v)
            if nv > 0:
                v = v / nv
            canon_vec[canon] = v
        for toks in toks_per:
            for w in toks:
                if w not in self._tok_cache and len(self._tok_cache) < 500_000:
                    self._tok_cache[w] = canon_vec[_SYNONYM_CANON.get(w, w)]
        # per-string blend/normalize, same op sequence as encode_one
        for j, (i, s) in enumerate(todo):
            char_part = char_mat[j]
            nv = np.linalg.norm(char_part)
            if nv > 0:
                char_part = char_part / nv
            toks = toks_per[j]
            if toks:
                tok_part = np.zeros(self.dim, dtype=np.float64)
                for w in toks:
                    tok_part += self._tok_cache.get(w) if w in self._tok_cache else canon_vec[_SYNONYM_CANON.get(w, w)]
                nv = np.linalg.norm(tok_part)
                if nv > 0:
                    tok_part = tok_part / nv
                v = self.token_blend * tok_part + (1.0 - self.token_blend) * char_part
            else:
                v = char_part
            nv = np.linalg.norm(v)
            if nv > 0:
                v = v / nv
            row = v.astype(np.float32)
            out[i] = row
            if len(self._cache) < 500_000:
                self._cache[s] = row
        return out

    # -- map_batches UDF ---------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        mat = self.encode_many(texts)
        emb = matrix_to_arrow(mat)
        return batch.append_column("embedding", emb)


def matrix_to_arrow(mat: np.ndarray) -> pa.Array:
    """(n, dim) float32 → fixed-width binary column (dim*4 bytes per row).

    Embeddings travel as binary rather than FixedSizeList because pyarrow's
    acero hash join (behind ``Dataset.join``) rejects list-typed non-key
    payload columns; fixed-size binary round-trips joins and shuffles and
    decodes back to a matrix with one zero-copy ``np.frombuffer``."""
    n, dim = mat.shape
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(dim * 4), n, [None, pa.py_buffer(np.ascontiguousarray(mat, dtype=np.float32).tobytes())]
    )


def embeddings_to_numpy(col: pa.ChunkedArray | pa.Array, dim: int) -> np.ndarray:
    """Zero-copy view of the binary embedding column as (n, dim) float32."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_binary(col.type):
        buf = col.buffers()[1]
        off = col.offset * dim * 4
        return np.frombuffer(buf, dtype=np.float32, count=len(col) * dim, offset=off).reshape(len(col), dim)
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        return np.frombuffer(b"".join(col.to_pylist()), dtype=np.float32).reshape(
            len(col), dim
        )
    if pa.types.is_fixed_size_list(col.type):
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), dim)
    return np.asarray(col.to_pylist(), dtype=np.float32).reshape(len(col), dim)


# --------------------------------------------------------------------------
# Worker-cached embedder for in-tile encoding

_WORKER_EMBEDDERS: dict[tuple, HashedNgramEmbedder] = {}


def worker_embedder(dim: int = 256, ngrams: tuple[int, ...] = (2, 3)) -> HashedNgramEmbedder:
    """Process-global embedder instance (per Ray worker), string-memoized.

    Lets stateless tile tasks encode their keys locally instead of shipping
    a 1 KB embedding per replicated row through the pair-gen shuffle —
    correct whenever the encoder is deterministic and cheap (the hashed
    n-gram default). Expensive model encoders should use the shuffle-borne
    embedding column path instead (``generate_pairs`` on pre-embedded
    inputs)."""
    key = (dim, ngrams)
    emb = _WORKER_EMBEDDERS.get(key)
    if emb is None:
        emb = HashedNgramEmbedder(dim=dim, ngrams=ngrams)
        _WORKER_EMBEDDERS[key] = emb
    return emb


# --------------------------------------------------------------------------
# Standalone API parity with the reference exports


def get_embeddings(strings, dim: int = 256) -> dict[str, np.ndarray]:
    """Driver-side convenience mirroring ``get_embeddings()``
    (``R/get_embeddings.R:21``): distinct strings → {string: unit vector}.

    For datasets, use ``map_batches(HashedNgramEmbedder, ...)`` instead.
    """
    emb = HashedNgramEmbedder(dim=dim)
    uniq = list(dict.fromkeys(strings))
    mat = emb.encode_many(uniq)
    return {s: mat[i] for i, s in enumerate(uniq)}


def get_similarity_matrix(embeddings: dict[str, np.ndarray], strings_a=None, strings_b=None) -> np.ndarray:
    """Driver-side parity with ``get_similarity_matrix()``
    (``R/get_similarity_matrix.R:22-44``): dense A·Bᵀ over unit vectors.

    The distributed pipeline never materializes this matrix — pair
    similarities are computed tile-wise inside the pair-gen groupby
    (SURVEY.md §1.3) — but the exported utility is part of the reference's
    public surface.
    """
    keys = list(embeddings)
    strings_a = keys if strings_a is None else list(strings_a)
    strings_b = keys if strings_b is None else list(strings_b)
    a = np.stack([embeddings[s] for s in strings_a]).astype(np.float64)
    b = np.stack([embeddings[s] for s in strings_b]).astype(np.float64)
    return a @ b.T
