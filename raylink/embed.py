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
        v = np.zeros(self.dim, dtype=np.float64)
        padded = "\x02" + s + "\x03"
        for n in self.ngrams:
            for i in range(len(padded) - n + 1):
                self._hash_into(v, padded[i : i + n])
        return v

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

    def encode_many(self, strings) -> np.ndarray:
        out = np.empty((len(strings), self.dim), dtype=np.float32)
        for i, s in enumerate(strings):
            out[i] = self.encode_one(str(s))
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
