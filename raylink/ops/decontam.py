"""Benchmark decontamination for training corpora.

Flags training documents that share any token n-gram with an evaluation /
benchmark set — the standard pre-training hygiene pass (GPT-3 appendix C,
PaLM, Llama: 8-13-token overlap against every eval benchmark).

Shape for 100 TB: the eval side is tiny relative to the corpus *by
definition* (benchmarks are thousands of documents, the corpus is
billions), so its distinct n-gram set is reduced once — per-batch set
partials, driver union — and broadcast via ``ray.put``; the corpus side is
ONE stateless vectorized ``map_batches`` pass with zero shuffle. Nothing
corpus-scale ever reaches the driver.

The broadcast set holds exact n-gram *strings* so the DuckDB oracle can
replay membership bit-exactly; a production run against a large benchmark
suite (~1e7 n-grams) would broadcast 64-bit n-gram hashes instead (~80 MB)
— the plumbing is identical, only the set elements change.

Tokenization is shared with the other token-level operators
(``ops/text._WORD_RE``: ASCII ``\\w+`` runs, lowercased per token) so one
DuckDB expression — ``regexp_extract_all(text, '[0-9A-Za-z_]+')`` +
``lower`` — replays every token operator in the repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from raylink.ops.text import _WORD_RE, set_column


def _doc_ngrams(text: str, n: int) -> set:
    toks = [w.lower() for w in _WORD_RE.findall(text)]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def eval_ngram_set(
    ds: ray.data.Dataset, n: int = 8, text_col: str = "text"
) -> frozenset:
    """Distinct token n-grams of an evaluation set.

    Per-batch set partials stream to the driver (one list row per batch);
    the union is bounded by the eval suite's size — the stated contract is
    eval ≪ corpus, the same boundedness argument as the incremental-dedup
    probe table."""

    def _partial(batch: pa.Table) -> pa.Table:
        grams: set = set()
        for t in batch.column(text_col).to_pylist():
            grams |= _doc_ngrams(t, n)
        return pa.table({"g": pa.array([list(grams)], type=pa.list_(pa.string()))})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out: set = set()
    for lst in parts["g"]:
        out.update(lst)
    return frozenset(out)


class _Decontaminate:
    """Stateless corpus-side pass: per document, the number of distinct
    n-grams, how many of them hit the broadcast eval set, and the
    contaminated flag. The eval set is fetched from the object store once
    per actor (``__init__``), not per batch."""

    def __init__(self, grams_ref, n: int, text_col: str):
        self.grams = ray.get(grams_ref) if isinstance(grams_ref, ray.ObjectRef) else grams_ref
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        m = len(texts)
        n_grams = np.zeros(m, dtype=np.int64)
        n_hit = np.zeros(m, dtype=np.int64)
        for i, t in enumerate(texts):
            grams = _doc_ngrams(t, self.n)
            n_grams[i] = len(grams)
            if grams:
                n_hit[i] = len(grams & self.grams)
        batch = set_column(batch, "n_grams", pa.array(n_grams, type=pa.int64()))
        batch = set_column(batch, "n_contaminated", pa.array(n_hit, type=pa.int64()))
        return set_column(
            batch,
            "contaminated",
            pa.array((n_hit > 0).astype(np.int64), type=pa.int64()),
        )


def decontaminate(
    ds: ray.data.Dataset,
    eval_grams: frozenset,
    n: int = 8,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Append ``n_grams`` / ``n_contaminated`` / ``contaminated`` columns.

    ``eval_grams`` is put into the object store ONCE here; every actor
    reads the same ref in ``__init__`` — broadcast, not re-shipped per
    batch."""
    from raylink.util import actor_pool_size

    grams_ref = ray.put(eval_grams)
    return ds.map_batches(
        _Decontaminate,
        fn_constructor_args=(grams_ref, n, text_col),
        batch_format="pyarrow",
        concurrency=(1, actor_pool_size()),
    )
