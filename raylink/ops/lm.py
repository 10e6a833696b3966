"""N-gram language-model perplexity scoring — the KenLM-style quality
filter every large training-data pipeline runs (CCNet, RefinedWeb,
FineWeb: score each document against a reference LM, drop the
high-perplexity tail).

A vocab-capped add-k bigram model, built and applied in three
scale-shaped passes:

  1. *vocab* — global top-V tokens by corpus frequency (ties
     (count desc, token asc)), via the same partial-Counter → groupby-sum
     → local-top-k shape as ``ops/text.vocab_topk``; out-of-vocab tokens
     map to ``<unk>``.
  2. *counts* — per-batch partial Counters of (context, word) bigrams
     over the mapped token stream (each document starts from a ``<s>``
     context) reduce through ONE distributed groupby sum; the folded
     table is bounded by min(observed bigrams, (V+1)²) — the vocab cap
     is what makes the model broadcastable, exactly why production
     n-gram LMs are vocab-limited.
  3. *score* — the count tables are broadcast once (``ray.put``); each
     batch scores its documents in a stateless vectorized pass:
     nll(doc) = -Σ_i ln((c(w_{i-1}, w_i) + k) / (c(w_{i-1}) + k·(V+1))).

Scoring a corpus against its OWN counts (the gate query does) makes the
perplexity a repetitiveness/outlier signal; scoring a candidate shard
against a trusted reference corpus' counts is the CCNet quality filter —
same operator, different ``fit`` input.

The whole model is a pure function of the fit corpus (no RNG, total tie
orders), so a DuckDB oracle rebuilds it from CTEs and replays the score
bit-exactly in e6 micro-units (ln/÷ agree with numpy to ~1e-15; the
micro-unit grid is 9 orders coarser — same device as bm25_topk).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from raylink.ops.text import _WORD_RE, set_column

BOS = "<s>"
UNK = "<unk>"


@dataclass
class BigramLM:
    vocab: frozenset
    bigram: dict  # (prev, w) -> count
    context: dict  # prev -> count (= sum of its bigram counts)
    k: float
    v_plus_1: int  # V + 1 (vocab plus <unk>) — the smoothing fan-out


def _mapped_tokens(text: str, vocab: frozenset) -> list:
    return [w if w in vocab else UNK for w in map(str.lower, _WORD_RE.findall(text))]


def fit_bigram_lm(
    ds: ray.data.Dataset,
    vocab_size: int = 10_000,
    k: float = 0.5,
    text_col: str = "text",
) -> BigramLM:
    """Fit the vocab + count tables. Driver memory is bounded by
    min(observed bigrams, (V+1)²), NOT the corpus."""
    from raylink.ops.text import vocab_topk

    vocab = frozenset(
        vocab_topk(ds, k=vocab_size, text_col=text_col).to_pandas()["token"]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter" = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = _mapped_tokens(t, vocab)
            prev = BOS
            for w in toks:
                c[(prev, w)] += 1
                prev = w
        ks = list(c.keys())
        return pa.table(
            {
                "prev": pa.array([a for a, _ in ks], type=pa.string()),
                "w": pa.array([b for _, b in ks], type=pa.string()),
                "c": pa.array([c[key] for key in ks], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    summed = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["prev", "w"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    bigram = {
        (p, w): int(c)
        for p, w, c in zip(summed["prev"], summed["w"], summed["c"])
    }
    context: dict = {}
    for (p, _), c in bigram.items():
        context[p] = context.get(p, 0) + c
    return BigramLM(
        vocab=vocab, bigram=bigram, context=context, k=k,
        v_plus_1=len(vocab) + 1,
    )


class _LmScore:
    """Stateless scoring pass; the model is fetched from the object store
    once per actor."""

    def __init__(self, lm_ref, text_col: str):
        self.lm: BigramLM = (
            ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        )
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lm = self.lm
        denom_add = lm.k * lm.v_plus_1
        texts = batch.column(self.text_col).to_pylist()
        m = len(texts)
        n_scored = np.zeros(m, dtype=np.int64)
        nll = np.zeros(m, dtype=np.float64)
        for i, t in enumerate(texts):
            toks = _mapped_tokens(t, lm.vocab)
            if not toks:
                continue
            ratios = np.empty(len(toks), dtype=np.float64)
            prev = BOS
            for j, w in enumerate(toks):
                ratios[j] = (lm.bigram.get((prev, w), 0) + lm.k) / (
                    lm.context.get(prev, 0) + denom_add
                )
                prev = w
            n_scored[i] = len(toks)
            nll[i] = -float(np.log(ratios).sum())
        batch = set_column(batch, "n_scored", pa.array(n_scored, type=pa.int64()))
        batch = set_column(batch, "nll", pa.array(nll, type=pa.float64()))
        ppl = np.where(n_scored > 0, np.exp(nll / np.maximum(n_scored, 1)), 0.0)
        return set_column(batch, "ppl", pa.array(ppl, type=pa.float64()))


def lm_score(
    ds: ray.data.Dataset,
    lm: BigramLM,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Append ``n_scored`` / ``nll`` (total negative log-likelihood) /
    ``ppl`` (exp(nll / n_scored)). The model broadcasts ONCE via
    ``ray.put``; the corpus streams."""
    from raylink.util import actor_pool_size

    lm_ref = ray.put(lm)
    return ds.map_batches(
        _LmScore,
        fn_constructor_args=(lm_ref, text_col),
        batch_format="pyarrow",
        concurrency=(1, actor_pool_size()),
    )
