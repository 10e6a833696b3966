"""Text-analysis operators for large-scale training-data pipelines:
token counting, surface statistics, quality scoring, language ID
(n-gram/stopword heuristic), and rolling-hash document fingerprinting.

All stateless vectorized ``map_batches`` stages over a ``text`` column;
regexes are compiled once per worker via a callable class.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

def set_column(batch: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    """Append-or-replace, so derived stats don't collide with pre-existing
    columns of the same name (e.g. documents.n_chars in the test tables)."""
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


# ASCII \w to match RE2 (DuckDB regexp_extract_all) semantics, so the SQL
# oracle reproduces n_words bit-exactly on unicode text
_WORD_RE = re.compile(r"\w+", re.ASCII)
_DIGIT_RE = re.compile(r"[0-9]")
# a BPE-ish pretokenizer: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "was", "on", "as"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "auf", "den"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "des", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "un", "una", "para", "en", "que", "por"},
}


class TextStats:
    """Append integer surface statistics: n_chars, n_words (\\w+ runs),
    n_digits, n_spaces. Integer outputs so a SQL oracle can reproduce them
    bit-exactly."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_chars = np.empty(n, dtype=np.int64)
        n_words = np.empty(n, dtype=np.int64)
        n_digits = np.empty(n, dtype=np.int64)
        n_spaces = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            n_chars[i] = len(t)
            n_words[i] = len(_WORD_RE.findall(t))
            n_digits[i] = len(_DIGIT_RE.findall(t))
            n_spaces[i] = t.count(" ")
        for name, arr in (
            ("n_chars", n_chars),
            ("n_words", n_words),
            ("n_digits", n_digits),
            ("n_spaces", n_spaces),
        ):
            batch = set_column(batch, name, pa.array(arr, type=pa.int64()))
        return batch


class TokenCount:
    """Whitespace token count plus a BPE-ish pretokenizer count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ws = pa.array([len(t.split()) for t in texts], type=pa.int64())
        bpe = pa.array([len(_BPE_RE.findall(t)) for t in texts], type=pa.int64())
        batch = set_column(batch, "n_ws_tokens", ws)
        return set_column(batch, "n_bpe_tokens", bpe)


class QualityScore:
    """Heuristic document-quality features (length / punctuation / stopword
    ratios) and a composite score in [0, 1]."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # ASCII classes so DuckDB RE2 reproduces the components bit-exactly
        # (the SQL oracle recomputes the full score)
        self.punct = re.compile(r"[^\w\s]", re.ASCII)
        self.nonws = re.compile(r"\S+", re.ASCII)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        punct_ratio = np.empty(n)
        stop_ratio = np.empty(n)
        mean_word_len = np.empty(n)
        score = np.empty(n)
        stops = _STOPWORDS["en"]
        for i, t in enumerate(texts):
            words = self.nonws.findall(t)
            nw = max(1, len(words))
            punct_ratio[i] = len(self.punct.findall(t)) / max(1, len(t))
            stop_ratio[i] = sum(w.lower() in stops for w in words) / nw
            mean_word_len[i] = sum(len(w) for w in words) / nw
            len_ok = 1.0 if 50 <= len(t) <= 20_000 else 0.3
            wl_ok = 1.0 if 2.0 <= mean_word_len[i] <= 12.0 else 0.3
            score[i] = len_ok * wl_ok * (1.0 - min(punct_ratio[i] * 2, 0.8))
        for name, arr in (
            ("punct_ratio", punct_ratio),
            ("stop_ratio", stop_ratio),
            ("mean_word_len", mean_word_len),
            ("quality_score", score),
        ):
            batch = set_column(batch, name, pa.array(arr, type=pa.float64()))
        return batch


class LangId:
    """Stopword-vote language heuristic over {en, de, fr, es}; 'und'
    (undetermined) when no stopword hits."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # ASCII \S+ tokenization matches DuckDB RE2 for the SQL oracle
        self.nonws = re.compile(r"\S+", re.ASCII)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs = []
        for t in texts:
            words = set(self.nonws.findall(t.lower()))
            best, best_n = "und", 0
            for lang, stops in _STOPWORDS.items():
                k = len(words & stops)
                if k > best_n:
                    best, best_n = lang, k
            langs.append(best)
        return set_column(batch, "lang_pred", pa.array(langs, type=pa.string()))


_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def _rolling_fingerprint(t: str) -> int:
    h = 0
    for ch in t:
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
    return h


class Fingerprint:
    """Deterministic rolling-hash document fingerprint (61-bit)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = pa.array([_rolling_fingerprint(t) for t in texts], type=pa.int64())
        return set_column(batch, "fingerprint", fps)


def text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(TextStats(text_col=text_col), batch_format="pyarrow")


def token_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(TokenCount(text_col=text_col), batch_format="pyarrow")


def quality_scores(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(QualityScore(text_col=text_col), batch_format="pyarrow")


def lang_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(LangId(text_col=text_col), batch_format="pyarrow")


def fingerprints(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(Fingerprint(text_col=text_col), batch_format="pyarrow")


def vocab_topk(
    ds: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Global top-k token vocabulary by corpus frequency.

    The wide step is shaped for 100-TB corpora: the map side tokenizes
    (ASCII ``\\w+`` runs, per-token ASCII lowercase — the exact tokens
    DuckDB's ``regexp_extract_all(text, '[0-9A-Za-z_]+')`` + ``lower``
    replays, keeping the operator inside the bit-exact oracle gate) and
    pre-aggregates counts per batch, so the groupby all-to-all moves one
    ``(token, cnt)`` row per DISTINCT token per batch — Zipf makes that a
    tiny fraction of the occurrence stream. After the distributed sum,
    every block forwards only its LOCAL top-k (any global top-k token is
    in some block's local top-k of the summed table, since each token
    lives in exactly one post-groupby block), so the final total-order
    sort sees ≤ blocks×k rows, not the vocabulary.

    Ties are broken (count desc, token asc) — a total order, so the k-row
    result is a pure function of the corpus.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(map(str.lower, _WORD_RE.findall(t)))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    def _local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    summed = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return (
        summed.map_batches(_local_topk, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def bm25_topk(
    ds: ray.data.Dataset,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
) -> ray.data.Dataset:
    """Top-k documents by BM25 score for a short query string.

    Two streaming passes, both scale-shaped:

      1. *Corpus stats*: one map pass emits a single partial row per batch
         — (n_docs, sum_dl, per-query-term document frequencies) — so the
         driver reduces ≤ blocks tiny rows into (N, avgdl, df). At 100 TB
         these are table statistics you'd maintain incrementally; here the
         pass IS the maintenance.
      2. *Scoring*: the (N, avgdl, df)-derived idf weights are closed over
         (broadcast-by-capture, they are a handful of floats), each batch
         scores its own docs vectorized-per-doc and forwards only its local
         top-k, so the final total-order sort sees ≤ blocks×k rows.

    Scores are fixed to integer micro-units (``bm25_e6``) and ranked by
    ``(bm25_e6 desc, id asc)`` — a total order a DuckDB oracle reproduces
    bit-exactly (ln/÷ in float64 agree to ~1e-15, six decimals are 9
    orders of magnitude coarser). Duplicate query terms are deduplicated
    (standard bag-of-terms BM25 over distinct terms).
    """
    terms = list(dict.fromkeys(map(str.lower, _WORD_RE.findall(query))))
    if not terms:
        raise ValueError(f"query has no tokens: {query!r}")
    nt = len(terms)
    term_ix = {t: i for i, t in enumerate(terms)}

    def _stats(batch: pa.Table) -> pa.Table:
        dfs = np.zeros(nt, dtype=np.int64)
        n_docs = len(batch)
        sum_dl = 0
        for t in batch.column(text_col).to_pylist():
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            sum_dl += len(toks)
            seen = set(toks)
            for term, i in term_ix.items():
                if term in seen:
                    dfs[i] += 1
        return pa.table(
            {
                "n_docs": pa.array([n_docs], type=pa.int64()),
                "sum_dl": pa.array([sum_dl], type=pa.int64()),
                "df": pa.array([dfs.tolist()], type=pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(_stats, batch_format="pyarrow").to_pandas()
    n = float(parts["n_docs"].sum())
    sum_dl = float(parts["sum_dl"].sum())
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.float64) if len(parts) else np.zeros(nt)
    empty = pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "bm25_e6": pa.array([], type=pa.int64())}
    )
    if n == 0 or sum_dl == 0:
        return ray.data.from_arrow(empty)
    avgdl = sum_dl / n
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def _score(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_ids, out_scores = [], []
        for i, t in enumerate(texts):
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            dl = len(toks)
            score = 0.0
            hit = False
            for term, j in term_ix.items():
                tf = toks.count(term)
                if tf:
                    hit = True
                    score += idf[j] * tf * (k1 + 1.0) / (
                        tf + k1 * (1.0 - b + b * dl / avgdl)
                    )
            if hit:
                out_ids.append(int(ids[i]))
                out_scores.append(int(round(score * 1e6)))
        if not out_ids:
            return empty
        order = sorted(range(len(out_ids)), key=lambda x: (-out_scores[x], out_ids[x]))[:k]
        return pa.table(
            {id_col: pa.array([out_ids[x] for x in order], type=pa.int64()),
             "bm25_e6": pa.array([out_scores[x] for x in order], type=pa.int64())}
        )

    return (
        ds.map_batches(_score, batch_format="pyarrow")
        .sort(["bm25_e6", id_col], descending=[True, False])
        .limit(k)
    )


class RepetitionStats:
    """Gopher-style repetition / diversity signals per document, over the
    same lowercased ASCII ``\\w+`` tokens the vocab/BM25 operators use (so
    one DuckDB tokenization replays every token-level operator):

    * ``n_tokens``       — token count
    * ``n_distinct``     — distinct-token count
    * ``top_word_cnt``   — occurrences of the most frequent token
    * ``top_bigram_cnt`` — occurrences of the most frequent 2-gram
    * ``top_word_frac``  — top_word_cnt / n_tokens (0.0 when empty)
    * ``top_bigram_frac``— top_bigram_cnt / (n_tokens-1) (0.0 when < 2 tokens)
    * ``distinct_frac``  — n_distinct / n_tokens (0.0 when empty)

    High ``top_*_frac`` / low ``distinct_frac`` flag the boilerplate and
    keyboard-mash documents the Gopher/MassiveText filters drop before
    training. Integer counters are emitted alongside the float fractions so
    the oracle gate can stay in exact integers; the fractions themselves
    are single IEEE float64 divisions of those integers, which DuckDB's
    ``CAST(a AS DOUBLE)/b`` reproduces bit-exactly.

    A stateless vectorized map stage; the per-doc Counter loop wraps
    C-speed dict ops (same defensible shape as bm25_topk's term counts).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, dtype=np.int64)
        n_dis = np.zeros(n, dtype=np.int64)
        top_w = np.zeros(n, dtype=np.int64)
        top_b = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            n_tok[i] = len(toks)
            if not toks:
                continue
            wc = Counter(toks)
            n_dis[i] = len(wc)
            top_w[i] = max(wc.values())
            if len(toks) >= 2:
                bc = Counter(zip(toks, toks[1:]))
                top_b[i] = max(bc.values())
        tw_frac = np.where(n_tok > 0, top_w / np.maximum(n_tok, 1), 0.0)
        tb_frac = np.where(n_tok > 1, top_b / np.maximum(n_tok - 1, 1), 0.0)
        d_frac = np.where(n_tok > 0, n_dis / np.maximum(n_tok, 1), 0.0)
        for name, arr, typ in (
            ("n_tokens", n_tok, pa.int64()),
            ("n_distinct", n_dis, pa.int64()),
            ("top_word_cnt", top_w, pa.int64()),
            ("top_bigram_cnt", top_b, pa.int64()),
            ("top_word_frac", tw_frac, pa.float64()),
            ("top_bigram_frac", tb_frac, pa.float64()),
            ("distinct_frac", d_frac, pa.float64()),
        ):
            batch = set_column(batch, name, pa.array(arr, type=typ))
        return batch


def repetition_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(RepetitionStats(text_col=text_col), batch_format="pyarrow")


# PII scrub patterns: ASCII classes only (re.ASCII) so DuckDB's RE2
# regexp_replace(..., 'g') replays each substitution bit-exactly; applied
# in list order (emails first — they contain dots and digits that the
# narrower patterns would otherwise mangle).
_PII_PATTERNS: list[tuple[str, "re.Pattern[str]", str]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", re.ASCII), "<EMAIL>"),
    ("ip", re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", re.ASCII), "<IP>"),
    ("phone", re.compile(r"\+\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{3}\b", re.ASCII), "<PHONE>"),
]


class PiiScrub:
    """Redact emails, IPv4 addresses and +international phone numbers.

    A stateless vectorized map stage (patterns compiled once per worker at
    class construction); each document is rewritten by the fixed pattern
    chain. The stand-in for the redaction pass every training-data
    pipeline runs before tokenization."""

    def __init__(self, text_col: str = "text", out_col: str = "text_scrubbed"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        for _, pat, repl in _PII_PATTERNS:
            texts = [pat.sub(repl, t) for t in texts]
        return set_column(batch, self.out_col, pa.array(texts, type=pa.string()))


def pii_scrub(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
) -> ray.data.Dataset:
    return ds.map_batches(
        PiiScrub(text_col=text_col, out_col=out_col), batch_format="pyarrow"
    )


def bpe_pair_counts(
    ds: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Global top-k ADJACENT token pairs by corpus frequency — the
    statistic one BPE merge step maximizes (the candidate merge is the
    top-1 row; a tokenizer-training loop re-runs this after each merge).

    Same 100-TB shape as :func:`vocab_topk`: the map side tokenizes and
    pre-aggregates per-batch pair counts (Zipf shrinks the exchange), the
    groupby key is the single string ``"t1 t2"`` (tokens are ``[0-9a-z_]+``
    so the space separator sorts BELOW every token character — ordering by
    the joined key is exactly ``ORDER BY t1, t2``), each post-groupby block
    forwards only its local top-k, and the final total-order sort sees
    ≤ blocks×k rows. Emits ``(t1, t2, n)`` under the total tie order
    (n DESC, t1 ASC, t2 ASC).
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = [s.lower() for s in _WORD_RE.findall(t)] if t else []
            c.update(map(" ".join, zip(toks, toks[1:])))
        return pa.table(
            {
                "pair": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    def _local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["n", "pair"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def _split(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = pc.split_pattern(batch.column("pair"), " ")
        return pa.table(
            {
                "t1": pc.list_element(parts, 0),
                "t2": pc.list_element(parts, 1),
                "n": batch.column("n"),
            }
        )

    summed = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
    )
    return (
        summed.map_batches(_local_topk, batch_format="pyarrow")
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
        .map_batches(_split, batch_format="pyarrow")
    )


def grouped_vocab_topk(
    ds: ray.data.Dataset,
    group_col: str,
    k: int = 10,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-GROUP top-k token vocabulary (e.g. per language, per source
    shard) — the stratified counterpart of :func:`vocab_topk`, same
    tokenizer contract (ASCII ``\\w+`` runs, lowered; replayable by
    DuckDB's ``regexp_extract_all`` + ``lower``).

    Shape: per-batch ``(group, token, cnt)`` Counter partials (the
    combiner — the exchange moves distinct-per-batch rows, not the
    occurrence stream), one groupby sum, then a per-group rank in one
    :func:`raylink.ops.window.windowed_rank` exchange on the SMALL summed
    table under the total tie order (cnt DESC, token ASC). Returns
    ``(group_col, token, cnt, rn)`` rows with ``rn ≤ k``.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from raylink.ops.window import windowed_rank

    def _partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        groups = batch.column(group_col).to_pylist()
        for g, t in zip(groups, batch.column(text_col).to_pylist()):
            for tok in _WORD_RE.findall(t):
                c[(g, tok.lower())] += 1
        gs = [g for g, _ in c.keys()]
        toks = [t for _, t in c.keys()]
        return pa.table(
            {
                group_col: pa.array(gs),
                "token": pa.array(toks, type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    summed = (
        ds.select_columns([group_col, text_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def _neg(batch: pa.Table) -> pa.Table:
        c = batch.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: batch.column(group_col),
                "token": batch.column("token"),
                "cnt": batch.column("cnt"),
                "_nc": pa.array(-c.astype(np.int64)),
            }
        )

    ranked = windowed_rank(
        summed.map_batches(_neg, batch_format="pyarrow"),
        group_col,
        ["_nc", "token", "cnt"],
        out_col="rn",
    )

    def _keep(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(rn <= k)).select(
            [group_col, "token", "cnt", "rn"]
        )

    return ranked.map_batches(_keep, batch_format="pyarrow")


def normalize_text(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    out_col: str = "text_norm",
) -> "ray.data.Dataset":
    """Canonical text normalization: ASCII-lowercase, collapse every
    whitespace run to one space, strip leading/trailing whitespace —
    the standard pre-tokenization pass. Fully VECTORIZED Arrow kernels
    (``utf8_lower`` + RE2 ``replace_substring_regex`` + ``utf8_trim``),
    no Python loop; semantics shared with the DuckDB replay
    (``lower`` + ``regexp_replace(..., '\\s+', ' ', 'g')`` + ``trim``).
    """
    import pyarrow.compute as pc

    def _norm(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(batch.column(text_col))
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return set_column(batch, out_col, s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s)

    return ds.map_batches(_norm, batch_format="pyarrow")
