"""Line-level boilerplate removal (CCNet / C4-style corpus hygiene).

Web corpora carry massive cross-document line duplication — navigation
text, cookie banners, footers — and the standard pre-training pass (CCNet,
Wenzek et al. 2020; C4, Raffel et al. 2020 §2.2 "three-sentence spans")
strips any LINE that recurs across enough distinct documents while keeping
each document's remaining lines in order.

Shape for 100 TB:

* **Counting is exact and single-shuffle.** A document is one row, so all
  of its lines sit in one batch; the per-batch partial counts each line
  once per document over a DISJOINT set of documents, which makes the
  partials plainly summable — ``groupby(line).sum`` yields the exact
  distinct-document frequency with ONE ``(line, n)``-row all-to-all (the
  same argument ``cohort_counts`` uses for its per-partition partials).
* **The frequent set is Zipf-small and broadcast.** Only lines at or above
  the threshold come back — boilerplate by definition (a line in ≥ f·N
  documents appears at most N/f·threshold distinct times... and in
  practice thousands of banner strings, not corpus-scale). It is
  ``ray.put`` once and probed per batch; the second pass is a stateless
  vectorized map with ZERO shuffle of document text. If the threshold is
  set so low the frequent set stops being driver-small, the CMS
  heavy-hitter sketch (:func:`raylink.ops.sketch.cms_heavy_hitters`) is
  the documented fallback for building the same broadcast set
  approximately.

Line semantics (shared with the DuckDB oracle so the gate is bit-exact):
split on ``delimiter`` verbatim — no stripping; EMPTY segments are never
counted and never removed (blank-line structure survives); a document
whose every line is boilerplate becomes the empty string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def line_frequencies(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact distinct-document frequency per line: ``(line, n_docs)``.

    Map side splits and de-duplicates per document, pre-sums per batch;
    only ``(line, partial_count)`` rows enter the single all-to-all.

    ``final_partitions``: pass a small value when the corpus's distinct
    line count is KNOWN to be tiny (test corpora) so the Aggregate emits
    no schema-less empty partitions; leave ``None`` at scale — the
    distinct-line table is corpus-sized and must keep its parallelism.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            seen = set(t.split(delimiter))
            seen.discard("")
            c.update(seen)
        return pa.table(
            {
                "line": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    partials = ds.select_columns([id_col, text_col]).map_batches(
        _partial, batch_format="pyarrow"
    )
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    return partials.groupby("line").aggregate(Sum("n", alias_name="n_docs"))


def strip_boilerplate(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    min_docs: int | None = None,
    doc_frac: tuple[int, int] | None = None,
    freq_partitions: int | None = None,
) -> ray.data.Dataset:
    """Remove every line that occurs in ≥ threshold distinct documents;
    emit ``(id_col, text_clean, n_kept, n_dropped)`` with surviving lines
    in their original order.

    The threshold is ``min_docs`` (absolute) or ``doc_frac = (num, den)``
    — frequent when ``n_docs · den ≥ num · N`` with ``N`` the corpus row
    count — kept RATIONAL so the Ray predicate and the SQL replay share
    one integer inequality (no float-ceil seam; same device as the
    ``quantile_filter`` epsilon note, solved here without the epsilon).
    """
    if (min_docs is None) == (doc_frac is None):
        raise ValueError("exactly one of min_docs / doc_frac is required")

    freq = line_frequencies(
        ds, text_col, id_col, delimiter, final_partitions=freq_partitions
    )
    if min_docs is not None:
        thr = int(min_docs)
    else:
        num, den = (int(x) for x in doc_frac)
        n_corpus = ds.count()
        # n_docs·den ≥ num·N  ⟺  n_docs ≥ ceil(num·N / den): exact integer
        # ceil, so the Ray predicate and the SQL replay agree bit-for-bit
        thr = -(-num * n_corpus // den)
    frequent = freq.filter(expr=f"n_docs >= {thr}")
    # Driver-small by the boilerplate contract (see module docstring);
    # collected once, shipped once.
    drop = frozenset(
        frequent.select_columns(["line"]).to_pandas()["line"].tolist()
    )
    drop_ref = ray.put(drop)

    def _strip(batch: pa.Table) -> pa.Table:
        dset: frozenset = ray.get(drop_ref)
        ids = batch.column(id_col)
        cleaned, kept_n, drop_n = [], [], []
        for t in batch.column(text_col).to_pylist():
            parts = t.split(delimiter)
            kept = [p for p in parts if p == "" or p not in dset]
            cleaned.append(delimiter.join(kept))
            kept_n.append(len(kept))
            drop_n.append(len(parts) - len(kept))
        return pa.table(
            {
                id_col: ids,
                "text_clean": pa.array(cleaned, type=pa.string()),
                "n_kept": pa.array(np.asarray(kept_n, dtype=np.int64)),
                "n_dropped": pa.array(np.asarray(drop_n, dtype=np.int64)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _strip, batch_format="pyarrow"
    )
