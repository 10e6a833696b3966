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
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        # one Arrow kernel pass (split → flatten + parent indices +
        # dictionary_encode), then pure-numpy (doc, line-code) dedup and
        # per-code bincount — no per-document Python loop (r4's weak
        # mark; measured 1.8× the Counter kernel on the sf0.1 corpus,
        # bit-identical output)
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        splits = pc.split_pattern(col, pattern=delimiter)
        flat = pc.list_flatten(splits)
        enc = flat.dictionary_encode()
        nu = len(enc.dictionary)
        if nu == 0:
            return pa.table(
                {"line": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(parent.astype(np.int64) * nu + codes)
        cnt = np.bincount(uniq % nu, minlength=nu).astype(np.int64)
        tbl = pa.table({"line": enc.dictionary, "n": pa.array(cnt)})
        return tbl.filter(pc.not_equal(tbl.column("line"), pa.scalar("")))

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
    import pyarrow.compute as pc

    from raylink.util import skip_empty

    # skip_empty map instead of .filter(expr=...): the Aggregate's empty
    # range partitions cross a Filter operator as schema-less bundles
    frequent = freq.map_batches(
        skip_empty(
            lambda t: t.filter(
                pc.greater_equal(t.column("n_docs"), pa.scalar(thr))
            ).select(["line"])
        ),
        batch_format="pyarrow",
    )
    # Driver-small by the boilerplate contract (see module docstring);
    # collected once, shipped once. When NO line is frequent the skip_empty
    # map leaves zero typed blocks and to_pandas has no columns — that is
    # the empty set, not an error (hypothesis-caught edge).
    fdf = frequent.to_pandas()
    drop = frozenset(fdf["line"].tolist()) if "line" in fdf.columns else frozenset()
    drop_ref = ray.put(drop)

    import pandas as pd

    def _strip(batch: pa.Table) -> pa.Table:
        # vectorized: split → flatten, one hash-set membership pass
        # (pandas isin against the broadcast frozenset), regroup the kept
        # lines into a ListArray by cumulative counts, and rebuild each
        # document with ONE Arrow binary_join — no per-line Python
        dset: frozenset = ray.get(drop_ref)
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        splits = pc.split_pattern(col, pattern=delimiter)
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        lines = pd.Series(flat.to_numpy(zero_copy_only=False))
        keep = ((lines == "") | ~lines.isin(dset)).to_numpy()
        ndocs = len(batch)
        n_total = (
            pc.list_value_length(splits)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        kept_cnt = np.bincount(parent[keep], minlength=ndocs).astype(np.int64)
        offsets = np.zeros(ndocs + 1, dtype=np.int32)
        np.cumsum(kept_cnt, out=offsets[1:])
        la = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), flat.filter(pa.array(keep))
        )
        cleaned = pc.binary_join(la, delimiter)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_clean": cleaned,
                "n_kept": pa.array(kept_cnt),
                "n_dropped": pa.array(n_total - kept_cnt),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _strip, batch_format="pyarrow"
    )


def dedup_lines_global(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Global first-writer-wins line deduplication (the CCNet *dedup*
    pass, complementing :func:`strip_boilerplate`'s frequency pass):
    every occurrence of a non-empty line is removed EXCEPT the earliest —
    the one at the smallest ``(doc_id, position)`` corpus-wide. Empty
    lines always survive (document structure). Emits
    ``(id_col, text_clean, n_kept, n_dropped)``.

    Shape — two all-to-alls, both inherent to the semantics:

    1. **Ownership, no join.** Occurrences explode to
       ``(doc, ord, line)`` rows routed by ``hash(line)``; each range
       partition holds ALL occurrences of its lines, so the owner
       (min packed ``doc·2²¹ + ord``) and the keep-filter are computed
       locally in one vectorized transform — ownership never becomes a
       join or a driver structure.
    2. **Reassembly.** Surviving occurrences are joined back onto the
       document table by ``hash(doc)`` (``util.shuffle_merge``), and each
       partition rebuilds its documents' text by position — documents
       with every line removed still emit a row (left side is the doc
       table).

    Packing contract (explicit raise, not an assert): positions must fit
    21 bits (≤ 2,097,151 lines per document) and ids 42 bits — the packed
    key is what lets both the Ray kernel and the DuckDB replay take ONE
    ``MIN`` instead of a two-level argmin.
    """
    import pandas as pd

    from raylink.ops.dedup import _default_partitions
    from raylink.util import pa_type, shuffle_merge, sorted_partition_apply

    ORD_BITS = 21
    L = np.int64(1 << ORD_BITS)
    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = ds.schema()
    id_type = pa_type(dict(zip(schema.names, schema.types))[id_col])

    import pyarrow.compute as pc

    def _explode(batch: pa.Table) -> pa.Table:
        # vectorized occurrence explode (r4's weak mark): one Arrow
        # split → flatten + parent-indices pass; per-line ordinals come
        # from the list offsets (global index minus the parent's start)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0 or len(ids) and ids.max() >= (1 << 42):
            raise ValueError(
                "dedup_lines_global requires 0 <= doc ids < 2^42 "
                "(packed-ownership contract)"
            )
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        splits = pc.split_pattern(col, pattern=delimiter)
        lens = (
            pc.list_value_length(splits)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(lens) and lens.max() >= (1 << ORD_BITS):
            bad = int(np.argmax(lens))
            raise ValueError(
                f"document {ids[bad]} has {lens[bad]} lines; the packed-"
                f"ownership contract caps at {(1 << ORD_BITS) - 1}"
            )
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        starts = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        ords = np.arange(len(parent), dtype=np.int64) - starts[parent]
        # deterministic cross-process line hash (pandas siphash with a
        # pinned key — NEVER builtins hash(), which is PYTHONHASHSEED-
        # randomized per worker and would shear ownership partitions)
        h = pd.util.hash_array(
            flat.to_numpy(zero_copy_only=False), hash_key="raylink_linedup!"
        )  # 16B key
        pid = (h % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                id_col: pa.array(ids[parent].astype(np.int64), type=pa.int64()),
                "ord": pa.array(ords),
                "line": flat,
            }
        )

    occ_schema = pa.schema(
        [(id_col, pa.int64()), ("ord", pa.int64()), ("line", pa.string())]
    )

    def _keep(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        packed = df[id_col].to_numpy() * L + df["ord"].to_numpy()
        df = df.assign(_packed=packed)
        owner = df.groupby("line", sort=False)["_packed"].transform("min")
        keep = (df["line"] == "") | (df["_packed"] == owner)
        out = df[keep]
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(), type=pa.int64()),
                "ord": pa.array(out["ord"].to_numpy()),
                "line": pa.array(out["line"].to_numpy(), type=pa.string()),
            }
        )

    from raylink.util import skip_empty

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        skip_empty(_explode), batch_format="pyarrow"
    )
    # uniform explicit cuts over the 2^31 pid space (same rationale as
    # util.shuffle_merge): no sampling pass, no empty sort partitions
    step = (1 << 31) // nparts
    survivors = sorted_partition_apply(
        exploded, "_pid", _keep, occ_schema,
        boundaries=list(range(step, 1 << 31, step))[: nparts - 1],
        # no schema anchor: the consumer is shuffle_merge WITH an explicit
        # right_schema, and the 0-row anchor crossing its tag map is the
        # bench tail's one residual RefBundle warning
        anchor=False,
    )

    out_schema = pa.schema(
        [
            (id_col, id_type),
            ("text_clean", pa.string()),
            ("n_kept", pa.int64()),
            ("n_dropped", pa.int64()),
        ]
    )

    import re as _re

    def _reassemble(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        # left: documents of this partition; right: their surviving lines.
        # Vectorized: map each surviving line to its document's row
        # position, stable-sort by (position, ord), regroup into a
        # ListArray by per-doc counts, and rebuild text with ONE Arrow
        # binary_join — no per-group Python join.
        right = right.sort_values([id_col, "ord"], kind="stable")
        lpos = pd.Series(
            np.arange(len(left), dtype=np.int64), index=left[id_col].to_numpy()
        )
        rpos = lpos.loc[right[id_col].to_numpy()].to_numpy()
        order = np.argsort(rpos, kind="stable")  # groups by doc, keeps ord
        kept_n = np.bincount(rpos, minlength=len(left)).astype(np.int64)
        offsets = np.zeros(len(left) + 1, dtype=np.int32)
        np.cumsum(kept_n, out=offsets[1:])
        vals = pa.array(right["line"].to_numpy()[order], type=pa.string())
        import pyarrow.compute as pc

        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), vals),
            delimiter,
        )
        n_total = (
            left[text_col].str.count(_re.escape(delimiter)).to_numpy(np.int64)
            + 1
        )
        return pd.DataFrame(
            {
                id_col: left[id_col].to_numpy(),
                "text_clean": joined.to_numpy(zero_copy_only=False),
                "n_kept": kept_n,
                "n_dropped": n_total - kept_n,
            }
        )

    return shuffle_merge(
        ds.select_columns([id_col, text_col]),
        survivors,
        [id_col],
        [id_col],
        _reassemble,
        out_schema,
        num_partitions=nparts,
        # explicit schemas: shuffle_merge would otherwise call
        # Dataset.schema() on the lazy survivors lineage, re-executing
        # the whole ownership exchange just to learn dtypes
        left_schema=pa.schema([(id_col, id_type), (text_col, pa.string())]),
        right_schema=occ_schema,
    )
